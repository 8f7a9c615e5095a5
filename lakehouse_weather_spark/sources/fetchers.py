"""Fetch backends for the crawl source: real HTML and PDF extraction
behind the injectable ``FetchFn`` seam (ref: ``dags/utils/crawl_web.py:
26-101`` — requests + BeautifulSoup page fetch, PDF download+extract).

Import strategy: the preferred third-party backends (requests, bs4,
pypdf) are used when importable, with dependency-free stdlib fallbacks
(urllib.request, html.parser, a minimal PDF text decoder) so the module
works — and is fully unit-testable against local fixture bytes — in a
hermetic environment with no network and no extra packages.

The fetchers run INSIDE ``mapInPandas`` workers (pipeline/crawl.py), so
everything here must be picklable and per-row cheap; no Spark imports.
"""

from __future__ import annotations

import re
import urllib.parse
import urllib.request
import zlib
from html.parser import HTMLParser

try:  # pragma: no cover - exercised only where requests is installed
    import requests as _requests
except Exception:  # noqa: BLE001
    _requests = None

try:  # pragma: no cover
    from bs4 import BeautifulSoup as _BeautifulSoup
except Exception:  # noqa: BLE001
    _BeautifulSoup = None

try:  # pragma: no cover
    from pypdf import PdfReader as _PdfReader
except Exception:  # noqa: BLE001
    _PdfReader = None

_SKIP_HREF = ("mailto:", "tel:", "#")
_NON_TEXT_TAGS = {"script", "style", "template", "noscript"}


# ---------------------------------------------------------------------------
# HTML: text extraction + link harvesting
# ---------------------------------------------------------------------------


class _TextAndLinks(HTMLParser):
    """Stdlib extractor mirroring the reference's bs4 usage: document
    text (script/style suppressed) and all <a href> values."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self.hrefs: list[str] = []
        self._suppress = 0

    def handle_starttag(self, tag, attrs):
        if tag in _NON_TEXT_TAGS:
            self._suppress += 1
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)

    def handle_endtag(self, tag):
        if tag in _NON_TEXT_TAGS and self._suppress:
            self._suppress -= 1

    def handle_data(self, data):
        if not self._suppress:
            self.chunks.append(data)


def extract_html_text(html: str) -> str:
    """Visible text of an HTML document, blank runs collapsed — the
    reference's ``bs4_extractor`` (crawl_web.py:14-24)."""
    if _BeautifulSoup is not None:  # pragma: no cover - env-dependent
        text = _BeautifulSoup(html, "html.parser").text
    else:
        p = _TextAndLinks()
        p.feed(html)
        text = "".join(p.chunks)
    return re.sub(r"\n\n+", "\n\n", text).strip()


def extract_links(html: str, base_url: str) -> list[str]:
    """Absolute <a href> targets, skipping mailto:/tel:/fragment links
    (crawl_web.py:90-94)."""
    if _BeautifulSoup is not None:  # pragma: no cover - env-dependent
        hrefs = [
            a["href"]
            for a in _BeautifulSoup(html, "html.parser").find_all("a", href=True)
            if a["href"]
        ]
    else:
        p = _TextAndLinks()
        p.feed(html)
        hrefs = p.hrefs
    return [
        urllib.parse.urljoin(base_url, h)
        for h in hrefs
        if h and not h.startswith(_SKIP_HREF)
    ]


# ---------------------------------------------------------------------------
# PDF: text extraction
# ---------------------------------------------------------------------------

_PDF_STREAM_RE = re.compile(rb"stream\r?\n(.*?)(?:\r?\n)?endstream", re.DOTALL)
# text-showing operators inside a content stream: (string) Tj / (s) TJ arrays
_PDF_TEXT_OP_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)")
_PDF_ESCAPES = {
    b"\\n": b"\n", b"\\r": b"\r", b"\\t": b"\t", b"\\b": b"\b",
    b"\\f": b"\f", b"\\(": b"(", b"\\)": b")", b"\\\\": b"\\",
}


def _decode_pdf_string(raw: bytes) -> str:
    body = raw[1:-1]
    for esc, rep in _PDF_ESCAPES.items():
        body = body.replace(esc, rep)
    body = re.sub(rb"\\([0-7]{1,3})", lambda m: bytes([int(m.group(1), 8) & 0xFF]), body)
    return body.decode("latin-1", errors="replace")


def extract_pdf_text(data: bytes) -> str:
    """Text content of a PDF. Uses pypdf when installed; otherwise a
    minimal stdlib decoder: inflate FlateDecode content streams and
    collect the literal strings shown by Tj/TJ operators (the PDF page
    text model; covers the straightforward PDFs the reference ingests
    via its loader — crawl_web.py:26-50). Not a general PDF renderer:
    hex strings, CID-keyed fonts, and encrypted files need the pypdf
    backend."""
    if _PdfReader is not None:  # pragma: no cover - env-dependent
        import io

        reader = _PdfReader(io.BytesIO(data))
        return "\n".join(page.extract_text() or "" for page in reader.pages)

    pieces: list[str] = []
    for m in _PDF_STREAM_RE.finditer(data):
        stream = m.group(1)
        try:
            stream = zlib.decompress(stream)
        except zlib.error:
            pass  # uncompressed stream
        if b"Tj" not in stream and b"TJ" not in stream:
            continue
        for s in _PDF_TEXT_OP_RE.findall(stream):
            pieces.append(_decode_pdf_string(s))
    return "\n".join(p for p in pieces if p.strip())


# ---------------------------------------------------------------------------
# HTTP fetch -> FetchFn
# ---------------------------------------------------------------------------


def http_get(url: str, timeout: float = 10.0) -> tuple[bytes, str]:
    """(body, content_type) via requests when available, else stdlib
    urllib (crawl_web.py:75-78 sends a browser User-Agent)."""
    headers = {"User-Agent": "Mozilla/5.0"}
    if _requests is not None:  # pragma: no cover - no network in CI
        resp = _requests.get(url, headers=headers, timeout=timeout)
        resp.raise_for_status()
        return resp.content, resp.headers.get("Content-Type", "")
    req = urllib.request.Request(url, headers=headers)  # pragma: no cover
    with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
        return resp.read(), resp.headers.get("Content-Type", "")


def http_fetch_fn(
    timeout: float = 10.0,
    get=None,
):
    """Build a ``FetchFn`` (url -> (page_content, content_type, links))
    dispatching on content type: PDF bytes -> text pages, HTML -> text +
    links (ref content-type dispatch: crawl_web.py:128-141). ``get`` is
    injectable for hermetic tests; it defaults to real HTTP."""
    getter = get or (lambda u: http_get(u, timeout))

    def fetch(url: str) -> tuple[str, str, list[str]]:
        body, ctype = getter(url)
        is_pdf = url.lower().endswith(".pdf") or "application/pdf" in ctype
        if is_pdf:
            return extract_pdf_text(body), "application/pdf", []
        html = body.decode("utf-8", errors="replace")
        return extract_html_text(html), "text/html", extract_links(html, url)

    return fetch
