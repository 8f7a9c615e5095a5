"""Fetch backends: HTML text/link extraction, PDF text extraction, and
the content-type-dispatching FetchFn — all hermetic (fixture bytes via
an injected getter; no network, no third-party parser packages)."""

from __future__ import annotations

import sys
import zlib
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lakehouse_weather_spark.pipeline.crawl import crawl
from lakehouse_weather_spark.sources.fetchers import (
    extract_html_text,
    extract_links,
    extract_pdf_text,
    http_fetch_fn,
)

HTML = b"""<html><head><title>Station</title>
<script>var x = "ignore me";</script>
<style>.c { color: red }</style></head>
<body><h1>Hanoi weather</h1>
<p>Humidity   rising.</p>


<p>Storm warning.</p>
<a href="/stations/hanoi.html">Hanoi</a>
<a href="https://other.example/global.pdf">Report</a>
<a href="mailto:ops@example.com">mail</a>
<a href="#top">top</a>
<a href="tel:+8424">call</a>
</body></html>"""


def make_pdf(pages: list[str], compress: bool) -> bytes:
    """Minimal single-xref PDF with one content stream per page."""
    objs: list[bytes] = []
    kids = ", ".join(f"{3 + 2 * i} 0 R" for i in range(len(pages)))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Count {len(pages)} /Kids [{kids}] >>".encode()
    )
    for i, text in enumerate(pages):
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {4 + 2 * i} 0 R >>".encode()
        )
        safe = text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        stream = f"BT /F1 12 Tf 72 720 Td ({safe}) Tj ET".encode()
        if compress:
            stream = zlib.compress(stream)
            extra = b" /Filter /FlateDecode"
        else:
            extra = b""
        objs.append(
            b"<< /Length %d%s >>\nstream\n%s\nendstream" % (len(stream), extra, stream)
        )
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for n, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n".encode()
    )
    return bytes(out)


def test_html_text_strips_tags_scripts_and_blank_runs():
    text = extract_html_text(HTML.decode())
    assert "Hanoi weather" in text and "Storm warning." in text
    assert "ignore me" not in text and "color: red" not in text
    assert "\n\n\n" not in text
    assert not text.startswith(("\n", " "))


def test_links_absolute_and_filtered():
    links = extract_links(HTML.decode(), "https://example.com/a/index.html")
    assert links == [
        "https://example.com/stations/hanoi.html",
        "https://other.example/global.pdf",
    ]


def test_pdf_text_raw_and_flate():
    for compress in (False, True):
        pdf = make_pdf(["Rain gauge (mm) \\ test", "Page two"], compress)
        text = extract_pdf_text(pdf)
        assert "Rain gauge (mm) \\ test" in text
        assert "Page two" in text


def test_fetch_fn_dispatches_on_content_type():
    site = {
        "https://example.com/": (HTML, "text/html; charset=utf-8"),
        "https://other.example/global.pdf": (
            make_pdf(["Global outlook"], True),
            "application/pdf",
        ),
    }
    fetch = http_fetch_fn(get=lambda u: site[u])
    content, ctype, links = fetch("https://example.com/")
    assert ctype == "text/html" and "Hanoi weather" in content
    assert "https://other.example/global.pdf" in links
    content, ctype, links = fetch("https://other.example/global.pdf")
    assert ctype == "application/pdf"
    assert content == "Global outlook" and links == []


def test_crawl_through_real_fetcher_reaches_pdf(spark):
    """End-to-end: the BFS crawl driven by the REAL fetch backend (with
    an injected transport) follows an HTML link into a PDF document."""
    site = {
        "https://example.com/": (HTML, "text/html"),
        "https://example.com/stations/hanoi.html": (
            b"<html><body>Hanoi station detail</body></html>",
            "text/html",
        ),
        "https://other.example/global.pdf": (
            make_pdf(["Global outlook"], True),
            "application/pdf",
        ),
    }

    def get(url):
        if url not in site:
            raise OSError(f"unreachable {url}")
        return site[url]

    pages = crawl(
        spark,
        seeds=["https://example.com/"],
        depth=2,
        fetch_fn=http_fetch_fn(get=get),
        fetch_partitions=2,
    )
    rows = {r.url: r for r in pages.collect()}
    assert "Hanoi weather" in rows["https://example.com/"].page_content
    assert rows["https://other.example/global.pdf"].page_content == "Global outlook"
    assert rows["https://other.example/global.pdf"].content_type == "application/pdf"
    assert "Hanoi station detail" in rows["https://example.com/stations/hanoi.html"].page_content
