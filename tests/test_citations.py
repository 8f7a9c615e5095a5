"""Citation discipline gate: every reference-file citation in package
docstrings must resolve to a real file in the reference snapshot.

Round 3's verdict found 7 docstring sites citing reference files that
do not exist; this test makes that class of drift impossible to
reintroduce. Citations look like ``dags/utils/crawl_web.py`` (with an
optional ``:line`` suffix); only the path part must exist.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

_REF = Path("/root/reference")
_PKG = Path(__file__).resolve().parent.parent / "lakehouse_weather_spark"

_CITE_RE = re.compile(r"\bdags/[A-Za-z0-9_/.]+?\.py\b")


@pytest.mark.skipif(not _REF.exists(), reason="reference snapshot absent")
def test_every_dags_citation_resolves():
    missing = {}
    for src in _PKG.rglob("*.py"):
        text = src.read_text()
        for cite in set(_CITE_RE.findall(text)):
            if not (_REF / cite).exists():
                missing.setdefault(str(src.relative_to(_PKG)), []).append(
                    cite
                )
    assert not missing, f"citations not present in reference: {missing}"


def test_citations_exist_at_all():
    # the parity story depends on docstrings citing the reference;
    # guard against citations being stripped wholesale
    n = 0
    for src in _PKG.rglob("*.py"):
        n += len(_CITE_RE.findall(src.read_text()))
    assert n >= 20
