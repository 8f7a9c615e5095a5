"""Gate: the builder's full-registry sweep artifact must be
registry-complete by construction (VERDICT r9 task 2).

LOCAL_CORRECTNESS.json is written only by
``tools/check_oracle.py --json``, which since round 10 refuses to
record a partial sweep. This test closes the other half of the loop:
the COMMITTED artifact must cover exactly the CURRENT registry and be
all-green, so registering a query late in a round without re-running
the sweep fails the suite instead of silently shipping a stale
artifact (the r9 blemish: 403-query sweep, 405-query registry).

Regenerate with:
    python tools/check_oracle.py --sf-dir /root/testdata/sf0.1 \
        --json LOCAL_CORRECTNESS.json
"""

from __future__ import annotations

import json
import os

from lakehouse_weather_spark.registry import load_all

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_ARTIFACT = os.path.join(_REPO, "LOCAL_CORRECTNESS.json")


def _load() -> dict:
    assert os.path.exists(_ARTIFACT), (
        "LOCAL_CORRECTNESS.json missing — run"
        " python tools/check_oracle.py --json LOCAL_CORRECTNESS.json"
    )
    with open(_ARTIFACT) as fh:
        return json.load(fh)


def test_sweep_is_registry_complete():
    data = _load()
    registry = set(load_all())
    recorded = set(data["queries"])
    missing = sorted(registry - recorded)
    extra = sorted(recorded - registry)
    assert not missing and not extra, (
        f"sweep artifact out of sync with registry:"
        f" missing={missing[:8]} extra={extra[:8]} — regenerate"
        " LOCAL_CORRECTNESS.json"
    )
    assert data["n_queries"] == len(registry)


def test_sweep_is_all_green():
    data = _load()
    bad = {
        n: r.get("status")
        for n, r in data["queries"].items()
        if r.get("status") not in ("OK", "ROWS_ONLY")
    }
    assert not bad, f"non-green sweep rows: {bad}"
    assert data["n_passed"] == data["n_queries"]
