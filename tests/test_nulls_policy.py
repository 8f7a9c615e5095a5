"""Lint gate for the central NULL-semantics policy (VERDICT r9 task 5).

NULLS.md is the single statement of when the engine mirrors
complete-case filters (tier 1) vs null-safe joins (tier 2) vs
NULL-as-group (tier 3). The policy only stays true if every
complete-case site keeps its in-place citation marker and the doc's
file inventory tracks reality — this test pins both, so deleting a
mirrored filter (or adding a new marker file without listing it)
fails the suite instead of silently un-centralizing the policy.
"""

from __future__ import annotations

import os
import re

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PKG = os.path.join(_REPO, "lakehouse_weather_spark")
_DOC = os.path.join(_REPO, "NULLS.md")

_MARKER = re.compile(r"complete[- ]case", re.IGNORECASE)

# Per-file complete-case marker floor as of round 10. Counts may GROW
# (new tier-1 sites cite the policy in place); a shrink means a
# mirrored filter lost its citation — update NULLS.md and this floor
# together, deliberately.
_MIN_MARKERS = {
    "operators/anomaly.py": 14,
    "operators/geo.py": 1,
    "operators/graph.py": 2,
    "operators/inference.py": 8,
    "operators/ivm.py": 2,
    "operators/sampling.py": 2,
    "operators/scalars.py": 1,
    "operators/scans.py": 1,
    "operators/sketches.py": 2,
    "operators/timeseries.py": 2,
    "operators/udfs.py": 2,
    # round-10 join-key/partition-column null battery additions
    # (test_null_join_keys_parity): event-SEQUENCE queries are tier 1
    # on ts — sessionize, session_window, event_transitions,
    # win_sliding, time_rollup, global_ordinal, scd2_intervals
    "operators/reshape.py": 1,
    "operators/sorts.py": 1,
    "streaming/events.py": 8,
    "streaming/stateful.py": 1,
}


def _marker_files() -> dict[str, int]:
    found: dict[str, int] = {}
    for root, _dirs, files in os.walk(_PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            with open(path, encoding="utf-8") as fh:
                n = len(_MARKER.findall(fh.read()))
            if n:
                found[os.path.relpath(path, _PKG)] = n
    return found


def test_policy_doc_exists_and_states_the_tiers():
    assert os.path.exists(_DOC), "NULLS.md (central NULL policy) missing"
    with open(_DOC, encoding="utf-8") as fh:
        doc = fh.read()
    for anchor in (
        "Tier 1", "Tier 2", "Tier 3", "eqNullSafe",
        "IS NOT DISTINCT FROM", "test_null_events_parity",
        "Mirrored, or not at all",
    ):
        assert anchor in doc, f"NULLS.md lost its '{anchor}' section"


def test_marker_floors_hold():
    found = _marker_files()
    lost = {
        f: (found.get(f, 0), floor)
        for f, floor in _MIN_MARKERS.items()
        if found.get(f, 0) < floor
    }
    assert not lost, (
        "complete-case citation markers disappeared (file: (now, floor))"
        f" {lost} — a mirrored NULL filter lost its in-place citation;"
        " restore it or update NULLS.md + this floor deliberately"
    )


def test_doc_inventory_tracks_marker_files():
    with open(_DOC, encoding="utf-8") as fh:
        doc = fh.read()
    unlisted = sorted(
        f for f in _marker_files()
        if f"`{f}`" not in doc and f not in _MIN_MARKERS
    )
    assert not unlisted, (
        f"files with complete-case sites not listed in NULLS.md:"
        f" {unlisted} — add them to the marker inventory (and a floor"
        " in test_nulls_policy._MIN_MARKERS)"
    )
