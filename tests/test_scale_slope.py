"""Scale-slope gate (VERDICT r7 task 3, r9 task 1): BENCH_SCALE.json
is the committed measurement of each worst-headline query's scaling
exponent between generated corpora a DECADE apart
(tools/bench_scale.py). The 5 s sf0.1 budget cannot distinguish O(n)
from O(n^2) on blocked-pair families; the slope can. Round 10 adds a
SECOND decade (sf1.0 -> sf10, lineitem 6M -> 60M rows): one decade can
hide a super-linear term behind its noise floor, two decades of
linear-or-better is the 100x evidence the design claims rest on. This
gate fails the suite when any query's measured slope in ANY decade is
super-linear and no written cap argument exists below — so a
regression that breaks a blocking/banding shape shows up as a failing
test, not a silent slowdown.

Regenerate after plan-shape changes with:
    python tools/bench_scale.py                          # sf0.1->1.0
    python tools/bench_scale.py --scales 1 10 --merge    # sf1->10
"""

from __future__ import annotations

import json
import math
from pathlib import Path

# Above 1.0 is super-linear; 1.35 allows constant-factor noise (JIT,
# shuffle setup, GC) on multi-second timings before we call a shape
# regression. r8 baseline: max measured slope 0.986 — every query in
# the set is linear-or-better with >0.35 margin.
SLOPE_THRESHOLD = 1.35

# query -> written cap argument permitting a super-linear slope.
# EMPTY by design at r8: nothing measured super-linear. Adding an
# entry requires an argument for why the growth is bounded (e.g.
# output-size-driven with a documented cap), not a shrug.
SUPRALINEAR_WHITELIST: dict[str, str] = {}

_ARTIFACT = Path(__file__).resolve().parents[1] / "BENCH_SCALE.json"


def _load() -> dict:
    assert _ARTIFACT.exists(), (
        "BENCH_SCALE.json missing — run python tools/bench_scale.py"
    )
    with open(_ARTIFACT) as fh:
        return json.load(fh)


def _decades(data: dict) -> dict[str, dict]:
    if "decades" in data:
        return data["decades"]
    # v1 artifact: its single decade is the whole file
    key = f"{min(data['scales'])}->{max(data['scales'])}"
    return {key: data}


def test_scale_artifact_is_a_decade_apart_and_broad():
    data = _load()
    for key, rec in _decades(data).items():
        scales = sorted(rec["scales"])
        assert len(scales) == 2, key
        ratio = scales[1] / scales[0]
        assert ratio >= 9.5, f"{key}: scales {scales} not a decade apart"
    # primary decade keeps the worst-25 breadth
    assert len(data["slopes"]) >= 25, (
        "slope coverage shrank below the worst-25 set"
    )


def test_second_decade_present_and_broad():
    """The sf1.0 -> sf10 decade must exist and cover at least the 15
    worst-slope families of the first decade (VERDICT r9 task 1)."""
    data = _load()
    decades = _decades(data)
    big = [
        rec for rec in decades.values() if max(rec["scales"]) >= 10.0
    ]
    assert big, (
        "no sf>=10 decade measured — run"
        " python tools/bench_scale.py --scales 1 10 --merge"
    )
    assert len(big[0]["slopes"]) >= 15, (
        "second decade covers fewer than the 15 worst-slope families"
    )


def test_no_unexplained_superlinear_slope():
    data = _load()
    offenders = {}
    for key, rec in _decades(data).items():
        for name, slope in rec["slopes"].items():
            if slope > SLOPE_THRESHOLD and name not in SUPRALINEAR_WHITELIST:
                offenders[f"{key}:{name}"] = slope
    assert not offenders, (
        f"super-linear scaling measured without a cap argument:"
        f" {offenders} — fix the plan shape or add a WRITTEN argument"
        " to SUPRALINEAR_WHITELIST"
    )


def test_whitelist_entries_carry_real_arguments():
    for name, arg in SUPRALINEAR_WHITELIST.items():
        assert len(arg.split()) >= 8, (
            f"{name}: cap argument too thin to count as written"
        )


def test_slopes_match_times():
    """The slope column must actually derive from the recorded times —
    the artifact cannot be hand-edited into compliance."""
    data = _load()
    for key, rec in _decades(data).items():
        lo, hi = sorted(rec["scales"])
        decade = math.log(hi / lo)
        t_lo = rec["times"][str(lo)]
        t_hi = rec["times"][str(hi)]
        for name, slope in rec["slopes"].items():
            want = math.log(
                max(t_hi[name], 1e-3) / max(t_lo[name], 1e-3)
            ) / decade
            assert abs(want - slope) < 5e-3, (key, name, want, slope)
