"""Scale-slope gate (VERDICT r7 task 3): BENCH_SCALE.json is the
committed measurement of each worst-headline query's scaling exponent
between generated corpora a DECADE apart (sf0.1 -> sf1, lineitem 600k
-> 6M; tools/bench_scale.py). The 5 s sf0.1 budget cannot distinguish
O(n) from O(n^2) on blocked-pair families; the slope can. This gate
fails the suite when a query's measured slope is super-linear and no
written cap argument exists below — so a regression that breaks a
blocking/banding shape shows up as a failing test, not a silent
slowdown.

Regenerate the artifact after plan-shape changes with:
    python tools/bench_scale.py
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


def test_scale_artifact_is_a_decade_apart_and_broad():
    data = _load()
    scales = sorted(data["scales"])
    assert len(scales) == 2
    ratio = scales[1] / scales[0]
    assert ratio >= 9.5, f"scales {scales} not a decade apart"
    assert len(data["slopes"]) >= 25, (
        "slope coverage shrank below the worst-25 set"
    )


def test_no_unexplained_superlinear_slope():
    data = _load()
    offenders = {
        name: slope
        for name, slope in data["slopes"].items()
        if slope > SLOPE_THRESHOLD and name not in SUPRALINEAR_WHITELIST
    }
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
    lo, hi = sorted(data["scales"])
    decade = math.log(hi / lo)
    t_lo = data["times"][str(lo)]
    t_hi = data["times"][str(hi)]
    for name, slope in data["slopes"].items():
        want = math.log(
            max(t_hi[name], 1e-3) / max(t_lo[name], 1e-3)
        ) / decade
        assert abs(want - slope) < 5e-3, (name, want, slope)
