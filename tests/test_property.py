"""Property-based tests (hypothesis): the recursive folds and
credit-conservation invariants hold for ARBITRARY series, not just the
fixture — the fuzz layer over the hand-replay unit tests.

Spark round-trips are expensive, so example counts are small; the
pure-python contracts (floor-division helpers, discount weights,
largest-remainder allocation) fuzz harder.
"""

from __future__ import annotations

import datetime as dt
import sys
from pathlib import Path

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_SPARK_SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _events_df(spark, counts):
    rows = []
    eid = 0
    base = dt.datetime(2026, 1, 1)
    for i, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, base + dt.timedelta(days=i), 1, "t", 0.0, ""))
            eid += 1
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    )


@_SPARK_SETTINGS
@given(
    counts=st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=12)
    .filter(lambda c: sum(c) > 0)
)
def test_holt_fold_matches_python_for_any_series(spark, tmp_path_factory, counts):
    from lakehouse_weather_spark.operators.timeseries import _S, q_holt_linear

    # days with zero events produce no bucket — drop them from the replay
    series = [c for c in counts if c > 0]
    out = tmp_path_factory.mktemp("holt")
    _events_df(spark, counts).write.mode("overwrite").parquet(
        f"{out}/events.parquet"
    )
    got = sorted(
        (r.day, r.level, r.trend)
        for r in q_holt_linear(spark, str(out)).collect()
    )
    l = b = None
    want = []
    for c in series:
        if l is None:
            l, b = c * _S, 0
        else:
            lp = (c * _S + 3 * (l + b)) // 4
            b = ((lp - l) + 3 * b) // 4
            l = lp
        want.append((l / _S, b / _S))
    assert [(lv, tr) for _, lv, tr in got] == want


@_SPARK_SETTINGS
@given(
    seqs=st.lists(
        st.lists(
            st.sampled_from(["view", "click", "purchase"]),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_attribution_conserves_credit_for_any_stream(
    spark, tmp_path_factory, seqs
):
    from lakehouse_weather_spark.operators.attribution import q_attribution

    rows = []
    eid = 0
    base = dt.datetime(2026, 1, 1)
    for uid, types in enumerate(seqs):
        for i, t in enumerate(types):
            rows.append(
                (eid, base + dt.timedelta(minutes=i), uid, t, 0.0, "")
            )
            eid += 1
    out = tmp_path_factory.mktemp("attr")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{out}/events.parquet")

    res = q_attribution(spark, str(out)).collect()
    # independent count of conversions-with-touches
    n_groups = 0
    for types in seqs:
        cur = 0
        for t in types:
            if t == "purchase":
                if cur:
                    n_groups += 1
                cur = 0
            else:
                cur += 1
    for col in ("first_touch_bp", "last_touch_bp", "linear_bp"):
        assert sum(getattr(r, col) for r in res) == 10_000 * n_groups


@given(
    weights=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=20)
    .filter(lambda w: sum(w) > 0),
    budget=st.integers(min_value=1, max_value=10_000),
)
@settings(max_examples=200, deadline=None)
def test_largest_remainder_always_sums_to_budget(weights, budget):
    # the pure integer contract behind q_neyman_allocation
    w_tot = sum(weights)
    base = [budget * w // w_tot for w in weights]
    rem = [(budget * w) % w_tot for w in weights]
    leftover = budget - sum(base)
    order = sorted(range(len(weights)), key=lambda i: (-rem[i], i))
    alloc = list(base)
    for i in order[:leftover]:
        alloc[i] += 1
    assert sum(alloc) == budget
    assert all(a >= b for a, b in zip(alloc, base))
    assert 0 <= leftover < len(weights) + 1


@given(st.integers(min_value=-(10**15), max_value=10**15))
@settings(max_examples=500, deadline=None)
def test_floor_division_helper_contract(x):
    # (x - pmod(x, 4)) / 4 == floor(x / 4) for either sign — the
    # identity q_holt_linear's _sfd/_dfd rely on
    pmod = ((x % 4) + 4) % 4
    assert (x - pmod) % 4 == 0
    assert (x - pmod) // 4 == x // 4  # python // is floor
