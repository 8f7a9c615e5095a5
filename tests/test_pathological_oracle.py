"""Spark-vs-DuckDB parity on a PATHOLOGICAL events fixture — the
shapes the driver's generated testdata never produces (single-event
users/types, one-day series, constant values, types living entirely in
one time half, simultaneous timestamps). The hand-replay unit tests
prove semantics on the fixture; this file proves the ORACLES stay
bit-exact off the happy path, which is exactly where engine-divergence
bugs (null handling, /0, empty groups) hide.
"""

from __future__ import annotations

import datetime as dt
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check_oracle import canonize, compare_one  # noqa: E402

from lakehouse_weather_spark.registry import load_all  # noqa: E402

_QUERIES = [
    "q_welch_ttest",
    "q_mannwhitney",
    "q_cuped",
    "q_did",
    "q_twap",
    "q_changepoint",
    "q_attribution",
    "q_seq_patterns",
    "q_window_funnel",
    "q_cohort_ltv",
    "q_sliding_distinct",
    "q_srm_check",
    "q_holt_linear",
    "q_mase",
    "q_causal_impact",
    "q_ewma_smooth",
    "q_cusum_shift",
    "q_l_diversity",
]

_BASE = dt.datetime(2026, 3, 1)


def _pathological_rows():
    rows = []
    eid = 0

    def add(days, minutes, uid, typ, val):
        nonlocal eid
        rows.append(
            (
                eid,
                _BASE + dt.timedelta(days=days, minutes=minutes),
                uid,
                typ,
                val,
                "",
            )
        )
        eid += 1

    # user 1: a single event of a type that appears nowhere else
    add(0, 0, 1, "solo", 1.0)
    # user 2: constant values (zero variance), spread over both halves
    for d in range(8):
        add(d, 5, 2, "flat", 7.0)
    # type 'early' lives ENTIRELY in the first half
    for d in range(3):
        add(d, 10, 3, "early", float(d))
    # type 'late' lives ENTIRELY in the second half
    for d in range(5, 8):
        add(d, 10, 4, "late", float(d))
    # user 5: full funnel twice + trailing orphans, with simultaneous
    # timestamps inside a purchase group
    for rep in range(2):
        add(1, 60 * rep, 5, "view", 0.5)
        add(1, 60 * rep + 1, 5, "click", 0.5)
        add(1, 60 * rep + 2, 5, "signup", 0.5)
        add(1, 60 * rep + 3, 5, "purchase", 9.9)
    add(7, 0, 5, "view", 0.1)  # after the last purchase: attributes to nothing
    # user 6: two events at the SAME microsecond (TWAP zero-gap tie)
    add(2, 0, 6, "flat", 1.0)
    add(2, 0, 6, "flat", 2.0)
    return rows


@pytest.fixture(scope="module")
def patho_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("patho")
    spark.createDataFrame(
        _pathological_rows(),
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    ).coalesce(1).write.parquet(f"{out}/events.parquet")
    return str(out)


@pytest.fixture(scope="module")
def patho_con(patho_dir):
    con = duckdb.connect()
    # Spark writes a DIRECTORY of part files; DuckDB needs the glob
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{patho_dir}/events.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", _QUERIES)
def test_pathological_parity(spark, patho_dir, patho_con, name):
    spec = load_all()[name]
    res = compare_one(name, spec, spark, patho_con, patho_dir)
    assert res["status"] == "OK", (name, res.get("detail"), res)


def test_pathological_fixture_exercises_the_edges(spark, patho_dir):
    # the fixture genuinely contains the degenerate shapes
    from lakehouse_weather_spark.sources.tables import load_table

    ev = load_table(spark, patho_dir, "events").collect()
    types = {}
    for r in ev:
        types.setdefault(r.event_type, []).append(r)
    assert len(types["solo"]) == 1
    assert len({r.value for r in types["flat"][:8]}) <= 2
    assert canonize  # imported utility stays exercised
