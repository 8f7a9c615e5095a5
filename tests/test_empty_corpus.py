"""Empty-corpus divergence sweep — the meta-test for the
empty-group divergence CLASS the round-6 fuzzer exposed on
q_dedup_shingle_size: an oracle that emits unconditional scalar /
UNION-ALL aggregate rows while the Spark side ends in a groupBy over a
possibly-empty derived set silently drops the spine rows the audit
exists to report.

Every oracle-backed registered query runs on an ALL-EMPTY corpus (all
ten tables, real schemas, zero rows) on BOTH engines, and the results
must agree bit-exactly. Runtime is ~4 minutes (one Spark plan per
query over empty input) — the round-7 sweep caught ten real defects in
one pass: the shingle-width spine drop, seven Spark-side crashes
(driver model fetches indexing into empty collects: coreset / MMR /
BM25 / pagerank / power-iteration / IVF / PQ), a NULL-vs-0 sum in the
join-plan selector, and an ANSI divide-by-zero in the LSH eval.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check_oracle import canonize  # noqa: E402

from lakehouse_weather_spark.registry import load_all  # noqa: E402
from lakehouse_weather_spark.sources.tables import TABLES  # noqa: E402

# Known ENGINE-level semantic differences on empty relations, each
# verified against a minimal probe (not an artifact of our queries):
# Spark's Expand-based grouping-sets implementation emits NO rows over
# an empty relation (spark.range(0).rollup("id").count() == 0), while
# the SQL standard — and DuckDB/Postgres — emit the grand-total ()
# grouping set unconditionally (count=0, sums NULL). Matching DuckDB
# would require a second unconditional global-aggregate scan unioned
# onto every rollup/cube — a real cost at 100 TB for a shape (a fully
# empty fact table) that is a deployment error, not a data condition.
_ENGINE_SEMANTICS_WHITELIST = {
    "q_agg_rollup": "Spark rollup emits 0 rows on empty input",
    "q_agg_cube": "Spark cube emits 0 rows on empty input",
    "q_grouping_sets": "Spark grouping sets emit 0 rows on empty input",
}


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_corpus")
    for t in TABLES:
        (
            spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
            .limit(0)
            .coalesce(1)
            .write.parquet(f"{out}/{t}.parquet")
        )
    return str(out)


@pytest.fixture(scope="module")
def empty_con(empty_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{empty_dir}/{t}.parquet/*.parquet')"
        )
    return con


def test_empty_corpus_parity(spark, empty_dir, empty_con):
    """One sweep, all divergers reported together (parametrizing 339
    cases would pay per-test fixture overhead for a property that is
    really one invariant over the registry)."""
    failures: dict[str, str] = {}
    for name, spec in load_all().items():
        if spec.oracle is None:
            continue
        try:
            ddf = empty_con.execute(spec.oracle).fetchdf()
            duck = ("ok", len(ddf), canonize(ddf))
        except Exception as e:  # noqa: BLE001
            duck = ("err", type(e).__name__, str(e)[:120])
        try:
            spdf = spec.fn(spark, empty_dir).toPandas()
            sp = ("ok", len(spdf), canonize(spdf))
        except Exception as e:  # noqa: BLE001
            sp = ("err", type(e).__name__, str(e)[:120])
        verdict = None
        if sp[0] == "ok" and duck[0] == "ok":
            if sp[1] != duck[1]:
                verdict = f"ROWCOUNT spark={sp[1]} duck={duck[1]}"
            elif sp[2] != duck[2]:
                verdict = f"VALUES n={sp[1]}"
        elif sp[0] != duck[0]:
            verdict = f"ONE_SIDE_ERR spark={sp[:2]} duck={duck[:2]}"
        elif sp[0] == "err":
            verdict = f"BOTH_ERR spark={sp[1]} duck={duck[1]}"
        if verdict is None:
            continue
        if name in _ENGINE_SEMANTICS_WHITELIST:
            continue
        failures[name] = verdict
    assert not failures, failures


def test_whitelist_matches_engine_probe(spark):
    # the whitelist's premise must stay true on the running Spark: if a
    # future Spark version adopts standard empty-relation grouping-set
    # semantics, this fails and the whitelist must shrink
    import pyspark.sql.functions as F

    df = spark.range(0).select(F.col("id").alias("a"))
    assert df.rollup("a").agg(F.count(F.lit(1))).count() == 0
    assert df.cube("a").agg(F.count(F.lit(1))).count() == 0


# --- single-row corpus sweep ------------------------------------------

# The 1-row twin of the empty sweep: every table holds exactly ONE row.
# This is where zero-variance, self-pair-only, one-time-half and
# second-order-statistic guards live — the round-7 run caught six more
# real defects (kNN self-exclusion on a 1-vector corpus, negative
# fixed-point variance under sqrt, ANSI divide-by-zero on empty time
# halves / degenerate value ranges, zero-variance Pearson).


@pytest.fixture(scope="module")
def one_row_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("one_row_corpus")
    for t in TABLES:
        (
            spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
            .limit(1)
            .coalesce(1)
            .write.parquet(f"{out}/{t}.parquet")
        )
    return str(out)


@pytest.fixture(scope="module")
def one_row_con(one_row_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{one_row_dir}/{t}.parquet/*.parquet')"
        )
    return con


def test_single_row_corpus_parity(spark, one_row_dir, one_row_con):
    failures: dict[str, str] = {}
    for name, spec in load_all().items():
        if spec.oracle is None:
            continue
        try:
            ddf = one_row_con.execute(spec.oracle).fetchdf()
            duck = ("ok", len(ddf), canonize(ddf))
        except Exception as e:  # noqa: BLE001
            duck = ("err", type(e).__name__, str(e)[:120])
        try:
            spdf = spec.fn(spark, one_row_dir).toPandas()
            sp = ("ok", len(spdf), canonize(spdf))
        except Exception as e:  # noqa: BLE001
            sp = ("err", type(e).__name__, str(e)[:120])
        verdict = None
        if sp[0] == "ok" and duck[0] == "ok":
            if sp[1] != duck[1]:
                verdict = f"ROWCOUNT spark={sp[1]} duck={duck[1]}"
            elif sp[2] != duck[2]:
                verdict = f"VALUES n={sp[1]}"
        elif sp[0] != duck[0]:
            verdict = f"ONE_SIDE_ERR spark={sp[:2]} duck={duck[:2]}"
        elif sp[0] == "err":
            verdict = f"BOTH_ERR spark={sp[1]} duck={duck[1]}"
        if verdict is not None:
            failures[name] = verdict
    assert not failures, failures
