"""Arm selectors (plans.choose_* + operators/planner.py): the decision
rules must pick salted on a hot-key fixture, broadcast on a small dim,
LSH above the pair budget — and the registered decision tables must
agree with the library constants."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from lakehouse_weather_spark.plans import (
    BROADCAST_CAP_ROWS,
    EXACT_PAIR_BUDGET,
    WINDOW_BUDGET_ROWS,
    choose_dedup_arm,
    choose_join_arm,
    choose_join_plan,
    choose_quantile_arm,
)
from lakehouse_weather_spark.registry import load_all


def test_join_selector_broadcast_on_small_dim(spark):
    fact = spark.range(0, 50_000).select(
        (F.col("id") % 100).alias("k"), "id"
    )
    dim = spark.range(0, 100).select(F.col("id").alias("k"))
    arm, stats = choose_join_plan(fact, "k", dim)
    assert arm == "broadcast"
    assert stats["n_dim"] == 100


def test_join_selector_salted_on_hot_key(spark):
    # one pathological key carries 60k rows; dim too big to broadcast
    hot = spark.range(0, 60_000).select(F.lit(0).alias("k"), "id")
    cold = spark.range(0, 5_000).select((F.col("id") + 1).alias("k"), "id")
    fact = hot.unionByName(cold)
    dim = spark.range(0, BROADCAST_CAP_ROWS + 1).select(
        F.col("id").alias("k")
    )
    arm, stats = choose_join_plan(fact, "k", dim)
    assert arm == "salted_smj"
    assert stats["max_key_cnt"] == 60_000


def test_join_selector_smj_on_uniform_big(spark):
    fact = spark.range(0, 50_000).select(
        (F.col("id") % 25_000).alias("k"), "id"
    )
    dim = spark.range(0, BROADCAST_CAP_ROWS + 1).select(
        F.col("id").alias("k")
    )
    arm, _ = choose_join_plan(fact, "k", dim)
    assert arm == "smj"


def test_dedup_selector_lsh_above_budget():
    # n*(n-1)/2 > EXACT_PAIR_BUDGET -> lsh
    import math

    n_over = int(math.isqrt(2 * EXACT_PAIR_BUDGET)) + 2
    assert choose_dedup_arm(n_over) == "lsh"
    assert choose_dedup_arm(1_000) == "exact"


def test_quantile_selector_threshold():
    assert choose_quantile_arm(WINDOW_BUDGET_ROWS) == "window"
    assert choose_quantile_arm(WINDOW_BUDGET_ROWS + 1) == "sampled_cutpoints"


def test_registered_decisions_match_library(spark, sf_dir):
    """The gate-verified decision tables must re-derive exactly what
    the library selectors say for the same integers — one rule, two
    renderings."""
    specs = load_all()
    for r in specs["q_choose_join_plan"].fn(spark, sf_dir).collect():
        assert r.arm == choose_join_arm(r.n_dim, r.max_key_cnt)
    for r in specs["q_choose_dedup_plan"].fn(spark, sf_dir).collect():
        assert r.arm == choose_dedup_arm(r.n_items)
    for r in specs["q_choose_quantile_plan"].fn(spark, sf_dir).collect():
        assert r.arm == choose_quantile_arm(r.n_rows)


def test_auto_join_picks_salted_on_hot_key(spark):
    """The selector wired to a consumer: a fact with ONE key carrying
    more than HOT_KEY_ROWS rows and a dim too big to broadcast must go
    down the salted path (the _salt column appears in the plan), and
    the result must equal the plain join exactly."""
    import contextlib
    import io

    from lakehouse_weather_spark.plans import HOT_KEY_ROWS, auto_join

    fact = spark.range(0, HOT_KEY_ROWS + 500).select(
        # one hot key (0) + a long tail of singletons
        F.when(F.col("id") < HOT_KEY_ROWS + 1, F.lit(0))
        .otherwise(F.col("id"))
        .alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(0, 25_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("dval")
    )
    joined, arm, stats = auto_join(fact, dim, "k")
    assert arm == "salted_smj"
    assert stats["max_key_cnt"] == HOT_KEY_ROWS + 1
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    assert "_salt" in buf.getvalue()
    plain = fact.join(dim, "k")
    assert joined.count() == plain.count()
    assert (
        joined.agg(F.sum("payload"), F.sum("dval")).collect()
        == plain.agg(F.sum("payload"), F.sum("dval")).collect()
    )


def test_auto_join_picks_broadcast_on_small_dim(spark):
    from lakehouse_weather_spark.plans import auto_join

    fact = spark.range(0, 5_000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("dval")
    )
    joined, arm, _ = auto_join(fact, dim, "k")
    assert arm == "broadcast"
    assert joined.count() == 5_000


def test_salted_join_auto_delegates(spark):
    from lakehouse_weather_spark.plans import salted_join

    fact = spark.range(0, 1_000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.range(0, 7).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dval")
    )
    # small dim -> the auto path broadcasts instead of paying the salt
    out = salted_join(fact, dim, "k", auto=True)
    assert out.count() == 1_000


def test_near_dup_pairs_auto_small_corpus_exact(spark, sf_dir):
    """On the fixture corpus (well under the pair budget) the auto
    entry picks the exact arm, and its pair set equals the PPJoin
    scale arm's — the selector changes cost, never answers."""
    from lakehouse_weather_spark.operators.dedup import (
        _jaccard_pairs_high,
        near_dup_pairs_auto,
    )

    pairs, arm, stats = near_dup_pairs_auto(spark, sf_dir)
    assert arm == "exact"
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    want = {
        (r.doc_a, r.doc_b)
        for r in _jaccard_pairs_high(spark, sf_dir).select(
            "doc_a", "doc_b"
        ).collect()
    }
    assert got == want
    assert stats["n_items"] > 0


def test_near_dup_pairs_auto_lsh_above_budget(spark, sf_dir, monkeypatch):
    """Shrinking the pair budget flips the SAME corpus to the lsh arm
    (monkeypatched constant — the decision rule, not a giant fixture)."""
    from lakehouse_weather_spark import plans
    from lakehouse_weather_spark.operators import dedup as D

    monkeypatch.setattr(plans, "EXACT_PAIR_BUDGET", 10)
    pairs, arm, _ = D.near_dup_pairs_auto(spark, sf_dir)
    assert arm == "lsh"
    assert pairs.count() >= 0


def test_auto_quantiles_window_arm_is_exact(spark):
    """Under the window budget the arm is 'window' and buckets are the
    exact equi-depth partition: sizes differ by at most 1 and bucket
    order follows value order."""
    from lakehouse_weather_spark.plans import auto_quantiles

    df = spark.range(1000).selectExpr(
        "id AS k", "(id * 37) % 1000 AS v"
    )
    out, arm, stats = auto_quantiles(df, "v", "k", n_buckets=8)
    assert arm == "window" and stats["n_rows"] == 1000
    sizes = {
        r["bucket"]: r["n"]
        for r in out.groupBy("bucket").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    assert set(sizes) == set(range(8))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # value ranges do not overlap across buckets
    import pyspark.sql.functions as F

    rng = out.groupBy("bucket").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    ).orderBy("bucket").collect()
    for a, b in zip(rng, rng[1:]):
        assert a["hi"] <= b["lo"]


def test_auto_quantiles_sampled_arm_scales(spark, monkeypatch):
    """Shrinking the window budget flips the SAME input to the sampled
    arm: every row lands in a valid bucket and no bucket hoards more
    than a small multiple of its fair share (sample-exact cuts)."""
    from lakehouse_weather_spark import plans

    monkeypatch.setattr(plans, "WINDOW_BUDGET_ROWS", 10)
    df = spark.range(2000).selectExpr(
        "id AS k", "(id * 37) % 2000 AS v"
    )
    out, arm, _ = plans.auto_quantiles(df, "v", "k", n_buckets=8)
    assert arm == "sampled_cutpoints"
    sizes = {
        r["bucket"]: r["n"]
        for r in out.groupBy("bucket").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    assert set(sizes) <= set(range(8)) and sum(sizes.values()) == 2000
    assert max(sizes.values()) <= 3 * (2000 // 8)
