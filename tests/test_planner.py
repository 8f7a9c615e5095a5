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
