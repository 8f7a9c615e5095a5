"""Mergeable-sketch operators (operators/sketches.py) + repetition
quality filter (operators/quality.py): bitmap exactness, HLL accuracy
and merge consistency, filter selectivity, and plan shape.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from lakehouse_weather_spark.operators.sketches import (
    hll_merge_estimates,
    hll_partition_sketches,
)
from lakehouse_weather_spark.operators.quality import apply_quality_filter
from lakehouse_weather_spark.registry import load_all
from lakehouse_weather_spark.sources.tables import load_table


def test_bitmap_distinct_is_exact(spark, sf_dir):
    out = load_all()["q_bitmap_distinct"].fn(spark, sf_dir)
    got = {r["o_orderpriority"]: r["n_customers"] for r in out.collect()}
    orders = load_table(spark, sf_dir, "orders")
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert got == exact


def test_hll_estimate_within_5pct(spark, sf_dir):
    out = load_all()["q_hll_distinct"].fn(spark, sf_dir)
    est = {r["o_orderpriority"]: r["approx_customers"] for r in out.collect()}
    orders = load_table(spark, sf_dir, "orders")
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    exact["ALL"] = orders.select("o_custkey").distinct().count()
    assert set(est) == set(exact)
    for k, e in exact.items():
        assert abs(est[k] - e) <= max(2, 0.05 * e), (k, est[k], e)


def test_hll_partials_merge_like_direct_sketch(spark, sf_dir):
    """Store-partials-then-remerge must estimate like sketching the
    union directly — the property that makes per-partition sketch
    artifacts reusable without rescanning raw data."""
    orders = load_table(spark, sf_dir, "orders")
    partials = hll_partition_sketches(
        orders.withColumn("g", F.pmod(F.col("o_orderkey"), F.lit(7))),
        "g",
        "o_custkey",
    ).withColumn("all", F.lit(1))
    merged = hll_merge_estimates(partials, "all").collect()[0]["approx_ndv"]
    direct = (
        orders.agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("o_custkey"), F.lit(12))
            ).alias("e")
        ).collect()[0]["e"]
    )
    # same lgK -> register-wise max union; estimates agree to ~1%
    assert abs(merged - direct) <= max(2, 0.01 * direct), (merged, direct)


def test_bitmap_plan_has_partial_aggregation(spark, sf_dir):
    # the per-bucket bitmap agg must run map-side before the shuffle:
    # HashAggregate appears in partial + final pairs, and no raw-key
    # distinct (Expand/distinct shuffle) node exists
    df = load_all()["q_bitmap_distinct"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "bitmap_construct_agg" in plan
    assert "Expand" not in plan


def test_quality_filter_splits_corpus(spark, sf_dir):
    out = load_all()["q_quality_repetition"].fn(spark, sf_dir)
    rows = out.collect()
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept < len(rows)  # thresholds genuinely split the data
    # pipeline form agrees with the keep flag on the length+repetition
    # signals it applies
    docs = load_table(spark, sf_dir, "documents")
    assert apply_quality_filter(docs).count() >= kept


def test_quality_plan_is_narrow(spark, sf_dir):
    # per-row array algebra: no Python stage, and the ONLY exchange is
    # the explicit small-fixture fan-out (tables.fan_out, skipped on
    # real multi-split inputs) — no aggregation/join shuffle
    df = load_all()["q_quality_repetition"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange ")
    assert n_exchanges == plan.count("REPARTITION_BY_NUM") <= 1
    assert "ENSURE_REQUIREMENTS" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hll_overlap_inclusion_exclusion(spark, sf_dir):
    from lakehouse_weather_spark.operators.sketches import hll_overlap_estimate

    orders = load_table(spark, sf_dir, "orders")
    # two overlapping slices of the customer keyspace
    a = orders.filter(F.col("o_orderkey") % 3 != 0).select("o_custkey")
    b = orders.filter(F.col("o_orderkey") % 2 != 0).select("o_custkey")
    est = hll_overlap_estimate(a, b, "o_custkey")
    exact_a = a.distinct().count()
    exact_b = b.distinct().count()
    exact_i = a.intersect(b).count()
    assert abs(est["n_a"] - exact_a) <= max(2, 0.05 * exact_a)
    assert abs(est["n_b"] - exact_b) <= max(2, 0.05 * exact_b)
    # intersection inherits three sketches' error: generous 15% bound
    assert abs(est["n_intersect"] - exact_i) <= max(5, 0.15 * exact_i), (
        est,
        exact_i,
    )


def test_countmin_one_sided_error_and_merge(spark, sf_dir):
    from lakehouse_weather_spark.operators.cms import (
        CMS_DEPTH,
        CMS_WIDTH,
        cms_estimate,
        cms_sketch,
    )

    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    rows = load_all()["q_countmin_words"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    # CMS never underestimates
    assert all(r.est_cnt >= r.true_cnt for r in rows)
    # with W=1024 vs a small fixture vocabulary, most top words should
    # be exact (few collisions among heavy cells)
    assert sum(1 for r in rows if r.est_cnt == r.true_cnt) >= 10

    # mergeability: sketch(all) == merge(sketch(half1), sketch(half2))
    h1 = cms_sketch(tokens.filter(F.col("doc_id") % 2 == 0), "word")
    h2 = cms_sketch(tokens.filter(F.col("doc_id") % 2 == 1), "word")
    merged = (
        h1.unionByName(h2)
        .groupBy("d", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    full = cms_sketch(tokens, "word")
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0
    assert full.count() <= CMS_DEPTH * CMS_WIDTH

    # probing the merged sketch gives identical estimates
    probe = spark.createDataFrame([("the",), ("of",)], ["word"])
    est_m = {r.word: r.est_cnt for r in cms_estimate(merged, probe).collect()}
    est_f = {r.word: r.est_cnt for r in cms_estimate(full, probe).collect()}
    assert est_m == est_f


def test_bloom_no_false_negatives_and_merge(spark, sf_dir):
    from lakehouse_weather_spark.operators.bloom import (
        BLOOM_BITS,
        bloom_build,
        bloom_probe,
    )

    rows = load_all()["q_bloom_filter"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    members = [r for r in rows if r.exact_member]
    assert len(members) > 0
    # the defining Bloom guarantee: every member is bloom-maybe
    assert all(r.bloom_maybe for r in members)

    # merge = union of bit sets: filter(A ∪ B) == filter(A) | filter(B)
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("user_id") % 2 == 0).select("user_id").distinct()
    b = ev.filter(F.col("user_id") % 2 == 1).select("user_id").distinct()
    merged = bloom_build(a, "user_id").union(
        bloom_build(b, "user_id")
    ).distinct()
    full = bloom_build(a.union(b), "user_id")
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0
    assert full.count() <= BLOOM_BITS

    # probing the merged filter finds every key from both halves
    verdicts = bloom_probe(merged, a.union(b).distinct(), "user_id")
    assert verdicts.filter(~F.col("bloom_maybe")).count() == 0


def test_type_overlap_counts_exclusive_buckets(spark, tmp_path):
    """Regression: a bitmap bucket populated by only ONE of the two
    event types must still contribute its bits to n_union. With
    user_ids {1, 40000} for type A and {1} for type B (40000 lands in
    a different 32768-wide bitmap bucket), the true overlap is 1; an
    inner join on bucket dropped A's exclusive bucket from the union
    and reported n_shared=2."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1), 1, "A", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1), 40000, "A", 1.0, "{}"),
        (3, dt.datetime(2024, 1, 1), 1, "B", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))

    out = load_all()["q_type_overlap"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.type_a, r.type_b) == ("A", "B")
    assert r.n_a == 2 and r.n_b == 1
    assert r.n_shared == 1


def test_quality_repetition_single_word_doc(spark, tmp_path):
    """Regression: an n=1 doc (no bigrams) must yield NULL
    top_bigram_frac and keep=0 on BOTH engines — Spark's
    sequence(1, 0) is descending [1, 0], not empty, so an unguarded
    bigram transform produced garbage, and the run-length top_count
    returned 1 on the junk array where the DuckDB oracle gives NULL."""
    import duckdb

    spark.createDataFrame(
        [(1, "solo", "en", "t", 4), (2, "two words here repeated", "en", "t", 24)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))

    spec = load_all()["q_quality_repetition"]
    got = {r.doc_id: r for r in spec.fn(spark, str(tmp_path)).collect()}
    assert got[1].top_bigram_frac is None
    assert got[1].keep == 0

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    want = {
        r[0]: r
        for r in con.execute(spec.oracle).fetchall()
    }
    for doc_id, row in want.items():
        g = got[doc_id]
        assert (g.top_bigram_frac is None) == (row[4] is None)
        if g.top_bigram_frac is not None:
            assert abs(g.top_bigram_frac - row[4]) < 1e-12
        assert g.keep == row[6]


def test_bloom_semijoin_equals_plain_semijoin_and_prunes(spark, sf_dir):
    from pyspark.sql import functions as F

    from lakehouse_weather_spark.operators.bloom import (
        _SJ_PRICE,
        bloom_build,
        q_bloom_semijoin,
    )
    from lakehouse_weather_spark.sources.tables import load_table

    got = {
        r.l_returnflag: (r.n_items, r.revenue)
        for r in q_bloom_semijoin(spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > _SJ_PRICE)
    )
    li = load_table(spark, sf_dir, "lineitem")
    plain = (
        li.join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "semi",
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10_000,
                        0,
                    ).cast("bigint")
                ).cast("double")
                / 10_000
            ).alias("rev"),
        )
        .collect()
    )
    want = {r.l_returnflag: (r.n, r.rev) for r in plain}
    assert got == want

    # the bit table is broadcastable and the prefilter actually prunes:
    # with a selective dim the maybe-set is far smaller than the table
    bits = bloom_build(orders.select("o_orderkey"), "o_orderkey")
    assert bits.count() <= 1024
    n_keys = li.select("l_orderkey").distinct().count()
    n_dim = orders.count()
    assert n_dim < n_keys * 0.2  # predicate is genuinely selective


def test_sliding_distinct_equals_bruteforce(spark, sf_dir):
    import datetime as dt

    from lakehouse_weather_spark.operators.sketches import (
        SLIDE_DAYS,
        q_sliding_distinct,
    )
    from lakehouse_weather_spark.sources.tables import load_table

    got = {
        r.window_end: (r.n_days, r.distinct_users)
        for r in q_sliding_distinct(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select("ts", "user_id").collect()
    by_day: dict[dt.datetime, set] = {}
    for r in ev:
        d = r.ts.replace(hour=0, minute=0, second=0, microsecond=0)
        by_day.setdefault(d, set()).add(r.user_id)
    want = {}
    for d in by_day:
        days = [
            d2
            for d2 in by_day
            if 0 <= (d - d2).days <= SLIDE_DAYS - 1
        ]
        users = set().union(*(by_day[d2] for d2 in days))
        want[d] = (len(days), len(users))
    assert got == want
    # windows genuinely overlap: mid-stream windows span 7 days
    assert max(n for n, _ in got.values()) == SLIDE_DAYS
