"""Scale-pattern behavior: salted joins match plain joins, co-bucketed
joins run exchange-free, partition pruning reaches the scan."""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from lakehouse_weather_spark.plans import bucketed_join, salted_join, write_bucketed


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("custkey"), "o_orderkey"
    )
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("custkey"), "c_name"
    )
    plain = orders.join(customer, "custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, customer, "custkey").select("o_orderkey", "c_name")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).isEmpty()
    assert plain.exceptAll(salted).isEmpty()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS bt")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "bt.orders_b", "o_orderkey")
    write_bucketed(lineitem, "bt.lineitem_b", "o_orderkey")

    joined = bucketed_join(spark, "bt.orders_b", "bt.lineitem_b", "o_orderkey")
    # disable broadcast so the join must be sort-merge — the point is
    # that co-bucketing removes the shuffle, not that the table is small
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan_of(
            bucketed_join(spark, "bt.orders_b", "bt.lineitem_b", "o_orderkey")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    assert joined.count() == spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()


def test_partition_pruning_reaches_scan(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "ingest_date",
        F.date_format(
            F.date_add(F.lit("2024-12-12").cast("date"), (F.col("doc_id") % 5).cast("int")),
            "yyyy-MM-dd",
        ),
    )
    out = str(tmp_path / "parted")
    docs.write.mode("overwrite").partitionBy("ingest_date").parquet(out)

    pruned = spark.read.parquet(out).filter(F.col("ingest_date") == "2024-12-13")
    plan = _plan_of(pruned)
    assert "PartitionFilters: [isnotnull(ingest_date" in plan
    n_part = pruned.count()
    assert 0 < n_part < docs.count()


def test_eval_doc_cap_bounds_shingle_input(spark, sf_dir):
    """The exact-truth eval arms take a deterministic md5-ordered doc
    sample: with doc_cap=N, at most N distinct documents ever enter
    shingling — the audit is bounded by construction, not by fixture
    size — and the same N docs come back on every run."""
    from lakehouse_weather_spark.operators.dedup import (
        _jaccard_pairs,
        _spark_shingle_hashes,
    )

    sh = _spark_shingle_hashes(spark, sf_dir, doc_cap=10)
    ids = sorted(r.doc_id for r in sh.select("doc_id").distinct().collect())
    assert len(ids) <= 10
    again = sorted(
        r.doc_id
        for r in _spark_shingle_hashes(spark, sf_dir, doc_cap=10)
        .select("doc_id")
        .distinct()
        .collect()
    )
    assert ids == again  # md5 order: stable across runs/sessions

    # pairs from the capped arm only ever reference sampled docs
    pairs = _jaccard_pairs(spark, sf_dir, doc_cap=10).collect()
    sampled = set(ids)
    assert all(p.doc_a in sampled and p.doc_b in sampled for p in pairs)

    # uncapped default unchanged: full corpus flows through
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    full = _spark_shingle_hashes(spark, sf_dir).select("doc_id").distinct()
    assert full.count() == n_docs


def test_headline_queries_within_perf_budget(spark, sf_dir):
    """CI-fashion perf smoke: the bench's worst historical offenders
    must stay within a generous multiple of their sf0.1 budget when run
    at the test fixture scale. This catches plan regressions (a new
    shuffle, a lost broadcast, a Python-UDF fallback) the round
    boundary would otherwise discover a day later. Budget: 5 s per
    query at sf0.1 is the driver bar; at the much smaller test fixture
    we allow the same 5 s wall — pure plan pathology, not throughput,
    is what trips it."""
    import time

    from lakehouse_weather_spark.registry import load_all

    specs = load_all()
    heaviest = [
        "q_pagerank_neardup",
        "q_cluster_split",
        "q_dedup_clusters",
        "q_lsh_eval",
        "q_silhouette",
        "q_minhash_neardup",
        "q_tpch_q1",
        "q_agg_basic",
        # round-4 heavies: iterative graph loops and the fold family
        "q_kcore",
        "q_bellman_ford",
        "q_assortativity",
        "q_prorate_revenue",
        "q_merkle_diff",
        "q_sequence_pack",
        # round-5 heavies: multi-width shingle audit, Gram + iteration
        # loop, streaming-through-the-gate, bucketed-table write path
        "q_dedup_shingle_size",
        "q_power_iteration",
        "q_stream_dedup",
        "q_tpch_q3_bucketed",
        "q_graph_2hop",
    ]
    # warm the session so the first query doesn't pay JVM/codegen boot
    spark.range(1).collect()
    over = {}
    for name in heaviest:
        t0 = time.time()
        specs[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.time() - t0
        if dt > 10.0:  # 2x the 5 s budget to absorb shared-box noise
            over[name] = round(dt, 2)
    assert not over, f"queries exceeding 2x perf budget: {over}"
