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
