"""Incremental maintenance: merge/upsert semantics, idempotent partition
append, compaction."""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from lakehouse_weather_spark.pipeline.incremental import (
    append_partition,
    compact_partitions,
    merge_upsert,
)


def test_merge_upsert(spark, sf_dir, tmp_path):
    base_dir = str(tmp_path / "base")
    out_dir = str(tmp_path / "merged")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    cust.write.parquet(base_dir)

    updates = (
        cust.filter("c_custkey <= 5")
        .withColumn("c_name", F.concat(F.lit("UPDATED_"), F.col("c_name")))
        .unionByName(
            cust.limit(1).select(
                (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
                F.lit("NEW_CUSTOMER").alias("c_name"),
                "c_nationkey",
                "c_acctbal",
                "c_mktsegment",
            )
        )
    )
    n_updated = cust.filter("c_custkey <= 5").count()
    merged = merge_upsert(spark, base_dir, updates, "c_custkey", out_dir)
    assert merged.count() == cust.count() + 1  # updates in place, 1 inserted
    assert merged.filter("c_name LIKE 'UPDATED_%'").count() == n_updated
    assert merged.filter("c_name = 'NEW_CUSTOMER'").count() == 1
    # untouched rows survive byte-identically
    untouched = merged.filter("c_custkey > 5 AND c_custkey < 1000000")
    assert untouched.exceptAll(cust.filter("c_custkey > 5")).isEmpty()


def test_append_partition_idempotent(spark, sf_dir, tmp_path):
    out = str(tmp_path / "parted")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "d", F.lit("2024-12-12")
    )
    append_partition(docs, out, "d")
    n1 = spark.read.parquet(out).count()
    # rerun of the same partition replaces, not duplicates
    append_partition(docs, out, "d")
    assert spark.read.parquet(out).count() == n1
    # a new partition appends without touching the old one
    docs2 = docs.withColumn("d", F.lit("2024-12-13"))
    append_partition(docs2, out, "d")
    assert spark.read.parquet(out).count() == 2 * n1


def test_compaction(spark, sf_dir, tmp_path):
    out = str(tmp_path / "frag")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.repartition(16).write.parquet(out)
    before = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert before >= 16
    after = compact_partitions(spark, out, target_files=2)
    assert after <= 2
    assert spark.read.parquet(out).count() == docs.count()
