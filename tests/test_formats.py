"""Multi-format ingest surface (SURVEY §2.1 DERIVED row): CSV and JSON
round-trips with explicit schemas preserve data exactly."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_csv_roundtrip_with_schema(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "docs_csv")
    (
        docs.write.option("header", True)
        .option("quoteAll", True)
        .mode("overwrite")
        .csv(out)
    )
    back = (
        spark.read.schema(docs.schema)
        .option("header", True)
        .csv(out)
    )
    assert back.count() == docs.count()
    assert back.schema == docs.schema
    assert back.exceptAll(docs).isEmpty() and docs.exceptAll(back).isEmpty()


def test_json_roundtrip_with_schema(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "orders_json")
    ev.write.mode("overwrite").json(out)
    back = spark.read.schema(ev.schema).json(out)
    assert back.count() == ev.count()
    assert back.exceptAll(ev).isEmpty()


def test_orc_roundtrip_with_schema(spark, sf_dir, tmp_path):
    """ORC round-trip: the third columnar format Spark ships natively
    (generic byte/string/file/DF sink coverage)."""
    out = str(tmp_path / "orc")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.schema == docs.schema
    assert back.count() == docs.count()
    assert back.exceptAll(docs).isEmpty()


def test_schema_evolution_merge(spark, sf_dir, tmp_path):
    """Schema evolution on append: new columns appear via mergeSchema;
    old files read them as NULL (the additive-evolution contract a
    long-lived 100 TB table needs)."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "evolving")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.select("doc_id", "lang").write.parquet(out)
    docs.select(
        "doc_id", "lang", F.lit("round2").alias("ingest_tag")
    ).write.mode("append").parquet(out)

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"doc_id", "lang", "ingest_tag"}
    assert merged.count() == 2 * docs.count()
    assert merged.filter("ingest_tag IS NULL").count() == docs.count()


def test_schema_evolution_merge_synthetic(spark, tmp_path):
    """Additive schema evolution across parquet file generations:
    mergeSchema unifies old (no `lang`) and new (with `lang`) files —
    old rows read back with NULL lang, no rewrite of historical data.
    The medallion layers rely on this when a column lands mid-stream."""
    out = str(tmp_path / "evolving")
    v1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    v1.write.parquet(out)
    v2 = spark.createDataFrame(
        [(3, "gamma", "en")], "doc_id long, text string, lang string"
    )
    v2.write.mode("append").parquet(out)

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"doc_id", "text", "lang"}
    rows = {r.doc_id: r for r in merged.collect()}
    assert rows[1].lang is None and rows[3].lang == "en"
    # default read (no mergeSchema) still works on any single footer
    assert spark.read.parquet(out).count() == 3
