"""Scan / source queries (SURVEY.md §2.1).

Reference behaviors re-expressed: JSON object reader
(``dags/access/minio_io_manager.py:68-87``) and Parquet reader
(``dags/access/minio_io_manager.py:169-181``) become plain columnar
scans. At 100 TB these are partition-parallel vectorized parquet reads
with column pruning — the projection lists below reach the reader as
``ReadSchema``, and the ``l_quantity`` predicate is pushed down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table


@register(
    "q_scan_documents",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents",
    doc="Full scan of the documents table (ref: minio_io_manager.read_json).",
)
def q_scan_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


@register(
    "q_scan_parquet",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem WHERE l_quantity > 25
    """,
    doc="Pruned+filtered parquet scan (ref: minio_io_manager.download_parquet"
    " + test.py row filter). Predicate and projection push into the reader.",
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 25)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@register(
    "q_scan_events",
    oracle="SELECT event_id, ts, user_id, event_type, value FROM events",
    doc="Typed scan of the stream-shaped events table (weather-API stand-in,"
    " ref: dags/bronze.py:110-111).",
)
def q_scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
