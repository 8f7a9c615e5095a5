"""Parquet table loaders for the driver-provided test tables.

The reference reads whole JSON objects into Python lists
(``dags/access/minio_io_manager.py:68-87``); here every table is a
columnar parquet scan so Catalyst can push filters/projections into the
reader (check ``PushedFilters`` / ``ReadSchema`` in ``.explain``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.sources.paths import dataset_path

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Pin determinism-critical confs even when running inside a caller's
    # session (e.g. the verification driver): UTC rendering and NTZ
    # parquet timestamps keep results identical across host timezones.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(dataset_path(sf_dir, f"{name}.parquet"))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ``ts`` as parquet TIMESTAMP(NANOS), which the
    vectorized Spark reader rejects. Read nanos as raw int64 and convert
    to TIMESTAMP_NTZ at microsecond precision (the nanos are verified
    micro-aligned in the test data, so this is lossless). Session tz is
    pinned to UTC so the LTZ->NTZ rendering is deterministic everywhere.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(dataset_path(sf_dir, "events.parquet"))
    return df.withColumn(
        "ts",
        F.expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)"),
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
