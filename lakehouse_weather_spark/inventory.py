"""Table-file inventory: the metadata view a lakehouse needs for
maintenance decisions (compaction targets, skew detection, skipping
effectiveness) — built from ``input_file_name()`` + one aggregate pass,
i.e. the poor-man's Iceberg `files` metadata table for plain parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def file_inventory(
    spark: SparkSession, table_dir: str, key_col: str | None = None
) -> DataFrame:
    """Per-file row counts (and optional key min/max — the file-skipping
    ranges) for every parquet file of a table directory."""
    df = spark.read.parquet(table_dir).withColumn(
        "_file", F.element_at(F.split(F.input_file_name(), "/"), -1)
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if key_col is not None:
        aggs += [
            F.min(key_col).alias(f"{key_col}_min"),
            F.max(key_col).alias(f"{key_col}_max"),
        ]
    return df.groupBy("_file").agg(*aggs).withColumnRenamed("_file", "file")
