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


@register(
    "q_delta_log_export",
    oracle="""
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY source
    """,
    doc="Delta-protocol interop round-trip: publish a per-source"
    " document summary into a scratch VERSIONED table (pipeline/"
    "atomic.py commit protocol), export a minimal _delta_log"
    " (protocol 1/2 + metaData schemaString + add actions,"
    " atomic.export_delta_log), REPLAY the log with the protocol's"
    " reader rules (adds minus removes -> live file set), and read"
    " the snapshot back through exactly those files. The oracle"
    " computes the same aggregate straight from the source, so the"
    " gate proves the published-exported-replayed snapshot is"
    " bit-identical to the data that went in — the external-reader"
    " guarantee (duckdb delta_scan / delta-rs see this exact layout;"
    " tests/test_incremental.py skip-gates the real delta_scan read"
    " on extension availability).",
)
def q_delta_log_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from lakehouse_weather_spark.pipeline.atomic import (
        export_delta_log,
        publish_df,
        replay_delta_log,
    )

    summary = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )
    # scratch location keyed by corpus AND pid: rerunning in the same
    # process republishes the next version of the same table
    # (exercising version turnover), while concurrent sessions over the
    # same corpus (bench + gate driver, pytest-xdist) never race one
    # directory's publish/export/replay (round-6 ADVICE)
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    table_dir = os.path.join(
        tempfile.gettempdir(), f"lws_delta_export_{key}_{os.getpid()}"
    )
    publish_df(summary, table_dir, schema_mode="overwrite")
    export_delta_log(table_dir)
    files, schema_string = replay_delta_log(table_dir)
    assert files and '"type":"struct"' in schema_string.replace(" ", "")
    # multi-commit time travel: a process rerun re-publishes the next
    # version of the same table, and the export appends ONE new commit
    # per version — assert the exported history still resolves every
    # retained version to a distinct file set (the external reader's
    # view of time travel)
    from lakehouse_weather_spark.pipeline.atomic import list_versions

    retained = list_versions(table_dir)
    if len(retained) > 1:
        prev_files, _ = replay_delta_log(table_dir, at_version=retained[-2])
        assert prev_files and set(prev_files) != set(files)
    return spark.read.parquet(*files).select("source", "n_docs", "sum_chars")
