"""Incremental-maintenance operators: the overwrite/append/upsert
patterns the reference fakes with object deletes (SURVEY.md §2.12).

- ``merge_upsert``: MERGE-style upsert without Delta — new/changed rows
  replace base rows by key (anti-join + union). On Delta/Iceberg this is
  a native MERGE INTO; the dataflow below is the engine-agnostic shape
  and stays a two-shuffle plan (anti join + write).
- ``append_partition``: the reference's date-partition append
  (``dags/bronze.py:53,91``) done atomically per partition.
- ``compact_partitions``: small-file compaction — the 100 TB lakehouse
  maintenance job (AQE-coalesced rewrite of a partition's files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def merge_upsert(
    spark: SparkSession, base_dir: str, updates: DataFrame, key: str, out_dir: str
) -> DataFrame:
    """Upsert ``updates`` into the parquet table at ``base_dir`` by
    ``key``; result written to ``out_dir`` and returned. Semantics match
    ``MERGE INTO base USING updates ON base.key = updates.key WHEN
    MATCHED THEN UPDATE * WHEN NOT MATCHED THEN INSERT *``.

    ``updates`` must be unique on ``key``: duplicate update keys all
    land in the result (SQL MERGE would raise on multiple matches —
    dedupe updates first, e.g. ``row_number() == 1`` by recency).

    This is the plain fixed-destination variant; the versioned-store
    MERGE (atomic commit, deletes, schema evolution, time travel)
    is :func:`lakehouse_weather_spark.pipeline.atomic.merge_upsert`."""
    base = spark.read.parquet(base_dir)
    survivors = base.join(updates.select(key), key, "left_anti")
    merged = survivors.unionByName(updates)
    merged.write.mode("overwrite").parquet(out_dir)
    return spark.read.parquet(out_dir)


def append_partition(
    df: DataFrame, out_dir: str, partition_col: str
) -> None:
    """Append new date partitions without touching existing ones (the
    bronze landing pattern; dynamic partition overwrite keeps reruns
    idempotent per partition)."""
    (
        df.sparkSession.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
    )
    df.write.mode("overwrite").partitionBy(partition_col).parquet(out_dir)


def compact_partitions(
    spark: SparkSession, table_dir: str, target_files: int = 4
) -> int:
    """Small-file compaction of a VERSIONED table (see
    ``pipeline.atomic``): the coalesced rewrite lands as a new version
    directory and becomes visible only at the atomic pointer commit, so
    a reader never sees a half-compacted table and a crash mid-rewrite
    leaves the committed version untouched. Returns the resulting file
    count. At scale this runs per-partition with a size-based target
    instead of a count."""
    import os

    from lakehouse_weather_spark.pipeline.atomic import (
        publish,
        read_current,
        resolve,
    )

    df = read_current(spark, table_dir)
    publish(
        table_dir,
        lambda path: df.coalesce(target_files)
        .write.mode("errorifexists")
        .parquet(path),
    )
    return len(
        [f for f in os.listdir(resolve(table_dir)) if f.endswith(".parquet")]
    )


def write_sized(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    target_mb: int = 128,
    sample_rows: int = 1000,
) -> int:
    """Write ``df`` as parquet with the file count derived from a
    measured bytes-per-row estimate, targeting ``target_mb`` per file —
    the proactive answer to the small-files problem (compaction is the
    reactive one). A ``sample_rows`` prefix is written to a scratch dir
    to measure the actual encoded+compressed row width (schema- and
    data-dependent; guessing is routinely off by 10x), then the full
    write uses ceil(total_bytes / target) partitions. Returns the file
    count written. At 100 TB the same estimate feeds
    ``spark.sql.files.maxRecordsPerFile`` instead of a repartition."""
    import glob
    import math
    import os
    import shutil

    scratch = out_dir.rstrip("/") + "__sizing"
    df.limit(sample_rows).write.mode("overwrite").parquet(scratch)
    sampled = spark.read.parquet(scratch)
    n_sampled = sampled.count()
    sample_bytes = sum(
        os.path.getsize(f) for f in glob.glob(f"{scratch}/*.parquet")
    )
    shutil.rmtree(scratch)

    total_rows = df.count()
    bytes_per_row = sample_bytes / max(n_sampled, 1)
    n_files = max(1, math.ceil(total_rows * bytes_per_row / (target_mb * 1024 * 1024)))
    df.repartition(n_files).write.mode("overwrite").parquet(out_dir)
    return len(glob.glob(f"{out_dir}/*.parquet"))


def update_join_view(
    view: DataFrame,
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on,
) -> DataFrame:
    """Incrementally maintain a materialized INNER-join view under
    append-only deltas on either (or both) sides.

    Classic delta-rule (view-maintenance literature; append-only case):

        d(A JOIN B) = dA JOIN B  UNION ALL  A JOIN dB
                      UNION ALL  dA JOIN dB

    where A/B are the PRE-delta snapshots — using post-delta snapshots
    on both terms would double-count the dA x dB pairs. The returned
    frame is ``view`` + the three delta joins; fold-in equality with a
    full recompute is asserted in tests/test_incremental.py.

    Scale shape: the deltas are small by construction (one
    batch/partition of new rows), so every delta join is
    broadcast-able on its delta side; the BASE tables are only ever
    probed, never re-joined against each other — the entire point of
    maintaining the view. Deletions/updates need a keyed MERGE of
    retractions (see merge_upsert); append-only covers the bronze
    ingest pattern.
    """
    d = (
        delta_a.join(b_old, on)
        .unionByName(a_old.join(delta_b, on))
        .unionByName(delta_a.join(delta_b, on))
    )
    return view.unionByName(d)


def update_bitmap_partials(
    old_partials: DataFrame, new_events: DataFrame
) -> DataFrame:
    """Fold a new batch of events into stored per-(day, bucket) roaring
    bitmap partials — the incremental-maintenance path for every
    distinct-count rollup built on them (q_sliding_distinct, weekly
    actives, backfills).

    Because bitmaps merge associatively and commutatively, partials
    from the new batch simply OR into the stored ones:

        merged(day, bucket) = bitmap_or(old(day, bucket), new(day, bucket))

    so a day's history NEVER needs re-reading when late events arrive —
    the whole point of keeping the partials instead of the counts.
    Equality with a full recompute is asserted in
    tests/test_incremental.py.
    """
    from pyspark.sql import functions as F

    fresh = (
        new_events.select(
            F.date_trunc("day", "ts").alias("d"),
            F.bitmap_bucket_number("user_id").alias("bucket"),
            F.bitmap_bit_position("user_id").alias("pos"),
        )
        .groupBy("d", "bucket")
        .agg(F.bitmap_construct_agg("pos").alias("bm"))
    )
    return (
        old_partials.unionByName(fresh)
        .groupBy("d", "bucket")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
    )
