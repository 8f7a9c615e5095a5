"""Atomic table publication: versioned directories + a pointer file.

The reference publishes tables by delete-then-write
(``dags/utils/chunks_data.py:58-59`` deletes every object under a
prefix, then uploads the new ones) — a reader in the gap sees a
half-deleted table, and a crash in the gap loses the table entirely.
The engine's earlier directory swap (``shutil.rmtree`` + ``move``) had
the same failure window.

This module provides the minimal lakehouse commit protocol instead:

- A *versioned table* is a directory containing immutable version
  subdirectories (``v000001/``, ``v000002/``, ...) plus a tiny pointer
  file ``_CURRENT`` naming the committed version.
- A writer prepares the next version directory completely, then commits
  it with ``os.replace`` of the pointer file — atomic on POSIX. On an
  object store the same protocol is a conditional put of the manifest
  object (S3 If-None-Match / GCS generation preconditions); Delta and
  Iceberg are this idea with richer manifests.
- A reader resolves ``_CURRENT`` once and reads only that version's
  directory. It can never observe a half state: before the commit it
  sees the old version, after it the new one. A crashed writer leaves
  only an orphaned uncommitted version directory, cleaned up by the
  next successful ``publish``.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_CURRENT"


def current_version(table_dir: str) -> str | None:
    """Committed version name, or None if the table has never been
    published."""
    try:
        with open(os.path.join(table_dir, _POINTER)) as fh:
            return fh.read().strip() or None
    except FileNotFoundError:
        return None


def resolve(table_dir: str) -> str:
    """Path of the committed version directory."""
    version = current_version(table_dir)
    if version is None:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    return os.path.join(table_dir, version)


def read_current(spark: SparkSession, table_dir: str) -> DataFrame:
    """Read the committed version of a versioned parquet table."""
    return spark.read.parquet(resolve(table_dir))


def publish(
    table_dir: str,
    write_fn: Callable[[str], None],
    keep: int = 2,
) -> str:
    """Write the next version via ``write_fn(version_path)``, then
    atomically commit it. Returns the committed version path.

    ``keep`` committed predecessors are retained for readers that
    resolved the pointer just before the commit (and as cheap time
    travel); older versions and orphaned uncommitted directories are
    pruned after the commit point."""
    os.makedirs(table_dir, exist_ok=True)
    committed = current_version(table_dir)
    existing = sorted(
        (d for d in os.listdir(table_dir) if d.startswith("v") and d[1:].isdigit()),
        key=lambda d: int(d[1:]),
    )
    last = int(existing[-1][1:]) if existing else 0
    version = f"v{last + 1:06d}"
    write_fn(os.path.join(table_dir, version))

    # commit point: atomic pointer replace
    tmp = os.path.join(table_dir, f".{_POINTER}.tmp")
    with open(tmp, "w") as fh:
        fh.write(version)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(table_dir, _POINTER))

    # prune: keep the new version, `keep` committed predecessors, and
    # drop everything else (including orphans of crashed writers)
    retain = {version}
    if committed is not None and committed in existing:
        older = [d for d in existing if int(d[1:]) <= int(committed[1:])]
        retain.update(older[-keep:])
    import shutil

    for d in existing:
        if d not in retain:
            shutil.rmtree(os.path.join(table_dir, d), ignore_errors=True)
    return os.path.join(table_dir, version)


def publish_df(df: DataFrame, table_dir: str, keep: int = 2) -> str:
    """Publish a DataFrame as the next committed version."""
    return publish(
        table_dir, lambda path: df.write.mode("errorifexists").parquet(path), keep
    )


def list_versions(table_dir: str) -> list[str]:
    """Version names still on disk, oldest first (the committed one plus
    up to ``keep`` retained predecessors)."""
    try:
        names = os.listdir(table_dir)
    except FileNotFoundError:
        return []
    return sorted(
        (d for d in names if d.startswith("v") and d[1:].isdigit()),
        key=lambda d: int(d[1:]),
    )


def read_version(spark: SparkSession, table_dir: str, version: str) -> DataFrame:
    """Time travel: read a specific retained version (cheap snapshot
    isolation — version dirs are immutable once committed)."""
    if version not in list_versions(table_dir):
        raise FileNotFoundError(
            f"version {version!r} not retained in {table_dir}"
            f" (have {list_versions(table_dir)})"
        )
    return spark.read.parquet(os.path.join(table_dir, version))


def table_changes(
    spark: SparkSession,
    table_dir: str,
    key: str,
    from_version: str,
    to_version: str,
) -> DataFrame:
    """CDC-style change feed between two retained versions: every row
    keyed by ``key`` tagged ``insert`` (key only in the newer version),
    ``delete`` (key only in the older; columns from the old row), or
    ``update`` (key in both with any differing column). Computed as a
    full outer join on the key — at scale this is the standard
    snapshot-diff CDC when the writer doesn't emit a row-level log."""
    from pyspark.sql import functions as F

    old = read_version(spark, table_dir, from_version)
    new = read_version(spark, table_dir, to_version)
    cols = [c for c in new.columns if c != key]
    o = old.select(key, F.struct(*cols).alias("_old"))
    n = new.select(key, F.struct(*cols).alias("_new"))
    joined = o.join(n, key, "full_outer")
    change = (
        F.when(F.col("_old").isNull(), F.lit("insert"))
        .when(F.col("_new").isNull(), F.lit("delete"))
        .when(F.col("_old") != F.col("_new"), F.lit("update"))
    )
    return (
        joined.withColumn("_change", change)
        .filter(F.col("_change").isNotNull())
        .select(key, "_change", F.coalesce(F.col("_new"), F.col("_old")).alias("row"))
        .select(key, "_change", "row.*")
    )
