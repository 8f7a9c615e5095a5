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


# Per-(session, corpus, table) memo of the ANALYZED scan DataFrame.
# ``spark.read.parquet`` re-lists the directory and re-reads parquet
# footers on EVERY call to resolve the schema (~85 ms measured at
# sf0.1); the registry surface calls load_table ~2x per query, so a
# 400-query sweep pays ~70 s of repeated footer reads for identical
# plans. The memo holds the lazy scan PLAN (never data — execution
# still reads the files each time), keyed by a weak session ref plus a
# content fingerprint so a corpus rewritten under the same path
# mid-session gets a fresh scan (same invalidation contract as
# dedup._substrate). This is exactly what a catalog/metastore gives a
# production deployment: schema resolution paid once per table, not
# once per query.
import weakref

_SCAN_MEMO: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Pin determinism-critical confs even when running inside a caller's
    # session (e.g. the verification driver): UTC rendering and NTZ
    # parquet timestamps keep results identical across host timezones.
    # Unconditional (sub-ms) — a caller may have mutated these since the
    # memoized scan was first built.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    per = _SCAN_MEMO.setdefault(spark, {})
    key = (sf_dir, name, corpus_fingerprint(sf_dir, name))
    df = per.get(key)
    if df is None:
        if name == "events":
            df = _load_events(spark, sf_dir)
        else:
            df = spark.read.parquet(dataset_path(sf_dir, f"{name}.parquet"))
        per[key] = df
    return df


def with_event_ts(df: DataFrame, ntz: bool = True) -> DataFrame:
    """Normalize the events ``ts`` column to a timestamp, whatever the
    file layout. Generator versions have stored ``ts`` as parquet
    TIMESTAMP(NANOS) (readable only as raw int64 via the nanosAsLong
    conf) or as TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ/LTZ depending
    on inferTimestampNTZ); branch on the scanned type so every layout
    loads identically. Nanos are micro-aligned in the test data, so the
    int64 path is lossless. Session tz is pinned UTC by the callers, so
    LTZ<->NTZ casts are deterministic everywhere.

    ntz=True yields TIMESTAMP_NTZ (batch/oracle comparisons); ntz=False
    yields TIMESTAMP (LTZ), which streaming watermarks require.
    """
    src = dict(df.dtypes)["ts"]
    col = (
        F.expr("timestamp_micros(ts div 1000)")
        if src == "bigint"
        else F.col("ts")
    )
    target = "timestamp_ntz" if ntz else "timestamp"
    return df.withColumn("ts", col.cast(target))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(dataset_path(sf_dir, "events.parquet"))
    return with_event_ts(df, ntz=True)


def fan_out(df: DataFrame, key: str, par: int = 16) -> DataFrame:
    """Spread a small single-file input across ``par`` tasks so narrow
    compute-heavy stages (shingling, per-doc array algebra) use the
    whole machine — one parquet file is one input split, which would
    otherwise pin the stage to a single core. File count is a cheap
    split-count proxy; a real multi-TB input has >> par splits and
    skips the repartition (no shuffle at scale). par=16 measured best
    for the md5-heavy shingle stage at sf0.1 (8 leaves cores idle;
    >16 only adds scheduling overhead at this input size)."""
    spark = df.sparkSession
    par = min(spark.sparkContext.defaultParallelism, par)
    if len(df.inputFiles()) < par:
        return df.repartition(par, key)
    return df


def local_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Small driver-local table -> DataFrame via Arrow, bypassing the
    pickled-RDD path.

    ``spark.createDataFrame(list)`` parallelizes the rows into
    ``defaultParallelism`` slices whose execution runs through plain
    (non-Arrow) Python workers — a SECOND worker factory that the
    Arrow-UDF warmup never touches. Measured at local[32]: 2.5-3.5 s
    the first time any query hits it (32 serialized worker forks behind
    the factory lock) and ~0.35 s per use warm (32 Python round trips
    for a handful of rows). Building a pyarrow Table in the driver and
    handing it to createDataFrame ships ready Arrow batches to the JVM:
    no Python workers at execution, ~0.1 s warm, nothing to warm up
    (guide §4 — eliminate the Python boundary; §5 — tiny lookup tables
    are driver-side model state, not distributed data).

    Supports the primitive + array column types the operator surface
    uses; schema strings accept both ``a long`` and ``a: long`` forms
    (same grammar as createDataFrame). Returns a DataFrame with the
    exact schema/nullability the classic path would produce."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType, _parse_datatype_string

    st = (
        schema
        if isinstance(schema, StructType)
        else _parse_datatype_string(schema)
    )
    ars = to_arrow_schema(st)
    rows = [tuple(r) for r in rows]
    cols = list(zip(*rows)) if rows else [() for _ in st.fields]
    tbl = pa.Table.from_arrays(
        [
            pa.array(list(c), type=ars.field(i).type)
            for i, c in enumerate(cols)
        ],
        schema=ars,
    )
    return spark.createDataFrame(tbl)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def corpus_fingerprint(sf_dir: str, name: str) -> str:
    """Cheap content fingerprint of a table's files (relative path,
    size, mtime per file) for memo-key invalidation: the substrate/model
    memos serve checkpointed snapshots keyed by (session, sf_dir,
    params), and without this a corpus REWRITTEN under the same path
    mid-session (a regenerated fixture) would silently serve the stale
    snapshot (round-6 ADVICE). A scandir over a handful of parquet
    files — microseconds, no data read."""
    import hashlib
    import os

    root = dataset_path(sf_dir, f"{name}.parquet")
    entries = []
    if os.path.isdir(root):
        for base, _dirs, files in sorted(os.walk(root)):
            for f in sorted(files):
                p = os.path.join(base, f)
                st = os.stat(p)
                entries.append(
                    (os.path.relpath(p, root), st.st_size, st.st_mtime_ns)
                )
    else:
        st = os.stat(root)
        entries.append((name, st.st_size, st.st_mtime_ns))
    return hashlib.md5(repr(entries).encode()).hexdigest()
