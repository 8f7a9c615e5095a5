"""SparkSession factory with scale-oriented defaults.

The reference runs single-threaded Python on one node
(``dags/utils/chunks_data.py:69``, ``dags/access/test.py:15-16``); this
engine targets a 1000-executor cluster reading ~100 TB. The configs here
are chosen so the SAME code runs on ``local[32]`` for tests and on a
real cluster unchanged:

- AQE on (runtime shuffle-coalesce, skew-join splitting, plan re-opt).
- Arrow on (vectorized pandas_udf / mapInPandas exchange).
- UTC session timezone + NTZ parquet timestamps so results are
  byte-identical across cluster timezones (and match the DuckDB oracle).
- Shuffle partitions sized from the local core count; on a cluster this
  is expected to be overridden (or left to AQE's initialPartitionNum).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEF_SF_DIR = "/root/testdata/sf0.1"


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", _DEF_SF_DIR)


def get_spark(
    app_name: str = "lakehouse_weather_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    # default pre-touched initial heap: 7/8 of the driver heap (14g at
    # the 16g default), floored/capped so a smaller
    # SPARK_GRAFT_DRIVER_MEM can never produce Xms > Xmx (fails JVM
    # boot). r11 A/B at sf0.1 local[32]: the r10 default (3/8 = 6g)
    # left the rest of the heap to grow lazily mid-run, and on hosts
    # that service fresh anonymous pages slowly (~450 MB/s here) that
    # growth taxed EVERY query a little — full-bench timed total
    # 359/361 s (6g, two runs) vs 283/330 s (14g, two runs). Peak G1
    # heap over a 421-query session is ~12-14 GB, so 7/8 pre-touches
    # the whole working heap at boot (a one-time, untimed cost).
    try:
        heap_gb = int(driver_mem.lower().rstrip("g"))
        xms_flags = (
            f" -Xms{max(1, heap_gb * 7 // 8)}g -XX:+AlwaysPreTouch"
        )
    except ValueError:  # non-"<n>g" spec: skip the pretouch default
        xms_flags = ""

    # Export the vendored protobuf onto PYTHONPATH BEFORE the JVM
    # boots: transformWithState's Python workers (spawned by the JVM)
    # inherit this env, and retrofitting after boot is impossible.
    # No-op where protobuf is natively importable or absent entirely.
    try:
        from lakehouse_weather_spark.streaming.stateful import (
            _ensure_protobuf,
        )

        _ensure_protobuf()
    except Exception:  # noqa: BLE001 - TWS is optional; never block boot
        pass

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- memory: local mode hosts all executor threads inside the
        # driver JVM, whose default 1g heap OOMs well before the box
        # does (observed: sf1 slope bench, 32 threads). Only effective
        # when THIS process launches the JVM (true for every CLI/test
        # entry here); a cluster deployment sizes executors instead.
        .config("spark.driver.memory", driver_mem)
        # JIT code cache: a 400+-query session generates hundreds of
        # distinct whole-stage-codegen classes; the JVM default
        # (~240 MB) fills mid-run, after which the JIT flushes/stops
        # compiling and the session tail runs partially interpreted
        # (measured: uncontended tail-half of the bench 197 s -> 180 s
        # with 2g). Reservation is virtual address space, committed
        # lazily — cheap insurance for any long-lived driver.
        #
        # -Xms6g -XX:+AlwaysPreTouch: this sandbox services FRESH
        # anonymous-page faults pathologically slowly (~50-300 MB/s
        # measured; vmstat shows up to 28% hypervisor steal during
        # fault storms), so lazy heap-capacity growth mid-run (G1 grew
        # 2.4 -> 5.3 GB over a 421-query bench) lands multi-second
        # stalls on whichever queries trigger expansion. Pre-touching a
        # peak-sized heap at boot moves that one-time cost out of query
        # time (G1 pre-touches with its parallel GC threads). Measured:
        # full bench 492/536 s (two runs, lazy) -> 450 s (pre-touched).
        # On a normal kernel/hypervisor this is still standard practice
        # for latency-sensitive JVMs and costs only boot time.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_GRAFT_DRIVER_JAVA_OPTS",
                "-XX:ReservedCodeCacheSize=2g" + xms_flags,
            ),
        )
        # --- correctness / determinism ---
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        # --- adaptive execution: the 100 TB safety net ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE partition coalescing stays at stock settings
        # (parallelismFirst=true, advisory 64m, minPartitionSize 1m).
        # Measured both alternatives at sf0.1 (OPTIMIZATION_r10.md §3):
        # parallelismFirst=false + advisory 128m serialized CPU-heavy
        # small-byte window/agg stages onto one task (12-query sample:
        # 19.7 s stock vs 30.8 s size-based) — the byte target is the
        # right production UPPER bound but local CPU-bound stages need
        # the parallelism-derived target. The advisory size is still
        # deployment-tunable:
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION", "64m"),
        )
        # runtime bloom-filter pushdown: semi-join reduction of big scans
        # from selective join sides (off by default; a large-join win)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # --- shuffle sizing ---
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # 128 MB splits: standard cluster-friendly scan granularity
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # --- broadcast: dims like region/nation/supplier stay broadcast
        # even at SF100k (they grow slowly or not at all) ---
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # --- python exchange ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # local warehouse for bucketed/managed tables (static conf — must
        # be set at session build; harmless on a real cluster where the
        # deployment overrides it)
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/lws_warehouse"),
        )
        # keep the local UI off (test/bench hygiene)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    # --- object store (opt-in; ref deployment is MinIO-backed,
    # docker-compose.yml:309-323). Point SPARK_GRAFT_S3_ENDPOINT at an
    # S3/MinIO endpoint and supply AWS_ACCESS_KEY_ID /
    # AWS_SECRET_ACCESS_KEY in the environment; the public connector
    # must be on the classpath, e.g.
    # SPARK_GRAFT_EXTRA_PACKAGES="org.apache.hadoop:hadoop-aws:3.4.1".
    # Every engine path flows through sources/paths.py:dataset_path, so
    # s3a:// table locations then work unchanged.
    endpoint = os.environ.get("SPARK_GRAFT_S3_ENDPOINT")
    if endpoint:
        builder = (
            builder.config("spark.hadoop.fs.s3a.endpoint", endpoint)
            .config("spark.hadoop.fs.s3a.path.style.access", "true")
            .config(
                "spark.hadoop.fs.s3a.connection.ssl.enabled",
                os.environ.get("SPARK_GRAFT_S3_SSL", "false"),
            )
            .config(
                "spark.hadoop.fs.s3a.aws.credentials.provider",
                "com.amazonaws.auth.EnvironmentVariableCredentialsProvider",
            )
        )
    packages = os.environ.get("SPARK_GRAFT_EXTRA_PACKAGES")
    if packages:
        builder = builder.config("spark.jars.packages", packages)
    spark = builder.getOrCreate()
    # Reliable checkpoint location for iterative algorithms (connected-
    # components label propagation). localCheckpoint() is executor-local
    # and lost on executor failure; a real cluster must point this at a
    # shared filesystem (HDFS/S3) via SPARK_GRAFT_CHECKPOINT_DIR.
    if spark.sparkContext.getCheckpointDir() is None:
        spark.sparkContext.setCheckpointDir(
            os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR", "/tmp/lws_checkpoints")
        )
    return spark


def warm_python_workers(spark: SparkSession) -> None:
    """Provision the Python worker pool: one trivial pandas_udf stage
    over <cores> partitions forks a worker per core and imports
    pandas/numpy in each. The first Python-boundary stage otherwise
    pays that cold start inside whatever query hits it first — on
    hosts that service fresh anonymous-page faults slowly (this
    sandbox: ~50-300 MB/s) the 32-worker import storm is a
    multi-second stall. Guide §4.5's init-once principle applied at
    session level; call it from untimed warmup, never from a query."""
    from pyspark.sql import functions as F

    cpus = spark.sparkContext.defaultParallelism

    @F.pandas_udf("long")
    def _warm_py(s):
        import numpy as _np  # noqa: F401

        return s

    (
        spark.range(cpus * 4, numPartitions=cpus)
        .select(_warm_py("id"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
