"""External-reader proof of the Delta export, offline (VERDICT r7
task 2).

No true foreign engine is installable in this container — the first
test RECORDS that fact by attempting the duckdb delta extension load —
so the proof uses ``tools/delta_reader.py``: a clean-room reader
implemented only from the public Delta protocol spec, sharing zero
code with the writer (it never imports ``lakehouse_weather_spark``).
It must open the multi-commit log, time-travel, reconstruct from the
checkpoint WITHOUT the pre-checkpoint JSON commits (log cleanup), and
see typed partition values — everything a foreign engine would do.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from pyspark.sql import functions as F  # noqa: E402

from delta_reader import DeltaProtocolError, DeltaTable  # noqa: E402
from lakehouse_weather_spark.pipeline.atomic import (  # noqa: E402
    export_delta_log,
    publish_df,
)


def test_no_foreign_engine_available_documented():
    """The container genuinely cannot load a foreign Delta engine:
    duckdb's delta extension needs a network INSTALL and no deltalake
    wheel is importable. If either ever becomes available this test
    FAILS, which is the signal to flip the real-engine tests on."""
    import importlib.util

    import duckdb

    assert importlib.util.find_spec("deltalake") is None, (
        "deltalake is now importable — switch the external-reader proof"
        " to the real engine"
    )
    con = duckdb.connect()
    with pytest.raises(Exception):
        con.execute("LOAD delta")


def test_clean_room_reader_shares_no_code_with_writer():
    """The reader is a genuinely independent implementation: its module
    source never imports the package that writes the log."""
    src = (
        Path(__file__).resolve().parents[1] / "tools" / "delta_reader.py"
    ).read_text()
    assert "lakehouse_weather_spark" not in src.replace(
        "``lakehouse_weather_spark.pipeline.atomic``", ""
    ).replace("``lakehouse_weather_spark``", "")


def test_reader_opens_multi_commit_log_and_time_travels(spark, tmp_path):
    table_dir = str(tmp_path / "t1")
    publish_df(
        spark.range(0, 40).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        table_dir,
    )
    export_delta_log(table_dir)
    publish_df(
        spark.range(0, 90).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        table_dir,
    )
    export_delta_log(table_dir)

    dt = DeltaTable(table_dir)
    assert dt.latest_version() == 1
    latest = dt.to_arrow()
    assert latest.num_rows == 90
    assert sorted(latest.column("k").to_pylist()) == list(range(90))
    assert latest.schema.field("k").type == "int64"
    # time travel to Delta commit 0 = first published snapshot
    v0 = dt.to_arrow(0)
    assert v0.num_rows == 40
    assert sorted(v0.column("v").to_pylist()) == [2 * i for i in range(40)]
    assert dt.validate() == []
    assert dt.validate(0) == []


def test_reader_sees_typed_partition_values(spark, tmp_path):
    """partitionValues are strings in the log; the reader must reattach
    them cast per schemaString — int stays int64, string stays string
    even when it looks like a date."""
    table_dir = str(tmp_path / "t2")
    df = spark.range(0, 60).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("int").alias("bucket"),
        F.when(F.col("id") % 2 == 0, "2024-01-02")
        .otherwise("2024-01-03")
        .alias("day"),
    )
    publish_df(df, table_dir, partition_by=["bucket", "day"])
    export_delta_log(table_dir)

    dt = DeltaTable(table_dir)
    snap = dt.snapshot()
    assert snap.partition_columns == ["bucket", "day"]
    for add in snap.adds.values():
        assert set(add["partitionValues"]) == {"bucket", "day"}
    tbl = dt.to_arrow()
    assert tbl.num_rows == 60
    assert str(tbl.schema.field("bucket").type) == "int32"
    assert str(tbl.schema.field("day").type) == "string"
    got = sorted(
        zip(
            tbl.column("k").to_pylist(),
            tbl.column("bucket").to_pylist(),
            tbl.column("day").to_pylist(),
        )
    )
    want = sorted(
        (i, i % 3, "2024-01-02" if i % 2 == 0 else "2024-01-03")
        for i in range(60)
    )
    assert got == want
    assert dt.validate() == []


def test_reader_reconstructs_from_checkpoint_after_log_cleanup(
    spark, tmp_path
):
    """Publish+export past the checkpoint interval, then DELETE every
    pre-checkpoint JSON commit (the protocol's log-cleanup allowance).
    A spec-correct reader must still reconstruct latest AND
    checkpoint-version state; asking for a pre-checkpoint version must
    raise (history is gone), exactly like Delta after cleanup."""
    from lakehouse_weather_spark.pipeline.atomic import _CHECKPOINT_EVERY

    table_dir = str(tmp_path / "t3")
    n_commits = _CHECKPOINT_EVERY + 3
    for i in range(n_commits):
        publish_df(
            spark.range(0, 10 + i).select(F.col("id").alias("k")),
            table_dir,
            keep=n_commits + 1,
        )
        export_delta_log(table_dir)
    log_dir = os.path.join(table_dir, "_delta_log")
    ckpt = os.path.join(
        log_dir, f"{_CHECKPOINT_EVERY:020d}.checkpoint.parquet"
    )
    assert os.path.isfile(ckpt)
    assert json.load(open(os.path.join(log_dir, "_last_checkpoint")))[
        "version"
    ] == _CHECKPOINT_EVERY
    for v in range(_CHECKPOINT_EVERY):
        os.unlink(os.path.join(log_dir, f"{v:020d}.json"))

    dt = DeltaTable(table_dir)
    latest = dt.to_arrow()
    assert latest.num_rows == 10 + n_commits - 1
    at_ck = dt.to_arrow(_CHECKPOINT_EVERY)
    assert at_ck.num_rows == 10 + _CHECKPOINT_EVERY
    with pytest.raises(DeltaProtocolError):
        dt.snapshot(_CHECKPOINT_EVERY - 1)
    assert dt.validate() == []


def test_timestamp_ntz_feature_gate(spark, tmp_path):
    """A schema with TIMESTAMP_NTZ must publish reader 3 / writer 7 +
    the timestampNtz feature, and the reader must both accept it and
    refuse a log demanding a feature it does not implement."""
    table_dir = str(tmp_path / "t4")
    df = spark.range(0, 5).select(
        F.col("id").alias("k"),
        F.timestamp_seconds(F.col("id") * 1000)
        .cast("timestamp_ntz")
        .alias("ts"),
    )
    publish_df(df, table_dir)
    export_delta_log(table_dir)
    dt = DeltaTable(table_dir)
    snap = dt.snapshot()
    assert snap.protocol["minReaderVersion"] == 3
    assert "timestampNtz" in snap.protocol["readerFeatures"]
    tbl = dt.to_arrow()
    assert str(tbl.schema.field("ts").type) == "timestamp[us]"
    assert dt.validate() == []

    # unknown reader feature => the reader must refuse, per the spec
    log_dir = os.path.join(table_dir, "_delta_log")
    c0 = os.path.join(log_dir, "00000000000000000000.json")
    lines = [json.loads(ln) for ln in open(c0)]
    for a in lines:
        if "protocol" in a:
            a["protocol"]["readerFeatures"] = ["deletionVectors"]
    with open(c0, "w") as fh:
        for a in lines:
            fh.write(json.dumps(a) + "\n")
    with pytest.raises(DeltaProtocolError, match="deletionVectors"):
        DeltaTable(table_dir).snapshot()


def test_validator_catches_corruption(spark, tmp_path):
    table_dir = str(tmp_path / "t5")
    publish_df(spark.range(0, 30).select(F.col("id").alias("k")), table_dir)
    export_delta_log(table_dir)
    dt = DeltaTable(table_dir)
    assert dt.validate() == []
    # corrupt: point an add at a missing file
    log_dir = os.path.join(table_dir, "_delta_log")
    c0 = os.path.join(log_dir, "00000000000000000000.json")
    lines = [json.loads(ln) for ln in open(c0)]
    for a in lines:
        if "add" in a:
            a["add"]["path"] = a["add"]["path"] + ".gone"
            break
    with open(c0, "w") as fh:
        for a in lines:
            fh.write(json.dumps(a) + "\n")
    problems = DeltaTable(table_dir).validate()
    assert any("does not exist" in p for p in problems)


def test_reader_v2_column_mapping_gate(spark, tmp_path):
    """Protocol reader version 2 signals column mapping: physical
    parquet column names may differ from the logical schema. This
    reader resolves columns by logical name only, so it must accept a
    v2 log ONLY when delta.columnMapping.mode is absent/'none', and
    refuse any real mapping mode instead of silently misreading."""
    table_dir = str(tmp_path / "t6")
    publish_df(spark.range(0, 10).select(F.col("id").alias("k")), table_dir)
    export_delta_log(table_dir)
    log_dir = os.path.join(table_dir, "_delta_log")
    c0 = os.path.join(log_dir, "00000000000000000000.json")
    lines = [json.loads(ln) for ln in open(c0)]
    for a in lines:
        if "protocol" in a:
            a["protocol"] = {"minReaderVersion": 2, "minWriterVersion": 5}
    with open(c0, "w") as fh:
        for a in lines:
            fh.write(json.dumps(a) + "\n")
    # v2 without a mapping mode: acceptable (logical == physical names)
    assert DeltaTable(table_dir).snapshot().version == 0

    for a in lines:
        if "metaData" in a:
            a["metaData"].setdefault("configuration", {})[
                "delta.columnMapping.mode"
            ] = "name"
    with open(c0, "w") as fh:
        for a in lines:
            fh.write(json.dumps(a) + "\n")
    with pytest.raises(DeltaProtocolError, match="columnMapping"):
        DeltaTable(table_dir).snapshot()
