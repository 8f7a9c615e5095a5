"""Incremental per-user profile (streaming/stateful.py): multi-batch
state carry must converge to the batch aggregate; the TWS backend runs
where its protobuf dependency exists, else skips (fallback still
covers the contract).
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from lakehouse_weather_spark.streaming.stateful import (
    HAS_TWS_DEPS,
    latest_profiles,
    stream_running_profile,
)


def _split_events(sf_dir: str, out_dir: Path) -> None:
    t = pq.read_table(f"{sf_dir}/events.parquet")
    half = t.num_rows // 2
    out_dir.mkdir()
    # version 2.6 keeps the fixtures' TIMESTAMP(NANOS) encoding intact
    pq.write_table(t.slice(0, half), out_dir / "f1.parquet", version="2.6")
    pq.write_table(t.slice(half), out_dir / "f2.parquet", version="2.6")


def _run_and_check(spark, sf_dir, tmp_path, backend: str) -> None:
    events_dir = tmp_path / f"events_{backend}"
    _split_events(sf_dir, events_dir)

    updates = stream_running_profile(
        spark,
        str(events_dir),
        str(tmp_path / f"ckpt_{backend}"),
        max_files_per_trigger=1,
        backend=backend,
    )
    got = {
        r["user_id"]: r for r in latest_profiles(updates).collect()
    }

    ev = spark.read.parquet(str(events_dir))
    # ts is raw int64 epoch-nanos in the legacy layout, timestamp[us]
    # in the current one; both reduce to exact epoch-micros (UTC session)
    last_us_expr = (
        "max(ts) div 1000"
        if dict(ev.dtypes)["ts"] == "bigint"
        else "max(unix_micros(cast(ts as timestamp)))"
    )
    exp = {
        r["user_id"]: r
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.expr(last_us_expr).alias("last_ts_us"),
        )
        .collect()
    }
    assert set(got) == set(exp)
    for uid, e in exp.items():
        g = got[uid]
        assert g["n_events"] == e["n_events"], uid
        assert g["last_ts_us"] == e["last_ts_us"], uid
        # incremental float addition vs batch sum: last-ulp tolerance
        assert math.isclose(
            g["total_value"], e["total_value"], rel_tol=1e-9
        ), uid

    # statefulness proof: one update row per (user, batch-with-events),
    # so the update log is strictly larger than the user set whenever
    # users span both files
    users_f1 = {
        r["user_id"]
        for r in spark.read.parquet(str(events_dir / "f1.parquet"))
        .select("user_id").distinct().collect()
    }
    users_f2 = {
        r["user_id"]
        for r in spark.read.parquet(str(events_dir / "f2.parquet"))
        .select("user_id").distinct().collect()
    }
    assert updates.count() == len(users_f1) + len(users_f2)
    assert users_f1 & users_f2, "fixture must exercise cross-batch state"


def test_running_profile_gswp_multibatch(spark, sf_dir, tmp_path):
    _run_and_check(spark, sf_dir, tmp_path, "gswp")


@pytest.mark.skipif(
    not HAS_TWS_DEPS, reason="transformWithState needs google.protobuf"
)
def test_running_profile_tws_multibatch(spark, sf_dir, tmp_path):
    _run_and_check(spark, sf_dir, tmp_path, "tws")


def test_auto_backend_resolves(spark, sf_dir, tmp_path):
    events_dir = tmp_path / "events_auto"
    _split_events(sf_dir, events_dir)
    out = stream_running_profile(
        spark, str(events_dir), str(tmp_path / "ckpt_auto")
    )
    assert out.count() > 0


def test_stream_heavy_users_covers_true_heavy_hitters(spark, sf_dir, tmp_path):
    """The state-carried Misra-Gries summary equals one sequential MG
    pass over the whole stream, so its guarantee holds across batch
    boundaries: every user with freq > n/k per event_type is in the
    candidate set. Exact recount of candidates + threshold == exact
    heavy hitters."""
    import pyspark.sql.functions as F

    from lakehouse_weather_spark.streaming.stateful import (
        HH_STREAM_K,
        stream_heavy_users,
    )

    events_dir = tmp_path / "events_hh"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.repartition(3).write.parquet(str(events_dir))  # 3 files -> 3 batches

    out = stream_heavy_users(
        spark,
        str(events_dir),
        str(tmp_path / "ckpt_hh"),
        max_files_per_trigger=1,
    )
    cands = {r.event_type: set(r.users) for r in out.collect()}
    totals = {r.event_type: r.n_seen for r in out.collect()}

    exact = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_type: dict[str, dict[int, int]] = {}
    for r in exact:
        by_type.setdefault(r.event_type, {})[r.user_id] = r.n
    for et, counts in by_type.items():
        n = sum(counts.values())
        assert totals[et] == n, et
        true_heavy = {u for u, c in counts.items() if c > n / HH_STREAM_K}
        # MG guarantee: candidates cover every true heavy hitter
        assert true_heavy <= cands[et], (et, true_heavy - cands[et])
        # and the summary is bounded
        assert len(cands[et]) < HH_STREAM_K


def test_memory_sink_names_are_stable_digests():
    """Sink names must come from a stable digest, never Python hash():
    str hash is salted per interpreter, so a driver restart would lose
    the handle to its own memory sink (and mod-1e7 truncation invites
    cross-run collisions). Source-level guard: no hash( call anywhere
    in the streaming package."""
    import re
    from pathlib import Path

    pkg = Path(__file__).resolve().parent.parent / (
        "lakehouse_weather_spark/streaming"
    )
    offenders = []
    for py in pkg.glob("*.py"):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            code = line.split("#", 1)[0]  # comments may discuss hash()
            if re.search(r"(?<![\w.])hash\(", code):
                offenders.append(f"{py.name}:{i}: {line.strip()}")
    assert not offenders, offenders

    # and the digest itself is deterministic across processes
    import hashlib

    assert (
        "profile_" + hashlib.md5(b"/tmp/ckpt").hexdigest()[:16]
        == "profile_" + hashlib.md5(b"/tmp/ckpt").hexdigest()[:16]
    )
