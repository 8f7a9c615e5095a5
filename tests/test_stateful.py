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


@pytest.mark.parametrize(
    "backend",
    [
        pytest.param(
            "tws",
            marks=pytest.mark.skipif(
                not HAS_TWS_DEPS,
                reason="transformWithState needs google.protobuf",
            ),
        ),
        # the dependency-free GroupState EventTimeTimeout twin must
        # honor the same semantics contract (it is what the oracle
        # gate runs where the protobuf export missed the JVM boot)
        "gswp",
    ],
)
def test_timer_fired_eviction_across_microbatches(
    spark, tmp_path, backend
):
    """REAL event-time timers on transformWithStateInPandas: sessions
    with an idle gap are evicted from state by REGISTERED TIMERS firing
    as the watermark advances across micro-batches — terminal sessions
    (no later event for the key) can ONLY close via the timer path, and
    the emitted watermark stamps prove firings happened at (at least)
    two different watermarks, i.e. mid-stream, not one terminal flush.
    Sessions superseded by a later event close inline ('event')."""
    import datetime as dt

    import pyarrow as pa

    from lakehouse_weather_spark.streaming.stateful import (
        stream_session_eviction,
    )

    B = dt.datetime(2024, 1, 1, 10, 0, 0)

    def ts(minutes: float) -> dt.datetime:
        return B + dt.timedelta(minutes=minutes)

    # file 0 (<= 10:20): user1 session A, user2's single session
    f0 = [
        (1, ts(0)), (1, ts(5)), (1, ts(10)),          # u1 A: 3 events
        (2, ts(0)), (2, ts(5)), (2, ts(10)), (2, ts(15)), (2, ts(20)),
    ]
    # file 1: user3's lone event (11:00), user1 session B (12:00+)
    f1 = [(3, ts(60)), (1, ts(120)), (1, ts(121))]
    # sentinel files: far-future user -1 rows advance the watermark so
    # every terminal session's timer fires. FOUR sentinel batches, not
    # two: a timer registered in batch N is only guaranteed visible to
    # expiry checks a couple of batches later (register -> watermark
    # advance -> fire), so trailing batches give every straggler a
    # firing opportunity before availableNow terminates.
    f2 = [(-1, ts(100 * 365 * 24 * 60))]
    f3 = [(-1, ts(101 * 365 * 24 * 60))]
    f4 = [(-1, ts(102 * 365 * 24 * 60))]
    f5 = [(-1, ts(103 * 365 * 24 * 60))]

    events_dir = tmp_path / "sess_events"
    events_dir.mkdir()
    schema = pa.schema(
        [("user_id", pa.int64()), ("ts", pa.timestamp("us"))]
    )
    import os

    for i, rows in enumerate((f0, f1, f2, f3, f4, f5)):
        path = events_dir / f"{i:02d}.parquet"
        pq.write_table(
            pa.table(
                {
                    "user_id": [r[0] for r in rows],
                    "ts": [r[1] for r in rows],
                },
                schema=schema,
            ),
            path,
        )
        # FileStreamSource orders batches by MODIFICATION TIME, and
        # same-second writes tie arbitrarily — pin strictly increasing
        # mtimes so the micro-batch order (and thus the watermark walk
        # this test asserts) is deterministic
        os.utime(path, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))

    out = stream_session_eviction(
        spark,
        str(events_dir),
        str(tmp_path / "ckpt_sess"),
        gap_minutes=30,
        watermark="1 minute",
        max_files_per_trigger=1,
        backend=backend,
    ).filter(F.col("user_id") != -1)
    rows = out.collect()

    def us(minutes: float) -> int:
        return int(
            (B + dt.timedelta(minutes=minutes)).timestamp() * 1_000_000
        )

    got = {
        (r.user_id, r.n_events, r.start_us, r.end_us) for r in rows
    }
    expected = {
        (1, 3, us(0), us(10)),     # u1 session A
        (1, 2, us(120), us(121)),  # u1 session B (terminal)
        (2, 5, us(0), us(20)),     # u2 (terminal)
        (3, 1, us(60), us(60)),    # u3 (terminal)
    }
    assert got == expected
    # exactly once: no duplicate session emissions at all
    assert len(rows) == len(expected)

    by_session = {
        (r.user_id, r.start_us): r for r in rows
    }
    # terminal sessions (no later event for the key) can only close by
    # a fired timer
    assert by_session[(1, us(120))].closed_by == "timer"
    assert by_session[(2, us(0))].closed_by == "timer"
    assert by_session[(3, us(60))].closed_by == "timer"
    # timers fired at >= 2 distinct watermarks => firings were spread
    # across micro-batches, not one terminal flush
    timer_wms = {r.wm_ms for r in rows if r.closed_by == "timer"}
    assert len(timer_wms) >= 2, timer_wms
