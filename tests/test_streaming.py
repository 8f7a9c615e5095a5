"""Structured Streaming equivalence: the streaming tumbling-window count
(readStream + watermark + availableNow) must equal the batch query."""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import load_all
from lakehouse_weather_spark.streaming.events import (
    stream_dedup,
    stream_enrich,
    stream_merge_sink,
    stream_sessionize,
    stream_stream_join,
    stream_tumbling_counts,
)


def _century_in_ts_units(ts_type) -> int:
    """100 years expressed in the events file's native ts unit (int64
    epoch-nanos legacy layout, or timestamp[s/ms/us/ns]). Sentinel rows
    use +1/+2 centuries: far enough to advance every watermark, near
    enough to stay pandas datetime64[ns]-representable (< year 2262)."""
    import pyarrow as pa

    unit = ts_type.unit if pa.types.is_timestamp(ts_type) else "ns"
    per_sec = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
    return 100 * 365 * 24 * 3600 * per_sec


def test_stream_equals_batch(spark, sf_dir, tmp_path):
    events_dir = tmp_path / "events_stream"
    events_dir.mkdir()
    (events_dir / "events.parquet").symlink_to(Path(sf_dir) / "events.parquet")

    batch = {
        (r.window_start, r.event_type): r.n_events
        for r in load_all()["q_win_tumbling"].fn(spark, sf_dir).collect()
    }
    stream = {
        (r.window_start, r.event_type): r.n_events
        for r in stream_tumbling_counts(
            spark, str(events_dir), str(tmp_path / "ckpt")
        ).collect()
    }
    assert stream == batch


def test_stream_dedup_one_per_key(spark, sf_dir, tmp_path):
    events_dir = tmp_path / "events_dd"
    events_dir.mkdir()
    (events_dir / "events.parquet").symlink_to(Path(sf_dir) / "events.parquet")

    result = stream_dedup(spark, str(events_dir), str(tmp_path / "ckpt_dd"))
    batch_keys = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert result.count() == batch_keys  # exactly one survivor per key
    assert result.select("user_id", "event_type").distinct().count() == batch_keys


def test_stream_static_enrich(spark, sf_dir, tmp_path):
    events_dir = tmp_path / "events_en"
    events_dir.mkdir()
    (events_dir / "events.parquet").symlink_to(Path(sf_dir) / "events.parquet")

    result = stream_enrich(
        spark, str(events_dir), sf_dir, str(tmp_path / "ckpt_en")
    )
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert result.count() == n_events  # every event found its dimension row
    assert result.filter("c_mktsegment IS NULL").count() == 0


def test_stream_merge_sink_latest_per_user(spark, sf_dir, tmp_path):
    events_dir = tmp_path / "events_ms"
    events_dir.mkdir()
    (events_dir / "events.parquet").symlink_to(Path(sf_dir) / "events.parquet")

    target = str(tmp_path / "target")
    n = stream_merge_sink(
        spark, str(events_dir), target, str(tmp_path / "ckpt_ms")
    )
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert n == n_users  # exactly one (latest) row per user


def test_stream_stream_join_equals_batch(spark, sf_dir, tmp_path):
    events_dir = tmp_path / "events_ss"
    events_dir.mkdir()
    (events_dir / "events.parquet").symlink_to(Path(sf_dir) / "events.parquet")

    result = stream_stream_join(
        spark, str(events_dir), str(events_dir), str(tmp_path / "ckpt_ss")
    )
    # batch equivalent over the same data
    from lakehouse_weather_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter("event_type = 'view'").selectExpr(
        "event_id AS view_id", "user_id AS v_user", "ts AS view_ts"
    )
    clicks = ev.filter("event_type = 'click'").selectExpr(
        "event_id AS click_id", "user_id AS c_user", "ts AS click_ts"
    )
    batch = views.join(
        clicks,
        (views.v_user == clicks.c_user)
        & (clicks.click_ts >= views.view_ts)
        & (clicks.click_ts < views.view_ts + F.expr("INTERVAL 1 HOUR")),
    )
    assert result.count() == batch.count()
    assert result.count() > 0


def test_stateful_sessionize_equals_batch_multibatch(spark, sf_dir, tmp_path):
    """The REAL stateful test: events split into time-ordered files
    consumed one per micro-batch (maxFilesPerTrigger=1), so sessions
    straddling batch boundaries must be stitched from carried state.
    Two far-future sentinel files advance the watermark so every open
    session times out and flushes (sentinel N advances the watermark at
    the end of its batch; sentinel N+1's batch then fires the timeouts)."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    events_dir = tmp_path / "events_sess"
    events_dir.mkdir()
    t = pq.read_table(Path(sf_dir) / "events.parquet")
    ts_type = t.schema.field("ts").type
    ts = pc.cast(t.column("ts"), pa.int64())  # epoch in the file's unit
    lo, hi = pc.min(ts).as_py(), pc.max(ts).as_py()
    cut1 = lo + (hi - lo) // 3
    cut2 = lo + 2 * (hi - lo) // 3
    parts = [
        t.filter(pc.less(ts, cut1)),
        t.filter(pc.and_(pc.greater_equal(ts, cut1), pc.less(ts, cut2))),
        t.filter(pc.greater_equal(ts, cut2)),
    ]
    assert all(p.num_rows > 0 for p in parts)

    century = _century_in_ts_units(ts_type)
    sentinels = []
    for k in (1, 2):
        row = t.slice(0, 1)
        row = row.set_column(
            row.schema.get_field_index("ts"),
            "ts",
            pa.array([hi + k * century], type=pa.int64()).cast(ts_type),
        )
        row = row.set_column(
            row.schema.get_field_index("user_id"),
            "user_id",
            pa.array([-1], type=t.schema.field("user_id").type),
        )
        sentinels.append(row)

    for i, part in enumerate(parts + sentinels):
        path = events_dir / f"{i:02d}.parquet"
        pq.write_table(part, path)
        # file-stream source processes oldest-mtime first
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    batch = {
        (r.user_id, r.session_idx): (r.session_start, r.session_end, r.n_events)
        for r in load_all()["q_sessionize"].fn(spark, sf_dir).collect()
    }
    stream = {
        (r.user_id, r.session_idx): (r.session_start, r.session_end, r.n_events)
        for r in stream_sessionize(
            spark,
            str(events_dir),
            str(tmp_path / "ckpt_sess"),
            max_files_per_trigger=1,
        ).collect()
        if r.user_id != -1
    }
    assert stream == batch


def test_append_mode_emits_each_window_once(spark, sf_dir, tmp_path):
    """Append-mode finalization semantics: a window is emitted exactly
    once, when the watermark passes its end (state evicted — bounded
    memory). Note Spark's documented guarantee is one-sided: data
    within the watermark is never dropped; older data MAY still be
    aggregated (here the late file's windows are created and finalized
    in the same batch), so the assertion is exactly-once emission and
    equality with the batch aggregate — not input dropping."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    events_dir = tmp_path / "events_late"
    events_dir.mkdir()
    t = pq.read_table(Path(sf_dir) / "events.parquet")
    ts = pc.cast(t.column("ts"), pa.int64())
    lo, hi = pc.min(ts).as_py(), pc.max(ts).as_py()
    cut = lo + (hi - lo) // 3
    early = t.filter(pc.less(ts, cut))          # will arrive LATE
    recent = t.filter(pc.greater_equal(ts, cut))
    assert early.num_rows > 0 and recent.num_rows > 0

    # two far-future sentinels advance the watermark so the recent
    # windows finalize and emit in append mode (same trick as the
    # sessionize test); the late file arrives after the watermark
    # passed its event times
    ts_type = t.schema.field("ts").type
    century = _century_in_ts_units(ts_type)
    files = [("00_recent", recent), ("01_late", early)]
    for k in (1, 2):
        row = t.slice(0, 1)
        row = row.set_column(
            row.schema.get_field_index("ts"),
            "ts",
            pa.array([hi + k * century], type=pa.int64()).cast(ts_type),
        )
        files.append((f"0{1 + k}_sentinel", row))
    for i, (name, part) in enumerate(files):
        path = events_dir / f"{name}.parquet"
        pq.write_table(part, path)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    result = stream_tumbling_counts(
        spark,
        str(events_dir),
        str(tmp_path / "ckpt_late"),
        max_files_per_trigger=1,
        output_mode="append",
    )
    import pandas as pd

    unit = ts_type.unit if pa.types.is_timestamp(ts_type) else "ns"
    max_real_year = pd.Timestamp(hi, unit=unit).year  # sentinels are +100y
    rows = [r for r in result.collect() if r.window_start.year <= max_real_year]
    # exactly-once: no (window, event_type) emitted twice
    keys = [(r.window_start, r.event_type) for r in rows]
    assert len(keys) == len(set(keys))
    # finalized output equals the batch aggregate over the real events
    # (sentinel windows excluded; the last sentinel's window is still
    # open and correctly absent)
    batch = {
        (r.window_start, r.event_type): r.n_events
        for r in load_all()["q_win_tumbling"].fn(spark, sf_dir).collect()
    }
    got = {
        (r.window_start.replace(tzinfo=None), r.event_type): r.n_events
        for r in rows
        if r.window_start.year <= max_real_year
    }
    assert got == batch


def test_stream_sliding_equals_batch(spark, sf_dir, tmp_path):
    from lakehouse_weather_spark.streaming.events import stream_sliding_counts

    events_dir = tmp_path / "events_sliding"
    events_dir.mkdir()
    (events_dir / "events.parquet").symlink_to(Path(sf_dir) / "events.parquet")

    batch = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in load_all()["q_win_sliding"].fn(spark, sf_dir).collect()
    }
    stream = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in stream_sliding_counts(
            spark, str(events_dir), str(tmp_path / "ckpt_sliding")
        ).collect()
    }
    assert stream == batch


def test_window_funnel_stage_semantics(spark, sf_dir):
    from lakehouse_weather_spark.sources.tables import load_table
    from lakehouse_weather_spark.streaming.events import (
        FUNNEL_STAGES,
        q_window_funnel,
    )

    got = {
        r.max_stage: r.n_users
        for r in q_window_funnel(spark, sf_dir).collect()
    }
    # replay greedily from each user's earliest view
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id"
    ).collect()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    import datetime as dt

    want: dict[int, int] = {}
    for rows in by_user.values():
        views = [r.ts for r in rows if r.event_type == FUNNEL_STAGES[0]]
        if not views:
            continue
        t = min(views)
        horizon = t + dt.timedelta(hours=1)
        stage = 1
        for nxt in FUNNEL_STAGES[1:]:
            cand = [
                r.ts
                for r in rows
                if r.event_type == nxt and t < r.ts <= horizon
            ]
            if not cand:
                break
            t = min(cand)
            stage += 1
        want[stage] = want.get(stage, 0) + 1
    assert got == want
    assert sum(got.values()) == len(
        {r.user_id for r in ev if r.event_type == FUNNEL_STAGES[0]}
    )


def test_cohort_ltv_is_cumulative_and_conserves_value(spark, sf_dir):
    from lakehouse_weather_spark.sources.tables import load_table
    from lakehouse_weather_spark.streaming.events import q_cohort_ltv

    rows = q_cohort_ltv(spark, sf_dir).collect()
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_week, []).append(r)
    total_fx = 0
    for series in by_cohort.values():
        series.sort(key=lambda r: r.week_offset)
        prev = 0.0
        for r in series:
            assert r.cum_value >= prev  # cumulative, non-decreasing
            prev = r.cum_value
            assert r.ltv_per_user_fx == int(r.cum_value * 10_000) // r.n_users
        total_fx += round(series[-1].cum_value * 10_000)
    ev = load_table(spark, sf_dir, "events").select("value").collect()
    assert total_fx == sum(round(r.value * 10_000) for r in ev)


def test_stream_session_window_equals_batch(spark, sf_dir, tmp_path):
    from lakehouse_weather_spark.streaming.events import stream_session_window

    events_dir = tmp_path / "events_sessw"
    events_dir.mkdir()
    (events_dir / "events.parquet").symlink_to(Path(sf_dir) / "events.parquet")

    batch = {
        (r.user_id, r.w_start, r.w_end): r.n_events
        for r in load_all()["q_session_window"].fn(spark, sf_dir).collect()
    }
    stream = {
        (r.user_id, r.w_start, r.w_end): r.n_events
        for r in stream_session_window(
            spark, str(events_dir), str(tmp_path / "ckpt_sessw")
        ).collect()
    }
    assert stream == batch


def test_stream_zset_ivm_equals_batch(spark, sf_dir, tmp_path):
    """The streaming Z-set fold (snapshot (+) per-micro-batch deltas,
    retractions included) must land bit-exactly on the batch
    q_zset_ivm result, no matter how the changelog splits into
    micro-batches (maxFilesPerTrigger=1 forces several folds)."""
    from lakehouse_weather_spark.operators.ivm import (
        _DEL_LT,
        _DEL_MOD,
        _H,
        q_zset_ivm,
    )
    from lakehouse_weather_spark.sources.tables import load_table
    from lakehouse_weather_spark.streaming.events import stream_zset_ivm

    ev = load_table(spark, str(sf_dir), "events").select(
        "event_type",
        F.expr("cast(round(value * 10000, 0) as bigint)").alias("fx"),
        F.expr(_H).alias("hh"),
    )
    base = ev.filter(F.col("hh") % 2 == 0)
    snapshot = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("fx").cast("bigint").alias("total_fx"),
    )
    retract = base.filter(F.col("hh") % _DEL_MOD < _DEL_LT).select(
        "event_type", "fx", F.lit(-1).cast("int").alias("w")
    )
    insert = ev.filter(F.col("hh") % 2 == 1).select(
        "event_type", "fx", F.lit(1).cast("int").alias("w")
    )
    changelog_dir = tmp_path / "changelog"
    # two separate files => at least two micro-batches
    retract.coalesce(1).write.mode("append").parquet(str(changelog_dir))
    insert.coalesce(1).write.mode("append").parquet(str(changelog_dir))

    target = str(tmp_path / "zset_target")
    stream_zset_ivm(
        spark,
        str(changelog_dir),
        target,
        str(tmp_path / "ckpt_zset"),
        snapshot,
    )

    from lakehouse_weather_spark.pipeline.atomic import read_current

    got = {
        r.event_type: (r.n_rows, r.total_fx)
        for r in read_current(spark, target).collect()
    }
    want = {
        r.event_type: (r.n_rows, r.total_fx)
        for r in q_zset_ivm(spark, str(sf_dir)).collect()
    }
    assert got == want


def test_stream_dedup_survives_restart_exactly_once(spark, tmp_path):
    """The durability contract: stop/restart with the same checkpoint
    (1) does not re-read consumed input files, (2) keeps dedup state
    ACROSS restarts (a later duplicate of a pre-restart key is still
    dropped), and (3) a restart with no new input emits nothing."""
    import datetime as dt

    from lakehouse_weather_spark.streaming.events import (
        stream_dedup_to_files,
    )

    events_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    base = dt.datetime(2026, 4, 1, 12, 0)

    def write_batch(rows, name):
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        ).coalesce(1).write.mode("append").parquet(events_dir)

    # batch 1: keys (1, view), (2, click) + an in-batch duplicate
    write_batch(
        [
            (1, base, 1, "view", 1.0, ""),
            (2, base + dt.timedelta(minutes=1), 2, "click", 1.0, ""),
            (3, base + dt.timedelta(minutes=2), 1, "view", 9.0, ""),
        ],
        "b1",
    )
    stream_dedup_to_files(spark, events_dir, out_dir, ckpt)
    first = spark.read.parquet(out_dir)
    assert first.count() == 2
    assert {r.event_id for r in first.collect()} == {1, 2}

    # batch 2: a CROSS-RESTART duplicate of (1, view) + one new key
    write_batch(
        [
            (4, base + dt.timedelta(minutes=3), 1, "view", 5.0, ""),
            (5, base + dt.timedelta(minutes=4), 3, "purchase", 2.0, ""),
        ],
        "b2",
    )
    stream_dedup_to_files(spark, events_dir, out_dir, ckpt)
    second = spark.read.parquet(out_dir)
    # only the new key lands: state survived the restart, and batch-1
    # files were not re-read (their rows would re-land otherwise)
    assert second.count() == 3
    assert {r.event_id for r in second.collect()} == {1, 2, 5}

    # restart with NO new input: nothing emits
    stream_dedup_to_files(spark, events_dir, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == 3


def test_stream_stream_left_join_emits_unmatched_after_watermark(
    spark, sf_dir, tmp_path
):
    """LEFT OUTER stream-stream join semantics: matched pairs equal the
    batch inner join, and every view with NO click in its window is
    emitted EXACTLY ONCE with NULL click columns — but only because the
    sentinel files push the join watermark past every real window
    (without advancement the unmatched tail would stay in state
    forever, which is the semantics this test pins)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from lakehouse_weather_spark.streaming.events import (
        stream_stream_left_join,
    )

    events_dir = tmp_path / "events_lj"
    events_dir.mkdir()
    t = pq.read_table(Path(sf_dir) / "events.parquet")
    ts_type = t.schema.field("ts").type
    ts = pc.cast(t.column("ts"), pa.int64())
    hi = pc.max(ts).as_py()
    century = _century_in_ts_units(ts_type)
    pq.write_table(t, events_dir / "00.parquet")
    os.utime(events_dir / "00.parquet", (1_700_000_000, 1_700_000_000))
    # two sentinel files, each carrying one far-future VIEW and one
    # far-future CLICK (user -1) so BOTH sides' watermarks advance:
    # sentinel N moves the watermark at its batch's end, sentinel N+1's
    # batch then evicts and emits the unmatched views
    for k in (1, 2):
        rows = t.slice(0, 2)
        rows = rows.set_column(
            rows.schema.get_field_index("ts"),
            "ts",
            pa.array([hi + k * century] * 2, type=pa.int64()).cast(ts_type),
        )
        rows = rows.set_column(
            rows.schema.get_field_index("user_id"),
            "user_id",
            pa.array([-1, -1], type=t.schema.field("user_id").type),
        )
        rows = rows.set_column(
            rows.schema.get_field_index("event_type"),
            "event_type",
            pa.array(["view", "click"], type=t.schema.field("event_type").type),
        )
        pq.write_table(rows, events_dir / f"{k:02d}.parquet")
        # FileStreamSource orders batches by mtime; same-second writes
        # tie arbitrarily — pin increasing mtimes so sentinels process
        # AFTER the data file and the watermark advances as designed
        os.utime(
            events_dir / f"{k:02d}.parquet",
            (1_700_000_000 + k * 100, 1_700_000_000 + k * 100),
        )

    result = stream_stream_left_join(
        spark,
        str(events_dir),
        str(events_dir),
        str(tmp_path / "ckpt_lj"),
        max_files_per_trigger=1,
    ).filter(F.col("v_user") != -1)

    from lakehouse_weather_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter("event_type = 'view'").selectExpr(
        "event_id AS view_id", "user_id AS v_user", "ts AS view_ts"
    )
    clicks = ev.filter("event_type = 'click'").selectExpr(
        "event_id AS click_id", "user_id AS c_user", "ts AS click_ts"
    )
    cond = (
        (views.v_user == clicks.c_user)
        & (clicks.click_ts >= views.view_ts)
        & (clicks.click_ts < views.view_ts + F.expr("INTERVAL 1 HOUR"))
    )
    n_matched_batch = views.join(clicks, cond).count()
    n_unmatched_batch = views.join(clicks, cond, "left_anti").count()
    assert n_matched_batch > 0 and n_unmatched_batch > 0

    matched = result.filter(F.col("click_id").isNotNull())
    unmatched = result.filter(F.col("click_id").isNull())
    assert matched.count() == n_matched_batch
    assert unmatched.count() == n_unmatched_batch
    # exactly once: unmatched view ids are distinct
    assert unmatched.select("view_id").distinct().count() == n_unmatched_batch


def test_stream_stream_full_join_emits_both_unmatched_sides(
    spark, sf_dir, tmp_path
):
    """FULL OUTER stream-stream join semantics: matched pairs equal the
    batch inner join, every view with no click in its window emits
    exactly once with NULL click columns, AND every click matching no
    view emits exactly once with NULL view columns — both flushed only
    because the sentinel files push the join watermark past every real
    window (unmatched rows from BOTH sides are held in state until the
    watermark proves no counterpart can arrive)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from lakehouse_weather_spark.streaming.events import (
        stream_stream_full_join,
    )

    events_dir = tmp_path / "events_fj"
    events_dir.mkdir()
    t = pq.read_table(Path(sf_dir) / "events.parquet")
    ts_type = t.schema.field("ts").type
    ts = pc.cast(t.column("ts"), pa.int64())
    hi = pc.max(ts).as_py()
    century = _century_in_ts_units(ts_type)
    pq.write_table(t, events_dir / "00.parquet")
    os.utime(events_dir / "00.parquet", (1_700_000_000, 1_700_000_000))
    for k in (1, 2):
        rows = t.slice(0, 2)
        rows = rows.set_column(
            rows.schema.get_field_index("ts"),
            "ts",
            pa.array([hi + k * century] * 2, type=pa.int64()).cast(ts_type),
        )
        rows = rows.set_column(
            rows.schema.get_field_index("user_id"),
            "user_id",
            pa.array([-1, -1], type=t.schema.field("user_id").type),
        )
        rows = rows.set_column(
            rows.schema.get_field_index("event_type"),
            "event_type",
            pa.array(["view", "click"], type=t.schema.field("event_type").type),
        )
        pq.write_table(rows, events_dir / f"{k:02d}.parquet")
        # pin increasing mtimes: FileStreamSource breaks same-second
        # mtime ties arbitrarily, and sentinels must process LAST
        os.utime(
            events_dir / f"{k:02d}.parquet",
            (1_700_000_000 + k * 100, 1_700_000_000 + k * 100),
        )

    result = stream_stream_full_join(
        spark,
        str(events_dir),
        str(events_dir),
        str(tmp_path / "ckpt_fj"),
        max_files_per_trigger=1,
    ).filter(
        (F.coalesce(F.col("v_user"), F.lit(0)) != -1)
        & (F.coalesce(F.col("c_user"), F.lit(0)) != -1)
    )

    from lakehouse_weather_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter("event_type = 'view'").selectExpr(
        "event_id AS view_id", "user_id AS v_user", "ts AS view_ts"
    )
    clicks = ev.filter("event_type = 'click'").selectExpr(
        "event_id AS click_id", "user_id AS c_user", "ts AS click_ts"
    )
    cond = (
        (views.v_user == clicks.c_user)
        & (clicks.click_ts >= views.view_ts)
        & (clicks.click_ts < views.view_ts + F.expr("INTERVAL 1 HOUR"))
    )
    n_matched = views.join(clicks, cond).count()
    n_view_only = views.join(clicks, cond, "left_anti").count()
    n_click_only = clicks.join(views, cond, "left_anti").count()
    assert n_matched > 0 and n_view_only > 0 and n_click_only > 0

    matched = result.filter(
        F.col("view_id").isNotNull() & F.col("click_id").isNotNull()
    )
    view_only = result.filter(F.col("click_id").isNull())
    click_only = result.filter(F.col("view_id").isNull())
    assert matched.count() == n_matched
    assert view_only.count() == n_view_only
    assert click_only.count() == n_click_only
    # exactly once on both unmatched sides
    assert view_only.select("view_id").distinct().count() == n_view_only
    assert (
        click_only.select("click_id").distinct().count() == n_click_only
    )
