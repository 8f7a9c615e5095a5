"""Unit semantics for the recursive time-series folds (timeseries.py):
hand-computed EWMA / CUSUM recurrences on a tiny synthetic series, plus
structural checks on the fixture queries."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from lakehouse_weather_spark.operators.timeseries import (
    _ALARM_MULT,
    _S,
    q_cusum_shift,
    q_ewma_smooth,
)


def _mk_events(spark, counts: list[int]):
    """One event row per count unit, day i holding counts[i] rows."""
    rows = []
    eid = 0
    base = dt.datetime(2026, 1, 1)
    for i, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, base + dt.timedelta(days=i), 1, "t", 0.0, ""))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string"
    )


def test_ewma_matches_hand_fold(spark, tmp_path):
    counts = [4, 8, 2, 2, 10]
    _mk_events(spark, counts).write.parquet(f"{tmp_path}/events.parquet")
    got = {
        (r.day - dt.datetime(2026, 1, 1)).days: r.ewma
        for r in q_ewma_smooth(spark, str(tmp_path)).collect()
    }
    # replay the integer recurrence exactly
    fx = None
    want = {}
    for i, c in enumerate(counts):
        fx = c * _S if fx is None else (c * _S + 3 * fx) // 4
        want[i] = fx / _S
    assert got == want
    # spot value: day1 = (8*S + 3*4*S)//4 = 5*S
    assert got[1] == 5.0


def test_cusum_accumulates_and_alarms(spark, tmp_path):
    # low baseline then a strong sustained spike: per-spike-hour excess
    # ~ (21 - mean - slack) accumulates past the 4*mean alarm line
    counts = [1] * 10 + [21] * 5
    _mk_events(spark, counts).write.parquet(f"{tmp_path}/events.parquet")
    rows = sorted(
        q_cusum_shift(spark, str(tmp_path)).collect(), key=lambda r: r.day
    )
    mean_fx = (sum(counts) * _S) // len(counts)
    s, want = 0, []
    for c in counts:
        s = max(0, s + c * _S - mean_fx - mean_fx // 20)
        want.append((s / _S, s > _ALARM_MULT * mean_fx))
    assert [(r.cusum, r.alarm) for r in rows] == want
    assert rows[-1].alarm  # sustained shift tripped
    assert not rows[0].alarm


def test_fixture_queries_cover_all_day_buckets(spark, sf_dir):
    ew = q_ewma_smooth(spark, sf_dir)
    cu = q_cusum_shift(spark, sf_dir)
    n_buckets = (
        ew.sparkSession.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", F.date_trunc("day", "ts"))
        .distinct()
        .count()
    )
    assert ew.count() == n_buckets
    assert cu.count() == n_buckets
    # smoothing preserves the per-type mean direction: ewma stays within
    # [min(cnt), max(cnt)] of its own series
    bad = ew.groupBy("event_type").agg(
        F.min("cnt").alias("lo"), F.max("cnt").alias("hi"),
        F.min("ewma").alias("elo"), F.max("ewma").alias("ehi"),
    ).filter((F.col("elo") < F.col("lo")) | (F.col("ehi") > F.col("hi")))
    assert bad.count() == 0


def test_calendar_gap_detected(spark, tmp_path):
    from lakehouse_weather_spark.operators.timeseries import q_calendar_gaps

    # days 0,1,2,5,6 present -> days 3,4 missing within the span
    counts = [2, 2, 2, 0, 0, 2, 2]
    _mk_events(spark, counts).write.parquet(f"{tmp_path}/events.parquet")
    row = q_calendar_gaps(spark, str(tmp_path)).collect()[0]
    assert row.n_expected == 7
    assert row.n_observed == 5
    assert row.n_missing == 2
    assert row.first_missing == dt.datetime(2026, 1, 4)


def test_seasonal_decompose_is_additive(spark, sf_dir):
    from lakehouse_weather_spark.operators.timeseries import (
        q_seasonal_decompose,
    )

    df = q_seasonal_decompose(spark, sf_dir)
    # cnt == trend + seasonal + residual exactly (fixed-point identity)
    bad = df.filter(
        F.abs(
            F.col("cnt")
            - (F.col("trend") + F.col("seasonal") + F.col("residual"))
        )
        > 1e-9
    )
    assert bad.count() == 0


def test_autocorr_bounded(spark, sf_dir):
    from lakehouse_weather_spark.operators.timeseries import q_autocorr

    for r in q_autocorr(spark, sf_dir).collect():
        for k in ("r1", "r2", "r7"):
            assert abs(getattr(r, k)) <= 1.0 + 1e-12


def test_holt_linear_matches_hand_fold(spark, tmp_path):
    from lakehouse_weather_spark.operators.timeseries import q_holt_linear

    # deliberately DECLINING series: trend goes negative, exercising
    # the floor-division path where truncation would diverge
    counts = [10, 8, 6, 4, 2, 1, 1]
    _mk_events(spark, counts).write.parquet(f"{tmp_path}/events.parquet")
    got = {
        (r.day - dt.datetime(2026, 1, 1)).days: (
            r.level,
            r.trend,
            r.forecast_next,
        )
        for r in q_holt_linear(spark, str(tmp_path)).collect()
    }
    l = b = None
    want = {}
    for i, c in enumerate(counts):
        if l is None:
            l, b = c * _S, 0
        else:
            lp = (c * _S + 3 * (l + b)) // 4  # python // IS floor
            b = ((lp - l) + 3 * b) // 4
            l = lp
        want[i] = (l / _S, b / _S, (l + b) / _S)
    assert got == want
    assert any(t < 0 for (_, t, _) in got.values())  # negative trend hit


def test_twap_matches_hand_integral(spark, sf_dir):
    from lakehouse_weather_spark.operators.timeseries import q_twap
    from lakehouse_weather_spark.sources.tables import load_table

    rows = q_twap(spark, sf_dir).collect()
    assert rows
    ev = load_table(spark, sf_dir, "events").collect()
    groups: dict[tuple, list] = {}
    for r in ev:
        day = r.ts.replace(hour=0, minute=0, second=0, microsecond=0)
        groups.setdefault((r.event_type, day), []).append(
            (int(r.ts.timestamp() * 1_000_000), r.event_id, round(r.value * 10_000))
        )
    want = {}
    for key, obs in groups.items():
        obs.sort(key=lambda o: (o[0], o[1]))
        dur = obs[-1][0] - obs[0][0]
        if dur <= 0:
            continue
        num = sum(
            (obs[i + 1][0] - obs[i][0]) * obs[i][2]
            for i in range(len(obs) - 1)
        )
        want[key] = (len(obs), num / dur / 10_000)
    got = {(r.event_type, r.day): (r.n_events, r.twap) for r in rows}
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-9


def test_survival_km_properties(spark, sf_dir):
    from lakehouse_weather_spark.operators.timeseries import q_survival_km

    rows = sorted(
        q_survival_km(spark, sf_dir).collect(), key=lambda r: r.t_bucket
    )
    assert len(rows) > 10  # a real curve, not a degenerate pair
    # survival is a non-increasing product in (0, 1]
    prev = 1.0
    for r in rows:
        assert 0.0 < r.survival <= prev + 1e-15
        prev = r.survival
    # risk set is the suffix sum of exits: strictly decreasing in t
    for a, b in zip(rows, rows[1:]):
        assert a.n_risk > b.n_risk
    # replay the product limit exactly
    s = 1.0
    for r in rows:
        s = s * (1.0 - r.n_shipped / r.n_risk)
        assert r.survival == s
    # censoring exists: total deaths < total entries at risk
    assert sum(r.n_shipped for r in rows) < rows[0].n_risk


def test_mase_matches_holt_replay(spark, tmp_path):
    from lakehouse_weather_spark.operators.timeseries import q_mase

    counts = [10, 8, 6, 7, 5, 4, 6, 3]
    _mk_events(spark, counts).write.parquet(f"{tmp_path}/events.parquet")
    r = q_mase(spark, str(tmp_path)).collect()[0]
    # replay holt + errors in python (floor division, negative-safe)
    l = b = None
    e_model = e_naive = 0
    prev = None
    n = 0
    for c in counts:
        if l is None:
            l, b = c * _S, 0
        else:
            e_model += abs(l + b - c * _S)
            e_naive += abs(c - prev) * _S
            n += 1
            lp = (c * _S + 3 * (l + b)) // 4
            b = ((lp - l) + 3 * b) // 4
            l = lp
        prev = c
    assert r.n_obs == n
    assert r.mase == e_model / e_naive
    assert abs(r.mae_model - e_model / n / _S) < 1e-12


def test_causal_impact_forecast_is_pre_fit_extrapolation(spark, sf_dir):
    from lakehouse_weather_spark.operators.timeseries import (
        q_causal_impact,
    )

    rows = q_causal_impact(spark, sf_dir).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for series in by_type.values():
        series.sort(key=lambda r: r.day)
        # forecast is linear in the step index: constant increments
        if len(series) >= 3:
            d1 = series[1].forecast - series[0].forecast
            for a, b in zip(series[1:], series[2:]):
                assert abs((b.forecast - a.forecast) - d1) < 1e-9
        # cumulative effect is the running sum of effects
        cum = 0.0
        for r in series:
            cum += r.effect
            assert abs(r.cum_effect - cum) < 1e-6
            assert abs(r.effect - (r.cnt - r.forecast)) < 1e-9
