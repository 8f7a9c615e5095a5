"""Recursive time-series operators: EWMA smoothing and CUSUM
level-shift detection over the daily event stream.

The reference pipeline ingests a weather feed via manually-triggered
Airflow DAGs (``dags/bronze.py:127``, ``schedule_interval=None``) but
has no smoothing or drift statistics over the ingested series at all;
these queries add the classic monitoring pair a production ingest runs
next to its volume checks (q_volume_anomaly does day-over-day deltas;
EWMA/CUSUM catch slow drifts a single-step delta misses).

Both statistics are RECURRENCES (state_t depends on state_{t-1}), the
one shape a plain window frame cannot express. The Spark-first answer:

- aggregate each key down to its (tiny) ordered daily-bucket series with ONE
  partial-agg shuffle (never a window over raw events),
- run the recurrence as an ``F.aggregate`` left fold over the sorted
  struct array — sequential per key, embarrassingly parallel across
  keys, which is the true dependency structure of a recurrence,
- keep the state in int64 fixed point (scale 1e4, floor division) so
  the fold is exact integer arithmetic: the DuckDB oracle replays the
  same recurrence with a recursive CTE and lands on identical bits.

Scale notes (100 TB framing): the fold input is |keys| x |buckets|
(5 types x ~30-150 days here; day buckets also keep the oracle's
recursive-CTE step count small — DuckDB pays ~20 ms per recursion step), aggregated BEFORE any per-key sequencing,
so executor memory per task is bounded by the series length, not the
event count. A series too long for one array (years of seconds) would
chunk by epoch and carry the boundary state forward — same fold, one
extra pass per chunk boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table

_S = 10_000  # fixed-point scale, matches functions.SCALE

# EWMA alpha = 1/4 as the exact integer recurrence
#   fx_t = (cnt_t * S + 3 * fx_{t-1}) div 4,  fx_0 = cnt_0 * S
# (floor division of non-negative int64: identical in Spark's DIV and
# DuckDB's //).
_EWMA_NUM = 3
_EWMA_DEN = 4

# CUSUM slack = mean/20 (5%) and alarm threshold = 4 * mean, both in
# fixed point off the integer per-type mean.
_SLACK_DIV = 20
_ALARM_MULT = 4


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))


_SERIES_T = "array<struct<h:timestamp,cnt:bigint>>"


def _fold_series(grouped: DataFrame, step_sql: str, out_t: str) -> DataFrame:
    """Left-fold ``step_sql`` over each key's day-sorted series.

    ``step_sql`` must reference ``acc.prev`` (int64 state, -1 before the
    first element) and ``x`` (the struct<h,cnt> element) and yield the
    next int64 state. The fold emits one (h, cnt, fx) row per bucket.
    """
    fold = f"""
        aggregate(
            array_sort(series),
            named_struct(
                'prev', CAST(-1 AS BIGINT),
                'out', CAST(array() AS {out_t})
            ),
            (acc, x) -> named_struct(
                'prev', CAST(({step_sql}) AS BIGINT),
                'out', acc.out || array(named_struct(
                    'h', x.h, 'cnt', x.cnt,
                    'fx', CAST(({step_sql}) AS BIGINT)))
            ),
            acc -> acc.out
        )
    """
    return grouped.select(
        "event_type", F.explode(F.expr(fold)).alias("e")
    ).select(
        "event_type",
        F.col("e.h").alias("day"),
        F.col("e.cnt").alias("cnt"),
        (F.col("e.fx").cast("double") / _S).alias("stat"),
    )


@register(
    "q_ewma_smooth",
    oracle=f"""
        WITH RECURSIVE daily AS (
            SELECT event_type, date_trunc('day', ts) AS h,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2
        ),
        seq AS (
            SELECT event_type, h, cnt,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY h) AS rn
            FROM daily
        ),
        ew AS (
            SELECT event_type, h, cnt, rn, cnt * {_S} AS fx
            FROM seq WHERE rn = 1
            UNION ALL
            SELECT s.event_type, s.h, s.cnt, s.rn,
                   (s.cnt * {_S} + {_EWMA_NUM} * e.fx) // {_EWMA_DEN}
            FROM seq s
            JOIN ew e ON s.event_type = e.event_type AND s.rn = e.rn + 1
        )
        SELECT event_type, h AS day, cnt,
               CAST(fx AS DOUBLE) / {_S} AS ewma
        FROM ew
    """,
    doc="Exponentially-weighted moving average (alpha=1/4) of daily"
    " event counts per type — the trend line volume monitoring draws"
    " over a bursty ingest. The recurrence runs as an F.aggregate"
    " integer fold over each type's day-sorted series (one partial-agg"
    " shuffle builds the series; the fold is sequential per key, the"
    " inherent dependency order of a recurrence, and parallel across"
    " keys). State is int64 fixed point with floor division, so the"
    " DuckDB recursive-CTE replay is bit-identical.",
)
def q_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    grouped = _daily(spark, sf_dir).groupBy("event_type").agg(
        F.collect_list(F.struct("h", "cnt")).alias("series")
    )
    step = (
        f"CASE WHEN acc.prev < 0 THEN x.cnt * {_S} "
        f"ELSE (x.cnt * {_S} + {_EWMA_NUM} * acc.prev) DIV {_EWMA_DEN} END"
    )
    out_t = "array<struct<h:timestamp,cnt:bigint,fx:bigint>>"
    return _fold_series(grouped, step, out_t).withColumnRenamed(
        "stat", "ewma"
    )


@register(
    "q_cusum_shift",
    oracle=f"""
        WITH RECURSIVE daily AS (
            SELECT event_type, date_trunc('day', ts) AS h,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2
        ),
        mu AS (
            SELECT event_type,
                   (sum(cnt) * {_S}) // count(*) AS mean_fx
            FROM daily GROUP BY event_type
        ),
        seq AS (
            SELECT h.event_type, h.h, h.cnt, m.mean_fx,
                   row_number() OVER (PARTITION BY h.event_type
                                      ORDER BY h.h) AS rn
            FROM daily h JOIN mu m USING (event_type)
        ),
        cu AS (
            SELECT event_type, h, cnt, mean_fx, rn,
                   greatest(CAST(0 AS BIGINT),
                            cnt * {_S} - mean_fx
                            - mean_fx // {_SLACK_DIV}) AS fx
            FROM seq WHERE rn = 1
            UNION ALL
            SELECT s.event_type, s.h, s.cnt, s.mean_fx, s.rn,
                   greatest(CAST(0 AS BIGINT),
                            c.fx + s.cnt * {_S} - s.mean_fx
                            - s.mean_fx // {_SLACK_DIV})
            FROM seq s
            JOIN cu c ON s.event_type = c.event_type AND s.rn = c.rn + 1
        )
        SELECT event_type, h AS day, cnt,
               CAST(fx AS DOUBLE) / {_S} AS cusum,
               fx > {_ALARM_MULT} * mean_fx AS alarm
        FROM cu
    """,
    doc="One-sided CUSUM level-shift statistic per event type: s_t ="
    " max(0, s_(t-1) + x_t - mean - slack) over daily counts, alarm"
    " when the cumulative excursion tops 4x the per-type mean — the"
    " textbook detector for slow upward drifts (bot traffic ramping,"
    " duplicate-ingest loops) that day-over-day deltas miss. Same"
    " engineered shape as q_ewma_smooth: tiny per-key series via ONE"
    " partial agg, integer-fixed-point F.aggregate fold (the per-type"
    " mean enters as an exact floor-divided int), recursive-CTE oracle"
    " replay bit-identical.",
)
def q_cusum_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = _daily(spark, sf_dir)
    # integer floor division (sum*S and count are non-negative), exactly
    # mirroring the oracle's // — no double path anywhere near the mean
    mu = hourly.groupBy("event_type").agg(
        F.expr(f"(sum(cnt) * {_S}) DIV count(*)").alias("mean_fx")
    )
    grouped = (
        hourly.join(F.broadcast(mu), "event_type")
        .groupBy("event_type", "mean_fx")
        .agg(F.collect_list(F.struct("h", "cnt")).alias("series"))
    )
    step = (
        f"greatest(CAST(0 AS BIGINT),"
        f" (CASE WHEN acc.prev < 0 THEN CAST(0 AS BIGINT) ELSE acc.prev END)"
        f" + x.cnt * {_S} - mean_fx - mean_fx DIV {_SLACK_DIV})"
    )
    out_t = "array<struct<h:timestamp,cnt:bigint,fx:bigint>>"
    fold = f"""
        aggregate(
            array_sort(series),
            named_struct(
                'prev', CAST(-1 AS BIGINT),
                'out', CAST(array() AS {out_t})
            ),
            (acc, x) -> named_struct(
                'prev', CAST(({step}) AS BIGINT),
                'out', acc.out || array(named_struct(
                    'h', x.h, 'cnt', x.cnt,
                    'fx', CAST(({step}) AS BIGINT)))
            ),
            acc -> acc.out
        )
    """
    return (
        grouped.select(
            "event_type", "mean_fx", F.explode(F.expr(fold)).alias("e")
        )
        .select(
            "event_type",
            F.col("e.h").alias("day"),
            F.col("e.cnt").alias("cnt"),
            (F.col("e.fx").cast("double") / _S).alias("cusum"),
            (F.col("e.fx") > _ALARM_MULT * F.col("mean_fx")).alias("alarm"),
        )
    )


# ---------------------------------------------------------------------------
# Seasonal decomposition, autocorrelation, ingest-calendar audit
# ---------------------------------------------------------------------------


@register(
    "q_seasonal_decompose",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS d,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2
        ),
        mu AS (
            SELECT event_type, (sum(cnt) * {_S}) // count(*) AS mean_fx
            FROM daily GROUP BY event_type
        ),
        dow AS (
            SELECT event_type, isodow(d) - 1 AS dow,
                   (sum(cnt) * {_S}) // count(*) AS dow_fx
            FROM daily GROUP BY 1, 2
        )
        SELECT d.event_type, d.d AS day,
               CAST(isodow(d.d) - 1 AS INTEGER) AS dow, d.cnt,
               CAST(m.mean_fx AS DOUBLE) / {_S} AS trend,
               CAST(w.dow_fx - m.mean_fx AS DOUBLE) / {_S} AS seasonal,
               CAST(d.cnt * {_S} - w.dow_fx AS DOUBLE) / {_S} AS residual
        FROM daily d
        JOIN mu m USING (event_type)
        JOIN dow w ON w.event_type = d.event_type
                  AND w.dow = isodow(d.d) - 1
    """,
    doc="Seasonal-naive decomposition of the daily series per event"
    " type: trend = per-type mean, seasonal = day-of-week mean minus"
    " trend, residual = observed minus day-of-week mean — the classic"
    " additive split monitoring uses to alarm on the RESIDUAL instead"
    " of raw counts (a quiet Sunday is normal; a quiet Tuesday is"
    " not). Two tiny broadcast aggregates (|types| and |types|x7"
    " rows) joined back onto the daily rollup; integer floor-divided"
    " means keep both engines bit-identical. Weekday convention:"
    " Spark weekday() == DuckDB isodow()-1 == 0 for Monday.",
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir).withColumnRenamed("h", "d")
    mu = daily.groupBy("event_type").agg(
        F.expr(f"(sum(cnt) * {_S}) DIV count(*)").alias("mean_fx")
    )
    dow = daily.groupBy(
        "event_type", F.expr("weekday(d)").cast("int").alias("dow")
    ).agg(F.expr(f"(sum(cnt) * {_S}) DIV count(*)").alias("dow_fx"))
    return (
        daily.withColumn("dow", F.expr("weekday(d)").cast("int"))
        .join(F.broadcast(mu), "event_type")
        .join(F.broadcast(dow), ["event_type", "dow"])
        .select(
            "event_type",
            F.col("d").alias("day"),
            "dow",
            "cnt",
            (F.col("mean_fx").cast("double") / _S).alias("trend"),
            ((F.col("dow_fx") - F.col("mean_fx")).cast("double") / _S).alias(
                "seasonal"
            ),
            (
                (F.col("cnt") * _S - F.col("dow_fx")).cast("double") / _S
            ).alias("residual"),
        )
    )


_AC_LAGS = (1, 2, 7)


@register(
    "q_autocorr",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS d,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2
        ),
        tot AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(cnt) AS BIGINT) AS s
            FROM daily GROUP BY event_type
        ),
        dev AS (
            SELECT d.event_type, d.d, t.n,
                   d.cnt * t.n - t.s AS dv,
                   lead(d.cnt * t.n - t.s, 1) OVER w AS dv1,
                   lead(d.cnt * t.n - t.s, 2) OVER w AS dv2,
                   lead(d.cnt * t.n - t.s, 7) OVER w AS dv7
            FROM daily d JOIN tot t USING (event_type)
            WINDOW w AS (PARTITION BY d.event_type ORDER BY d.d)
        )
        SELECT event_type, CAST(max(n) AS BIGINT) AS n_days,
               CAST(sum(dv * dv1) AS DOUBLE) / NULLIF(sum(dv * dv), 0) AS r1,
               CAST(sum(dv * dv2) AS DOUBLE) / NULLIF(sum(dv * dv), 0) AS r2,
               CAST(sum(dv * dv7) AS DOUBLE) / NULLIF(sum(dv * dv), 0) AS r7
        FROM dev
        GROUP BY event_type
    """,
    doc="Lag-1/2/7 autocorrelation of the daily count series per event"
    " type — the diagnostic that tells monitoring whether yesterday"
    " (r1) or last week (r7) predicts today, i.e. which baseline"
    " q_volume_anomaly / q_seasonal_decompose should difference"
    " against. Deviations are EXACT integers (cnt*n - total, no floor"
    " anywhere), lag pairing is one lead() window over the tiny daily"
    " rollup, and each coefficient is a single IEEE division of exact"
    " int64 sums — bit-identical cross-engine. NULL lead tails drop"
    " out of both engines' sum() identically.",
)
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    daily = _daily(spark, sf_dir).withColumnRenamed("h", "d")
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cnt").cast("bigint").alias("s"),
    )
    w = Window.partitionBy("event_type").orderBy("d")
    dv = (F.col("cnt") * F.col("n") - F.col("s")).alias("dv")
    dev = (
        daily.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "n",
            dv,
            *[
                F.lead(F.col("cnt") * F.col("n") - F.col("s"), k)
                .over(w)
                .alias(f"dv{k}")
                for k in _AC_LAGS
            ],
        )
    )
    # zero-variance (constant) series: autocorrelation is undefined,
    # NULL instead of dividing by zero (mirrored in the oracle)
    den = F.expr("nullif(sum(dv * dv), cast(0 as bigint))")
    return dev.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_days"),
        *[
            (F.sum(F.col("dv") * F.col(f"dv{k}")).cast("double") / den).alias(
                f"r{k}"
            )
            for k in _AC_LAGS
        ],
    )


@register(
    "q_calendar_gaps",
    oracle="""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS d
            FROM events GROUP BY 1, 2
        ),
        span AS (
            SELECT event_type, min(d) AS d0, max(d) AS d1,
                   CAST(count(*) AS BIGINT) AS n_observed
            FROM daily GROUP BY event_type
        ),
        expected AS (
            SELECT s.event_type, s.n_observed,
                   unnest(generate_series(s.d0, s.d1,
                                          INTERVAL 1 DAY)) AS d
            FROM span s
        ),
        missing AS (
            SELECT e.event_type, e.d
            FROM expected e LEFT JOIN daily o
              ON o.event_type = e.event_type AND o.d = e.d
            WHERE o.d IS NULL
        ),
        miss_agg AS (
            SELECT event_type, min(d) AS first_missing
            FROM missing GROUP BY event_type
        )
        SELECT e.event_type,
               CAST(count(*) AS BIGINT) AS n_expected,
               max(e.n_observed) AS n_observed,
               CAST(count(*) - max(e.n_observed) AS BIGINT) AS n_missing,
               max(m.first_missing) AS first_missing
        FROM expected e
        LEFT JOIN miss_agg m ON m.event_type = e.event_type
        GROUP BY e.event_type
    """,
    doc="Ingest-calendar completeness audit: per event type, the"
    " expected day count over the observed [min, max] span versus the"
    " days actually present, with the first missing day — exactly the"
    " silent failure mode of a periodic fetch — and doubly so for the"
    " reference's manual-trigger DAGs (dags/bronze.py:127,"
    " schedule_interval=None: a forgotten trigger leaves an"
    " undetected hole). The expected calendar generates"
    " from a |types|-row span aggregate (never corpus-sized), and the"
    " hole check is one anti-join-shaped left join per day bucket.",
)
def q_calendar_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir).select(
        "event_type", F.col("h").alias("d")
    ).distinct()
    span = daily.groupBy("event_type").agg(
        F.min("d").alias("d0"),
        F.max("d").alias("d1"),
        F.count(F.lit(1)).cast("bigint").alias("n_observed"),
    )
    expected = span.select(
        "event_type",
        "n_observed",
        F.explode(
            F.expr("sequence(d0, d1, interval 1 day)")
        ).alias("d"),
    )
    missing = expected.join(daily, ["event_type", "d"], "left_anti").select(
        "event_type", F.col("d").alias("md")
    )
    return (
        expected.join(
            missing.groupBy("event_type").agg(F.min("md").alias("first_missing")),
            "event_type",
            "left",
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_expected"),
            F.max("n_observed").alias("n_observed"),
            (F.count(F.lit(1)) - F.max("n_observed"))
            .cast("bigint")
            .alias("n_missing"),
            F.max("first_missing").alias("first_missing"),
        )
    )


@register(
    "q_burstiness",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS d,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(cnt) AS BIGINT) AS n_events,
               CAST(count(*) * sum(cnt * cnt) - sum(cnt) * sum(cnt)
                    AS DOUBLE) / (count(*) * sum(cnt)) AS fano
        FROM daily GROUP BY event_type
    """,
    doc="Burstiness (Fano factor) of the daily count series per event"
    " type: variance-to-mean ratio from exact integer sufficient"
    " statistics — (n*sum(x^2) - sum(x)^2) / (n*sum(x)), one IEEE"
    " division at the end. Fano ~1 is Poisson-like arrivals; >> 1"
    " means bursts (scraper storms, retry loops) that sizing from"
    " mean load alone would miss — read with q_autocorr (is the"
    " burst periodic?) and q_cusum_shift (is it a level shift?)."
    " One partial-agg rollup over the tiny daily series.",
)
def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    n = F.count(F.lit(1))
    sx = F.sum("cnt")
    sxx = F.sum(F.col("cnt") * F.col("cnt"))
    return daily.groupBy("event_type").agg(
        n.cast("bigint").alias("n_days"),
        sx.cast("bigint").alias("n_events"),
        ((n * sxx - sx * sx).cast("double") / (n * sx)).alias("fano"),
    )


# --- Holt linear-trend smoothing -------------------------------------

# alpha = beta = 1/4 as exact integer recurrences with denominator 4.
_H_NUM = 3
_H_DEN = 4


def _sfd(e: str) -> str:
    """Spark floor division by _H_DEN, exact for EITHER sign: pmod is
    non-negative, so (e - pmod(e, d)) is an exact multiple of d and DIV
    is exact division (Spark DIV truncates, DuckDB // truncates — both
    are exact on a zero remainder, so the engines agree even on
    negative trend values where plain truncation and floor differ)."""
    return f"((({e}) - pmod(({e}), {_H_DEN})) div {_H_DEN})"


def _dfd(e: str) -> str:
    """DuckDB mirror of _sfd: %'s sign follows the dividend, so the
    ((x % d) + d) % d wrap reproduces pmod."""
    return f"((({e}) - (((({e}) % {_H_DEN}) + {_H_DEN}) % {_H_DEN})) // {_H_DEN})"


_S_LNEW = _sfd(f"x.cnt * {_S} + {_H_NUM} * (acc.l + acc.b)")
_S_BNEW = _sfd(f"({_S_LNEW}) - acc.l + {_H_NUM} * acc.b")
_D_LNEW = _dfd(f"s.cnt * {_S} + {_H_NUM} * (e.lfx + e.bfx)")
_D_BNEW = _dfd(f"({_D_LNEW}) - e.lfx + {_H_NUM} * e.bfx")


# Shared recursive-CTE chain ending in ``ho`` = the per-type Holt
# state series (event_type, h, cnt, rn, lfx, bfx) — reused by the
# q_holt_linear, q_mase, and q_causal_impact oracles. ``src_where``
# restricts which events feed the fit (e.g. the pre-period only).
def _holt_cte(src_where: str = "") -> str:
    return f"""
        daily AS (
            SELECT event_type, date_trunc('day', ts) AS h,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events {src_where} GROUP BY 1, 2
        ),
        seq AS (
            SELECT event_type, h, cnt,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY h) AS rn
            FROM daily
        ),
        ho AS (
            SELECT event_type, h, cnt, rn,
                   CAST(cnt * {_S} AS BIGINT) AS lfx,
                   CAST(0 AS BIGINT) AS bfx
            FROM seq WHERE rn = 1
            UNION ALL
            SELECT s.event_type, s.h, s.cnt, s.rn,
                   CAST(({_D_LNEW}) AS BIGINT),
                   CAST(({_D_BNEW}) AS BIGINT)
            FROM seq s
            JOIN ho e ON s.event_type = e.event_type AND s.rn = e.rn + 1
        )
"""


_HOLT_CTE = _holt_cte()


@register(
    "q_holt_linear",
    oracle=f"""
        WITH RECURSIVE {_HOLT_CTE}
        SELECT event_type, h AS day, cnt,
               CAST(lfx AS DOUBLE) / {_S} AS level,
               CAST(bfx AS DOUBLE) / {_S} AS trend,
               CAST(lfx + bfx AS DOUBLE) / {_S} AS forecast_next
        FROM ho
    """,
    doc="Holt double exponential smoothing (alpha=beta=1/4) of daily"
    " event counts per type: a LEVEL and a TREND recurrence coupled"
    " per step — the capacity-planning forecast line (forecast_next ="
    " level + trend) that plain EWMA cannot produce because it has no"
    " trend state. Same engineered shape as q_ewma_smooth: ONE"
    " partial-agg shuffle to tiny per-type day series, then an"
    " F.aggregate integer fold carrying (level, trend) int64"
    " fixed-point state. The trend can go NEGATIVE, where Spark DIV"
    " (truncation) and floor disagree — both engines therefore"
    " compute floor division as (e - pmod(e, 4)) / 4, exact on a"
    " zero remainder, making the DuckDB recursive-CTE replay"
    " bit-identical even on declining series.",
)
def q_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _holt_frame(spark, sf_dir).select(
        "event_type",
        "day",
        "cnt",
        (F.col("lfx").cast("double") / _S).alias("level"),
        (F.col("bfx").cast("double") / _S).alias("trend"),
        ((F.col("lfx") + F.col("bfx")).cast("double") / _S).alias(
            "forecast_next"
        ),
    )


def _holt_frame(
    spark: SparkSession, sf_dir: str, daily: DataFrame | None = None
) -> DataFrame:
    """Integer Holt state series (event_type, day, cnt, lfx, bfx) —
    shared by q_holt_linear (display form), q_mase (error form), and
    q_causal_impact (pre-period fit). ``daily`` overrides the input
    bucket series (default: the full stream's daily counts)."""
    if daily is None:
        daily = _daily(spark, sf_dir)
    grouped = daily.groupBy("event_type").agg(
        F.collect_list(F.struct("h", "cnt")).alias("series")
    )
    out_t = "array<struct<h:timestamp,cnt:bigint,lfx:bigint,bfx:bigint>>"
    fold = f"""
        aggregate(
            array_sort(series),
            named_struct(
                'n', CAST(0 AS BIGINT), 'l', CAST(0 AS BIGINT),
                'b', CAST(0 AS BIGINT),
                'out', CAST(array() AS {out_t})
            ),
            (acc, x) -> CASE WHEN acc.n = 0 THEN named_struct(
                'n', CAST(1 AS BIGINT),
                'l', CAST(x.cnt * {_S} AS BIGINT),
                'b', CAST(0 AS BIGINT),
                'out', array(named_struct(
                    'h', x.h, 'cnt', x.cnt,
                    'lfx', CAST(x.cnt * {_S} AS BIGINT),
                    'bfx', CAST(0 AS BIGINT))))
            ELSE named_struct(
                'n', acc.n + CAST(1 AS BIGINT),
                'l', CAST(({_S_LNEW}) AS BIGINT),
                'b', CAST(({_S_BNEW}) AS BIGINT),
                'out', acc.out || array(named_struct(
                    'h', x.h, 'cnt', x.cnt,
                    'lfx', CAST(({_S_LNEW}) AS BIGINT),
                    'bfx', CAST(({_S_BNEW}) AS BIGINT))))
            END,
            acc -> acc.out
        )
    """
    return grouped.select(
        "event_type", F.explode(F.expr(fold)).alias("e")
    ).select(
        "event_type",
        F.col("e.h").alias("day"),
        F.col("e.cnt").alias("cnt"),
        F.col("e.lfx").alias("lfx"),
        F.col("e.bfx").alias("bfx"),
    )


# --- time-weighted average (TWAP) ------------------------------------


@register(
    "q_twap",
    oracle=f"""
        WITH seq AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   epoch_us(ts) AS t_us,
                   CAST(round(value * {_S}) AS BIGINT) AS vfx,
                   lead(epoch_us(ts)) OVER (
                       PARTITION BY event_type, date_trunc('day', ts)
                       ORDER BY epoch_us(ts), event_id) AS next_us
            FROM events
        ),
        agg AS (
            SELECT event_type, day,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(max(t_us) - min(t_us) AS BIGINT) AS dur_us,
                   sum(CASE WHEN next_us IS NULL THEN 0
                            ELSE (next_us - t_us) * vfx END) AS num
            FROM seq GROUP BY event_type, day
        )
        SELECT event_type, day, n_events,
               CAST(num AS DOUBLE) / CAST(dur_us AS DOUBLE) / {_S} AS twap
        FROM agg WHERE dur_us > 0
    """,
    doc="Time-weighted average value (TWAP) per event type and day:"
    " each observation holds until the next one, so its weight is its"
    " holding interval in epoch micros — the correct mean for"
    " irregularly-sampled series, where the arithmetic mean"
    " over-weights bursts (the finance TWAP / IoT last-observation-"
    " carried-forward integral). One lead() window on the natural"
    " (type, day) partitioning + one partial agg; interval x value"
    " products are int64-exact and sum in decimal(38)/hugeint (a day"
    " of micros times a fixed-point value overflows int64 at real"
    " scale), converging to one mirrored IEEE division pair — DuckDB"
    " replays it bit-for-bit. Zero-duration groups (a single"
    " observation, or all samples on one microsecond) are excluded"
    " identically in both engines.",
)
def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    us = "unix_micros(cast(ts as timestamp))"
    base = ev.select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.expr(us).alias("t_us"),
        F.round(F.col("value") * _S, 0).cast("bigint").alias("vfx"),
        "event_id",
    )
    w = Window.partitionBy("event_type", "day").orderBy("t_us", "event_id")
    seq = base.withColumn("next_us", F.lead("t_us").over(w))
    agg = seq.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.max("t_us") - F.min("t_us")).cast("bigint").alias("dur_us"),
        F.expr(
            "sum(cast(case when next_us is null then 0"
            " else (next_us - t_us) * vfx end as decimal(38, 0)))"
        ).alias("num"),
    )
    return agg.filter(F.col("dur_us") > 0).select(
        "event_type",
        "day",
        "n_events",
        F.expr(f"cast(num as double) / cast(dur_us as double) / {_S}").alias(
            "twap"
        ),
    )


# --- Kaplan-Meier survival -------------------------------------------

# Duration bucket for the survival curve: 30-day steps keep the curve
# (and the oracle's recursive replay) at ~100 points regardless of SF.
_KM_BUCKET = 30


@register(
    "q_survival_km",
    oracle=f"""
        WITH RECURSIVE base AS (
            SELECT epoch_us(l.l_shipdate) // 86400000000 AS shipday,
                   epoch_us(o.o_orderdate) // 86400000000 AS orderday
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate >= o.o_orderdate
        ),
        bounds AS (
            SELECT max(orderday) AS obs_end FROM base
        ),
        units AS (
            SELECT CASE WHEN shipday > (SELECT obs_end FROM bounds)
                        THEN ((SELECT obs_end FROM bounds) - orderday)
                             // {_KM_BUCKET}
                        ELSE (shipday - orderday) // {_KM_BUCKET}
                   END AS t,
                   CASE WHEN shipday > (SELECT obs_end FROM bounds)
                        THEN 0 ELSE 1 END AS died
            FROM base
        ),
        counts AS (
            SELECT t, CAST(sum(died) AS BIGINT) AS d,
                   CAST(count(*) AS BIGINT) AS leav
            FROM units GROUP BY t
        ),
        risk AS (
            SELECT t, d,
                   CAST(sum(leav) OVER (ORDER BY t DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS BIGINT) AS n_risk,
                   row_number() OVER (ORDER BY t ASC) AS rn
            FROM counts
        ),
        km AS (
            SELECT t, d, n_risk, rn,
                   1.0 - CAST(d AS DOUBLE) / n_risk AS surv
            FROM risk WHERE rn = 1
            UNION ALL
            SELECT r.t, r.d, r.n_risk, r.rn,
                   k.surv * (1.0 - CAST(r.d AS DOUBLE) / r.n_risk)
            FROM risk r JOIN km k ON r.rn = k.rn + 1
        )
        SELECT t AS t_bucket, n_risk, d AS n_shipped, surv AS survival
        FROM km
    """,
    doc="Kaplan-Meier estimator of order-to-ship latency with RIGHT"
    " CENSORING: the 'event' is a lineitem shipping; items whose ship"
    " date lies beyond the order horizon (max order date = the"
    " observation end) are censored at their age-at-horizon — exactly"
    " the not-yet-shipped open orders a naive mean-latency metric"
    " silently drops, biasing SLAs optimistic. Durations bucket into"
    " 30-day steps so the curve stays ~100 points at ANY scale. The"
    " risk set is a suffix sum over that tiny bucket table; the"
    " product-limit recurrence runs as the q_ewma_smooth-style"
    " F.aggregate fold — each step multiplies by (1 - d/n), mirrored"
    " IEEE ops on identical integers, so the DuckDB recursive-CTE"
    " replay is bit-exact. The only fact-scale work is the"
    " lineitem-orders equi-join + ONE partial agg.",
)
def q_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.expr(
                "unix_micros(cast(l_shipdate as timestamp))"
                " div 86400000000"
            ).alias("shipday"),
            F.expr(
                "unix_micros(cast(o_orderdate as timestamp))"
                " div 86400000000"
            ).alias("orderday"),
        )
    )
    bounds = base.agg(F.max("orderday").alias("obs_end"))
    units = base.crossJoin(F.broadcast(bounds)).select(
        F.expr(
            f"case when shipday > obs_end"
            f" then (obs_end - orderday) div {_KM_BUCKET}"
            f" else (shipday - orderday) div {_KM_BUCKET} end"
        ).alias("t"),
        F.expr(
            "case when shipday > obs_end then 0 else 1 end"
        ).alias("died"),
    )
    counts = units.groupBy("t").agg(
        F.sum("died").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("leav"),
    )
    # suffix sum + KM fold run over the ~100-row bucket table —
    # global windows are bounded, not a scale hazard
    wdesc = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = counts.select(
        "t", "d", F.sum("leav").over(wdesc).cast("bigint").alias("n_risk")
    )
    series = risk.groupBy().agg(
        F.collect_list(F.struct("t", "d", "n_risk")).alias("series")
    )
    out_t = "array<struct<t:bigint,d:bigint,n_risk:bigint,surv:double>>"
    fold = f"""
        aggregate(
            array_sort(series),
            named_struct('s', CAST(1.0 AS DOUBLE),
                         'out', CAST(array() AS {out_t})),
            (acc, x) -> named_struct(
                's', acc.s * (1.0 - CAST(x.d AS DOUBLE) / x.n_risk),
                'out', acc.out || array(named_struct(
                    't', x.t, 'd', x.d, 'n_risk', x.n_risk,
                    'surv', acc.s * (1.0 - CAST(x.d AS DOUBLE)
                                     / x.n_risk)))),
            acc -> acc.out
        )
    """
    return series.select(F.explode(F.expr(fold)).alias("e")).select(
        F.col("e.t").alias("t_bucket"),
        F.col("e.n_risk").alias("n_risk"),
        F.col("e.d").alias("n_shipped"),
        F.col("e.surv").alias("survival"),
    )


# --- MASE forecast-quality scorecard ---------------------------------


@register(
    "q_mase",
    oracle=f"""
        WITH RECURSIVE {_HOLT_CTE},
        err AS (
            SELECT c.event_type,
                   abs(p.lfx + p.bfx - c.cnt * {_S}) AS e_model,
                   abs(c.cnt - p.cnt) * {_S} AS e_naive
            FROM ho c JOIN ho p
              ON c.event_type = p.event_type AND c.rn = p.rn + 1
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_obs,
               CAST(sum(e_model) AS DOUBLE) / count(*) / {_S} AS mae_model,
               CAST(sum(e_naive) AS DOUBLE) / count(*) / {_S} AS mae_naive,
               CAST(sum(e_model) AS DOUBLE) / NULLIF(sum(e_naive), 0) AS mase
        FROM err GROUP BY event_type
    """,
    doc="MASE (mean absolute scaled error, Hyndman & Koehler 2006) of"
    " the Holt one-step-ahead forecast per event type: model error"
    " |level_(t-1) + trend_(t-1) - actual_t| scaled by the naive"
    " lag-1 forecast's error — the scale-free forecast score (<1 ="
    " beats naive) that makes capacity forecasts comparable across"
    " types with different volumes. Errors are EXACT int64 (the Holt"
    " state is integer fixed point, the naive error a count"
    " difference), so the two final mirrored IEEE divisions"
    " hash-match. Adds one self-join over the tiny per-type state"
    " series on top of q_holt_linear's fold.",
)
def q_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ho = _holt_frame(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    err = (
        ho.select(
            "event_type",
            "day",
            "cnt",
            "lfx",
            "bfx",
            F.lag("lfx").over(w).alias("p_lfx"),
            F.lag("bfx").over(w).alias("p_bfx"),
            F.lag("cnt").over(w).alias("p_cnt"),
        )
        .filter(F.col("p_lfx").isNotNull())
        .select(
            "event_type",
            F.abs(
                F.col("p_lfx") + F.col("p_bfx") - F.col("cnt") * _S
            ).alias("e_model"),
            (F.abs(F.col("cnt") - F.col("p_cnt")) * _S).alias("e_naive"),
        )
    )
    return err.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.expr(f"cast(sum(e_model) as double) / count(*) / {_S}").alias(
            "mae_model"
        ),
        F.expr(f"cast(sum(e_naive) as double) / count(*) / {_S}").alias(
            "mae_naive"
        ),
        # a CONSTANT series has zero naive error: MASE is undefined,
        # so it NULLs rather than raising (mirrored in the oracle)
        F.expr(
            "cast(sum(e_model) as double)"
            " / nullif(sum(e_naive), cast(0 as bigint))"
        ).alias("mase"),
    )


# --- CausalImpact-style counterfactual -------------------------------

_PRE_WHERE = (
    "WHERE epoch_us(ts) < (SELECT (epoch_us(min(ts))"
    " + epoch_us(max(ts))) // 2 FROM events)"
)


@register(
    "q_causal_impact",
    oracle=f"""
        WITH RECURSIVE {_holt_cte(_PRE_WHERE)},
        fit AS (
            SELECT event_type, lfx, bfx FROM (
                SELECT event_type, lfx, bfx,
                       row_number() OVER (PARTITION BY event_type
                           ORDER BY rn DESC) AS rk
                FROM ho
            ) WHERE rk = 1
        ),
        post AS (
            SELECT event_type, date_trunc('day', ts) AS h,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events
            WHERE epoch_us(ts) >= (SELECT (epoch_us(min(ts))
                  + epoch_us(max(ts))) // 2 FROM events)
            GROUP BY 1, 2
        ),
        joined AS (
            SELECT p.event_type, p.h, p.cnt, f.lfx, f.bfx,
                   row_number() OVER (PARTITION BY p.event_type
                       ORDER BY p.h) AS j
            FROM post p JOIN fit f USING (event_type)
        ),
        eff AS (
            SELECT event_type, h, cnt, j,
                   lfx + j * bfx AS fcst_fx,
                   cnt * {_S} - (lfx + j * bfx) AS eff_fx
            FROM joined
        )
        SELECT event_type, h AS day, cnt,
               CAST(fcst_fx AS DOUBLE) / {_S} AS forecast,
               CAST(eff_fx AS DOUBLE) / {_S} AS effect,
               CAST(sum(eff_fx) OVER (PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) / {_S} AS cum_effect
        FROM eff
    """,
    doc="CausalImpact-style counterfactual (Brodersen et al. 2015,"
    " trend-model form): fit Holt level+trend on the PRE-period daily"
    " counts only, extrapolate forecast_j = level + j*trend across"
    " the post period, and report per-day and CUMULATIVE effect ="
    " actual - counterfactual — the intervention readout when no"
    " control group exists (complementing q_did, which needs one,"
    " and q_changepoint, which finds WHERE to split). The fit is the"
    " same integer Holt fold (pre-period input only); extrapolation"
    " and cumulative effects are pure int64, so the replay is"
    " bit-exact. Post-period work is one partial agg + windows over"
    " the tiny per-type series.",
)
def q_causal_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    us = "unix_micros(cast(ts as timestamp))"
    bounds = ev.agg(
        F.expr(f"(min({us}) + max({us})) div 2").alias("mid_us")
    )
    evb = ev.crossJoin(F.broadcast(bounds))
    daily_pre = (
        evb.filter(F.expr(f"{us} < mid_us"))
        .groupBy("event_type", F.date_trunc("day", "ts").alias("h"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    wlast = Window.partitionBy("event_type").orderBy(F.desc("day"))
    fit = (
        _holt_frame(spark, sf_dir, daily=daily_pre)
        .withColumn("rk", F.row_number().over(wlast))
        .filter(F.col("rk") == 1)
        .select("event_type", "lfx", "bfx")
    )
    post = (
        evb.filter(F.expr(f"{us} >= mid_us"))
        .groupBy("event_type", F.date_trunc("day", "ts").alias("h"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    wj = Window.partitionBy("event_type").orderBy("h")
    eff = (
        post.join(F.broadcast(fit), "event_type")
        .withColumn("j", F.row_number().over(wj))
        .select(
            "event_type",
            "h",
            "cnt",
            (F.col("lfx") + F.col("j") * F.col("bfx")).alias("fcst_fx"),
            (
                F.col("cnt") * _S
                - (F.col("lfx") + F.col("j") * F.col("bfx"))
            ).alias("eff_fx"),
        )
    )
    wcum = wj.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return eff.select(
        "event_type",
        F.col("h").alias("day"),
        "cnt",
        (F.col("fcst_fx").cast("double") / _S).alias("forecast"),
        (F.col("eff_fx").cast("double") / _S).alias("effect"),
        (F.sum("eff_fx").over(wcum).cast("double") / _S).alias(
            "cum_effect"
        ),
    )


@register(
    "q_streaks",
    oracle="""
        WITH daily AS (
            SELECT DISTINCT user_id,
                   datediff('day', DATE '1970-01-01',
                            CAST(ts AS DATE)) AS dayidx
            FROM events
        ),
        isl AS (
            SELECT user_id, dayidx,
                   dayidx - CAST(row_number() OVER (
                       PARTITION BY user_id ORDER BY dayidx
                   ) AS BIGINT) AS island
            FROM daily
        ),
        streaks AS (
            SELECT user_id, island,
                   CAST(count(*) AS BIGINT) AS len,
                   min(dayidx) AS start_idx
            FROM isl GROUP BY user_id, island
        ),
        marked AS (
            SELECT user_id, len, start_idx,
                   max(len) OVER (PARTITION BY user_id) AS max_len
            FROM streaks
        )
        SELECT user_id,
               CAST(sum(len) AS BIGINT) AS active_days,
               CAST(count(*) AS BIGINT) AS n_streaks,
               max(len) AS longest_streak,
               CAST(DATE '1970-01-01'
                   + CAST(min(CASE WHEN len = max_len THEN start_idx END)
                          AS INTEGER) AS TIMESTAMP) AS longest_start
        FROM marked GROUP BY user_id
    """,
    doc="Gaps-and-islands activity streaks per user: distinct active"
    " days collapse to runs of consecutive days via the classic"
    " day_index - row_number island key, then per-user totals, run"
    " count, longest run, and the (tie-safe: earliest) start date of"
    " the longest run. The engagement-streak readout every activity"
    " product ships, and a pure integer/window pipeline: one distinct"
    " shuffle on (user, day), then windows PARTITIONED BY user — the"
    " per-user day lists are bounded by the calendar, never the event"
    " volume, so the shape is unchanged at 100 TB. Reference has no"
    " user-level analytics at all (its gold layer is document chunks,"
    " dags/gold.py); this is the events-table closure.",
)
def q_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("dayidx"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("dayidx")
    isl = daily.select(
        "user_id",
        "dayidx",
        (F.col("dayidx") - F.row_number().over(w).cast("bigint")).alias(
            "island"
        ),
    )
    streaks = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("bigint").alias("len"),
        F.min("dayidx").alias("start_idx"),
    )
    wmax = Window.partitionBy("user_id")
    marked = streaks.select(
        "user_id", "len", "start_idx", F.max("len").over(wmax).alias("max_len")
    )
    return marked.groupBy("user_id").agg(
        F.sum("len").cast("bigint").alias("active_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.max("len").alias("longest_streak"),
        F.date_add(
            F.lit("1970-01-01").cast("date"),
            F.min(
                F.when(F.col("len") == F.col("max_len"), F.col("start_idx"))
            ).cast("int"),
        )
        .cast("timestamp")
        .alias("longest_start"),
    )


# --- Theil-Sen robust trend slope ------------------------------------


@register(
    "q_theilsen",
    oracle="""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS h,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2
        ),
        pairs AS (
            SELECT a.event_type,
                   CAST(b.cnt - a.cnt AS DOUBLE)
                       / date_diff('day', a.h, b.h) AS slope,
                   a.h AS h1, b.h AS h2
            FROM daily a
            JOIN daily b
              ON a.event_type = b.event_type AND b.h > a.h
        ),
        ranked AS (
            SELECT event_type, slope,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY slope, h1, h2) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n_pairs
            FROM pairs
        )
        SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
               slope AS ts_slope
        FROM ranked WHERE rn = (n_pairs + 1) // 2
    """,
    doc="Theil-Sen robust trend estimator per event type: the MEDIAN of"
    " all pairwise slopes between daily volumes — up to ~29% corrupted"
    " days cannot move it, unlike the OLS slope a single outlier day"
    " drags arbitrarily. Slopes are exact int64 count differences over"
    " exact day gaps (one IEEE division each); the median is the exact"
    " lower order statistic with a deterministic (slope, day-pair)"
    " tiebreak. The pairwise join runs on the DAILY aggregate — rows ="
    " types x days, so the quadratic lives on a calendar-bounded table"
    " (60 days -> <2k pairs/type) no matter how many raw events fed"
    " it; the raw scan contributes one partial-agg shuffle. Types with"
    " a single active day have no pairs and drop out by construction.",
)
def q_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    a = daily.select(
        "event_type", F.col("h").alias("h1"), F.col("cnt").alias("c1")
    )
    b = daily.select(
        "event_type", F.col("h").alias("h2"), F.col("cnt").alias("c2")
    )
    pairs = a.join(b, "event_type").filter(F.col("h2") > F.col("h1")).select(
        "event_type",
        (
            (F.col("c2") - F.col("c1")).cast("double")
            / F.datediff(F.col("h2").cast("date"), F.col("h1").cast("date"))
        ).alias("slope"),
        "h1",
        "h2",
    )
    w = Window.partitionBy("event_type").orderBy("slope", "h1", "h2")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("n_pairs"),
    )
    return ranked.filter(
        F.col("rn") == F.expr("(n_pairs + 1) div 2")
    ).select(
        "event_type",
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.col("slope").alias("ts_slope"),
    )


# --- daily OHLC candles ----------------------------------------------


@register(
    "q_ohlc_daily",
    oracle="""
        SELECT event_type, date_trunc('day', ts) AS day,
               (min(struct_pack(t := ts, e := event_id,
                    fx := CAST(round(value * 10000) AS BIGINT)))).fx
                   AS open_fx,
               max(CAST(round(value * 10000) AS BIGINT)) AS high_fx,
               min(CAST(round(value * 10000) AS BIGINT)) AS low_fx,
               (max(struct_pack(t := ts, e := event_id,
                    fx := CAST(round(value * 10000) AS BIGINT)))).fx
                   AS close_fx,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events
        GROUP BY 1, 2
    """,
    doc="Daily OHLC candles per event type — open/close are the values"
    " of the FIRST and LAST event of the day, high/low the extremes:"
    " the time-series summarization finance calls candlesticks and"
    " monitoring calls per-window first/last gauges. First/last"
    " resolve through (ts, event_id, value) struct extremes — the"
    " same tie-safe argmin/argmax discipline as q_agg_minmax_by, so"
    " same-microsecond events cannot make engines (or cluster runs)"
    " disagree. Values live in exact fixed point; ONE partial-agg"
    " shuffle computes all five statistics — every aggregate is"
    " commutative-mergeable, the shape that rolls up hourly partials"
    " into days for free at 100 TB.",
)
def q_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.expr("cast(round(value * 10000, 0) as bigint)").alias("fx"),
    )
    return ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.min(F.struct("ts", "event_id", "fx"))["fx"].alias("open_fx"),
        F.max("fx").alias("high_fx"),
        F.min("fx").alias("low_fx"),
        F.max(F.struct("ts", "event_id", "fx"))["fx"].alias("close_fx"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


# --- revenue proration across calendar months ------------------------


@register(
    "q_prorate_revenue",
    oracle="""
        WITH span AS (
            SELECT o.o_orderkey,
                   CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_fx,
                   least(CAST(o.o_orderdate AS DATE),
                         CAST(max(l.l_shipdate) AS DATE)) AS d0,
                   greatest(CAST(o.o_orderdate AS DATE),
                            CAST(max(l.l_shipdate) AS DATE)) AS d1
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderkey, o.o_totalprice, o.o_orderdate
        ),
        months AS (
            SELECT o_orderkey, total_fx, d0, d1,
                   CAST(unnest(generate_series(
                       date_trunc('month', d0), date_trunc('month', d1),
                       INTERVAL 1 MONTH)) AS DATE) AS m0
            FROM span
        ),
        alloc AS (
            -- the span is CONTIGUOUS from d0, so cumulative overlap
            -- days through any month have a CLOSED FORM — no window,
            -- no lag: cd(m) = days d0..min(month_end, d1), and the
            -- previous cumulative is the same formula at m0 - 1 day,
            -- clamped at 0 for the first month
            SELECT m0, o_orderkey,
                   (total_fx * (date_diff('day', d0,
                        least(CAST(m0 + INTERVAL 1 MONTH AS DATE)
                              - INTERVAL 1 DAY, d1)) + 1))
                       // (date_diff('day', d0, d1) + 1)
                   - (total_fx * greatest(date_diff('day', d0,
                        least(CAST(m0 - INTERVAL 1 DAY AS DATE), d1))
                        + 1, 0))
                       // (date_diff('day', d0, d1) + 1) AS alloc_fx
            FROM months
        )
        SELECT CAST(m0 AS TIMESTAMP) AS month,
               CAST(sum(alloc_fx) AS BIGINT) AS revenue_fx,
               CAST(count(*) AS BIGINT) AS n_order_months
        FROM alloc GROUP BY m0
    """,
    doc="Revenue recognition / daily-rate proration: each order's total"
    " spreads over the calendar months its [orderdate, last shipdate]"
    " span touches, weighted by overlap days, using the TELESCOPING"
    " integer allocation floor(T*c_i/D) - floor(T*c_{i-1}/D) on"
    " cumulative overlap days — allocations are exact cents that sum"
    " to EXACTLY the order total (no float proration drift, no lost"
    " remainder pennies), the invariant finance reconciliation"
    " demands. Month explode is sequence() over a per-order bounded"
    " span; cumulative overlap days have a CLOSED FORM on the"
    " contiguous span, so there is NO per-order window — explode,"
    " narrow date math, one final month partial agg. The per-order"
    " max-ship table broadcasts (key + one date per order); at a"
    " scale where that side outgrows executor memory, drop the hint"
    " and AQE falls back to the shuffle join, rest of the plan"
    " unchanged. Degenerate spans (ship before order) normalize"
    " through least/greatest.",
)
def q_prorate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # pre-aggregate lineitem to one row per order BEFORE the join:
    # the shuffle carries (key, max_ship) pairs instead of full
    # 16-column lineitem rows, and the join is key-to-key 1:1
    ship = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.max("l_shipdate").alias("max_ship")
    )
    span = (
        orders.select("o_orderkey", "o_totalprice", "o_orderdate")
        # the per-order max-ship table is key + one date (~16 B/row):
        # broadcast it so the orders side never shuffles for the join
        .join(F.broadcast(ship), "o_orderkey")
        .select(
            "o_orderkey",
            F.expr("cast(round(o_totalprice * 100, 0) as bigint)").alias(
                "total_fx"
            ),
            F.least(
                F.col("o_orderdate").cast("date"),
                F.col("max_ship").cast("date"),
            ).alias("d0"),
            F.greatest(
                F.col("o_orderdate").cast("date"),
                F.col("max_ship").cast("date"),
            ).alias("d1"),
        )
    )
    months = span.select(
        "o_orderkey",
        "total_fx",
        "d0",
        "d1",
        F.explode(
            F.expr(
                "sequence(date_trunc('month', d0),"
                " date_trunc('month', d1), interval 1 month)"
            )
        ).alias("m0_ts"),
    ).withColumn("m0", F.col("m0_ts").cast("date")).drop("m0_ts")
    # contiguous-span closed form: cumulative overlap days through a
    # month (and through the previous month) are direct date math, so
    # the telescoping needs NO window and NO lag — explode + narrow
    # arithmetic is the whole per-month stage
    cd = (
        F.datediff(
            F.least(F.expr("date_add(add_months(m0, 1), -1)"), F.col("d1")),
            F.col("d0"),
        )
        + 1
    )
    cd_prev = F.greatest(
        F.datediff(
            F.least(F.expr("date_add(m0, -1)"), F.col("d1")), F.col("d0")
        )
        + 1,
        F.lit(0),
    )
    tdays = F.datediff("d1", "d0") + 1
    # integer `div` end-to-end (matches the oracle's // exactly and has
    # no 2^53 float-mantissa dependency, unlike (a - a % b) / b)
    alloc = months.withColumns(
        {"cd": cd, "cd_prev": cd_prev, "tdays": tdays}
    ).select(
        "m0",
        "o_orderkey",
        F.expr(
            "((total_fx * cd) div tdays)"
            " - ((total_fx * cd_prev) div tdays)"
        )
        .cast("bigint")
        .alias("alloc_fx"),
    )
    return alloc.groupBy(
        F.col("m0").cast("timestamp_ntz").alias("month")
    ).agg(
        F.sum("alloc_fx").cast("bigint").alias("revenue_fx"),
        F.count(F.lit(1)).cast("bigint").alias("n_order_months"),
    )


# --- OLS trend (the parametric companion to Theil-Sen) ----------------


@register(
    "q_ols_trend",
    oracle="""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS h,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2
        ),
        idx AS (
            SELECT event_type,
                   CAST(date_diff('day',
                       min(h) OVER (PARTITION BY event_type), h)
                       AS BIGINT) AS x,
                   cnt AS y
            FROM daily
        ),
        mom AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy,
                   CAST(sum(x * y) AS BIGINT) AS sxy
            FROM idx GROUP BY event_type
        )
        SELECT event_type, n,
               CASE WHEN n * sxx - sx * sx = 0 THEN CAST(0 AS DOUBLE)
                    ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE) END
                   AS ols_slope,
               CASE WHEN n * sxx - sx * sx = 0
                    THEN CAST(sy AS DOUBLE) / n
                    ELSE (CAST(sy AS DOUBLE)
                          - (CAST(n * sxy - sx * sy AS DOUBLE)
                             / CAST(n * sxx - sx * sx AS DOUBLE))
                            * CAST(sx AS DOUBLE)) / n END AS intercept,
               CASE WHEN (n * sxx - sx * sx) = 0
                      OR (n * syy - sy * sy) = 0 THEN CAST(0 AS DOUBLE)
                    ELSE (CAST(n * sxy - sx * sy AS DOUBLE)
                          * CAST(n * sxy - sx * sy AS DOUBLE))
                         / (CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(n * syy - sy * sy AS DOUBLE)) END
                   AS r_squared
        FROM mom
    """,
    doc="Closed-form OLS trend per event type over daily volumes —"
    " slope, intercept, and R² from SIX exact integer sufficient"
    " sums (x = day index from the per-type min day, y = count):"
    " the parametric companion to q_theilsen, and reading both"
    " answers 'is the trend real or one outlier day?' — OLS moves"
    " with the outlier, Theil-Sen doesn't, and R² quantifies the"
    " fit. One daily partial agg + one per-type moment agg (the"
    " q_corr_matrix single-scan pattern); the only doubles are the"
    " final three expressions, written IDENTICALLY in both engines;"
    " single-day types define slope 0 / intercept mean / R² 0 on"
    " the zero-variance guards.",
)
def q_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("h"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    w = Window.partitionBy("event_type")
    idx = daily.select(
        "event_type",
        F.datediff(
            F.col("h").cast("date"), F.min("h").over(w).cast("date")
        )
        .cast("bigint")
        .alias("x"),
        F.col("cnt").alias("y"),
    )
    mom = idx.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = F.when(dx == 0, F.lit(0.0)).otherwise(
        cov.cast("double") / dx.cast("double")
    )
    intercept = F.when(
        dx == 0, F.col("sy").cast("double") / F.col("n")
    ).otherwise(
        (
            F.col("sy").cast("double")
            - (cov.cast("double") / dx.cast("double"))
            * F.col("sx").cast("double")
        )
        / F.col("n")
    )
    r2 = F.when((dx == 0) | (dy == 0), F.lit(0.0)).otherwise(
        (cov.cast("double") * cov.cast("double"))
        / (dx.cast("double") * dy.cast("double"))
    )
    return mom.select(
        "event_type",
        "n",
        slope.alias("ols_slope"),
        intercept.alias("intercept"),
        r2.alias("r_squared"),
    )


# --- SAX symbolization + motif counts ---------------------------------

# Symbolic Aggregate approXimation (Lin/Keogh et al., DMKD'07) adapted
# to be engine-exact: the PAA step is the per-(type, day) mean (exact
# integer sum/count, truncating division — both engines truncate), and
# the alphabet breakpoints are EQUI-DEPTH per type (ntile over the
# per-type day series) instead of the paper's Gaussian table — rank-
# based discretization needs no float quantiles and matches DuckDB's
# standard-SQL ntile bit-for-bit given the deterministic (value, day)
# tiebreak. Downstream, consecutive-day symbol bigrams are the motif
# vocabulary — the "repeated shape" index that turns a 100 TB metric
# archive into a searchable symbol corpus (every window is per-type,
# parallel across types; the day table is calendar-bounded).

_SAX_ALPHABET = "abcd"  # 4 equi-depth symbols


@register(
    "q_sax_motifs",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   datediff('day', DATE '1970-01-01',
                            CAST(ts AS DATE)) AS dayidx,
                   CAST(sum(CAST(round(value * 10000) AS BIGINT))
                        AS BIGINT)
                       // CAST(count(*) AS BIGINT) AS paa_fx
            FROM events
            -- complete cases: an all-NULL day yields NULL paa_fx,
            -- which ntile orders NULLS LAST here / FIRST in Spark;
            -- a NULL ts makes a NULL dayidx with the same skew
            WHERE value IS NOT NULL AND ts IS NOT NULL
            GROUP BY event_type, CAST(ts AS DATE)
        ),
        sym AS (
            SELECT event_type, dayidx,
                   substr('{_SAX_ALPHABET}',
                          CAST(ntile({len(_SAX_ALPHABET)}) OVER (
                              PARTITION BY event_type
                              ORDER BY paa_fx, dayidx
                          ) AS INTEGER), 1) AS s
            FROM daily
        ),
        grams AS (
            SELECT event_type,
                   lag(s) OVER (PARTITION BY event_type
                                ORDER BY dayidx) || s AS motif
            FROM sym
        )
        SELECT event_type, motif, CAST(count(*) AS BIGINT) AS n
        FROM grams WHERE motif IS NOT NULL
        GROUP BY event_type, motif
    """,
    doc="SAX symbolization of each event type's daily-mean series:"
    " exact integer PAA (per-day fixed-point mean, truncating"
    " division), equi-depth 4-letter alphabet via per-type ntile with"
    " a deterministic (value, day) tiebreak, then consecutive-day"
    " bigram motif counts — the symbol index that makes shape search"
    " over a metric archive a string problem. All windows are"
    " per-type (parallel) over the calendar-bounded day table; the"
    " rank-based alphabet replaces the paper's Gaussian breakpoints"
    " so both engines discretize bit-identically.",
)
def q_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    # complete cases (mirrored in the oracle): an all-NULL day would
    # emit NULL paa_fx, ordered NULLS FIRST here vs DuckDB's LAST
    daily = (
        ev.filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .select(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"),
                F.lit("1970-01-01").cast("date"),
            )
            .cast("bigint")
            .alias("dayidx"),
            F.round(F.col("value") * 10000, 0)
            .cast("bigint")
            .alias("vfx"),
        )
        .groupBy("event_type", "dayidx")
        .agg(
            F.expr(
                "CAST(sum(vfx) AS BIGINT) div CAST(count(*) AS BIGINT)"
            ).alias("paa_fx")
        )
    )
    k = len(_SAX_ALPHABET)
    w_nt = Window.partitionBy("event_type").orderBy("paa_fx", "dayidx")
    sym = daily.select(
        "event_type",
        "dayidx",
        F.substring(
            F.lit(_SAX_ALPHABET), F.ntile(k).over(w_nt), 1
        ).alias("s"),
    )
    w_seq = Window.partitionBy("event_type").orderBy("dayidx")
    grams = sym.select(
        "event_type",
        F.concat(F.lag("s").over(w_seq), F.col("s")).alias("motif"),
    ).filter(F.col("motif").isNotNull())
    return grams.groupBy("event_type", "motif").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


# ---------------------------------------------------------------------------
# Rolling-origin forecast backtest (naive + seasonal-naive baselines)
# ---------------------------------------------------------------------------

_BT_HORIZONS = (1, 2, 3)
_BT_SEASON = 7


@register(
    "q_rolling_backtest",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        ),
        lagged AS (
            SELECT event_type, day, x,
                   {", ".join(
                       f"lag(x, {h}) OVER (PARTITION BY event_type"
                       f" ORDER BY day) AS f{h}"
                       for h in (*_BT_HORIZONS, _BT_SEASON)
                   )}
            FROM daily
        ),
        errs AS (
            {" UNION ALL ".join(
                f"SELECT event_type, 'naive' AS method,"
                f" CAST({h} AS BIGINT) AS horizon,"
                f" abs(x - f{h}) AS ae FROM lagged"
                f" WHERE f{h} IS NOT NULL"
                for h in _BT_HORIZONS
            )}
            UNION ALL
            SELECT event_type, 'snaive', CAST({_BT_SEASON} AS BIGINT),
                   abs(x - f{_BT_SEASON}) FROM lagged
            WHERE f{_BT_SEASON} IS NOT NULL
        )
        SELECT event_type, method, horizon,
               CAST(count(*) AS BIGINT) AS n_evals,
               CAST(sum(ae) AS BIGINT) AS sum_abs_err_fx,
               CAST(CAST(sum(ae) AS DOUBLE)
                    / CAST(count(*) AS DOUBLE) / 100.0 AS DOUBLE)
                   AS mae
        FROM errs GROUP BY event_type, method, horizon
    """,
    doc="Rolling-origin forecast BACKTEST of the two baselines every"
    " forecasting system must beat — naive (last value, horizons"
    f" {_BT_HORIZONS}) and seasonal-naive (same weekday,"
    f" m={_BT_SEASON}) — on each event type's daily total series."
    " Per-(series, method, horizon) MAE from integer absolute errors;"
    " lags via windows PARTITIONED by series (never a global sort),"
    " one daily partial agg + one window shuffle. This is the"
    " evaluation harness that makes q_holt_linear/q_seasonal_decompose"
    " claims falsifiable — at 100 TB with millions of series the"
    " shape is unchanged: windows shard by series key and the MAE"
    " fold is decomposable (cf. q_mase, which normalizes one model"
    " by the naive baseline; this emits the baseline grid itself).",
)
def q_rolling_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            F.expr("cast(round(value * 100) as bigint)").alias("fx"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("fx").cast("bigint").alias("x"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "x",
        *[
            F.lag("x", h).over(w).alias(f"f{h}")
            for h in (*_BT_HORIZONS, _BT_SEASON)
        ],
    )
    parts = [
        lagged.filter(F.col(f"f{h}").isNotNull()).select(
            "event_type",
            F.lit("naive").alias("method"),
            F.lit(h).cast("bigint").alias("horizon"),
            F.abs(F.col("x") - F.col(f"f{h}")).alias("ae"),
        )
        for h in _BT_HORIZONS
    ]
    parts.append(
        lagged.filter(F.col(f"f{_BT_SEASON}").isNotNull()).select(
            "event_type",
            F.lit("snaive").alias("method"),
            F.lit(_BT_SEASON).cast("bigint").alias("horizon"),
            F.abs(F.col("x") - F.col(f"f{_BT_SEASON}")).alias("ae"),
        )
    )
    errs = parts[0]
    for p in parts[1:]:
        errs = errs.unionByName(p)
    return errs.groupBy("event_type", "method", "horizon").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_evals"),
        F.sum("ae").cast("bigint").alias("sum_abs_err_fx"),
        (
            F.sum("ae").cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(100.0)
        ).alias("mae"),
    )


# ---------------------------------------------------------------------------
# round 10: drawdown, pinball loss, rolling correlation
# ---------------------------------------------------------------------------


@register(
    "q_drawdown",
    oracle="""
        WITH pts AS (
            -- complete case (NULLS.md tier 1): the equity curve is an
            -- ordering by ts; a NULL event-time has no position and a
            -- NULL value no increment
            SELECT user_id,
                   CAST(round(value * 10000) AS BIGINT) AS fx,
                   ts, event_id
            FROM events
            WHERE ts IS NOT NULL AND user_id IS NOT NULL
              AND value IS NOT NULL
        ),
        cums AS (
            SELECT user_id, ts, event_id,
                   sum(fx) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cum_fx
            FROM pts
        ),
        curve AS (
            SELECT user_id, cum_fx,
                   max(cum_fx) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS peak_fx
            FROM cums
        )
        SELECT user_id,
               CAST(max(peak_fx - cum_fx) AS DOUBLE) / 10000
                   AS max_drawdown,
               CAST(max(peak_fx) AS DOUBLE) / 10000 AS peak_value,
               CAST(count(*) AS BIGINT) AS n_points
        FROM curve GROUP BY user_id
    """,
    doc="Maximum drawdown per user over the running fixed-point value"
    " curve (the risk statistic behind equity-curve monitoring and"
    " per-account spend caps): cumulative sum ordered by (ts,"
    " event_id), running peak, max(peak - cum). Two frames over ONE"
    " user-partitioned sort — Spark evaluates both in a single"
    " WindowExec pass, so the cost is one shuffle on user_id and the"
    " state per task is a row, independent of corpus size. All"
    " arithmetic is int64 fixed point; the only doubles are final"
    " exact-int divisions. Complete case on ts/user_id/value"
    " (NULLS.md tier 1).",
)
def q_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # complete case (NULLS.md tier 1): drawdown is defined over the
    # time order; NULL ts/user/value rows carry no curve position
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
    )
    fx = F.round(F.col("value") * 10000, 0).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(fx).over(w).alias("cum_fx"),
    ).withColumn("peak_fx", F.max("cum_fx").over(w))
    return curve.groupBy("user_id").agg(
        (
            F.max(F.col("peak_fx") - F.col("cum_fx")).cast("double")
            / 10000
        ).alias("max_drawdown"),
        (F.max("peak_fx").cast("double") / 10000).alias("peak_value"),
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
    )


@register(
    "q_pinball_loss",
    oracle="""
        WITH daily AS (
            -- complete case (NULLS.md tier 1): a NULL ts has no day
            -- bucket, and the lag-7 pairing is an ordering by day
            SELECT event_type, date_trunc('day', ts) AS d,
                   sum(CAST(round(value * 10000) AS BIGINT)) AS y
            FROM events WHERE ts IS NOT NULL
            GROUP BY 1, 2
        ),
        paired AS (
            SELECT event_type, y,
                   lag(y, 7) OVER (PARTITION BY event_type
                                   ORDER BY d) AS f
            FROM daily
        )
        SELECT event_type,
               CAST(count(f) AS BIGINT) AS n_evals,
               CAST(sum(greatest((y - f), -(y - f))) AS DOUBLE)
                   / 20000 / count(f) AS pinball50,
               CAST(sum(greatest(9 * (y - f), -(y - f))) AS DOUBLE)
                   / 100000 / count(f) AS pinball90
        FROM paired WHERE f IS NOT NULL
        GROUP BY event_type
    """,
    doc="Pinball (quantile) loss of the seasonal-naive forecast"
    " (lag-7: same weekday last week) over each event type's daily"
    " fixed-point total — the metric that grades quantile forecasts"
    " (tau=0.5 reduces to half the MAE; tau=0.9 penalizes"
    " under-forecasting 9x). The loss max(tau*d, (tau-1)*d) is"
    " computed x10 in int64 (greatest(9d, -d)/10) so every sum is"
    " exact; the only doubles are final divisions. One partial-agg"
    " shuffle to the calendar-bounded day series, then a lag over"
    " ~|days| rows per type. Complete case on ts (NULLS.md tier 1).",
)
def q_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # complete case (NULLS.md tier 1): day bucketing + lag-7 pairing
    # are orderings by event time
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    )
    fx = F.round(F.col("value") * 10000, 0).cast("bigint")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.sum(fx).alias("y"))
    w = Window.partitionBy("event_type").orderBy("d")
    paired = daily.select(
        "event_type", "y", F.lag("y", 7).over(w).alias("f")
    ).filter(F.col("f").isNotNull())
    d = F.col("y") - F.col("f")
    return paired.groupBy("event_type").agg(
        F.count("f").cast("bigint").alias("n_evals"),
        (
            F.sum(F.greatest(d, -d)).cast("double")
            / 20000 / F.count("f")
        ).alias("pinball50"),
        (
            F.sum(F.greatest(F.lit(9) * d, -d)).cast("double")
            / 100000 / F.count("f")
        ).alias("pinball90"),
    )


@register(
    "q_rolling_corr",
    oracle="""
        WITH daily AS (
            -- complete case (NULLS.md tier 1): day buckets + a rolling
            -- frame are orderings by event time
            SELECT date_trunc('day', ts) AS d, event_type,
                   sum(CAST(round(value * 10000) AS BIGINT))
                       // count(*) AS avg_fx
            FROM events
            WHERE ts IS NOT NULL
              AND event_type IN ('click', 'purchase')
            GROUP BY 1, 2
        ),
        pair AS (
            SELECT c.d, c.avg_fx AS x, p.avg_fx AS y
            FROM daily c JOIN daily p USING (d)
            WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        ),
        rolled AS (
            SELECT d,
                   count(*) OVER w AS n,
                   sum(x) OVER w AS sx, sum(y) OVER w AS sy,
                   sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy,
                   sum(x * y) OVER w AS sxy
            FROM pair
            WINDOW w AS (ORDER BY d
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        )
        SELECT d AS day,
               CAST(n AS BIGINT) AS n_days,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                          * CAST(n * syy - sy * sy AS DOUBLE))
                   AS corr_7d
        FROM rolled
        WHERE n = 7
          AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
    doc="7-day rolling Pearson correlation between the click and"
    " purchase daily mean-value series — the co-movement monitor"
    " behind 'did purchases decouple from clicks this week'. Daily"
    " means are int64 fixed point (floor division keeps them exact"
    " and overflow-safe: products of day MEANS stay under 2^53, where"
    " products of day SUMS would overflow at large sf), the rolling"
    " moments are exact integer window sums over the"
    " calendar-bounded joined day series, and the final corr is"
    " correctly-rounded IEEE ops (mul/sqrt/div) on identical ints —"
    " bit-stable cross-engine. The one unpartitioned window runs on"
    " one row per day (whitelisted, tests/test_plans.py). Complete"
    " case on ts (NULLS.md tier 1).",
)
def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # complete case (NULLS.md tier 1): day buckets + rolling frame
    # are orderings by event time
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("event_type").isin("click", "purchase")
    )
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("d"), "event_type"
    ).agg(F.expr("div(sum(cast(round(value * 10000) as bigint)), count(*))").alias("avg_fx"))
    clicks = daily.filter(F.col("event_type") == "click").select(
        "d", F.col("avg_fx").alias("x")
    )
    buys = daily.filter(F.col("event_type") == "purchase").select(
        "d", F.col("avg_fx").alias("y")
    )
    pair = clicks.join(buys, "d")
    w = Window.orderBy("d").rowsBetween(-6, 0)
    rolled = pair.select(
        "d",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
    )
    covn = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        rolled.filter(
            (F.col("n") == 7) & (varx > 0) & (vary > 0)
        )
        .select(
            F.col("d").alias("day"),
            F.col("n").cast("bigint").alias("n_days"),
            (
                covn.cast("double")
                / F.sqrt(varx.cast("double") * vary.cast("double"))
            ).alias("corr_7d"),
        )
    )
