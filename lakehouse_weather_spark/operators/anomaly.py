"""Anomaly / monitoring operators: the data-quality closure a production
ingest pipeline runs next to its crawl (the reference's DAGs —
``dags/bronze.py:127``, ``silver.py:25``, ``gold.py:30`` — are all
manual-trigger, ``schedule_interval=None``, and have no drift or
outlier monitoring at all; these queries add that surface
Spark-first).

All three queries are engineered for cross-engine determinism the same
way the rest of the repo is (see functions.py): doubles enter integer
space once via fixed-point rounding, medians are order statistics (no
interpolation), percentage changes are basis points via non-negative
integer division — so the DuckDB oracles match bit-exactly.

Scale notes (100 TB framing):
- q_outlier_mad: two window shuffles on a low-cardinality key would
  skew at scale; the per-group medians come from rank windows here
  (exactness for the oracle), but each "join med back" is a broadcast
  of a |event_type|-row table — the scan side stays narrow. At real
  scale swap the rank-median for approx_percentile (one partial-agg
  pass, no window) and keep the same broadcast-back shape.
- q_volume_anomaly: aggregates to |days| x |types| rows BEFORE any
  window — the window runs on the tiny aggregate, never on raw events.
- q_win_range_time: a RANGE frame over event-time seconds; Spark
  evaluates it with a single sort per user partition (no per-frame
  rescan), identical shape to the ROWS frames in q_win_frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table

# Fixed-point scale for event values (matches functions.SCALE).
_SCALE = 10_000
# MAD multiplier: |x - median| > K * MAD flags an outlier. K=3 is the
# standard robust-statistics cutoff (~2 sigma for normal data).
_K = 3


@register(
    "q_outlier_mad",
    oracle=f"""
        WITH fx AS (
            -- complete cases: NULL value ranks NULLS LAST here but
            -- NULLS FIRST in Spark, shifting the median rank
            SELECT event_id, event_type, value,
                   CAST(round(value * {_SCALE}) AS BIGINT) AS vfx
            FROM events
            WHERE value IS NOT NULL
        ),
        ranked AS (
            SELECT *,
                   row_number() OVER (PARTITION BY event_type
                       ORDER BY vfx, event_id) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM fx
        ),
        med AS (
            SELECT event_type, min(vfx) AS med_fx
            FROM ranked WHERE rn = (n + 1) // 2 GROUP BY event_type
        ),
        dev AS (
            SELECT fx.event_id, fx.event_type, fx.value,
                   abs(fx.vfx - med.med_fx) AS dev_fx
            FROM fx JOIN med USING (event_type)
        ),
        dranked AS (
            SELECT *,
                   row_number() OVER (PARTITION BY event_type
                       ORDER BY dev_fx, event_id) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM dev
        ),
        mad AS (
            SELECT event_type, min(dev_fx) AS mad_fx
            FROM dranked WHERE rn = (n + 1) // 2 GROUP BY event_type
        )
        SELECT dev.event_id, dev.event_type, dev.value,
               dev.dev_fx, mad.mad_fx
        FROM dev JOIN mad USING (event_type)
        WHERE dev.dev_fx > {_K} * mad.mad_fx
    """,
    doc="Robust per-group outlier detection: median + MAD (median"
    " absolute deviation), flag |x - med| > 3*MAD. Medians are exact"
    " lower order statistics over fixed-point values (deterministic"
    " tiebreak on event_id), so every engine agrees bit-for-bit —"
    " no stddev, no interpolation. Plan: two rank windows on"
    " event_type + two broadcast joins of 5-row median tables. At"
    " 100 TB replace the rank windows with approx_percentile (single"
    " partial-agg pass) and keep the broadcast-back shape.",
)
def q_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # complete cases (mirrored in the oracle): NULL vfx shifts the
    # median rank under Spark's NULLS FIRST vs DuckDB's NULLS LAST
    fx = ev.filter(F.col("value").isNotNull()).select(
        "event_id",
        "event_type",
        "value",
        F.round(F.col("value") * _SCALE, 0).cast("bigint").alias("vfx"),
    )

    def lower_median(df: DataFrame, col: str) -> DataFrame:
        w = Window.partitionBy("event_type").orderBy(col, "event_id")
        wc = Window.partitionBy("event_type")
        ranked = df.withColumn("rn", F.row_number().over(w)).withColumn(
            "n", F.count(F.lit(1)).over(wc)
        )
        return (
            ranked.filter(F.col("rn") == F.expr("(n + 1) div 2"))
            .groupBy("event_type")
            .agg(F.min(col).alias(f"med_{col}"))
        )

    med = lower_median(fx, "vfx")
    dev = fx.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.abs(F.col("vfx") - F.col("med_vfx")).alias("dev_fx"),
    )
    mad = lower_median(dev, "dev_fx").withColumnRenamed(
        "med_dev_fx", "mad_fx"
    )
    return dev.join(F.broadcast(mad), "event_type").filter(
        F.col("dev_fx") > _K * F.col("mad_fx")
    ).select("event_id", "event_type", "value", "dev_fx", "mad_fx")


@register(
    "q_volume_anomaly",
    oracle="""
        WITH daily AS (
            SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS d, event_type,
                   count(*) AS cnt
            FROM events GROUP BY 1, 2
        ),
        lagged AS (
            SELECT d, event_type, cnt,
                   lag(cnt) OVER (PARTITION BY event_type ORDER BY d)
                       AS prev_cnt
            FROM daily
        )
        SELECT d, event_type, cnt, prev_cnt,
               CAST(CASE WHEN prev_cnt IS NULL THEN NULL
                    ELSE (abs(cnt - prev_cnt) * 10000) // prev_cnt
               END AS BIGINT) AS abs_change_bps,
               CAST(CASE WHEN prev_cnt IS NULL THEN NULL
                    WHEN cnt >= prev_cnt THEN 1 ELSE -1
               END AS INTEGER) AS direction,
               COALESCE(abs(cnt - prev_cnt) * 10 > prev_cnt, FALSE)
                   AS is_anomaly
        FROM lagged
    """,
    doc="Day-over-day ingest-volume drift per event type: daily counts,"
    " lag window, change in basis points (non-negative integer division"
    " — floor == truncate, so Spark div and DuckDB // agree), anomaly"
    " flag at >10% swing. The window runs over the |days|x|types|"
    " aggregate (150 rows), never over raw events: at 100 TB the only"
    " heavy step is the partial-agg count, and the day/type key is"
    " uniform by construction. This is the monitoring query a"
    " periodic crawl DAG (the reference's are manual-trigger,"
    " dags/bronze.py:127) should ship with.",
)
def q_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").cast("string").alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = daily.withColumn("prev_cnt", F.lag("cnt").over(w))
    change = F.abs(F.col("cnt") - F.col("prev_cnt"))
    return lagged.select(
        "d",
        "event_type",
        "cnt",
        "prev_cnt",
        F.expr("(abs(cnt - prev_cnt) * 10000) div prev_cnt").alias(
            "abs_change_bps"
        ),
        F.when(F.col("prev_cnt").isNull(), F.lit(None).cast("int"))
        .when(F.col("cnt") >= F.col("prev_cnt"), F.lit(1))
        .otherwise(F.lit(-1))
        .alias("direction"),
        F.coalesce(
            change * 10 > F.col("prev_cnt"), F.lit(False)
        ).alias("is_anomaly"),
    )


@register(
    "q_win_range_time",
    oracle=f"""
        WITH sec AS (
            SELECT event_id, user_id, value,
                   epoch_ns(ts) // 1000000000 AS ts_sec,
                   CAST(round(value * {_SCALE}) AS BIGINT) AS vfx
            FROM events
        )
        SELECT event_id, user_id, ts_sec,
               CAST(count(*) OVER w AS BIGINT) AS cnt_1h,
               CAST(sum(vfx) OVER w AS DOUBLE) / {_SCALE} AS sum_1h
        FROM sec
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
                     RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
    """,
    doc="Event-time RANGE frame: per user, count and fixed-point sum of"
    " the trailing hour (RANGE BETWEEN 3599 PRECEDING, on epoch"
    " seconds). Unlike a ROWS frame, the frame is defined by the TIME"
    " axis — peers with equal timestamps share one frame, so the result"
    " is order-independent by construction. Session tz is pinned UTC, so"
    " unix_seconds(ntz->ltz cast) == DuckDB epoch_ns//1e9 everywhere."
    " One shuffle on user_id; Spark evaluates the running range frame"
    " in a single sorted pass per partition.",
)
def q_win_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sec = ev.select(
        "event_id",
        "user_id",
        F.expr("unix_seconds(CAST(ts AS TIMESTAMP))").alias("ts_sec"),
        F.round(F.col("value") * _SCALE, 0).cast("bigint").alias("vfx"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_sec").rangeBetween(-3599, 0)
    return sec.select(
        "event_id",
        "user_id",
        "ts_sec",
        F.count(F.lit(1)).over(w).alias("cnt_1h"),
        (F.sum("vfx").over(w).cast("double") / _SCALE).alias("sum_1h"),
    )


@register(
    "q_dist_drift",
    oracle="""
        WITH bounds AS (
            SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid_us
            FROM events
        ),
        halves AS (
            SELECT event_type,
                   CAST(sum(CASE WHEN epoch_us(ts) < (SELECT mid_us FROM bounds)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
                   CAST(sum(CASE WHEN epoch_us(ts) >= (SELECT mid_us FROM bounds)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
            FROM events GROUP BY event_type
        ),
        tot AS (
            SELECT CAST(sum(n_old) AS BIGINT) AS t_old,
                   CAST(sum(n_new) AS BIGINT) AS t_new
            FROM halves
        )
        SELECT h.event_type, h.n_old, h.n_new,
               CAST(h.n_old AS DOUBLE) / t.t_old AS p_old,
               CAST(h.n_new AS DOUBLE) / t.t_new AS p_new,
               (CAST(h.n_new AS DOUBLE) / t.t_new
                - CAST(h.n_old AS DOUBLE) / t.t_old)
               * (CAST(h.n_new AS DOUBLE) / t.t_new
                  - CAST(h.n_old AS DOUBLE) / t.t_old)
               / NULLIF(CAST(h.n_old AS DOUBLE) / t.t_old, 0)
                   AS chi2_term
        FROM halves h CROSS JOIN tot t
    """,
    doc="Categorical distribution drift between the stream's first and"
    " second time halves: per-type shares in each half plus the"
    " chi-square contribution (p_new - p_old)^2 / p_old — the"
    " ingest-monitoring check that flags a category surging or"
    " vanishing. Integer counts + mirrored IEEE divisions (deliberately"
    " no PSI: its ln() rounds differently per libm), so every float"
    " oracle-matches. One conditional-aggregation scan + a 2-number"
    " broadcast.",
)
def q_dist_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # midpoint in exact epoch-micros (integer) — timestamp-interval
    # halving rounds differently across engines; integers do not
    us = "unix_micros(cast(ts as timestamp))"
    bounds = ev.agg(
        F.expr(f"(min({us}) + max({us})) div 2").alias("mid_us")
    )
    halves = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.expr(us) < F.col("mid_us"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_old"),
            F.sum(
                F.when(F.expr(us) >= F.col("mid_us"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_new"),
        )
    )
    tot = halves.agg(
        F.sum("n_old").cast("bigint").alias("t_old"),
        F.sum("n_new").cast("bigint").alias("t_new"),
    )
    # nullif on the TOTALS too: a corpus living entirely in one time
    # half (e.g. a single event) zeroes t_old or t_new — DuckDB's 0/0
    # is NULL while Spark's ANSI double division throws
    p_old = F.expr(
        "cast(n_old as double) / nullif(cast(t_old as double), 0d)"
    )
    p_new = F.expr(
        "cast(n_new as double) / nullif(cast(t_new as double), 0d)"
    )
    return halves.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_old",
        "n_new",
        p_old.alias("p_old"),
        p_new.alias("p_new"),
        # brand-new categories (p_old = 0) have an undefined chi2
        # contribution: NULL, not a divide-by-zero (mirrored above)
        (
            (p_new - p_old)
            * (p_new - p_old)
            / F.nullif(p_old, F.lit(0.0))
        ).alias("chi2_term"),
    )


@register(
    "q_interarrival_hist",
    oracle="""
        WITH gaps AS (
            SELECT event_type,
                   epoch_us(ts) // 1000000
                   - lag(epoch_us(ts) // 1000000) OVER (
                       PARTITION BY event_type ORDER BY ts, event_id
                   ) AS gap_s
            FROM events
        )
        SELECT event_type,
               CAST(CASE WHEN gap_s = 0 THEN 0
                         ELSE length(bin(gap_s)) END AS INTEGER)
                   AS log2_bucket,
               CAST(count(*) AS BIGINT) AS n_gaps
        FROM gaps WHERE gap_s IS NOT NULL
        GROUP BY 1, 2
    """,
    doc="Inter-arrival-time histogram per event type, bucketed by"
    " floor(log2(gap seconds)) — burstiness vs steady-rate diagnosis"
    " for ingest monitoring. The log2 bucket is length(bin(n)) — the"
    " binary-digit count, an exact integer identical in both engines —"
    " so no libm log2 enters the hashed output. One key-partitioned"
    " lag window + a tiny groupBy.",
)
def q_interarrival_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    secs = F.expr("unix_micros(cast(ts as timestamp)) div 1000000")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type", (secs - F.lag(secs).over(w)).alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    bucket = (
        F.when(F.col("gap_s") == 0, 0)
        .otherwise(F.length(F.expr("bin(gap_s)")))
        .cast("int")
    )
    return gaps.groupBy(
        "event_type", bucket.alias("log2_bucket")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_gaps"))


@register(
    "q_winsorize",
    oracle="""
        WITH fx AS (
            -- complete cases: NULL value ranks NULLS LAST here but
            -- NULLS FIRST in Spark, shifting the clip-bound ranks
            SELECT event_type,
                   CAST(round(value * 10000) AS BIGINT) AS v_fx
            FROM events
            WHERE value IS NOT NULL
        ),
        ranked AS (
            SELECT event_type, v_fx,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY v_fx) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM fx
        ),
        bounds AS (
            SELECT event_type,
                   min(CASE WHEN rn = greatest((n * 5) // 100, 1)
                            THEN v_fx END) AS lo_fx,
                   min(CASE WHEN rn = least((n * 95) // 100 + 1, n)
                            THEN v_fx END) AS hi_fx
            FROM ranked GROUP BY event_type
        )
        SELECT f.event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN f.v_fx < b.lo_fx
                             OR f.v_fx > b.hi_fx
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
               CAST(b.lo_fx AS DOUBLE) / 10000 AS lo,
               CAST(b.hi_fx AS DOUBLE) / 10000 AS hi,
               CAST(sum(least(greatest(f.v_fx, b.lo_fx), b.hi_fx))
                    AS DOUBLE) / 10000 / count(*) AS winsorized_mean
        FROM fx f JOIN bounds b USING (event_type)
        GROUP BY f.event_type, b.lo_fx, b.hi_fx
    """,
    doc="Winsorized statistics per event type: clip bounds are EXACT"
    " 5th/95th order statistics of the fixed-point values (rank"
    " windows, integer index arithmetic — no impl-defined"
    " percentile_approx), values clamp to [lo, hi], and the winsorized"
    " mean accumulates as exact integers — the robust-mean"
    " preprocessing that stops tail outliers from dominating scale"
    " normalization. Key-partitioned rank windows + one groupBy;"
    " bounds and means oracle-match bit-for-bit.",
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    # complete cases (mirrored in the oracle): NULL v_fx ranks NULLS
    # FIRST here vs DuckDB's NULLS LAST, shifting the clip bounds
    fx = ev.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.expr("CAST(round(value * 10000, 0) AS BIGINT)").alias("v_fx"),
    )
    w = Window.partitionBy("event_type").orderBy("v_fx")
    ranked = fx.select(
        "event_type",
        "v_fx",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("n"),
    )
    bounds = ranked.groupBy("event_type").agg(
        F.min(
            F.when(
                F.col("rn") == F.greatest(F.expr("(n * 5) div 100"), F.lit(1)),
                F.col("v_fx"),
            )
        ).alias("lo_fx"),
        F.min(
            F.when(
                F.col("rn") == F.least(F.expr("(n * 95) div 100 + 1"), F.col("n")),
                F.col("v_fx"),
            )
        ).alias("hi_fx"),
    )
    clamped = F.least(F.greatest(F.col("v_fx"), F.col("lo_fx")), F.col("hi_fx"))
    return (
        fx.join(bounds, "event_type")
        .groupBy("event_type", "lo_fx", "hi_fx")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.when(
                    (F.col("v_fx") < F.col("lo_fx"))
                    | (F.col("v_fx") > F.col("hi_fx")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_clipped"),
            F.sum(clamped).alias("s_fx"),
        )
        .select(
            "event_type",
            "n",
            "n_clipped",
            (F.col("lo_fx").cast("double") / 10000).alias("lo"),
            (F.col("hi_fx").cast("double") / 10000).alias("hi"),
            (F.col("s_fx").cast("double") / 10000 / F.col("n")).alias(
                "winsorized_mean"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Event-time disorder profile (watermark planning)
# ---------------------------------------------------------------------------


@register(
    "q_disorder_profile",
    oracle="""
        WITH arr AS (
            SELECT event_id, user_id, event_type,
                   epoch_ns(ts) // 1000000000 AS ts_sec
            FROM events
        ),
        run AS (
            SELECT event_type,
                   max(ts_sec) OVER (PARTITION BY user_id
                                     ORDER BY event_id) - ts_sec
                       AS disorder_sec,
                   event_id
            FROM arr
        ),
        ranked AS (
            SELECT event_type, disorder_sec,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY disorder_sec, event_id) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM run
        )
        SELECT event_type,
               CAST(max(n) AS BIGINT) AS n_events,
               CAST(max(disorder_sec) AS BIGINT) AS max_disorder_sec,
               CAST(min(CASE WHEN rn = (n + 1) // 2 THEN disorder_sec END)
                    AS BIGINT) AS p50_disorder_sec,
               CAST(min(CASE WHEN rn = (19 * n + 19) // 20
                        THEN disorder_sec END)
                    AS BIGINT) AS p95_disorder_sec
        FROM ranked
        GROUP BY event_type
    """,
    doc="Event-time disorder profile: per user, how far each event's"
    " timestamp lags the running maximum seen so far in ARRIVAL order"
    " (event_id as the arrival proxy), rolled up per type to max / p50"
    " / p95 lateness — the measurement that picks a Structured"
    " Streaming watermark delay (withWatermark bounds state by exactly"
    " this quantity; streaming/events.py's watermarked joins and"
    " windows consume the answer). The running max is one sorted pass"
    " per user partition; the percentile arm uses exact rank windows"
    " per TYPE for oracle parity (at 100 TB: approx_percentile, same"
    " output contract). Integer seconds end-to-end.",
)
def q_disorder_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    arr = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("unix_seconds(CAST(ts AS TIMESTAMP))").alias("ts_sec"),
    )
    wu = Window.partitionBy("user_id").orderBy("event_id")
    run = arr.select(
        "event_type",
        (F.max("ts_sec").over(wu) - F.col("ts_sec")).alias("disorder_sec"),
        "event_id",
    )
    wt = Window.partitionBy("event_type").orderBy("disorder_sec", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = run.select(
        "event_type",
        "disorder_sec",
        F.row_number().over(wt).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_events"),
        F.max("disorder_sec").cast("bigint").alias("max_disorder_sec"),
        F.min(
            F.when(F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("disorder_sec"))
        )
        .cast("bigint")
        .alias("p50_disorder_sec"),
        F.min(
            F.when(
                F.col("rn") == F.expr("(19 * n + 19) DIV 20"),
                F.col("disorder_sec"),
            )
        )
        .cast("bigint")
        .alias("p95_disorder_sec"),
    )


# ---------------------------------------------------------------------------
# Conversion-latency profile (funnel timing)
# ---------------------------------------------------------------------------

CONV_WINDOW_SEC = 3600  # view converts if a purchase follows within 1h


@register(
    "q_funnel_latency",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, event_id, event_type,
                   epoch_ns(ts) // 1000000000 AS ts_sec,
                   date_trunc('day', ts) AS day
            FROM events WHERE event_type IN ('view', 'purchase')
        ),
        nxt AS (
            SELECT user_id, event_id, event_type, ts_sec, day,
                   min(CASE WHEN event_type = 'purchase' THEN ts_sec END)
                       OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                             ROWS BETWEEN 1 FOLLOWING
                                      AND UNBOUNDED FOLLOWING)
                       AS next_purchase_sec
            FROM seq
        ),
        conv AS (
            SELECT day, event_id,
                   next_purchase_sec - ts_sec AS latency_sec,
                   next_purchase_sec IS NOT NULL
                       AND next_purchase_sec - ts_sec <= {CONV_WINDOW_SEC}
                       AS converted
            FROM nxt WHERE event_type = 'view'
        ),
        ranked AS (
            SELECT day, latency_sec,
                   row_number() OVER (PARTITION BY day
                                      ORDER BY latency_sec, event_id) AS rn,
                   count(*) OVER (PARTITION BY day) AS n
            FROM conv WHERE converted
        ),
        stats AS (
            SELECT day,
                   CAST(max(n) AS BIGINT) AS n_converted,
                   CAST(min(CASE WHEN rn = (n + 1) // 2
                            THEN latency_sec END) AS BIGINT)
                       AS p50_latency_sec,
                   CAST(min(CASE WHEN rn = (19 * n + 19) // 20
                            THEN latency_sec END) AS BIGINT)
                       AS p95_latency_sec
            FROM ranked GROUP BY day
        ),
        views AS (
            SELECT day, CAST(count(*) AS BIGINT) AS n_views
            FROM conv GROUP BY day
        )
        SELECT v.day, v.n_views,
               CAST(COALESCE(s.n_converted, 0) AS BIGINT) AS n_converted,
               CAST(COALESCE(s.n_converted, 0) * 10000 // v.n_views
                    AS BIGINT) AS conversion_bp,
               s.p50_latency_sec, s.p95_latency_sec
        FROM views v LEFT JOIN stats s USING (day)
    """,
    doc=f"Conversion-latency funnel profile: per day, how many views"
    f" convert to a purchase within {CONV_WINDOW_SEC} s and the"
    " p50/p95 view-to-purchase latency — the timing half of funnel"
    " analysis (q_funnel counts steps; this measures how FAST users"
    " traverse them, the metric latency regressions show up in"
    " first). The next-purchase lookup is one conditional-min"
    " following-rows window per user (the q_join_asof_tolerance"
    " shape without a second table); percentiles are exact rank"
    " statistics per DAY partition (at 100 TB: approx_percentile,"
    " same contract). Integer seconds and basis points end-to-end.",
)
def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    seq = ev.filter(F.col("event_type").isin("view", "purchase")).select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("unix_seconds(CAST(ts AS TIMESTAMP))").alias("ts_sec"),
        F.date_trunc("day", "ts").alias("day"),
    )
    wnext = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = seq.withColumn(
        "next_purchase_sec",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts_sec"))
        ).over(wnext),
    )
    conv = nxt.filter(F.col("event_type") == "view").select(
        "day",
        "event_id",
        (F.col("next_purchase_sec") - F.col("ts_sec")).alias("latency_sec"),
        (
            F.col("next_purchase_sec").isNotNull()
            & (
                F.col("next_purchase_sec") - F.col("ts_sec")
                <= CONV_WINDOW_SEC
            )
        ).alias("converted"),
    )
    wr = Window.partitionBy("day").orderBy("latency_sec", "event_id")
    wn = Window.partitionBy("day")
    ranked = conv.filter("converted").select(
        "day",
        "latency_sec",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    stats = ranked.groupBy("day").agg(
        F.max("n").cast("bigint").alias("n_converted"),
        F.min(
            F.when(F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("latency_sec"))
        )
        .cast("bigint")
        .alias("p50_latency_sec"),
        F.min(
            F.when(
                F.col("rn") == F.expr("(19 * n + 19) DIV 20"),
                F.col("latency_sec"),
            )
        )
        .cast("bigint")
        .alias("p95_latency_sec"),
    )
    views = conv.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_views")
    )
    return views.join(stats, "day", "left").select(
        "day",
        "n_views",
        F.coalesce("n_converted", F.lit(0)).cast("bigint").alias("n_converted"),
        F.expr("coalesce(n_converted, 0) * 10000 DIV n_views")
        .cast("bigint")
        .alias("conversion_bp"),
        "p50_latency_sec",
        "p95_latency_sec",
    )


# ---------------------------------------------------------------------------
# Numeric distribution drift (two-sample Kolmogorov-Smirnov)
# ---------------------------------------------------------------------------


@register(
    "q_ks_drift",
    oracle=f"""
        WITH bounds AS (
            SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid_us
            FROM events
        ),
        fx AS (
            SELECT event_type, event_id,
                   CAST(round(value * {_SCALE}) AS BIGINT) AS vfx,
                   CASE WHEN epoch_us(ts) < (SELECT mid_us FROM bounds)
                        THEN 1 ELSE 0 END AS h1
            FROM events
            -- complete cases: NULL value sorts NULLS LAST here but
            -- NULLS FIRST in Spark, shifting the ECDF walk
            WHERE value IS NOT NULL
        ),
        tot AS (
            SELECT event_type,
                   CAST(sum(h1) AS BIGINT) AS n1,
                   CAST(sum(1 - h1) AS BIGINT) AS n2
            FROM fx GROUP BY event_type
        ),
        cum AS (
            SELECT f.event_type, t.n1, t.n2,
                   sum(f.h1) OVER w AS c1,
                   sum(1 - f.h1) OVER w AS c2
            FROM fx f JOIN tot t USING (event_type)
            WINDOW w AS (PARTITION BY f.event_type
                         ORDER BY f.vfx, f.event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT event_type, max(n1) AS n1, max(n2) AS n2,
               CAST(max(abs(c1 * n2 - c2 * n1)) AS BIGINT) AS d_num,
               CAST(max(abs(c1 * n2 - c2 * n1)) AS DOUBLE)
                   / (max(n1) * max(n2)) AS ks_stat
        FROM cum GROUP BY event_type
        HAVING max(n1) > 0 AND max(n2) > 0
    """,
    doc="Two-sample Kolmogorov-Smirnov drift per event type: the max"
    " ECDF gap between the first and second time half of each type's"
    " value distribution — the NUMERIC companion to q_dist_drift's"
    " categorical chi-square (KS catches a shifted mean or fattened"
    " tail that category counts can't see). The supremum is exact:"
    " cumulative counts c1, c2 along the sorted merged sample compare"
    " as the cross-multiplied integer |c1*n2 - c2*n1| (ECDF"
    " difference without division), one IEEE divide at the end. One"
    " sort-window per type partition; the time midpoint is the same"
    " integer epoch-micros split q_dist_drift uses.",
)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mid = ev.agg(
        F.expr(
            "(unix_micros(min(CAST(ts AS TIMESTAMP)))"
            " + unix_micros(max(CAST(ts AS TIMESTAMP)))) DIV 2"
        ).alias("mid_us")
    )
    # complete cases (mirrored in the oracle): NULL value sorts NULLS
    # FIRST here / NULLS LAST in DuckDB, shifting the ECDF walk
    fx = (
        ev.filter(F.col("value").isNotNull())
        .crossJoin(F.broadcast(mid))
        .select(
            "event_type",
            "event_id",
            F.round(F.col("value") * _SCALE, 0)
            .cast("bigint")
            .alias("vfx"),
            F.when(
                F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
                < F.col("mid_us"),
                1,
            )
            .otherwise(0)
            .alias("h1"),
        )
    )
    tot = fx.groupBy("event_type").agg(
        F.sum("h1").cast("bigint").alias("n1"),
        F.sum(F.lit(1) - F.col("h1")).cast("bigint").alias("n2"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("vfx", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = fx.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "n1",
        "n2",
        F.sum("h1").over(w).alias("c1"),
        F.sum(F.lit(1) - F.col("h1")).over(w).alias("c2"),
    )
    d = F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
    # a type living entirely in one half has no two-sample statistic:
    # excluded identically in both engines
    return (
        cum.groupBy("event_type")
        .agg(
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
            F.max(d).cast("bigint").alias("d_num"),
        )
        .filter((F.col("n1") > 0) & (F.col("n2") > 0))
        .select(
            "event_type",
            "n1",
            "n2",
            "d_num",
            (F.col("d_num").cast("double") / (F.col("n1") * F.col("n2"))).alias(
                "ks_stat"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Activity concentration (Gini coefficient)
# ---------------------------------------------------------------------------


@register(
    "q_gini_activity",
    oracle="""
        WITH peruser AS (
            SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS x
            FROM events GROUP BY event_type, user_id
        ),
        ranked AS (
            SELECT event_type, x,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY x, user_id) AS i,
                   count(*) OVER (PARTITION BY event_type) AS n,
                   sum(x) OVER (PARTITION BY event_type) AS sx
            FROM peruser
        )
        SELECT event_type,
               CAST(max(n) AS BIGINT) AS n_users,
               CAST(max(sx) AS BIGINT) AS n_events,
               CAST(2 * sum(i * x) - (max(n) + 1) * max(sx) AS DOUBLE)
                   / (max(n) * max(sx)) AS gini
        FROM ranked GROUP BY event_type
    """,
    doc="Gini coefficient of per-user activity within each event type —"
    " the single-number concentration metric monitoring pairs with"
    " q_skew_profile's top-key list (Gini ~0: uniform traffic; ~1: a"
    " few accounts generate everything — bot farms, scraper loops,"
    " and the hot keys that will skew every user-keyed shuffle). The"
    " classic rank formula G = (2*sum(i*x_i) - (n+1)*sum(x)) /"
    " (n*sum(x)) stays in exact int64 (ranks totally ordered by"
    " (count, user_id)) until the single final division. One agg to"
    " per-user counts, one rank window over USERS-per-type, one"
    " rollup.",
)
def q_gini_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    peruser = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    wr = Window.partitionBy("event_type").orderBy("x", "user_id")
    wn = Window.partitionBy("event_type")
    ranked = peruser.select(
        "event_type",
        "x",
        F.row_number().over(wr).cast("bigint").alias("i"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
        F.sum("x").over(wn).cast("bigint").alias("sx"),
    )
    return ranked.groupBy("event_type").agg(
        F.max("n").alias("n_users"),
        F.max("sx").alias("n_events"),
        (
            (
                F.lit(2) * F.sum(F.col("i") * F.col("x"))
                - (F.max("n") + 1) * F.max("sx")
            ).cast("double")
            / (F.max("n") * F.max("sx"))
        ).alias("gini"),
    )


# --- Welch's t-test mean-shift drift ---------------------------------


@register(
    "q_welch_ttest",
    oracle=f"""
        WITH bounds AS (
            SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid_us
            FROM events
        ),
        fx AS (
            -- complete cases: a NULL value would rank NULLS LAST here
            -- but NULLS FIRST in Spark, shifting every derived rank
            SELECT event_type,
                   CAST(epoch_us(ts) < (SELECT mid_us FROM bounds)
                        AS INTEGER) AS is_old,
                   CAST(round(value * {_SCALE}) AS BIGINT) AS vfx
            FROM events
            WHERE value IS NOT NULL
        ),
        agg AS (
            SELECT event_type,
                   CAST(sum(is_old) AS BIGINT) AS n_old,
                   CAST(sum(1 - is_old) AS BIGINT) AS n_new,
                   CAST(sum(CASE WHEN is_old = 1 THEN vfx ELSE 0 END)
                        AS BIGINT) AS s_old,
                   CAST(sum(CASE WHEN is_old = 0 THEN vfx ELSE 0 END)
                        AS BIGINT) AS s_new,
                   CAST(sum(CASE WHEN is_old = 1 THEN vfx * vfx
                                 ELSE 0 END) AS DOUBLE) AS q_old,
                   CAST(sum(CASE WHEN is_old = 0 THEN vfx * vfx
                                 ELSE 0 END) AS DOUBLE) AS q_new
            FROM fx GROUP BY event_type
        ),
        mom AS (
            SELECT event_type, n_old, n_new,
                   CAST(s_old AS DOUBLE) / n_old AS m_old,
                   CAST(s_new AS DOUBLE) / n_new AS m_new,
                   (q_old - (CAST(s_old AS DOUBLE) * CAST(s_old AS DOUBLE))
                        / n_old) / (n_old - 1) AS v_old,
                   (q_new - (CAST(s_new AS DOUBLE) * CAST(s_new AS DOUBLE))
                        / n_new) / (n_new - 1) AS v_new
            FROM agg
        ),
        se AS (
            SELECT event_type, n_old, n_new, m_old, m_new, v_old, v_new,
                   v_old / n_old + v_new / n_new AS se2
            FROM mom
        )
        SELECT event_type, n_old, n_new,
               m_old / {_SCALE} AS mean_old,
               m_new / {_SCALE} AS mean_new,
               (m_new - m_old) / sqrt(se2) AS t_stat,
               se2 * se2 / ((v_old / n_old) * (v_old / n_old) / (n_old - 1)
                   + (v_new / n_new) * (v_new / n_new) / (n_new - 1))
                   AS welch_df
        FROM se
        WHERE n_old >= 2 AND n_new >= 2 AND se2 > 0
    """,
    doc="Welch's two-sample t-test per event type between the stream's"
    " first and second time halves: the parametric mean-shift detector"
    " that complements q_ks_drift (shape drift) and q_dist_drift"
    " (category drift). Sums and sums-of-squares are EXACT integers"
    " (fixed-point values; Spark side sums squares in decimal(38) so"
    " ANSI never overflows at scale, DuckDB in hugeint — both convert"
    " to the identical double), and every downstream float op (+ - *"
    " / sqrt) is a correctly-rounded IEEE primitive applied in"
    " mirrored order, so t and the Welch-Satterthwaite df hash-match"
    " across engines. ONE conditional-aggregation scan; output is"
    " |types| rows.",
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = "unix_micros(cast(ts as timestamp))"
    bounds = ev.agg(
        F.expr(f"(min({us}) + max({us})) div 2").alias("mid_us")
    )
    # complete cases (mirrored in the oracle): NULL value rows would
    # inflate n_old/n_new while dropping out of the sums
    fx = (
        ev.filter(F.col("value").isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.expr(f"cast({us} < mid_us as int)").alias("is_old"),
            F.round(F.col("value") * _SCALE, 0)
            .cast("bigint")
            .alias("vfx"),
        )
    )
    agg = fx.groupBy("event_type").agg(
        F.sum("is_old").cast("bigint").alias("n_old"),
        F.sum(1 - F.col("is_old")).cast("bigint").alias("n_new"),
        F.sum(F.when(F.col("is_old") == 1, F.col("vfx")).otherwise(0))
        .cast("bigint")
        .alias("s_old"),
        F.sum(F.when(F.col("is_old") == 0, F.col("vfx")).otherwise(0))
        .cast("bigint")
        .alias("s_new"),
        F.expr(
            "cast(sum(cast(case when is_old = 1 then vfx * vfx else 0 end"
            " as decimal(38, 0))) as double)"
        ).alias("q_old"),
        F.expr(
            "cast(sum(cast(case when is_old = 0 then vfx * vfx else 0 end"
            " as decimal(38, 0))) as double)"
        ).alias("q_new"),
    )
    mom = agg.select(
        "event_type",
        "n_old",
        "n_new",
        F.expr("cast(s_old as double) / n_old").alias("m_old"),
        F.expr("cast(s_new as double) / n_new").alias("m_new"),
        F.expr(
            "(q_old - (cast(s_old as double) * cast(s_old as double))"
            " / n_old) / (n_old - 1)"
        ).alias("v_old"),
        F.expr(
            "(q_new - (cast(s_new as double) * cast(s_new as double))"
            " / n_new) / (n_new - 1)"
        ).alias("v_new"),
    )
    se = mom.withColumn(
        "se2", F.expr("v_old / n_old + v_new / n_new")
    )
    # types with a sub-2 half (or zero pooled variance) have an
    # undefined t — excluded identically in both engines
    se = se.filter(
        (F.col("n_old") >= 2) & (F.col("n_new") >= 2) & (F.col("se2") > 0)
    )
    return se.select(
        "event_type",
        "n_old",
        "n_new",
        (F.col("m_old") / _SCALE).alias("mean_old"),
        (F.col("m_new") / _SCALE).alias("mean_new"),
        F.expr("(m_new - m_old) / sqrt(se2)").alias("t_stat"),
        F.expr(
            "se2 * se2 / ((v_old / n_old) * (v_old / n_old) / (n_old - 1)"
            " + (v_new / n_new) * (v_new / n_new) / (n_new - 1))"
        ).alias("welch_df"),
    )


# --- CUPED variance reduction ----------------------------------------


@register(
    "q_cuped",
    oracle=f"""
        WITH bounds AS (
            SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid_us
            FROM events
        ),
        per_user AS (
            SELECT user_id,
                   CAST(sum(CASE WHEN epoch_us(ts) < (SELECT mid_us
                                                      FROM bounds)
                            THEN CAST(round(value * {_SCALE}) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS pre,
                   CAST(sum(CASE WHEN epoch_us(ts) >= (SELECT mid_us
                                                       FROM bounds)
                            THEN CAST(round(value * {_SCALE}) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS post
            FROM events GROUP BY user_id
        ),
        mom AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(pre) AS BIGINT) AS sp,
                   CAST(sum(post) AS BIGINT) AS ss,
                   CAST(sum(CAST(pre AS HUGEINT) * pre) AS DOUBLE) AS spp,
                   CAST(sum(CAST(post AS HUGEINT) * post) AS DOUBLE) AS sss,
                   CAST(sum(CAST(pre AS HUGEINT) * post) AS DOUBLE) AS sps
            FROM per_user
            HAVING count(*) >= 2
        ),
        stats AS (
            SELECT n,
                   (spp - (CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)) / n)
                       / (n - 1) AS var_pre,
                   (sss - (CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)) / n)
                       / (n - 1) AS var_post,
                   (sps - (CAST(sp AS DOUBLE) * CAST(ss AS DOUBLE)) / n)
                       / (n - 1) AS cov,
                   CAST(sp AS DOUBLE) / n / {_SCALE} AS mean_pre,
                   CAST(ss AS DOUBLE) / n / {_SCALE} AS mean_post
            FROM mom
        )
        SELECT n AS n_users, mean_pre, mean_post,
               cov / NULLIF(var_pre, 0) AS theta,
               var_post / {_SCALE} / {_SCALE} AS var_post,
               (var_post + (cov / NULLIF(var_pre, 0))
                    * (cov / NULLIF(var_pre, 0)) * var_pre
                - 2 * (cov / NULLIF(var_pre, 0)) * cov)
                    / {_SCALE} / {_SCALE} AS var_adj,
               1 - (var_post + (cov / NULLIF(var_pre, 0))
                    * (cov / NULLIF(var_pre, 0)) * var_pre
                    - 2 * (cov / NULLIF(var_pre, 0)) * cov)
                    / NULLIF(var_post, 0) AS var_reduction
        FROM stats
    """,
    doc="CUPED variance reduction (Deng et al. 2013) over the event"
    " stream: per-user value totals split at the stream midpoint into"
    " a PRE-period covariate and a POST-period metric; theta ="
    " cov(pre, post) / var(pre), and the adjusted metric's variance"
    " comes from the ALGEBRAIC identity var(post - theta*pre) ="
    " var_post + theta^2*var_pre - 2*theta*cov — crucially NOT from a"
    " second pass summing per-user doubles, which would be"
    " partition-order-dependent. Every moment (sums, sums of squares,"
    " cross products) is an exact integer aggregate (decimal(38) /"
    " hugeint), so the handful of final IEEE ops mirror bit-for-bit."
    " This is the experimentation-platform primitive: one scan, one"
    " user-keyed partial agg, one 6-number reduce.",
)
def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = "unix_micros(cast(ts as timestamp))"
    bounds = ev.agg(
        F.expr(f"(min({us}) + max({us})) div 2").alias("mid_us")
    )
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.expr(
                f"cast(sum(case when {us} < mid_us then"
                f" cast(round(value * {_SCALE}) as bigint) else 0 end)"
                " as bigint)"
            ).alias("pre"),
            F.expr(
                f"cast(sum(case when {us} >= mid_us then"
                f" cast(round(value * {_SCALE}) as bigint) else 0 end)"
                " as bigint)"
            ).alias("post"),
        )
    )
    # variances need at least two users; below that the experiment
    # readout is undefined and the query returns no row (mirrored)
    mom = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("pre").cast("bigint").alias("sp"),
        F.sum("post").cast("bigint").alias("ss"),
        F.expr(
            "cast(sum(cast(pre as decimal(19, 0))"
            " * cast(pre as decimal(19, 0))) as double)"
        ).alias("spp"),
        F.expr(
            "cast(sum(cast(post as decimal(19, 0))"
            " * cast(post as decimal(19, 0))) as double)"
        ).alias("sss"),
        F.expr(
            "cast(sum(cast(pre as decimal(19, 0))"
            " * cast(post as decimal(19, 0))) as double)"
        ).alias("sps"),
    ).filter(F.col("n") >= 2)
    stats = mom.select(
        "n",
        F.expr(
            "(spp - (cast(sp as double) * cast(sp as double)) / n)"
            " / (n - 1)"
        ).alias("var_pre"),
        F.expr(
            "(sss - (cast(ss as double) * cast(ss as double)) / n)"
            " / (n - 1)"
        ).alias("var_post"),
        F.expr(
            "(sps - (cast(sp as double) * cast(ss as double)) / n)"
            " / (n - 1)"
        ).alias("cov"),
        F.expr(f"cast(sp as double) / n / {_SCALE}").alias("mean_pre"),
        F.expr(f"cast(ss as double) / n / {_SCALE}").alias("mean_post"),
    )
    return stats.select(
        F.col("n").alias("n_users"),
        "mean_pre",
        "mean_post",
        F.expr("cov / nullif(var_pre, cast(0 as double))").alias("theta"),
        F.expr(f"var_post / {_SCALE} / {_SCALE}").alias("var_post"),
        F.expr(
            "(var_post + (cov / nullif(var_pre, cast(0 as double)))"
            " * (cov / nullif(var_pre, cast(0 as double))) * var_pre"
            " - 2 * (cov / nullif(var_pre, cast(0 as double))) * cov)"
            f" / {_SCALE} / {_SCALE}"
        ).alias("var_adj"),
        F.expr(
            "1 - (var_post + (cov / nullif(var_pre, cast(0 as double)))"
            " * (cov / nullif(var_pre, cast(0 as double))) * var_pre"
            " - 2 * (cov / nullif(var_pre, cast(0 as double))) * cov)"
            " / nullif(var_post, cast(0 as double))"
        ).alias("var_reduction"),
    )


# --- Mann-Whitney U rank test ----------------------------------------


@register(
    "q_mannwhitney",
    oracle=f"""
        WITH bounds AS (
            SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid_us
            FROM events
        ),
        fx AS (
            -- complete cases: a NULL value would rank NULLS LAST here
            -- but NULLS FIRST in Spark, shifting every derived rank
            SELECT event_type,
                   CAST(epoch_us(ts) < (SELECT mid_us FROM bounds)
                        AS INTEGER) AS is_old,
                   CAST(round(value * {_SCALE}) AS BIGINT) AS vfx
            FROM events
            WHERE value IS NOT NULL
        ),
        ranked AS (
            SELECT event_type, is_old, vfx,
                   rank() OVER (PARTITION BY event_type
                                ORDER BY vfx) AS min_rank,
                   count(*) OVER (PARTITION BY event_type, vfx) AS c
            FROM fx
        ),
        agg AS (
            SELECT event_type,
                   CAST(sum(is_old) AS BIGINT) AS n1,
                   CAST(sum(1 - is_old) AS BIGINT) AS n2,
                   CAST(sum(CASE WHEN is_old = 1
                            THEN 2 * min_rank + c - 1 ELSE 0 END)
                        AS BIGINT) AS r1_2
            FROM ranked GROUP BY event_type
        ),
        ties AS (
            SELECT event_type,
                   CAST(sum(CAST(c AS HUGEINT) * c * c - c) AS DOUBLE)
                       AS tie_term
            FROM (SELECT DISTINCT event_type, vfx,
                         count(*) OVER (PARTITION BY event_type, vfx)
                             AS c
                  FROM fx)
            GROUP BY event_type
        ),
        stat AS (
            SELECT a.event_type, a.n1, a.n2,
                   (CAST(a.r1_2 AS DOUBLE) / 2)
                       - (CAST(a.n1 AS DOUBLE) * (a.n1 + 1)) / 2 AS u1,
                   (CAST(a.n1 AS DOUBLE) * a.n2) / 2 AS mu,
                   (CAST(a.n1 AS DOUBLE) * a.n2 / 12)
                   * ((a.n1 + a.n2 + 1)
                      - t.tie_term / (CAST(a.n1 + a.n2 AS DOUBLE)
                                      * (a.n1 + a.n2 - 1))) AS var
            FROM agg a JOIN ties t USING (event_type)
        )
        SELECT event_type, n1 AS n_old, n2 AS n_new, u1 AS u_stat,
               (u1 - mu) / sqrt(var) AS z_score
        FROM stat
        WHERE n1 >= 1 AND n2 >= 1 AND var > 0
    """,
    doc="Mann-Whitney U (Wilcoxon rank-sum) drift test per event type"
    " between the stream's time halves — the NONPARAMETRIC location"
    " test completing the drift triptych (q_ks_drift: shape;"
    " q_welch_ttest: parametric mean; here: rank shift robust to"
    " outliers and any monotone transform). Tied ranks use average"
    " ranks kept INTEGER by doubling (2*min_rank + ties - 1), and the"
    " tie-corrected normal-approximation variance consumes an exact"
    " hugeint/decimal sum of (t^3 - t); the final z is a handful of"
    " mirrored IEEE ops, so DuckDB replays every float bit-for-bit."
    " Two windows on (type[, value]) + one partial agg.",
)
def q_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    us = "unix_micros(cast(ts as timestamp))"
    bounds = ev.agg(
        F.expr(f"(min({us}) + max({us})) div 2").alias("mid_us")
    )
    # complete cases (mirrored in the oracle): NULL value ranks NULLS
    # FIRST here but NULLS LAST in DuckDB, shifting every tied rank
    fx = (
        ev.filter(F.col("value").isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.expr(f"cast({us} < mid_us as int)").alias("is_old"),
            F.round(F.col("value") * _SCALE, 0)
            .cast("bigint")
            .alias("vfx"),
        )
    )
    wrank = Window.partitionBy("event_type").orderBy("vfx")
    wtie = Window.partitionBy("event_type", "vfx")
    ranked = fx.select(
        "event_type",
        "is_old",
        "vfx",
        F.rank().over(wrank).alias("min_rank"),
        F.count(F.lit(1)).over(wtie).alias("c"),
    )
    agg = ranked.groupBy("event_type").agg(
        F.sum("is_old").cast("bigint").alias("n1"),
        F.sum(1 - F.col("is_old")).cast("bigint").alias("n2"),
        F.sum(
            F.when(
                F.col("is_old") == 1,
                2 * F.col("min_rank") + F.col("c") - 1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("r1_2"),
    )
    ties = (
        ranked.select("event_type", "vfx", "c")
        .distinct()
        .groupBy("event_type")
        .agg(
            F.expr(
                "cast(sum(cast(c as decimal(19, 0)) * c * c - c)"
                " as double)"
            ).alias("tie_term")
        )
    )
    stat = agg.join(ties, "event_type").select(
        "event_type",
        "n1",
        "n2",
        F.expr(
            "(cast(r1_2 as double) / 2)"
            " - (cast(n1 as double) * (n1 + 1)) / 2"
        ).alias("u1"),
        F.expr("(cast(n1 as double) * n2) / 2").alias("mu"),
        F.expr(
            "(cast(n1 as double) * n2 / 12)"
            " * ((n1 + n2 + 1) - tie_term"
            " / (cast(n1 + n2 as double) * (n1 + n2 - 1)))"
        ).alias("var"),
    )
    # an empty half or an all-tied sample (var = 0) has no defined z
    # — excluded identically in both engines
    stat = stat.filter(
        (F.col("n1") >= 1) & (F.col("n2") >= 1) & (F.col("var") > 0)
    )
    return stat.select(
        "event_type",
        F.col("n1").alias("n_old"),
        F.col("n2").alias("n_new"),
        F.col("u1").alias("u_stat"),
        F.expr("(u1 - mu) / sqrt(var)").alias("z_score"),
    )


# Cramer-von Mises per-point fixed-point scale: each squared ECDF gap
# is <= 1, so addends are <= 1e12 and the int64 sum has headroom to
# ~9e6 pooled points per type; beyond that drop to 1e10 resolution.
_CVM_SCALE = 1_000_000_000_000


@register(
    "q_cvm_drift",
    oracle=f"""
        WITH bounds AS (
            SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid_us
            FROM events
        ),
        fx AS (
            SELECT event_type, event_id,
                   CAST(round(value * {_SCALE}) AS BIGINT) AS vfx,
                   CASE WHEN epoch_us(ts) < (SELECT mid_us FROM bounds)
                        THEN 1 ELSE 0 END AS h1
            FROM events
            -- complete cases: NULL value sorts NULLS LAST here but
            -- NULLS FIRST in Spark, shifting the ECDF walk
            WHERE value IS NOT NULL
        ),
        tot AS (
            SELECT event_type,
                   CAST(sum(h1) AS BIGINT) AS n1,
                   CAST(sum(1 - h1) AS BIGINT) AS n2
            FROM fx GROUP BY event_type
        ),
        cum AS (
            SELECT f.event_type, t.n1, t.n2,
                   sum(f.h1) OVER w AS c1,
                   sum(1 - f.h1) OVER w AS c2
            FROM fx f JOIN tot t USING (event_type)
            WINDOW w AS (PARTITION BY f.event_type
                         ORDER BY f.vfx, f.event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        gaps AS (
            SELECT event_type, n1, n2,
                   CAST(round(
                       (CAST(CAST(c1 * n2 - c2 * n1 AS BIGINT) AS DOUBLE)
                        / CAST(n1 * n2 AS DOUBLE))
                       * (CAST(CAST(c1 * n2 - c2 * n1 AS BIGINT) AS DOUBLE)
                          / CAST(n1 * n2 AS DOUBLE))
                       * {_CVM_SCALE}
                   ) AS BIGINT) AS g_fx
            FROM cum WHERE n1 > 0 AND n2 > 0
        )
        SELECT event_type, max(n1) AS n1, max(n2) AS n2,
               CAST(sum(g_fx) AS BIGINT) AS cvm_sum_fx,
               CAST(CAST(sum(g_fx) AS BIGINT) AS DOUBLE) / {_CVM_SCALE}
                   * CAST(max(n1) * max(n2) AS DOUBLE)
                   / CAST((max(n1) + max(n2)) * (max(n1) + max(n2))
                          AS DOUBLE) AS cvm_stat
        FROM gaps GROUP BY event_type
    """,
    doc="Two-sample Cramer-von Mises drift per event type: the L2"
    " companion to q_ks_drift's max-gap — T = n1*n2/(n1+n2)^2 *"
    " sum over pooled points of (F1-F2)^2, which catches distributed"
    " mass shifts (a fattened tail, a bimodal split) that a single"
    " supremum can miss and is the standard pairing on a drift"
    " dashboard. Each squared ECDF gap is computed from the EXACT"
    " cross-multiplied integer (c1*n2 - c2*n1) with two correctly-"
    " rounded IEEE divides, fixed-point rounded per point and summed"
    " as int64 (order-free), then the bounded coefficient applies —"
    " identical ASTs on both engines, so rows hash-match. Same"
    " single sort-window per type partition as KS; the two statistics"
    " could share one cumulative pass in a fused dashboard query.",
)
def q_cvm_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mid = ev.agg(
        F.expr(
            "(unix_micros(min(CAST(ts AS TIMESTAMP)))"
            " + unix_micros(max(CAST(ts AS TIMESTAMP)))) DIV 2"
        ).alias("mid_us")
    )
    # complete cases (mirrored in the oracle): NULL value sorts NULLS
    # FIRST here / NULLS LAST in DuckDB, shifting the ECDF walk
    fx = (
        ev.filter(F.col("value").isNotNull())
        .crossJoin(F.broadcast(mid))
        .select(
            "event_type",
            "event_id",
            F.round(F.col("value") * _SCALE, 0)
            .cast("bigint")
            .alias("vfx"),
            F.when(
                F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
                < F.col("mid_us"),
                1,
            )
            .otherwise(0)
            .alias("h1"),
        )
    )
    tot = fx.groupBy("event_type").agg(
        F.sum("h1").cast("bigint").alias("n1"),
        F.sum(F.lit(1) - F.col("h1")).cast("bigint").alias("n2"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("vfx", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = fx.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "n1",
        "n2",
        F.sum("h1").over(w).alias("c1"),
        F.sum(F.lit(1) - F.col("h1")).over(w).alias("c2"),
    )
    gap = (
        (F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
        .cast("bigint")
        .cast("double")
        / (F.col("n1") * F.col("n2")).cast("double")
    )
    gaps = cum.filter((F.col("n1") > 0) & (F.col("n2") > 0)).select(
        "event_type",
        "n1",
        "n2",
        F.round(gap * gap * _CVM_SCALE, 0).cast("bigint").alias("g_fx"),
    )
    return gaps.groupBy("event_type").agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.sum("g_fx").cast("bigint").alias("cvm_sum_fx"),
        (
            F.sum("g_fx").cast("bigint").cast("double")
            / _CVM_SCALE
            * (F.max("n1") * F.max("n2")).cast("double")
            / ((F.max("n1") + F.max("n2")) * (F.max("n1") + F.max("n2"))).cast(
                "double"
            )
        ).alias("cvm_stat"),
    )


# --- popularity rank shift -------------------------------------------


@register(
    "q_rank_shift",
    oracle="""
        WITH bounds AS (
            SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid_us
            FROM events
        ),
        halves AS (
            SELECT event_type,
                   CAST(epoch_us(ts) < (SELECT mid_us FROM bounds)
                        AS INTEGER) AS is_old
            FROM events
        ),
        counts AS (
            SELECT event_type,
                   CAST(sum(is_old) AS BIGINT) AS n_old,
                   CAST(sum(1 - is_old) AS BIGINT) AS n_new
            FROM halves GROUP BY event_type
        ),
        ranked AS (
            SELECT event_type, n_old, n_new,
                   CAST(row_number() OVER (
                       ORDER BY n_old DESC, event_type) AS BIGINT)
                       AS rank_old,
                   CAST(row_number() OVER (
                       ORDER BY n_new DESC, event_type) AS BIGINT)
                       AS rank_new
            FROM counts
        )
        SELECT event_type, n_old, n_new, rank_old, rank_new,
               rank_old - rank_new AS rank_gain
        FROM ranked
    """,
    doc="Popularity rank-shift (top movers) between the stream's first"
    " and second time halves: every event type gets its volume RANK"
    " in each half (deterministic name tiebreak) and the rank delta —"
    " the trending-up/trending-down table behind 'what changed this"
    " week' dashboards, robust to overall traffic growth because"
    " ranks, not raw counts, are compared. One scan + one"
    " (type, half) partial agg; the ranking windows run on the"
    " TYPE-cardinality table (bounded — tens of rows at any fact"
    " scale), never on raw events, so the no-partition window is the"
    " sanctioned bounded kind.",
)
def q_rank_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    us = "unix_micros(cast(ts as timestamp))"
    bounds = ev.agg(
        F.expr(f"(min({us}) + max({us})) div 2").alias("mid_us")
    )
    counts = (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.expr(f"cast({us} < mid_us as int)").alias("is_old"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("is_old").cast("bigint").alias("n_old"),
            F.sum(1 - F.col("is_old")).cast("bigint").alias("n_new"),
        )
    )
    w_old = Window.orderBy(F.desc("n_old"), F.asc("event_type"))
    w_new = Window.orderBy(F.desc("n_new"), F.asc("event_type"))
    return counts.select(
        "event_type",
        "n_old",
        "n_new",
        F.row_number().over(w_old).cast("bigint").alias("rank_old"),
        F.row_number().over(w_new).cast("bigint").alias("rank_new"),
        (
            F.row_number().over(w_old) - F.row_number().over(w_new)
        )
        .cast("bigint")
        .alias("rank_gain"),
    )


# --- local peak detection --------------------------------------------


@register(
    "q_local_peaks",
    oracle="""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2
        ),
        ctx AS (
            SELECT event_type, day, cnt,
                   lag(cnt) OVER (PARTITION BY event_type
                                  ORDER BY day) AS prev_cnt,
                   lead(cnt) OVER (PARTITION BY event_type
                                   ORDER BY day) AS next_cnt
            FROM daily
        )
        SELECT event_type, CAST(day AS TIMESTAMP) AS day, cnt,
               cnt - greatest(coalesce(prev_cnt, 0),
                              coalesce(next_cnt, 0)) AS prominence
        FROM ctx
        WHERE cnt > coalesce(prev_cnt, 0)
          AND cnt > coalesce(next_cnt, 0)
    """,
    doc="Local volume peaks per event type: days strictly above BOTH"
    " calendar neighbors (series edges compare against 0, so a"
    " spike on the first or last day still surfaces), with"
    " prominence = height over the taller neighbor — the"
    " peak-picking primitive behind incident annotation and"
    " burst-day reporting, complementing q_volume_anomaly's"
    " day-over-day deltas and q_outlier_mad's global outliers."
    " One daily partial agg; lag/lead windows partition per type"
    " over calendar-bounded rows; all comparisons are exact int64.",
)
def q_local_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    ctx = daily.select(
        "event_type",
        "day",
        "cnt",
        F.coalesce(F.lag("cnt").over(w), F.lit(0)).alias("prev_cnt"),
        F.coalesce(F.lead("cnt").over(w), F.lit(0)).alias("next_cnt"),
    )
    return ctx.filter(
        (F.col("cnt") > F.col("prev_cnt")) & (F.col("cnt") > F.col("next_cnt"))
    ).select(
        "event_type",
        "day",
        "cnt",
        (F.col("cnt") - F.greatest("prev_cnt", "next_cnt")).alias(
            "prominence"
        ),
    )


# ---------------------------------------------------------------------------
# Late-data / out-of-orderness audit (watermark sizing input)
# ---------------------------------------------------------------------------

# lateness histogram bucket upper bounds, seconds (last bucket open)
_LATE_BOUNDS = (0, 60, 600, 3600, 21600, 86400)


@register(
    "q_late_data_audit",
    oracle=f"""
        WITH seq AS (
            -- floor() the epoch on BOTH terms: DuckDB's CAST(double AS
            -- BIGINT) ROUNDS half-up, while Spark's unix_timestamp
            -- FLOORS; a sub-second component >= .5 would otherwise
            -- shift late_s by 1s and flip bucket membership at every
            -- boundary
            SELECT event_type,
                   CAST(floor(epoch(max(ts) OVER (PARTITION BY user_id
                            ORDER BY event_id
                            ROWS UNBOUNDED PRECEDING))) AS BIGINT)
                   - CAST(floor(epoch(ts)) AS BIGINT) AS late_s
            FROM events
        ),
        bucketed AS (
            SELECT event_type,
                   CASE
                       WHEN late_s <= 0 THEN 'b0_on_time'
                       WHEN late_s <= 60 THEN 'b1_1min'
                       WHEN late_s <= 600 THEN 'b2_10min'
                       WHEN late_s <= 3600 THEN 'b3_1h'
                       WHEN late_s <= 21600 THEN 'b4_6h'
                       WHEN late_s <= 86400 THEN 'b5_1d'
                       ELSE 'b6_over_1d' END AS bucket,
                   late_s
            FROM seq
        )
        SELECT event_type, bucket,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(max(late_s) AS BIGINT) AS max_late_s
        FROM bucketed
        GROUP BY event_type, bucket
    """,
    doc="Out-of-orderness audit over the event log: per event, lateness"
    " = (running max event-time so far in ARRIVAL order, per user) -"
    " own event-time; histogrammed per event type. This is the"
    " empirical input that sizes a Structured Streaming WATERMARK —"
    " pick the bucket that covers the tail you are willing to wait"
    " for, and streaming/events.py's watermarked aggregations drop"
    " exactly what this query quantifies (its APPEND-mode test"
    " demonstrates the drop). Arrival order = event_id (the log's"
    " monotone ingest key). All windows partition by user_id — narrow"
    " per-user scans, no global ordering anywhere.",
)
def q_late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    late = ev.select(
        "event_type",
        (
            F.unix_timestamp(F.max("ts").over(w))
            - F.unix_timestamp("ts")
        ).cast("bigint").alias("late_s"),
    )
    bucket = (
        F.when(F.col("late_s") <= 0, "b0_on_time")
        .when(F.col("late_s") <= 60, "b1_1min")
        .when(F.col("late_s") <= 600, "b2_10min")
        .when(F.col("late_s") <= 3600, "b3_1h")
        .when(F.col("late_s") <= 21600, "b4_6h")
        .when(F.col("late_s") <= 86400, "b5_1d")
        .otherwise("b6_over_1d")
    )
    return (
        late.withColumn("bucket", bucket)
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.max("late_s").cast("bigint").alias("max_late_s"),
        )
    )


# ---------------------------------------------------------------------------
# Freshness / staleness audit (pipeline-health primitive)
# ---------------------------------------------------------------------------

_FRESH_STALE_DAYS = 3
_FRESH_WINDOW_DAYS = 7


@register(
    "q_freshness_audit",
    oracle=f"""
        WITH mx AS (
            SELECT date_trunc('day', max(ts)) AS maxd FROM events
        ),
        per_type AS (
            SELECT event_type,
                   CAST(date_trunc('day', max(ts)) AS DATE) AS last_day,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CASE WHEN date_trunc('day', ts)
                            > (SELECT maxd FROM mx)
                              - INTERVAL {_FRESH_WINDOW_DAYS} DAY
                            THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_last_{_FRESH_WINDOW_DAYS}d
            FROM events GROUP BY event_type
        )
        SELECT event_type,
               strftime(last_day, '%Y-%m-%d') AS last_day,
               CAST(date_diff('day', last_day,
                    CAST((SELECT maxd FROM mx) AS DATE)) AS BIGINT)
                   AS days_stale,
               n_events, n_last_{_FRESH_WINDOW_DAYS}d,
               date_diff('day', last_day,
                   CAST((SELECT maxd FROM mx) AS DATE))
                   > {_FRESH_STALE_DAYS} AS is_stale
        FROM per_type
    """,
    doc="Ingest-freshness audit per event type: last observed day,"
    f" staleness in days relative to the corpus high-water mark, the"
    f" trailing-{_FRESH_WINDOW_DAYS}-day volume, and a stale flag"
    f" (> {_FRESH_STALE_DAYS} days silent) — the first page of any"
    " pipeline-health dashboard and the trigger for the quarantine /"
    " backfill runbooks (ref: the weather DAG's daily pulls,"
    " dags/bronze.py, have no freshness check at all — a dead API"
    " key goes unnoticed). ONE partial-agg pass + a 1-row broadcast"
    " high-water mark; day-truncated integer arithmetic, bit-exact.",
)
def q_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_weather_spark.sources.tables import with_event_ts

    ev = with_event_ts(load_table(spark, sf_dir, "events"))
    mx = ev.agg(F.date_trunc("day", F.max("ts")).alias("maxd"))
    per_type = (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("event_type")
        .agg(
            F.date_trunc("day", F.max("ts")).alias("last_day"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(
                F.when(
                    F.date_trunc("day", F.col("ts"))
                    > F.expr(
                        f"maxd - INTERVAL {_FRESH_WINDOW_DAYS} DAY"
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias(f"n_last_{_FRESH_WINDOW_DAYS}d"),
            F.first("maxd").alias("maxd"),
        )
    )
    stale = F.datediff(F.col("maxd"), F.col("last_day")).cast("bigint")
    return per_type.select(
        "event_type",
        # string, not DATE: date-typed output canonicalizes differently
        # across pandas bridges (datetime64 vs date) — format is stable
        F.date_format("last_day", "yyyy-MM-dd").alias("last_day"),
        stale.alias("days_stale"),
        "n_events",
        f"n_last_{_FRESH_WINDOW_DAYS}d",
        (stale > _FRESH_STALE_DAYS).alias("is_stale"),
    )


# --- Kruskal-Wallis H: k-sample rank test across ALL event types -----

# The k-sample completion of the drift triptych's pairwise tests
# (q_mannwhitney is 2-sample): one H statistic asking whether ANY of
# the k event-type populations is location-shifted, computed from
# GLOBAL average ranks. The naive form is a single table-wide window —
# the q_rfm anti-plan — so the Spark side uses the q_global_ordinal
# decomposition instead: rows bucket by a monotone coarse prefix of the
# rank key (value-range-bounded bucket count), per-bucket counts fold
# into starting offsets via one bounded window, and ranks are computed
# WITHIN buckets in parallel. Equal values always share a bucket (the
# prefix is a pure function of the value), so tie groups never
# straddle buckets and the doubled average-rank idiom
# (2*min_rank + ties - 1, the q_mannwhitney precedent) stays exact.
#
# Integer discipline: the per-type contribution R_j^2/n_j would
# overflow int64 squared, so it is computed as the exact quotient
# decomposition r2*a + (r2*r) div n (a = r2 div n, r = r2 mod n) —
# every intermediate <= 4*N^3, headroom to ~1.3e6 events at this
# resolution (the q_cvm_drift precedent: beyond that, drop a decimal
# digit of rank resolution). The final H / tie-correction are a
# handful of scalar IEEE ops on exact int64 inputs — no float SUM
# whose partial order could differ between engines.

_KW_BUCKET_DIV = 1 << 20  # value-prefix bucket width on the fx scale


@register(
    "q_kruskal_wallis",
    oracle=f"""
        WITH fx AS (
            -- complete cases: NULL value ranks NULLS LAST here but
            -- NULLS FIRST in Spark (and NULL buckets drop from the
            -- distributed offset join entirely)
            SELECT event_type,
                   CAST(round(value * {_SCALE}) AS BIGINT) AS vfx
            FROM events
            WHERE value IS NOT NULL
        ),
        ranked AS (
            SELECT event_type, vfx,
                   rank() OVER (ORDER BY vfx) AS min_rank,
                   count(*) OVER (PARTITION BY vfx) AS c
            FROM fx
        ),
        per_type AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(2 * min_rank + c - 1) AS BIGINT) AS r2_sum
            FROM ranked GROUP BY event_type
        ),
        q AS (
            SELECT event_type, n, r2_sum,
                   r2_sum * (r2_sum // n)
                       + (r2_sum * (r2_sum % n)) // n AS qj
            FROM per_type
        ),
        ties AS (
            SELECT CAST(sum(c * c * c - c) AS BIGINT) AS tie_term
            FROM (SELECT vfx, CAST(count(*) AS BIGINT) AS c
                  FROM fx GROUP BY vfx)
        ),
        tot AS (
            SELECT CAST(sum(n) AS BIGINT) AS nt,
                   CAST(sum(qj) AS BIGINT) AS sum_q
            FROM q
        )
        SELECT q.event_type, q.n, q.r2_sum,
               (3.0 * tot.sum_q)
                   / (CAST(tot.nt AS DOUBLE) * (tot.nt + 1))
                   - 3.0 * (tot.nt + 1) AS h_stat,
               ((3.0 * tot.sum_q)
                   / (CAST(tot.nt AS DOUBLE) * (tot.nt + 1))
                   - 3.0 * (tot.nt + 1))
                   / nullif(1.0 - CAST(ties.tie_term AS DOUBLE)
                            / nullif(CAST(tot.nt AS DOUBLE) * tot.nt
                                     * tot.nt - tot.nt, 0.0),
                            0.0) AS h_tied
        FROM q, tot, ties
    """,
    doc="Kruskal-Wallis H across all event types: GLOBAL doubled"
    " average ranks via the q_global_ordinal bucket decomposition"
    " (monotone value-prefix buckets, one bounded offset window,"
    " per-bucket parallel rank windows — never a table-wide window),"
    " per-type rank sums kept int64-exact through a quotient-remainder"
    " square, and the tie-corrected H as mirrored scalar IEEE ops on"
    " exact integer inputs. The oracle computes the NAIVE single-window"
    " form, so a gate pass proves the distributed decomposition"
    " bit-identical. Output: one row per event type with its n and"
    " doubled rank sum plus the (global) H and tie-corrected H.",
)
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    # complete cases (mirrored in the oracle): NULL vfx would rank
    # NULLS FIRST vs DuckDB's NULLS LAST — and worse, its NULL bucket
    # key would silently drop from the inner offset join below
    fx = ev.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.round(F.col("value") * _SCALE, 0).cast("bigint").alias("vfx"),
    )
    # r11 (guide §2.3 — aggregate before you shuffle): the raw table
    # is scanned ONCE into the (event_type, vfx) count table; the
    # distinct-value count map, the rank map, per-type rank sums and
    # the tie term all derive from aggregates of it. The old shape
    # re-derived fx per branch (vmin / per-row rank windows / ties) —
    # four passes over raw events and two per-row windows; every
    # window below runs on the bounded distinct-value / bucket lists.
    tv = fx.groupBy("event_type", "vfx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tv")
    )
    cnts = tv.groupBy("vfx").agg(F.sum("n_tv").alias("c"))
    # monotone non-negative bucket key: equal vfx => equal bucket, and
    # bucket order respects vfx order (offset makes the div a floor)
    vmin = cnts.agg(F.min("vfx").alias("vmin"))
    bcnts = cnts.crossJoin(F.broadcast(vmin)).withColumn(
        "bucket", F.expr(f"(vfx - vmin) div {_KW_BUCKET_DIV}")
    )
    # bounded offset window: one row per occupied value-range bucket
    # (range/2^20 rows), never the raw table
    w_off = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        bcnts.groupBy("bucket")
        .agg(F.sum("c").alias("bn"))
        .select(
            "bucket",
            F.coalesce(F.sum("bn").over(w_off), F.lit(0)).alias("off"),
        )
    )
    # min rank of a value = rows in earlier buckets + smaller values'
    # counts within its bucket + 1 — identical to the oracle's global
    # rank() because equal vfx share a bucket and buckets are monotone
    w_less = (
        Window.partitionBy("bucket")
        .orderBy("vfx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rank_map = (
        bcnts.join(F.broadcast(offsets), "bucket")
        .select(
            "vfx",
            "c",
            (
                F.col("off")
                + F.coalesce(F.sum("c").over(w_less), F.lit(0))
                + 1
            ).alias("min_rank"),
        )
    )
    # per-type sums as exact integer products: every raw row with this
    # (event_type, vfx) contributes the same 2*min_rank + c - 1
    per_type = (
        tv.join(rank_map, "vfx")
        .groupBy("event_type")
        .agg(
            F.sum("n_tv").cast("bigint").alias("n"),
            F.sum(
                F.col("n_tv")
                * (2 * F.col("min_rank") + F.col("c") - 1)
            )
            .cast("bigint")
            .alias("r2_sum"),
        )
    )
    q = per_type.select(
        "event_type",
        "n",
        "r2_sum",
        F.expr(
            "r2_sum * (r2_sum div n) + (r2_sum * (r2_sum % n)) div n"
        ).alias("qj"),
    )
    ties = cnts.agg(
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("bigint")
        .alias("tie_term")
    )
    tot = q.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("qj").cast("bigint").alias("sum_q"),
    )
    h = (
        "(3.0 * sum_q) / (CAST(nt AS DOUBLE) * (nt + 1))"
        " - 3.0 * (nt + 1)"
    )
    return (
        q.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ties))
        .select(
            "event_type",
            "n",
            "r2_sum",
            F.expr(h).alias("h_stat"),
            F.expr(
                f"({h}) / nullif(1.0 - CAST(tie_term AS DOUBLE)"
                " / nullif(CAST(nt AS DOUBLE) * nt * nt - nt, 0.0),"
                " 0.0)"
            ).alias("h_tied"),
        )
    )


# ---------------------------------------------------------------------------
# Heavy changers between time halves (round 9)
# ---------------------------------------------------------------------------

_HC_TOPK = 20


@register(
    "q_heavy_change",
    oracle=f"""
        WITH b AS (
            SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid
            FROM events
            WHERE user_id IS NOT NULL
        ),
        per_user AS (
            SELECT user_id,
                   CAST(sum(CASE WHEN epoch_us(ts) < (SELECT mid FROM b)
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
                   CAST(sum(CASE WHEN epoch_us(ts) >= (SELECT mid FROM b)
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_new
            FROM events
            WHERE user_id IS NOT NULL
            GROUP BY user_id
        )
        SELECT user_id, n_old, n_new,
               abs(n_new - n_old) AS abs_change
        FROM per_user
        ORDER BY abs_change DESC, user_id
        LIMIT {_HC_TOPK}
    """,
    doc="Heavy CHANGERS (not heavy hitters): the top-"
    f"{_HC_TOPK} users by absolute activity-count change between the"
    " stream's time halves — the key-level drill-down behind"
    " q_volume_anomaly's aggregate alarm (which segment moved the"
    " metric). Exact conditional counts in one partial-agg shuffle,"
    " then a deterministic TakeOrdered top-k (|delta| desc, user_id"
    " tiebreak) — never a global rank window, so at 100 TB the"
    " reduction is per-partition heaps merging k rows at the driver."
    " The sketch-space analog (two CMS snapshots differenced) lives"
    " in operators/cms.py; this exact form is its ground truth.",
)
def q_heavy_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    us = "unix_micros(cast(ts as timestamp))"
    bounds = ev.agg(
        F.expr(f"(min({us}) + max({us})) div 2").alias("mid")
    )
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.sum(F.expr(f"CASE WHEN {us} < mid THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_old"),
            F.sum(F.expr(f"CASE WHEN {us} >= mid THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_new"),
        )
    )
    return (
        per_user.select(
            "user_id",
            "n_old",
            "n_new",
            F.abs(F.col("n_new") - F.col("n_old")).alias("abs_change"),
        )
        .orderBy(F.col("abs_change").desc(), "user_id")
        .limit(_HC_TOPK)
    )
