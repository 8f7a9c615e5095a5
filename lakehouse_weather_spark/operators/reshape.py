"""Reshaping + subquery + null-semantics operators (DERIVED closure):
pivot/unpivot, correlated subqueries (Catalyst decorrelation), and the
SQL null-handling surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "q_pivot_events",
    oracle=f"""
        SELECT user_id,
               {", ".join(f"count(*) FILTER (WHERE event_type = '{t}') AS {t}"
                          for t in EVENT_TYPES)}
        FROM events
        GROUP BY user_id
    """,
    doc="Pivot: per-user event-type count matrix (wide feature table)."
    " Explicit value list keeps the output schema static — mandatory at"
    " scale (dynamic pivot needs an extra distinct pass).",
)
def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
        .na.fill(0, list(EVENT_TYPES))
    )


@register(
    "q_unpivot",
    oracle="""
        SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS value
        FROM lineitem WHERE l_orderkey % 991 = 0
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount', l_discount
        FROM lineitem WHERE l_orderkey % 991 = 0
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'tax', l_tax
        FROM lineitem WHERE l_orderkey % 991 = 0
    """,
    doc="Unpivot/melt: wide metric columns to long (metric, value) rows"
    " — the feature-store long format. Spark's unpivot is a zero-shuffle"
    " Expand.",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 991 == 0)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "metric",
        "value",
    ).withColumn(
        "metric",
        F.when(F.col("metric") == "l_quantity", "quantity")
        .when(F.col("metric") == "l_discount", "discount")
        .otherwise("tax"),
    )


@register(
    "q_scalar_subquery",
    oracle="""
        SELECT c_custkey, c_acctbal,
               (SELECT max(o.o_totalprice) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS max_order_price
        FROM customer c
        WHERE c_acctbal > 9000
    """,
    doc="Correlated scalar subquery: each customer's max order value."
    " Catalyst decorrelates to an aggregate + left outer join — no"
    " per-row execution (check the plan: one join, not N subqueries).",
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal,
               (SELECT max(o.o_totalprice) FROM v_orders o
                WHERE o.o_custkey = c.c_custkey) AS max_order_price
        FROM v_customer c
        WHERE c_acctbal > 9000
        """
    )


@register(
    "q_exists_subquery",
    oracle="""
        SELECT p_partkey, p_name
        FROM part p
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 49)
    """,
    doc="EXISTS subquery (decorrelates to left-semi join): parts ever"
    " ordered at max quantity.",
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "part").createOrReplaceTempView("v_part")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_name
        FROM v_part p
        WHERE EXISTS (SELECT 1 FROM v_lineitem l
                      WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 49)
        """
    )


@register(
    "q_null_semantics",
    oracle="""
        SELECT doc_id,
               nullif(lang, 'en') AS maybe_lang,
               coalesce(nullif(lang, 'en'), 'fallback') AS with_fallback,
               (nullif(lang, 'en') IS NULL) AS is_null_flag,
               (nullif(lang, 'en') IS NOT DISTINCT FROM 'es') AS null_safe_eq_es,
               CASE WHEN nullif(lang, 'en') IS NOT NULL THEN 'has_value'
                    ELSE 'was_null' END AS nvl2_style
        FROM documents
    """,
    doc="Null-handling surface: nullif/coalesce/IS NULL/null-safe"
    " equality (<=>)/nvl2-style branching — the semantics the"
    " reference's defensive dict.get defaults imply (seed_milvus.py:"
    "53-59), as three-valued SQL logic.",
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    maybe = F.nullif(F.col("lang"), F.lit("en"))
    return docs.select(
        "doc_id",
        maybe.alias("maybe_lang"),
        F.coalesce(maybe, F.lit("fallback")).alias("with_fallback"),
        maybe.isNull().alias("is_null_flag"),
        maybe.eqNullSafe(F.lit("es")).alias("null_safe_eq_es"),
        F.when(maybe.isNotNull(), "has_value").otherwise("was_null").alias("nvl2_style"),
    )


# ---------------------------------------------------------------------------
# Time-series resampling: regular grid + zero-fill + forward-fill
# ---------------------------------------------------------------------------


@register(
    "q_resample_ffill",
    oracle="""
        WITH hours AS (
            SELECT unnest(generate_series(
                (SELECT date_trunc('hour', min(ts)) FROM events),
                (SELECT date_trunc('hour', max(ts)) FROM events),
                INTERVAL 1 HOUR)) AS hour
        ),
        types AS (SELECT DISTINCT event_type FROM events),
        grid AS (SELECT event_type, hour FROM types CROSS JOIN hours),
        agg AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   CAST(count(*) AS BIGINT) AS cnt,
                   CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS DOUBLE)
                       / 10000 / count(*) AS avg_value
            FROM events GROUP BY 1, 2
        )
        SELECT g.event_type, g.hour,
               CAST(coalesce(a.cnt, 0) AS BIGINT) AS n_events,
               last_value(a.avg_value IGNORE NULLS) OVER (
                   PARTITION BY g.event_type ORDER BY g.hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS avg_value_ffill
        FROM grid g LEFT JOIN agg a
          ON g.event_type = a.event_type AND g.hour = a.hour
    """,
    doc="Time-series resampling per event_type: a dense hourly grid"
    " (sequence between global min/max hour — two scalars broadcast),"
    " zero-filled counts, and forward-filled hourly mean value via"
    " last-non-null over an ordered window. The gap-filling shape"
    " feature pipelines and monitors need; the window partitions by"
    " key so no global sort, and the mean uses fixed-point dsum so the"
    " forward-filled doubles oracle-match bit-for-bit.",
)
def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz")
    agg = ev.groupBy(
        "event_type", hour.alias("hour")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        (
            F.sum(F.expr("CAST(round(value * 10000, 0) AS BIGINT)"))
            .cast("double")
            / 10000
            / F.count(F.lit(1))
        ).alias("avg_value"),
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).cast("timestamp_ntz").alias("lo"),
        F.date_trunc("hour", F.max("ts")).cast("timestamp_ntz").alias("hi"),
    )
    types = ev.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.expr("sequence(lo, hi, interval 1 hour)")
            ).alias("hour"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(agg, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce("cnt", F.lit(0)).cast("bigint").alias("n_events"),
            F.last("avg_value", ignorenulls=True)
            .over(w)
            .alias("avg_value_ffill"),
        )
    )


# ---------------------------------------------------------------------------
# Gaps-and-islands: merge overlapping per-user activity intervals
# ---------------------------------------------------------------------------


@register(
    "q_interval_merge",
    oracle="""
        WITH iv AS (
            SELECT user_id, ts AS s,
                   ts + to_seconds(CAST(round(value * 3600) AS BIGINT)) AS e
            FROM events
        ),
        flagged AS (
            SELECT user_id, s, e,
                   CASE WHEN s > max(e) OVER (
                       PARTITION BY user_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) THEN 1 ELSE 0 END AS new_island
            FROM iv
        ),
        islands AS (
            SELECT user_id, s, e,
                   sum(new_island) OVER (
                       PARTITION BY user_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS island_id
            FROM flagged
        )
        SELECT user_id, CAST(island_id AS BIGINT) AS island_id,
               min(s) AS island_start, max(e) AS island_end,
               CAST(count(*) AS BIGINT) AS n_events
        FROM islands
        GROUP BY user_id, island_id
    """,
    doc="Gaps-and-islands interval union: each event opens an activity"
    " interval [ts, ts + value*3600 s]; overlapping intervals per user"
    " merge into islands via the running-max-of-end window (an island"
    " starts exactly when a start exceeds every previous end). One"
    " key-partitioned sort + one groupBy — the coverage/uptime/session"
    " primitive that naive self-joins make O(n^2). Timestamp compares"
    " are exact, so island boundaries oracle-match.",
)
def q_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.col("ts").alias("s"),
        F.expr(
            "ts + make_dt_interval(0, 0, 0, CAST(round(value * 3600, 0) AS BIGINT))"
        ).alias("e"),
    )
    prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    running = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(F.col("s") > F.max("e").over(prev), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "island_id", F.sum("new_island").over(running).cast("bigint")
    )
    return islands.groupBy("user_id", "island_id").agg(
        F.min("s").alias("island_start"),
        F.max("e").alias("island_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


@register(
    "q_not_in_nulls",
    oracle="""
        WITH probe AS (
            SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
                        ELSE o_custkey END AS k
            FROM orders WHERE o_orderstatus = 'F'
        )
        SELECT 'not_in' AS variant, CAST(count(*) AS BIGINT) AS n
        FROM customer WHERE c_custkey NOT IN (SELECT k FROM probe)
        UNION ALL
        SELECT 'not_exists', CAST(count(*) AS BIGINT)
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM probe p WHERE p.k = c.c_custkey)
        UNION ALL
        SELECT 'not_in_null_filtered', CAST(count(*) AS BIGINT)
        FROM customer
        WHERE c_custkey NOT IN (SELECT k FROM probe WHERE k IS NOT NULL)
    """,
    doc="The NOT IN null trap, pinned as behavior: a NULL in the"
    " subquery makes `x NOT IN (...)` UNKNOWN for every row (count 0),"
    " while NOT EXISTS and the null-filtered NOT IN return the real"
    " anti-join count. Spark plans NOT IN as a null-aware anti join"
    " (expensive at scale — another reason to prefer NOT EXISTS); both"
    " engines implement identical three-valued logic, so all three"
    " counts oracle-match.",
)
def q_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}_nin")
    return spark.sql(
        """
        WITH probe AS (
            SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
                        ELSE o_custkey END AS k
            FROM v_orders_nin WHERE o_orderstatus = 'F'
        )
        SELECT 'not_in' AS variant, CAST(count(*) AS BIGINT) AS n
        FROM v_customer_nin WHERE c_custkey NOT IN (SELECT k FROM probe)
        UNION ALL
        SELECT 'not_exists', CAST(count(*) AS BIGINT)
        FROM v_customer_nin c
        WHERE NOT EXISTS (SELECT 1 FROM probe p WHERE p.k = c.c_custkey)
        UNION ALL
        SELECT 'not_in_null_filtered', CAST(count(*) AS BIGINT)
        FROM v_customer_nin
        WHERE c_custkey NOT IN (SELECT k FROM probe WHERE k IS NOT NULL)
        """
    )


@register(
    "q_scd2_intervals",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type AS state, ts, event_id,
                   lag(event_type) OVER w AS prev_state
            FROM events
            WHERE ts IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        changes AS (
            SELECT user_id, state, ts AS valid_from, event_id
            FROM ordered
            WHERE prev_state IS NULL OR state <> prev_state
        )
        SELECT user_id, state,
               CAST(valid_from AS TIMESTAMP) AS valid_from,
               CAST(lead(valid_from) OVER (
                   PARTITION BY user_id ORDER BY valid_from, event_id
               ) AS TIMESTAMP) AS valid_to,
               (lead(valid_from) OVER (
                   PARTITION BY user_id ORDER BY valid_from, event_id
               ) IS NULL) AS is_current
        FROM changes
    """,
    doc="SCD2 (slowly-changing-dimension) interval construction from a"
    " change log: consecutive repeats of the same state compress away"
    " (lag-change filter), each surviving change opens a validity"
    " interval closed by the next change's timestamp (lead), the last"
    " one staying open as is_current — the dimension-history shape"
    " MERGE-based SCD2 pipelines maintain. Two key-partitioned windows"
    " on a total order, no self-join; timestamps compare exactly, so"
    " the interval table oracle-matches.",
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # complete case (NULLS.md tier 1): a change record with NULL ts
    # cannot open or close a validity interval
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev_state"),
    )
    changes = ordered.filter(
        F.col("prev_state").isNull() | (F.col("state") != F.col("prev_state"))
    ).select("user_id", "state", F.col("ts").alias("valid_from"), "event_id")
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    nxt = F.lead("valid_from").over(w2)
    return changes.select(
        "user_id",
        "state",
        "valid_from",
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# LATERAL correlated top-N per group
# ---------------------------------------------------------------------------

LATERAL_TOPN = 2

# Identical SQL text on Spark (native LATERAL subquery) and the DuckDB
# oracle; only the table names differ (temp views vs parquet views).
_LATERAL_SQL = f"""
    SELECT c.c_custkey,
           t.o_orderkey,
           t.o_totalprice
    FROM {{customer}} c,
    LATERAL (
        SELECT o_orderkey, o_totalprice FROM {{orders}} o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT {LATERAL_TOPN}
    ) t
"""


@register(
    "q_lateral_topk",
    oracle=_LATERAL_SQL.format(customer="customer", orders="orders"),
    doc=f"Correlated LATERAL subquery: top-{LATERAL_TOPN} orders per"
    " customer with the per-customer LIMIT INSIDE the lateral body —"
    " the SQL-standard spelling of top-N-per-group that q_win_rownum"
    " expresses with a window. Spark decorrelates the lateral into a"
    " ranked join (no per-row re-execution), so the physical plan is"
    " the same shuffle+rank shape as the window form and scales the"
    " same way; customers WITHOUT orders drop out (inner lateral),"
    " which the window form needs an extra join to express. Identical"
    " SQL text runs on both engines.",
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "lws_lat_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "lws_lat_orders"
    )
    return spark.sql(
        _LATERAL_SQL.format(
            customer="lws_lat_customer", orders="lws_lat_orders"
        )
    )


@register(
    "q_resample_linear",
    oracle="""
        WITH hours AS (
            SELECT unnest(generate_series(
                (SELECT date_trunc('hour', min(ts)) FROM events),
                (SELECT date_trunc('hour', max(ts)) FROM events),
                INTERVAL 1 HOUR)) AS hour
        ),
        types AS (SELECT DISTINCT event_type FROM events),
        grid AS (SELECT event_type, hour FROM types CROSS JOIN hours),
        agg AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   CAST(count(*) AS BIGINT) AS cnt,
                   CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS DOUBLE)
                       / 10000 / count(*) AS avg_value
            FROM events GROUP BY 1, 2
        ),
        ctx AS (
            SELECT g.event_type, g.hour,
                   CAST(coalesce(a.cnt, 0) AS BIGINT) AS n_events,
                   last_value(a.avg_value IGNORE NULLS) OVER (
                       PARTITION BY g.event_type ORDER BY g.hour
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS v_prev,
                   last_value(a.hour IGNORE NULLS) OVER (
                       PARTITION BY g.event_type ORDER BY g.hour
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS h_prev,
                   first_value(a.avg_value IGNORE NULLS) OVER (
                       PARTITION BY g.event_type ORDER BY g.hour
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS v_next,
                   first_value(a.hour IGNORE NULLS) OVER (
                       PARTITION BY g.event_type ORDER BY g.hour
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS h_next
            FROM grid g LEFT JOIN agg a
              ON g.event_type = a.event_type AND g.hour = a.hour
        )
        SELECT event_type, hour, n_events,
               CASE
                   WHEN v_prev IS NULL THEN v_next
                   WHEN v_next IS NULL THEN v_prev
                   WHEN h_next = h_prev THEN v_prev
                   ELSE v_prev + (v_next - v_prev) *
                        (CAST(date_diff('hour', h_prev, hour) AS DOUBLE)
                         / CAST(date_diff('hour', h_prev, h_next)
                                AS DOUBLE))
               END AS avg_value_interp
        FROM ctx
    """,
    doc="Time-series resampling with LINEAR interpolation — the"
    " numeric companion to q_resample_ffill: gaps in the hourly grid"
    " take the straight line between the surrounding observed hourly"
    " means (leading gaps back-fill, trailing gaps forward-fill)."
    " Neighbor values and hours come from the same ignore-nulls"
    " window pair running both directions over the per-type grid;"
    " the interpolation weight is an exact integer hour-gap ratio"
    " evaluated as the IDENTICAL IEEE expression in both engines, so"
    " even the interpolated doubles hash-match. Windows partition by"
    " type (parallel); the grid is calendar x types bounded.",
)
def q_resample_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz")
    agg = ev.groupBy("event_type", hour.alias("hour")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        (
            F.sum(F.expr("CAST(round(value * 10000, 0) AS BIGINT)"))
            .cast("double")
            / 10000
            / F.count(F.lit(1))
        ).alias("avg_value"),
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).cast("timestamp_ntz").alias("lo"),
        F.date_trunc("hour", F.max("ts")).cast("timestamp_ntz").alias("hi"),
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias(
                "hour"
            ),
        )
    )
    joined = grid.join(
        agg.select(
            "event_type",
            F.col("hour").alias("obs_hour"),
            "cnt",
            "avg_value",
        ),
        (grid["event_type"] == agg["event_type"])
        & (grid["hour"] == F.col("obs_hour")),
        "left",
    ).select(grid["event_type"], grid["hour"], "obs_hour", "cnt", "avg_value")
    wb = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ctx = joined.select(
        "event_type",
        "hour",
        F.coalesce("cnt", F.lit(0)).cast("bigint").alias("n_events"),
        F.last("avg_value", ignorenulls=True).over(wb).alias("v_prev"),
        F.last("obs_hour", ignorenulls=True).over(wb).alias("h_prev"),
        F.first("avg_value", ignorenulls=True).over(wf).alias("v_next"),
        F.first("obs_hour", ignorenulls=True).over(wf).alias("h_next"),
    )
    hrs = lambda a, b: F.expr(  # noqa: E731
        f"(unix_micros(cast({b} as timestamp))"
        f" - unix_micros(cast({a} as timestamp))) div 3600000000"
    )
    interp = (
        F.when(F.col("v_prev").isNull(), F.col("v_next"))
        .when(F.col("v_next").isNull(), F.col("v_prev"))
        .when(F.col("h_next") == F.col("h_prev"), F.col("v_prev"))
        .otherwise(
            F.col("v_prev")
            + (F.col("v_next") - F.col("v_prev"))
            * (
                hrs("h_prev", "hour").cast("double")
                / hrs("h_prev", "h_next").cast("double")
            )
        )
    )
    return ctx.select(
        "event_type", "hour", "n_events", interp.alias("avg_value_interp")
    )
