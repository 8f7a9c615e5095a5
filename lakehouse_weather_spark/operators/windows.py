"""Window-function queries (SURVEY.md §2.5).

The reference computes a chunk ordinal implicitly via split order
(``dags/utils/chunks_data.py:102``; int64 chunk-index field 106 in the
Milvus segment) — i.e. row_number over (partition by source, order by
position). Windows shuffle once on the partition key; order keys are
fully deterministic (unique tiebreakers) so results are stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table


@register(
    "q_win_rownum",
    oracle="""
        SELECT doc_id, source,
               CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS INTEGER) AS rn,
               CAST(rank() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS INTEGER) AS rnk
        FROM documents
    """,
    doc="row_number/rank per partition — the chunk-ordinal-per-source"
    " pattern (chunks_data.py:102) as an explicit window.",
)
def q_win_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w1 = Window.partitionBy("source").orderBy("doc_id")
    w2 = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    return docs.select(
        "doc_id",
        "source",
        F.row_number().over(w1).alias("rn"),
        F.rank().over(w2).alias("rnk"),
    )


@register(
    "q_win_rank_stats",
    oracle="""
        SELECT o_orderkey, o_orderpriority,
               CAST(ntile(4) OVER w AS INTEGER) AS price_quartile,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cdist
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey)
    """,
    doc="Rank statistics per group: ntile quartiles, percent_rank,"
    " cume_dist over order value (price-band features). Deterministic"
    " via the o_orderkey tiebreak; the ratio outputs are exact"
    " divisions of identical ints.",
)
def q_win_rank_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("price_quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
    )


@register(
    "q_win_laglead",
    oracle="""
        SELECT event_id, user_id, value,
               value - lag(value) OVER
                     (PARTITION BY user_id
                      ORDER BY ts NULLS FIRST, event_id) AS delta,
               lead(event_type) OVER
                     (PARTITION BY user_id
                      ORDER BY ts NULLS FIRST, event_id) AS next_type
        FROM events
    """,
    doc="lag/lead per user ordered by event time (event deltas; chunk"
    " overlap-check analogue). event_id tiebreaker keeps it deterministic;"
    " the delta subtraction is a single IEEE op — bit-stable everywhere."
    " NULL ts placement is PINNED (NULLS FIRST on both engines, the"
    " NULLS.md ordering rule): Spark defaults NULLS FIRST asc, DuckDB"
    " NULLS LAST, so an unpinned NULL event-time would shift every"
    " lag/lead in its user partition between engines.",
)
def q_win_laglead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_first("ts"), "event_id"
    )
    return ev.select(
        "event_id",
        "user_id",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "q_win_frame",
    oracle="""
        SELECT event_id, user_id,
               CAST(sum(CAST(round(value * 10000) AS BIGINT))
                        OVER (PARTITION BY user_id
                              ORDER BY ts NULLS FIRST, event_id
                              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
                   / 10000
                   / count(*) OVER (PARTITION BY user_id
                              ORDER BY ts NULLS FIRST, event_id
                              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS moving_avg,
               CAST(sum(CAST(round(value * 10000) AS BIGINT))
                        OVER (PARTITION BY user_id
                              ORDER BY ts NULLS FIRST, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) / 10000 AS running_sum
        FROM events
    """,
    doc="Sliding-frame aggregates: 5-row moving average + running sum per"
    " user. Frame sums accumulate fixed-point (see functions.dsum) so the"
    " result is independent of the engine's frame-evaluation algorithm"
    " (running vs segment-tree). NULL ts placement pinned NULLS FIRST"
    " on both engines (NULLS.md ordering rule).",
)
def q_win_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_first("ts"), "event_id"
    )
    vfx = F.round(F.col("value") * 10000, 0).cast("bigint")
    frame5 = w.rowsBetween(-4, 0)
    running = w.rowsBetween(Window.unboundedPreceding, 0)
    return ev.select(
        "event_id",
        "user_id",
        (
            F.sum(vfx).over(frame5).cast("double") / 10000
            / F.count(F.lit(1)).over(frame5)
        ).alias("moving_avg"),
        (F.sum(vfx).over(running).cast("double") / 10000).alias("running_sum"),
    )


@register(
    "q_win_distribution",
    oracle="""
        SELECT o_orderkey, o_orderpriority,
               percent_rank() OVER w AS pr,
               cume_dist() OVER w AS cd,
               CAST(ntile(4) OVER w AS INTEGER) AS quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey)
    """,
    doc="Distribution window functions (percent_rank / cume_dist /"
    " ntile) per order priority — the relative-standing surface"
    " (percentile features for ML, quartile bucketing). The ORDER BY"
    " includes the key so every row has a unique rank: ntile and the"
    " rank ratios are then deterministic and engine-portable. One"
    " shuffle on the partition key; ANSI semantics in both engines.",
)
def q_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "q_win_navigation",
    oracle="""
        SELECT event_id, user_id,
               first_value(event_type) OVER w AS first_type,
               last_value(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS final_type,
               nth_value(event_id, 3) OVER (
                   PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS third_event_id,
               last_value(CASE WHEN value >= 0.5 THEN value END IGNORE NULLS)
                   OVER w AS last_big_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="Window navigation surface: first_value, whole-frame last_value"
    " and nth_value, and running last-non-null (IGNORE NULLS) — the"
    " carry-forward primitive — per user over a TOTAL order"
    " (ts, event_id), so every function is deterministic and"
    " oracle-exact. One key-partitioned sort, no global window."
    " NULL ts placement pinned NULLS FIRST on both engines"
    " (NULLS.md ordering rule).",
)
def q_win_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    running = (
        Window.partitionBy("user_id")
        .orderBy(F.asc_nulls_first("ts"), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    full = (
        Window.partitionBy("user_id")
        .orderBy(F.asc_nulls_first("ts"), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    big = F.when(F.col("value") >= 0.5, F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        F.first("event_type").over(running).alias("first_type"),
        F.last("event_type").over(full).alias("final_type"),
        F.nth_value("event_id", 3).over(full).alias("third_event_id"),
        F.last(big, ignorenulls=True).over(running).alias("last_big_value"),
    )


@register(
    "q_point_in_time_features",
    oracle="""
        SELECT event_id, user_id, ts,
               CAST(count(*) OVER w AS BIGINT) AS n_prior_events,
               CAST(coalesce(sum(CAST(round(value * 10000) AS BIGINT))
                             OVER w, 0) AS DOUBLE) / 10000
                   AS prior_value_total,
               CAST(coalesce(sum(CASE WHEN event_type = 'error'
                                      THEN 1 ELSE 0 END) OVER w, 0)
                    AS BIGINT) AS n_prior_errors
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        QUALIFY event_type = 'purchase'
    """,
    doc="Point-in-time-correct feature join: for every purchase, the"
    " user's feature state computed from STRICTLY EARLIER events only"
    " (frame ends at 1 PRECEDING over the total (ts, event_id) order)"
    " — the leakage guarantee feature stores call PIT correctness,"
    " which a naive join to a feature snapshot silently violates. One"
    " key-partitioned window, fixed-point value totals, oracle-exact.",
)
def q_point_in_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    zero = F.lit(0).cast("bigint")
    return (
        ev.select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            F.count(F.lit(1)).over(w).cast("bigint").alias("n_prior_events"),
            (
                F.coalesce(
                    F.sum(
                        F.expr("CAST(round(value * 10000, 0) AS BIGINT)")
                    ).over(w),
                    zero,
                ).cast("double")
                / 10000
            ).alias("prior_value_total"),
            F.coalesce(
                F.sum(
                    F.when(F.col("event_type") == "error", 1).otherwise(0)
                ).over(w),
                zero,
            )
            .cast("bigint")
            .alias("n_prior_errors"),
        )
        .filter(F.col("event_type") == "purchase")
        .drop("event_type")
    )
