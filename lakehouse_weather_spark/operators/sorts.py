"""Sort / limit / top-k queries (SURVEY.md §2.6 — DERIVED; the reference
processes objects in S3-listing order, ``minio_io_manager.py:192``).

Top-k uses a deterministic tiebreaker so the selected SET is stable;
Spark executes it as TakeOrderedAndProject (per-partition heaps, no full
sort) — the right plan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table


@register(
    "q_sort",
    oracle="""
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
    """,
    doc="Global sort (range-partitioned exchange + per-partition sort)."
    " Driver compare is order-insensitive; the sort is the semantic.",
)
def q_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    )


@register(
    "q_topk",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    doc="Top-k: TakeOrderedAndProject (per-partition heap of 100, merge"
    " on driver) — never a full sort. o_orderkey tiebreaker makes the"
    " top-100 set deterministic.",
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q_global_ordinal",
    oracle="""
        SELECT event_id,
               CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT)
                   AS ordinal
        FROM events
        WHERE ts IS NOT NULL
    """,
    doc="Scalable GLOBAL row numbering — the pattern that replaces the"
    " row_number()-over-no-partition anti-plan (which funnels the whole"
    " table through ONE task). Rows bucket by a coarse prefix of the"
    " sort key (the event DAY — any bucketing that respects the global"
    " order works), per-bucket counts aggregate into a tiny table,"
    " a cumulative window over that BOUNDED bucket list yields each"
    " bucket's starting offset, offsets broadcast-join back, and the"
    " ordinal is offset + row_number WITHIN the bucket. The only"
    " unbounded windows are per-bucket (parallel across days); at"
    " 100 TB you tighten the bucket to the hour and nothing else"
    " changes. The oracle is the naive single-window form, so the gate"
    " proves the distributed decomposition is bit-identical to it.",
)
def q_global_ordinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from lakehouse_weather_spark.sources.tables import load_table as _lt

    # complete case (NULLS.md tier 1): the ordinal IS the time order —
    # a NULL ts has no position, and its NULL day-bucket would also
    # drop silently from the offsets equi-join on one engine only
    ev = (
        _lt(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("event_id", "ts", F.to_date("ts").alias("bucket"))
    )
    counts = ev.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    # cumulative offsets over the BOUNDED per-day count list (#days
    # rows — the sanctioned bounded-window shape, never the raw table)
    w_off = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "bucket", F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("off")
    )
    w_in = Window.partitionBy("bucket").orderBy("ts", "event_id")
    return (
        ev.join(F.broadcast(offsets), "bucket")
        .select(
            "event_id",
            (F.col("off") + F.row_number().over(w_in))
            .cast("bigint")
            .alias("ordinal"),
        )
    )
