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
