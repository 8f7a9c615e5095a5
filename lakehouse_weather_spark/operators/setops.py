"""Set operations (SURVEY.md §2.7 — DERIVED closure; dedup ops live in
``dedup.py``).

SQL UNION/INTERSECT/EXCEPT have DISTINCT semantics — mapped to
``union().distinct()``, ``intersect()``, ``subtract()``. Spark plans all
three as hash aggregates / left-semi/anti joins on the full row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table


def _cust_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .selectExpr("c_nationkey AS nationkey")
    )


def _supp_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "supplier")
        .selectExpr("s_nationkey AS nationkey")
    )


@register(
    "q_set_union",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="UNION (distinct): nations having customers or suppliers.",
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct()


@register(
    "q_set_intersect",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="INTERSECT: nations having both customers and suppliers.",
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@register(
    "q_set_except",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000
    """,
    doc="EXCEPT (distinct): nations with rich customers but no rich"
    " suppliers (filtered so the result is non-empty at every SF).",
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    rich_cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .selectExpr("c_nationkey AS nationkey")
    )
    rich_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .selectExpr("s_nationkey AS nationkey")
    )
    return rich_cust.subtract(rich_supp)


@register(
    "q_set_intersect_all",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT ALL
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="INTERSECT ALL (bag semantics): each nationkey keeps"
    " min(multiplicity_left, multiplicity_right) copies — the SQL bag"
    " intersection Spark implements as a counted left-semi hash join"
    " (df.intersectAll). Completes the §2.7 set-op family alongside"
    " the DISTINCT forms.",
)
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).intersectAll(
        _supp_nations(spark, sf_dir)
    )


@register(
    "q_set_except_all",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
        EXCEPT ALL
        SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000
    """,
    doc="EXCEPT ALL (bag semantics): multiplicity-aware difference —"
    " each key keeps max(left_count - right_count, 0) copies"
    " (df.exceptAll). The bag twin of q_set_except, same filtered"
    " inputs so the result is non-empty at every SF.",
)
def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    rich_cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .selectExpr("c_nationkey AS nationkey")
    )
    rich_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .selectExpr("s_nationkey AS nationkey")
    )
    return rich_cust.exceptAll(rich_supp)
