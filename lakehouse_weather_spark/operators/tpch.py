"""Classic multi-join analytic queries (TPC-H-shaped; DERIVED closure).

These exercise what single-operator queries can't: join ordering,
broadcast selection across 3-6 tables, aggregate-after-join, and
top-k-after-aggregate. Catalyst + AQE pick the physical plan; the
assertions in tests/test_plans.py keep the dimensions broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.functions import dsum, sql_dsum
from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table


@register(
    "q_tpch_q3",
    oracle=f"""
        SELECT l.l_orderkey,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
               o.o_orderdate, o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
          AND l.l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
    """,
    doc="TPC-H Q3 shape (shipping priority): 3-way join with selective"
    " dimension filters -> grouped revenue -> top-10. The customer"
    " filter pushes down before the join; TakeOrderedAndProject caps"
    " the sort.",
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp_ntz")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q_tpch_q6",
    oracle=f"""
        SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue,
               count(*) AS cnt
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape (forecast revenue change): pure scan-filter-"
    "aggregate — every predicate pushes into the parquet reader; the"
    " ideal single-stage 100 TB query.",
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@register(
    "q_tpch_q10",
    oracle=f"""
        SELECT c.c_custkey, c.c_name,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
               n.n_name
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1995-10-01'
          AND o.o_orderdate < TIMESTAMP '1996-01-01'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned-item reporting): fact-fact join plus"
    " broadcast nation, grouped revenue, top-20 customers.",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q_tpch_q4",
    oracle="""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1995-07-01'
          AND o.o_orderdate < TIMESTAMP '1995-10-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (order-priority checking): correlated EXISTS"
    " with an inequality -> left-semi join, then a tiny groupBy.",
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_q4")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem_q4")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM v_orders_q4 o
        WHERE o.o_orderdate >= TIMESTAMP_NTZ '1995-07-01'
          AND o.o_orderdate < TIMESTAMP_NTZ '1995-10-01'
          AND EXISTS (SELECT 1 FROM v_lineitem_q4 l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
        """
    )


@register(
    "q_tpch_q12",
    oracle="""
        SELECT l_linestatus,
               count(*) FILTER (WHERE o_orderpriority IN
                   ('1-URGENT', '2-HIGH')) AS high_line_count,
               count(*) FILTER (WHERE o_orderpriority NOT IN
                   ('1-URGENT', '2-HIGH')) AS low_line_count
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
          AND l.l_shipdate < TIMESTAMP '1996-01-01'
        GROUP BY l_linestatus
    """,
    doc="TPC-H Q12 shape (shipping modes / priority): fact-fact join +"
    " conditional counts per class.",
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, F.lit(1))).alias("high_line_count"),
            F.count(F.when(~high, F.lit(1))).alias("low_line_count"),
        )
    )


@register(
    "q_tpch_q14",
    oracle=f"""
        SELECT 100.0 * {sql_dsum("CASE WHEN p.p_type LIKE 'PROMO%'"
                                 " THEN l.l_extendedprice * (1 - l.l_discount)"
                                 " ELSE 0.0 END")}
               / {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')}
                   AS promo_revenue_pct
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1995-09-01'
          AND l.l_shipdate < TIMESTAMP '1995-10-01'
    """,
    doc="TPC-H Q14 shape (promotion effect): ratio of two exact"
    " fixed-point sums — the division of identical doubles is"
    " bit-stable across engines. Part joins broadcast.",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp_ntz"))
    )
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg((F.lit(100.0) * dsum(promo) / dsum(rev)).alias("promo_revenue_pct"))
    )


@register(
    "q_tpch_q5",
    oracle=f"""
        SELECT n.n_name,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n.n_name
        ORDER BY revenue DESC
    """,
    doc="TPC-H Q5 shape (local supplier volume): 6-way star join with a"
    " region filter that prunes through nation -> supplier; all"
    " dimensions broadcast, lineitem never shuffles for the joins.",
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"))
    )
