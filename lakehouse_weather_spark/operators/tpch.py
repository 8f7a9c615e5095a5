"""Classic multi-join analytic queries (TPC-H-shaped; DERIVED closure).

These exercise what single-operator queries can't: join ordering,
broadcast selection across 3-6 tables, aggregate-after-join, and
top-k-after-aggregate. Catalyst + AQE pick the physical plan; the
assertions in tests/test_plans.py keep the dimensions broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.functions import davg, dsum, sql_davg, sql_dsum
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


@register(
    "q_tpch_q1",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               {sql_dsum('l_extendedprice')} AS sum_base_price,
               {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
               {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
               avg(l_quantity) AS avg_qty,
               {sql_davg('l_extendedprice')} AS avg_price,
               {sql_davg('l_discount')} AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape (pricing summary report): the canonical full-"
    "scan aggregate — 8 aggregates over 2 grouping columns, all"
    " map-side partial; quantity sums stay exact (integer-valued"
    " doubles), money sums/avgs use fixed-point accumulation.",
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q_tpch_q7",
    oracle=f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate BETWEEN TIMESTAMP '1995-01-01'
                               AND TIMESTAMP '1996-12-31'
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape (volume shipping between two nations): double"
    " nation dimension (supplier side + customer side), disjunctive"
    " nation-pair predicate, per-year revenue. Both nation copies"
    " broadcast; the fact join is orders-lineitem.",
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1995-01-01").cast("timestamp_ntz"),
            F.lit("1996-12-31").cast("timestamp_ntz"),
        )
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q_tpch_q8",
    oracle=f"""
        SELECT o_year,
               {sql_dsum("CASE WHEN nation = 'NATION_1' THEN volume ELSE 0.0 END")}
               / {sql_dsum('volume')} AS mkt_share
        FROM (
            SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
                   l.l_extendedprice * (1 - l.l_discount) AS volume,
                   n2.n_name AS nation
            FROM part p
            JOIN lineitem l ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
            JOIN region r ON n1.n_regionkey = r.r_regionkey
            JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
            WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
        )
        GROUP BY o_year
        ORDER BY o_year
    """,
    doc="TPC-H Q8 shape (national market share): 8-way star join, then"
    " a conditional-share ratio per order year — a ratio of two exact"
    " fixed-point sums, bit-stable across engines.",
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")))
    r = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    national = F.when(F.col("nation") == "NATION_1", volume).otherwise(F.lit(0.0))
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(r, F.col("n1_region") == r.r_regionkey)
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((dsum(national) / dsum(volume)).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "q_tpch_q13",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape (customer order-count distribution): left join"
    " preserving order-less customers, count per customer, then a"
    " histogram of the counts — two chained aggregations.",
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q_tpch_q15",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1995-01-01'
              AND l_shipdate < TIMESTAMP '1995-04-01'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15 shape (top supplier): quarterly revenue per supplier,"
    " then an equality filter against the scalar max — the CTE is"
    " referenced twice (revenue + its max), which Spark plans as a"
    " reused subquery. Fixed-point revenue makes the max/equality"
    " bit-stable.",
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem_q15")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("v_supplier_q15")
    return spark.sql(
        f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
            FROM v_lineitem_q15
            WHERE l_shipdate >= TIMESTAMP_NTZ '1995-01-01'
              AND l_shipdate < TIMESTAMP_NTZ '1995-04-01'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM v_supplier_q15 s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s.s_suppkey
        """
    )


@register(
    "q_tpch_q17",
    oracle=f"""
        SELECT {sql_dsum('l.l_extendedprice')} / 7.0 AS avg_yearly
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#23'
          AND l.l_quantity < (
              SELECT 0.2 * avg(l2.l_quantity)
              FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
          )
    """,
    doc="TPC-H Q17 shape (small-quantity-order revenue; p_container"
    " predicate dropped — column absent from the fixture schema):"
    " correlated scalar average per part -> de-correlated into an"
    " aggregate + join by Spark. Quantity averages are exact"
    " (integer-valued doubles), so the 0.2*avg threshold is"
    " bit-identical across engines.",
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem_q17")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("v_part_q17")
    return spark.sql(
        f"""
        SELECT {sql_dsum('l.l_extendedprice')} / 7.0 AS avg_yearly
        FROM v_lineitem_q17 l JOIN v_part_q17 p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#23'
          AND l.l_quantity < (
              SELECT 0.2 * avg(l2.l_quantity)
              FROM v_lineitem_q17 l2 WHERE l2.l_partkey = p.p_partkey
          )
        """
    )


@register(
    "q_tpch_q18",
    oracle="""
        SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
               o.o_totalprice, sum(l.l_quantity) AS total_qty
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING sum(l_quantity) > 300
        )
        GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
                 o.o_totalprice
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 100
    """,
    doc="TPC-H Q18 shape (large-volume customers): IN over a grouped"
    " HAVING subquery -> left-semi join against a pre-aggregated fact,"
    " then re-aggregate and top-100. Quantity sums are exact"
    " integer-valued doubles.",
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q_tpch_q19",
    oracle=f"""
        SELECT {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
               AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape (discounted revenue; container/shipmode"
    " predicates replaced by size/quantity — columns absent from the"
    " fixture schema): three OR'd conjunctive predicate groups spanning"
    " both join sides — the optimizer must keep the join equi-key and"
    " evaluate the disjunction post-join.",
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    g1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    g2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    )
    g3 = (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(g1 | g2 | g3)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "q_tpch_q22",
    oracle=f"""
        SELECT c_mktsegment AS segment,
               count(*) AS numcust,
               {sql_dsum('c_acctbal')} AS totacctbal
        FROM customer c
        WHERE c_acctbal > (
            SELECT {sql_davg('c2.c_acctbal')}
            FROM customer c2 WHERE c2.c_acctbal > 0.0
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '1999-01-01'
        )
        GROUP BY c_mktsegment
        ORDER BY segment
    """,
    doc="TPC-H Q22 shape (global sales opportunity; phone-prefix"
    " predicate replaced by market segment — column absent from the"
    " fixture schema): scalar above-average-balance subquery + NOT"
    " EXISTS anti join against recent orders. The average threshold"
    " uses fixed-point accumulation so the cut is bit-identical across"
    " engines.",
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer_q22")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_q22")
    return spark.sql(
        f"""
        SELECT c_mktsegment AS segment,
               count(*) AS numcust,
               {sql_dsum('c_acctbal')} AS totacctbal
        FROM v_customer_q22 c
        WHERE c_acctbal > (
            SELECT {sql_davg('c2.c_acctbal')}
            FROM v_customer_q22 c2 WHERE c2.c_acctbal > 0.0
        )
        AND NOT EXISTS (
            SELECT 1 FROM v_orders_q22 o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP_NTZ '1999-01-01'
        )
        GROUP BY c_mktsegment
        ORDER BY segment
        """
    )


# ---------------------------------------------------------------------------
# The six classically-partsupp/column-dependent queries, adapted to the
# fixture schema (no partsupp table; no receiptdate/container/phone
# columns). Each keeps the ORIGINAL query's structural challenge —
# the join topology, subquery correlation, and aggregation shape — with
# the missing relation replaced by the lineitem-derived part-supplier
# relationship and missing predicates by equivalents, documented per
# query.
# ---------------------------------------------------------------------------


@register(
    "q_tpch_q2",
    oracle="""
        SELECT DISTINCT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE p.p_size = 15 AND r.r_name = 'EUROPE'
          AND s.s_acctbal = (
              SELECT max(s2.s_acctbal)
              FROM lineitem l2
              JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
              JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
              JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
              WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
          )
        ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
        LIMIT 100
    """,
    doc="TPC-H Q2 shape (best supplier per part; partsupp replaced by"
    " the lineitem-evidenced part-supplier relationship, min supplycost"
    " by max acctbal): correlated per-part scalar subquery over the"
    " same 4-way dimension join as the outer query — the classic"
    " decorrelation stress test.",
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("part", "lineitem", "supplier", "nation", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}_q2")
    return spark.sql(
        """
        SELECT DISTINCT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type
        FROM v_part_q2 p
        JOIN v_lineitem_q2 l ON p.p_partkey = l.l_partkey
        JOIN v_supplier_q2 s ON s.s_suppkey = l.l_suppkey
        JOIN v_nation_q2 n ON s.s_nationkey = n.n_nationkey
        JOIN v_region_q2 r ON n.n_regionkey = r.r_regionkey
        WHERE p.p_size = 15 AND r.r_name = 'EUROPE'
          AND s.s_acctbal = (
              SELECT max(s2.s_acctbal)
              FROM v_lineitem_q2 l2
              JOIN v_supplier_q2 s2 ON s2.s_suppkey = l2.l_suppkey
              JOIN v_nation_q2 n2 ON s2.s_nationkey = n2.n_nationkey
              JOIN v_region_q2 r2 ON n2.n_regionkey = r2.r_regionkey
              WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
          )
        ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
        LIMIT 100
        """
    )


@register(
    "q_tpch_q9",
    oracle=f"""
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)'
                         ' - 0.1 * p.p_retailprice * l.l_quantity')} AS sum_profit
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%red%'
        GROUP BY 1, 2
        ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape (product-type profit; ps_supplycost replaced by"
    " 10% of p_retailprice as the unit cost): 5-way join filtered by a"
    " part-name LIKE, profit aggregated per supplier nation and order"
    " year. The part filter must push down before the fact join.",
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    o = load_table(spark, sf_dir, "orders")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(n, F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(profit).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


_Q11_VALUE = "sum(CAST(round(l_extendedprice * 10000) AS BIGINT))"


@register(
    "q_tpch_q11",
    oracle=f"""
        WITH pv AS (
            SELECT l.l_partkey, {sql_dsum('l.l_extendedprice')} AS value
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            WHERE n.n_name = 'NATION_3'
            GROUP BY l.l_partkey
        )
        SELECT l_partkey, value
        FROM pv
        WHERE value > (SELECT {sql_davg('value')} * 1.2 FROM pv)
        ORDER BY value DESC, l_partkey
    """,
    doc="TPC-H Q11 shape (important stock; partsupp value replaced by"
    " shipped lineitem value per part, the scale-dependent fraction by"
    " 1.2x the mean — scale-free): grouped values filtered against a"
    " scalar aggregate over the SAME grouped CTE, referenced twice."
    " Both the values and the threshold use fixed-point accumulation so"
    " the cut is bit-identical across engines.",
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "supplier", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}_q11")
    from lakehouse_weather_spark.functions import sql_davg as _davg, sql_dsum as _dsum

    return spark.sql(
        f"""
        WITH pv AS (
            SELECT l.l_partkey, {_dsum('l.l_extendedprice')} AS value
            FROM v_lineitem_q11 l
            JOIN v_supplier_q11 s ON l.l_suppkey = s.s_suppkey
            JOIN v_nation_q11 n ON s.s_nationkey = n.n_nationkey
            WHERE n.n_name = 'NATION_3'
            GROUP BY l.l_partkey
        )
        SELECT l_partkey, value
        FROM pv
        WHERE value > (SELECT {_davg('value')} * 1.2 FROM pv)
        ORDER BY value DESC, l_partkey
        """
    )


@register(
    "q_tpch_q16",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#45'
          AND p.p_type NOT LIKE 'MEDIUM%'
          AND p.p_size IN (1, 4, 7)
          AND l.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape (supplier counts per part attributes; partsupp"
    " replaced by the lineitem part-supplier relationship, the"
    " complaint-comment filter by negative account balance): negated"
    " predicates + NOT IN anti subquery + count(DISTINCT) per group.",
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("part", "lineitem", "supplier"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}_q16")
    return spark.sql(
        """
        SELECT p.p_brand, p.p_type, p.p_size,
               count(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM v_part_q16 p JOIN v_lineitem_q16 l ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#45'
          AND p.p_type NOT LIKE 'MEDIUM%'
          AND p.p_size IN (1, 4, 7)
          AND l.l_suppkey NOT IN (
              SELECT s_suppkey FROM v_supplier_q16 WHERE s_acctbal < 0
          )
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
        """
    )


@register(
    "q_tpch_q20",
    oracle="""
        SELECT s.s_name, n.n_name
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE s.s_suppkey IN (
            SELECT l.l_suppkey FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
            GROUP BY l.l_suppkey, l.l_partkey
            HAVING sum(l.l_quantity) > 0.1 * (
                SELECT sum(l2.l_quantity) FROM lineitem l2
                WHERE l2.l_partkey = l.l_partkey
            )
        )
        ORDER BY s.s_name
    """,
    doc="TPC-H Q20 shape (suppliers with significant stock; the"
    " availqty-vs-half-of-shipped test becomes supplier-ships->10% of a"
    " PROMO part's total quantity): IN over a grouped HAVING whose"
    " threshold is a correlated scalar aggregate — a doubly-nested"
    " decorrelation. Quantity sums are exact integer-valued doubles.",
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("supplier", "nation", "lineitem", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}_q20")
    return spark.sql(
        """
        SELECT s.s_name, n.n_name
        FROM v_supplier_q20 s JOIN v_nation_q20 n ON s.s_nationkey = n.n_nationkey
        WHERE s.s_suppkey IN (
            SELECT l.l_suppkey FROM v_lineitem_q20 l
            JOIN v_part_q20 p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
            GROUP BY l.l_suppkey, l.l_partkey
            HAVING sum(l.l_quantity) > 0.1 * (
                SELECT sum(l2.l_quantity) FROM v_lineitem_q20 l2
                WHERE l2.l_partkey = l.l_partkey
            )
        )
        ORDER BY s.s_name
        """
    )


@register(
    "q_tpch_q21",
    oracle="""
        SELECT s.s_name, count(*) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 100
    """,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting; the"
    " receiptdate-vs-commitdate lateness becomes shipped->60-days after"
    " the order date): EXISTS (another supplier on the order) + NOT"
    " EXISTS (no OTHER supplier was late) — the double-correlated"
    " semi/anti join pair that makes Q21 the optimizer's hardest"
    " decorrelation.",
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("supplier", "lineitem", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}_q21")
    return spark.sql(
        """
        SELECT s.s_name, count(*) AS numwait
        FROM v_supplier_q21 s
        JOIN v_lineitem_q21 l1 ON s.s_suppkey = l1.l_suppkey
        JOIN v_orders_q21 o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
              SELECT 1 FROM v_lineitem_q21 l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM v_lineitem_q21 l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 100
        """
    )


# ---------------------------------------------------------------------------
# Q3 over co-bucketed fact tables: the exchange-free repeat-join path
# ---------------------------------------------------------------------------

_BUCKETS_Q3 = 8


def _bucketed_name(base: str, sf_dir: str) -> str:
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return f"lws_{base}_b{_BUCKETS_Q3}_{tag}"


def ensure_bucketed_facts(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Materialize orders + lineitem bucketed AND sorted by orderkey
    (idempotent per sf_dir). This is the one-time pre-shuffle that every
    subsequent orderkey equi-join amortizes against — the managed-table
    analogue of Hive/Iceberg bucket transforms."""
    from lakehouse_weather_spark.plans import write_bucketed

    names = []
    for base, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        name = _bucketed_name(base, sf_dir)
        if not spark.catalog.tableExists(name):
            # the in-memory catalog forgets tables between sessions but
            # the warehouse directory survives: clear a stale location
            # before the managed-table write (on a real cluster the
            # metastore persists and this branch never fires)
            import shutil

            loc = (
                spark.conf.get("spark.sql.warehouse.dir")
                .removeprefix("file:")
                + f"/{name}"
            )
            shutil.rmtree(loc, ignore_errors=True)
            write_bucketed(
                load_table(spark, sf_dir, base), name, key, _BUCKETS_Q3
            )
        names.append(name)
    return names[0], names[1]


@register(
    "q_tpch_q3_bucketed",
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
    doc="TPC-H Q3 answered ENTIRELY WITHOUT A SHUFFLE over co-bucketed"
    f" fact tables (orders + lineitem bucketed by orderkey x"
    f" {_BUCKETS_Q3}): the broadcast customer join preserves the"
    " streamed side's bucketing, the orders-lineitem sort-merge join"
    " runs exchange-free on matching HashPartitioning, and the groupBy"
    " (whose keys include l_orderkey) is satisfied by the same"
    " partitioning — tests/test_plans.py asserts ZERO Exchange nodes"
    " outside the broadcast. This is the amortization lever for"
    " repeated 100 TB fact-fact joins: pay the layout shuffle once at"
    " ingest, never again per query. Result is bit-identical to"
    " q_tpch_q3 (same oracle).",
)
def q_tpch_q3_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders_t, lineitem_t = ensure_bucketed_facts(spark, sf_dir)
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = spark.table(orders_t).filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = spark.table(lineitem_t).filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp_ntz")
    )
    return (
        o.join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )
