"""Data-profiling + complex-type operators (DERIVED closure).

``q_profile_lineitem`` is the lakehouse table-stats pass (per-column
min/max/null-count/NDV in ONE scan) — what ANALYZE TABLE computes and
what file-skipping metadata is built from. ``q_array_ops`` exercises the
array-algebra surface over the word arrays of documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table

_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "q_profile_lineitem",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS col_name,
               min({c}) AS min_val, max({c}) AS max_val,
               count(*) - count({c}) AS null_count,
               CAST(count(DISTINCT {c}) AS BIGINT) AS ndv
        FROM lineitem
        """
        for c in _PROFILE_COLS
    ),
    doc="Single-pass column profiling (ANALYZE TABLE shape): min/max/"
    "null-count/NDV per measure column, unpivoted to one row per column."
    " At 100 TB this is the stats pass that powers CBO and file skipping;"
    " Spark computes all columns' aggregates in one scan then unpivots.",
)
def q_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__ndv"),
        ]
    wide = li.agg(*aggs)
    per_col = [
        wide.select(
            F.lit(c).alias("col_name"),
            F.col(f"{c}__min").alias("min_val"),
            F.col(f"{c}__max").alias("max_val"),
            F.col(f"{c}__nulls").alias("null_count"),
            F.col(f"{c}__ndv").alias("ndv"),
        )
        for c in _PROFILE_COLS
    ]
    out = per_col[0]
    for p in per_col[1:]:
        out = out.unionByName(p)
    return out


@register(
    "q_array_ops",
    oracle="""
        SELECT doc_id,
               CAST(len(words) AS INTEGER) AS n_words,
               list_contains(words, 'spark') AS has_spark,
               CAST(len(list_distinct(words)) AS INTEGER) AS n_unique,
               list_sort(list_distinct(words))[1] AS first_word,
               CAST(len(list_intersect(list_distinct(words),
                    ['spark', 'table', 'query', 'data'])) AS INTEGER)
                   AS kw_hits,
               array_to_string(list_sort(list_distinct(words))[1:3], '|')
                   AS first3
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    """,
    doc="Array algebra over word arrays: size, membership, distinct,"
    " sort, intersect, slice, join — the JVM-side (codegen) complex-type"
    " surface; no shuffle, no Python.",
)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    uniq = F.array_sort(F.array_distinct(words))
    kws = F.array(*[F.lit(w) for w in ("spark", "table", "query", "data")])
    return docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.array_contains(words, "spark").alias("has_spark"),
        F.size(F.array_distinct(words)).alias("n_unique"),
        uniq.getItem(0).alias("first_word"),
        F.size(F.array_intersect(F.array_distinct(words), kws)).alias("kw_hits"),
        F.array_join(F.slice(uniq, 1, 3), "|").alias("first3"),
    )


@register(
    "q_dq_constraints",
    oracle="""
        SELECT
            (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
                AS null_custkeys,
            (SELECT count(*) FROM (
                 SELECT o_orderkey FROM orders
                 GROUP BY o_orderkey HAVING count(*) > 1))
                AS dup_orderkeys,
            (SELECT count(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey))
                AS orphan_orders,
            (SELECT count(*) FROM lineitem
              WHERE l_quantity <= 0 OR l_discount < 0 OR l_discount > 1)
                AS range_violations,
            (SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey))
                AS orphan_lineitems
    """,
    doc="Data-quality constraint suite in one query (Deequ/dbt-test"
    " shape): null checks, key uniqueness, referential integrity"
    " (orders->customer, lineitem->orders), and value-range assertions"
    " — each violation count computable from one scan + anti joins."
    " A CI gate asserts all-zeros on trusted tables; at 100 TB the"
    " anti joins ride the same broadcast/shuffle machinery as queries.",
)
def q_dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one declarative plan (scalar subqueries -> anti joins), no driver
    # actions: the whole suite is a single job the scheduler can overlap
    for t in ("orders", "customer", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}_dq")
    return spark.sql(
        """
        SELECT
            (SELECT count(*) FROM v_orders_dq WHERE o_custkey IS NULL)
                AS null_custkeys,
            (SELECT count(*) FROM (
                 SELECT o_orderkey FROM v_orders_dq
                 GROUP BY o_orderkey HAVING count(*) > 1))
                AS dup_orderkeys,
            (SELECT count(*) FROM v_orders_dq o
              WHERE NOT EXISTS (SELECT 1 FROM v_customer_dq c
                                WHERE c.c_custkey = o.o_custkey))
                AS orphan_orders,
            (SELECT count(*) FROM v_lineitem_dq
              WHERE l_quantity <= 0 OR l_discount < 0 OR l_discount > 1)
                AS range_violations,
            (SELECT count(*) FROM v_lineitem_dq l
              WHERE NOT EXISTS (SELECT 1 FROM v_orders_dq o
                                WHERE o.o_orderkey = l.l_orderkey))
                AS orphan_lineitems
        """
    )
