"""Cost-based arm-selection decision tables (plan audits -> decisions).

The engine deliberately ships exact and scale arms side by side:
plain vs salted joins (operators/joins.py, plans.salted_join), exact
all-pairs vs LSH/prefix-filtered dedup (operators/dedup.py), global
ranking windows vs sampled cut points (q_rfm vs q_rfm_naive,
q_equidepth_hist, q_global_ordinal). The pre-flight audits that inform
the choice already exist (q_skew_profile, q_selfjoin_fanout,
q_entity_blocks); these queries CLOSE the loop — they compute the same
bounded decide-before-you-shuffle statistics and emit the recommended
arm, with thresholds shared with ``plans.choose_*`` so the library
selector and the audited decision table can never disagree.

The reference has no planner at all (its joins are pandas merges inside
Airflow tasks, ``dags/utils/chunks_data.py``); this is the layer a
100 TB deployment needs on top. All arithmetic is exact integer, so the
DuckDB oracles replay every decision bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.plans import (
    BROADCAST_CAP_ROWS,
    EXACT_PAIR_BUDGET,
    HOT_KEY_ROWS,
    WINDOW_BUDGET_ROWS,
)
from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table

_JOIN_ARM_SQL = (
    f"CASE WHEN n_dim <= {BROADCAST_CAP_ROWS} THEN 'broadcast'"
    f" WHEN max_key_cnt > {HOT_KEY_ROWS} THEN 'salted_smj'"
    f" ELSE 'smj' END"
)

# (scenario, fact table, fact key, dim table) — the fixture's
# representative join shapes: fact x tiny dim, fact x mid dim, fact x
# big dim, and a low-cardinality-key self-join (the hot-key case).
_JOIN_SCENARIOS = (
    ("lineitem_x_supplier", "lineitem", "l_suppkey", "supplier"),
    ("lineitem_x_orders", "lineitem", "l_orderkey", "orders"),
    ("orders_x_customer", "orders", "o_custkey", "customer"),
    ("events_x_events_type", "events", "event_type", "events"),
)


def _join_oracle() -> str:
    rows = []
    for name, fact, key, dim in _JOIN_SCENARIOS:
        rows.append(f"""
        SELECT '{name}' AS join_name,
               (SELECT CAST(count(*) AS BIGINT) FROM {fact}) AS n_fact,
               (SELECT CAST(count(DISTINCT {key}) AS BIGINT) FROM {fact})
                   AS n_keys,
               (SELECT CAST(max(cnt) AS BIGINT) FROM (
                    SELECT count(*) AS cnt FROM {fact} GROUP BY {key}))
                   AS max_key_cnt,
               (SELECT CAST(count(*) AS BIGINT) FROM {dim}) AS n_dim""")
    return f"""
        WITH scen AS ({' UNION ALL '.join(rows)})
        SELECT join_name, n_fact, n_keys, max_key_cnt, n_dim,
               {_JOIN_ARM_SQL} AS arm
        FROM scen
    """


@register(
    "q_choose_join_plan",
    oracle=_join_oracle(),
    doc="Join-strategy selector over the fixture's representative join"
    " shapes: per scenario, ONE partial-agg groupBy on the fact key"
    " (n_fact / n_keys / hottest-key count — the q_skew_profile"
    " inputs) plus the dim-side count, then the plans.choose_join_arm"
    " rule: dim <= " + str(BROADCAST_CAP_ROWS) + " rows -> broadcast;"
    " hottest key > " + str(HOT_KEY_ROWS) + " rows -> salted sort-"
    "merge (even an AQE-split partition cannot parallelize ONE key's"
    " build); else plain SMJ. Decide-before-you-shuffle: the"
    " statistics are bounded aggregates, the decision is exact"
    " integer, and the thresholds are the library constants"
    " plans.salted_join consumers use — audits become decisions.",
)
def q_choose_join_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for name, fact, key, dim in _JOIN_SCENARIOS:
        f = load_table(spark, sf_dir, fact)
        d = load_table(spark, sf_dir, dim)
        per_key = f.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
        stats = per_key.agg(
            # coalesce: on an EMPTY fact table sum() is NULL while the
            # oracle's scalar count(*) subquery is 0 (max_key_cnt stays
            # NULL — the oracle's max() over no groups is NULL too)
            F.coalesce(F.sum("cnt"), F.lit(0))
            .cast("bigint")
            .alias("n_fact"),
            # count(key), not count(*): groupBy emits a NULL-key group
            # but the oracle's count(DISTINCT key) ignores NULLs — and
            # a NULL key never joins, so it is not a key for planning
            F.count(F.col(key)).cast("bigint").alias("n_keys"),
            F.max("cnt").cast("bigint").alias("max_key_cnt"),
        )
        dimc = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_dim"))
        row = (
            stats.crossJoin(F.broadcast(dimc))
            .select(
                F.lit(name).alias("join_name"),
                "n_fact",
                "n_keys",
                "max_key_cnt",
                "n_dim",
                F.expr(_JOIN_ARM_SQL).alias("arm"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# Spark spells integer division `div`, DuckDB `//` — two renderings of
# the SAME rule (n >= 0 here, so trunc and floor division agree)
_DEDUP_ARM_SQL = (
    f"CASE WHEN n_items * (n_items - 1) DIV 2 <= {EXACT_PAIR_BUDGET}"
    f" THEN 'exact' ELSE 'lsh' END"
)
_DEDUP_ARM_DUCK = (
    f"CASE WHEN n_items * (n_items - 1) // 2 <= {EXACT_PAIR_BUDGET}"
    f" THEN 'exact' ELSE 'lsh' END"
)

_DEDUP_SCENARIOS = (
    ("documents_shingle", "documents", "doc_id"),
    ("embeddings_cosine", "embeddings", "vec_id"),
)


def _dedup_oracle() -> str:
    rows = []
    for name, tbl, key in _DEDUP_SCENARIOS:
        rows.append(
            f"SELECT '{name}' AS corpus,"
            f" (SELECT CAST(count(DISTINCT {key}) AS BIGINT) FROM {tbl})"
            f" AS n_items"
        )
    return f"""
        WITH scen AS ({' UNION ALL '.join(rows)})
        SELECT corpus, n_items,
               CAST(n_items * (n_items - 1) // 2 AS BIGINT)
                   AS exact_pairs,
               {_DEDUP_ARM_DUCK} AS arm
        FROM scen
    """


@register(
    "q_choose_dedup_plan",
    oracle=_dedup_oracle(),
    doc="Dedup-arm selector: per corpus, the exact all-pairs candidate"
    " count n*(n-1)/2 against the library pair budget"
    f" ({EXACT_PAIR_BUDGET}) decides 'exact' (blocked all-pairs"
    " kernel: q_embed_neardup / q_editdist_neardup) vs 'lsh' (banded"
    " MinHash / prefix-filtered PPJoin: q_minhash_neardup /"
    " q_dedup_clusters). ONE distinct-count per corpus — the cheapest"
    " statistic that bounds the exact arm's output; the thresholds"
    " are plans.choose_dedup_arm's, so library and audit agree.",
)
def q_choose_dedup_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for name, tbl, key in _DEDUP_SCENARIOS:
        t = load_table(spark, sf_dir, tbl)
        row = (
            t.agg(F.countDistinct(key).cast("bigint").alias("n_items"))
            .select(
                F.lit(name).alias("corpus"),
                "n_items",
                F.expr("CAST(n_items * (n_items - 1) DIV 2 AS BIGINT)").alias(
                    "exact_pairs"
                ),
                F.expr(_DEDUP_ARM_SQL).alias("arm"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


_QUANTILE_ARM_SQL = (
    f"CASE WHEN n_rows <= {WINDOW_BUDGET_ROWS} THEN 'window'"
    f" ELSE 'sampled_cutpoints' END"
)

_QUANTILE_SCENARIOS = (
    ("customer_rfm", "customer"),
    ("lineitem_price_hist", "lineitem"),
    ("events_ordinal", "events"),
)


def _quantile_oracle() -> str:
    rows = []
    for name, tbl in _QUANTILE_SCENARIOS:
        rows.append(
            f"SELECT '{name}' AS ranking, (SELECT CAST(count(*) AS BIGINT)"
            f" FROM {tbl}) AS n_rows"
        )
    return f"""
        WITH scen AS ({' UNION ALL '.join(rows)})
        SELECT ranking, n_rows, {_QUANTILE_ARM_SQL} AS arm
        FROM scen
    """


@register(
    "q_choose_quantile_plan",
    oracle=_quantile_oracle(),
    doc="Global-ranking-arm selector: row count against the window"
    f" budget ({WINDOW_BUDGET_ROWS}) decides 'window' (a global"
    " ntile/row_number — ONE task, fine at dimension cardinality:"
    " q_rfm_naive) vs 'sampled_cutpoints' (deterministic sample cut"
    " points + broadcast CASE / the q_global_ordinal bucket"
    " decomposition: q_rfm, q_equidepth_hist). The same constant"
    " plans.choose_quantile_arm applies, so the library selector and"
    " this gate-verified table cannot drift.",
)
def q_choose_quantile_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for name, tbl in _QUANTILE_SCENARIOS:
        t = load_table(spark, sf_dir, tbl)
        row = t.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows")).select(
            F.lit(name).alias("ranking"),
            "n_rows",
            F.expr(_QUANTILE_ARM_SQL).alias("arm"),
        )
        out = row if out is None else out.unionByName(row)
    return out
