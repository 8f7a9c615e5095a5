"""Market-basket mining + item-item collaborative filtering.

The reference curates documents one-by-one and has no co-occurrence
analytics at all (its only cross-row operator family is dedup,
``dags/silver.py``); these are the DERIVED association-mining ops a
lakehouse serving both analysts ("what sells together") and a training
pipeline ("which sources/topics co-occur in a context window") needs.

Baskets here are ORDERS, items are part BRANDS (the classic retail
shape on the fixture): ``lineitem ⋈ part`` lifts each order's lines to
the 25-value brand space, and pairs are generated per basket.

Scale shape (100 TB):
- the basket⋈dim lift broadcasts the part dimension's (partkey, brand)
  projection — two narrow columns, never the fact table;
- pair generation is a per-basket self-join whose fan-out is bounded by
  the DISTINCT items per basket (≤ |brands| = 25 here; with an open
  item space you cap basket width first, exactly like the dedup
  family's DF_CAP — a 10k-item basket contributes 5·10^7 pairs and is
  a bot, not a signal);
- everything downstream of the pair groupBy is |items|² at most —
  driver-scale tables joined broadcast.

A-priori pruning is real, not decorative: item supports aggregate
FIRST, the frequent-item set broadcasts back, and only pairs of two
frequent items are generated — the anti-monotonicity walk from the
A-priori paper (Agrawal & Srikant, VLDB'94) expressed as two hash
aggregates and one broadcast semi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table

# minimum pair support: 1% of baskets (integer floor), never below 2 —
# relative thresholds survive scale-up, absolute ones don't
_MINSUP_DIV = 100

# shared oracle CTE: per-order distinct brands, item supports, the
# basket count, and the frequent-item prefilter (A-priori level 1)
_BASKET_CTE = f"""
    baskets AS (
        SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS item
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    nb AS (SELECT count(DISTINCT basket) AS n_baskets FROM baskets),
    minsup AS (
        SELECT CASE WHEN n_baskets // {_MINSUP_DIV} > 2
                    THEN n_baskets // {_MINSUP_DIV} ELSE 2 END AS ms
        FROM nb
    ),
    items AS (
        SELECT item, CAST(count(*) AS BIGINT) AS n_item
        FROM baskets GROUP BY item
    ),
    freq AS (
        SELECT item, n_item FROM items, minsup WHERE n_item >= ms
    ),
    pairs AS (
        SELECT a.item AS item_a, b.item AS item_b,
               CAST(count(*) AS BIGINT) AS n_ab
        FROM baskets a
        JOIN baskets b ON a.basket = b.basket AND a.item < b.item
        JOIN freq fa ON fa.item = a.item
        JOIN freq fb ON fb.item = b.item
        GROUP BY a.item, b.item
    )
"""


def _baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(
            F.broadcast(part), li.l_partkey == part.p_partkey
        )
        .select(
            F.col("l_orderkey").alias("basket"),
            F.col("p_brand").alias("item"),
        )
        .distinct()
    )


_PAIRS_MEMO: "weakref.WeakKeyDictionary" = None  # type: ignore[assignment]


def _frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(item_a, item_b, n_a, n_b, n_ab, n_baskets, ms) for every
    frequent pair — the shared A-priori core of both queries,
    materialized ONCE per (session, corpus) like the dedup substrates:
    q_itemcf_topk consumes it twice (the symmetrized union) and
    q_basket_pairs once more, and before the memo each consumer
    re-executed the whole basket-collapse DAG (measured: `grouped`
    evaluated ~9x across the two queries)."""
    global _PAIRS_MEMO
    import weakref

    from lakehouse_weather_spark.operators.dedup import _checkpoint
    from lakehouse_weather_spark.sources.tables import corpus_fingerprint

    if _PAIRS_MEMO is None:
        _PAIRS_MEMO = weakref.WeakKeyDictionary()
    per = _PAIRS_MEMO.setdefault(spark, {})
    key = (sf_dir, corpus_fingerprint(sf_dir, "lineitem"))
    df = per.get(key)
    if df is None:
        # eager=False: the memo still hands every consumer the same
        # block-backed table computed exactly once, but the build
        # lands inside the first consumer's own job instead of a
        # dedicated materialization job (it is query-shaped work that
        # belongs in that window either way — substrate policy note
        # in bench.py)
        df = _checkpoint(_build_frequent_pairs(spark, sf_dir), eager=False)
        per[key] = df
    return df


def _build_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair generation is the dedup family's band-agg shape, not a
    basket⋈basket self-join: ONE groupBy collapses each basket to its
    sorted distinct item array, the A-priori prune drops infrequent
    items from the array (array_intersect against the broadcast
    frequent list), and ordered pairs explode NARROWLY from the pruned
    array — so the only shuffles are the basket collapse and the final
    |items|²-bounded pair count, where the self-join form shuffles the
    basket table twice more."""
    from lakehouse_weather_spark.operators.dedup import _checkpoint

    baskets = _baskets(spark, sf_dir)
    # checkpointed: three consumers below (n_baskets, item counts, the
    # pair explode) each re-executed the collapse otherwise
    grouped = _checkpoint(
        baskets.groupBy("basket").agg(
            F.sort_array(F.collect_set("item")).alias("items")
        ),
        eager=False,
    )
    nb = grouped.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_baskets")
    ).select(
        "n_baskets",
        F.greatest(
            F.expr(f"n_baskets div {_MINSUP_DIV}"), F.lit(2)
        ).alias("ms"),
    )
    items_cnt = (
        grouped.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_item"))
    )
    freq = items_cnt.crossJoin(F.broadcast(nb)).filter(
        F.col("n_item") >= F.col("ms")
    )
    freq_arr = freq.agg(
        F.sort_array(F.collect_list("item")).alias("freq_items")
    )
    pairs = (
        grouped.crossJoin(F.broadcast(freq_arr))
        # A-priori prune INSIDE the row: drop infrequent items from the
        # sorted array before any pair exists (order is preserved, so
        # generated pairs are already item_a < item_b)
        .select(
            F.array_intersect("items", "freq_items").alias("fi")
        )
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(fi, (x, i) ->"
                    " transform(slice(fi, i + 2, size(fi)),"
                    " y -> struct(x AS item_a, y AS item_b))))"
                )
            ).alias("p")
        )
        .select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
    )
    fa = F.broadcast(
        freq.select(
            F.col("item").alias("item_a"), F.col("n_item").alias("n_a")
        )
    )
    fb = F.broadcast(
        freq.select(
            F.col("item").alias("item_b"), F.col("n_item").alias("n_b")
        )
    )
    return (
        pairs.join(fa, "item_a")
        .join(fb, "item_b")
        .crossJoin(F.broadcast(nb))
    )


@register(
    "q_basket_pairs",
    oracle=f"""
        WITH {_BASKET_CTE}
        SELECT p.item_a, p.item_b,
               fa.n_item AS n_a, fb.n_item AS n_b, p.n_ab,
               CAST(p.n_ab * 1000 // nb.n_baskets AS BIGINT) AS supp_pm,
               CAST(p.n_ab * 1000 // fa.n_item AS BIGINT) AS conf_pm,
               CAST(p.n_ab * nb.n_baskets * 1000000
                    // (fa.n_item * fb.n_item) AS BIGINT) AS lift_ppm
        FROM pairs p
        JOIN freq fa ON fa.item = p.item_a
        JOIN freq fb ON fb.item = p.item_b
        CROSS JOIN nb, minsup
        WHERE p.n_ab >= minsup.ms
    """,
    doc="A-priori frequent itemset pairs over order baskets lifted to"
    " the brand space (lineitem ⋈ broadcast part): support ≥"
    " max(2, baskets/100) with the LEVEL-1 prune applied before pair"
    " generation (only frequent items self-join), then per-pair"
    " support/confidence/lift in exact integer per-mille/ppm"
    " arithmetic. Pair fan-out is bounded by distinct items per"
    " basket; everything after the pair groupBy is |items|^2-bounded"
    " and broadcast. The relative (not absolute) support threshold is"
    " what survives a 1000x corpus scale-up.",
)
def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _frequent_pairs(spark, sf_dir)
    return pairs.filter(F.col("n_ab") >= F.col("ms")).select(
        "item_a",
        "item_b",
        "n_a",
        "n_b",
        "n_ab",
        F.expr("CAST(n_ab * 1000 div n_baskets AS BIGINT)").alias(
            "supp_pm"
        ),
        F.expr("CAST(n_ab * 1000 div n_a AS BIGINT)").alias("conf_pm"),
        F.expr(
            "CAST(n_ab * n_baskets * 1000000 div (n_a * n_b) AS BIGINT)"
        ).alias("lift_ppm"),
    )


_CF_TOPK = 3


@register(
    "q_itemcf_topk",
    oracle=f"""
        WITH {_BASKET_CTE},
        sym AS (
            SELECT p.item_a AS item, p.item_b AS other,
                   fa.n_item AS n_i, fb.n_item AS n_o, p.n_ab
            FROM pairs p
            JOIN freq fa ON fa.item = p.item_a
            JOIN freq fb ON fb.item = p.item_b
            UNION ALL
            SELECT p.item_b, p.item_a, fb.n_item, fa.n_item, p.n_ab
            FROM pairs p
            JOIN freq fa ON fa.item = p.item_a
            JOIN freq fb ON fb.item = p.item_b
        ),
        scored AS (
            SELECT item, other, n_ab,
                   CAST(n_ab AS DOUBLE)
                       / sqrt(CAST(n_i AS DOUBLE) * CAST(n_o AS DOUBLE))
                       AS cosine,
                   row_number() OVER (
                       PARTITION BY item
                       ORDER BY CAST(n_ab AS DOUBLE)
                           / sqrt(CAST(n_i AS DOUBLE)
                                  * CAST(n_o AS DOUBLE)) DESC,
                           other
                   ) AS rnk
            FROM sym
        )
        SELECT item, other, n_ab, cosine,
               CAST(rnk AS BIGINT) AS rnk
        FROM scored WHERE rnk <= {_CF_TOPK}
    """,
    doc=f"Item-item collaborative filtering: top-{_CF_TOPK} co-ordered"
    " brands per brand by binary cosine n_ab / sqrt(n_a * n_b) over"
    " the SAME A-priori pair counts as q_basket_pairs (build the pair"
    " table once, serve every consumer — the substrate pattern). The"
    " ranking window partitions by item over an |items|-bounded"
    " similarity list; ties break on the neighbor id so the selected"
    " set is deterministic. Cosine is a handful of mirrored IEEE ops"
    " on exact integer counts, replayed bit-for-bit by the oracle.",
)
def q_itemcf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    pairs = _frequent_pairs(spark, sf_dir)
    sym = pairs.select(
        F.col("item_a").alias("item"),
        F.col("item_b").alias("other"),
        F.col("n_a").alias("n_i"),
        F.col("n_b").alias("n_o"),
        "n_ab",
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("item"),
            F.col("item_a").alias("other"),
            F.col("n_b").alias("n_i"),
            F.col("n_a").alias("n_o"),
            "n_ab",
        )
    )
    cosine = F.expr(
        "CAST(n_ab AS DOUBLE)"
        " / sqrt(CAST(n_i AS DOUBLE) * CAST(n_o AS DOUBLE))"
    )
    w = Window.partitionBy("item").orderBy(
        cosine.desc(), F.col("other").asc()
    )
    return (
        sym.select(
            "item",
            "other",
            "n_ab",
            cosine.alias("cosine"),
            F.row_number().over(w).cast("bigint").alias("rnk"),
        )
        .filter(F.col("rnk") <= _CF_TOPK)
    )
