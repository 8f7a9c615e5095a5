"""Graph operators over the document similarity graph (training-data
closure): PageRank-style centrality — the standard corpus-quality /
importance weighting pass (harmonic-centrality-weighted sampling a la
web-corpus curation) — expressed as iterative DataFrame joins.

Like the connected-components loop in ``dedup.py``, the driver holds
only the iteration counter; every step is a distributed join + partial
aggregation, ranks checkpoint reliably to cut lineage, and all rank
arithmetic is fixed-point (order-independent integer sums), so the
result is bit-reproducible on any cluster AND exactly replayable in
numpy (tests/test_graph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.operators.dedup import (
    _checkpoint,
    _minhash_pairs_cte,
    q_minhash_neardup,
)
from lakehouse_weather_spark.registry import register

RANK_SCALE = 1_000_000_000_000
N_ITER = 5
DAMPING = 0.85


def pagerank(
    edges: DataFrame,
    n_iter: int = N_ITER,
    damping: float = DAMPING,
    checkpoint_every: int = 3,
) -> DataFrame:
    """PageRank over a directed edge list (src, dst) -> (node, rank).

    Per iteration: each node sends rank/out_degree along its out-edges
    (contributions FLOOR-quantized at 1e-12 fixed point, integer-summed
    — associative), then rank = (1-d)/N + d * received. Nodes with no
    in-edges keep the teleport term. floor(), not round(): Spark's
    round() on doubles goes through the shortest decimal string
    (BigDecimal.valueOf), which disagrees with binary-exact HALF_UP
    engines on arbitrary-fraction products at 1e9+ magnitudes — floor
    is exact on the binary double everywhere, so the iteration is
    bit-identical in Spark, numpy, and DuckDB. Scale shape per
    iteration: one broadcast-or-shuffle join of ranks onto edges + one
    partial-agg shuffle on dst.

    Callers pass a CHECKPOINTED edge list (it anchors every iteration's
    lineage); nodes and out-degrees derive from it lazily — they are
    trivial recomputations over the materialized edges, so eagerly
    materializing them only adds job-scheduling overhead. Ranks cut
    lineage every ``checkpoint_every`` rounds (same cadence argument as
    the connected-components loop: between cuts the plan grows by a
    few shallow joins, and each materialization is a full job)."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edges_deg = edges.join(out_deg, "src")

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    teleport = (1.0 - damping) / n
    for it in range(n_iter):
        contrib = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"CAST(floor(rank / deg * {RANK_SCALE}) AS BIGINT)"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("received"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (F.coalesce(F.col("received"), F.lit(0)).cast("double") / RANK_SCALE)
                ).alias("rank"),
            )
        )
        if checkpoint_every and it % checkpoint_every == checkpoint_every - 1:
            ranks = _checkpoint(ranks)
    return ranks


def _pagerank_oracle() -> str:
    """Unrolled DuckDB replay of the N_ITER pagerank rounds: the same
    fixed-point contribution rounding, the same teleport/damping double
    expression tree, iterated as chained CTEs — so even the iterative
    operator is value-hash-checked (the kmeans pattern)."""
    its = []
    prev = "r0"
    for i in range(1, N_ITER + 1):
        its.append(f"""
        recv{i} AS (
            SELECT ed.dst AS node,
                   sum(CAST(floor(p.rank / ed.deg * {RANK_SCALE}) AS BIGINT))
                       AS received
            FROM ed JOIN {prev} p ON ed.src = p.node
            GROUP BY ed.dst
        ),
        r{i} AS (
            SELECT n.node,
                   (SELECT tp FROM consts)
                   + CAST({DAMPING} AS DOUBLE)
                     * (CAST(COALESCE(rc.received, 0) AS DOUBLE)
                        / {RANK_SCALE}) AS rank
            FROM nodes n LEFT JOIN recv{i} rc ON n.node = rc.node
        )""")
        prev = f"r{i}"
    chain = ",".join(its)
    return f"""
        WITH {_minhash_pairs_cte()},
        e AS (SELECT doc_a AS src, doc_b AS dst FROM mpairs
              UNION ALL SELECT doc_b, doc_a FROM mpairs),
        nodes AS (SELECT DISTINCT src AS node FROM e),
        consts AS (
            -- CAST to DOUBLE everywhere: bare decimal literals are
            -- exact DECIMALs in DuckDB, so (1.0 - 0.85) would be an
            -- exact 0.15 instead of the binary 0.15000000000000002
            -- the Python/Spark float path computes — an ulp off in tp
            SELECT count(*) AS n,
                   (CAST(1.0 AS DOUBLE) - CAST({DAMPING} AS DOUBLE))
                       / count(*) AS tp,
                   CAST(1.0 AS DOUBLE) / count(*) AS r_init
            FROM nodes
        ),
        deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        ed AS (SELECT e.src, e.dst, d.deg FROM e JOIN deg d USING (src)),
        r0 AS (
            SELECT node, (SELECT r_init FROM consts) AS rank FROM nodes
        ),{chain}
        SELECT node, rank FROM {prev}
    """


@register(
    "q_pagerank_neardup",
    oracle=_pagerank_oracle(),
    doc="PageRank centrality over the symmetric MinHash near-dup graph"
    f" ({N_ITER} iterations, damping {DAMPING}): rank mass concentrates"
    " in large duplicate clusters — a corpus-importance /"
    " representative-selection signal. Iterative join + partial-agg"
    " shuffle per round with reliable checkpoints; fixed-point"
    " contribution sums make the result cluster-order-independent —"
    " verified bit-exact against BOTH a numpy replay (pytest) and an"
    " unrolled DuckDB CTE replay of all iterations (oracle gate).",
)
def q_pagerank_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # materialize the (expensive) LSH pair query ONCE before the
    # symmetrizing union — both union branches and every pagerank
    # iteration read the checkpointed pair list, not the live plan
    pairs = _checkpoint(q_minhash_neardup(spark, sf_dir))
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    return pagerank(edges)


@register(
    "q_triangle_stats",
    oracle=f"""
        WITH {_minhash_pairs_cte()},
        e AS (SELECT doc_a AS a, doc_b AS b FROM mpairs),
        sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
        deg AS (SELECT a AS doc_id, count(*) AS degree FROM sym GROUP BY a),
        tri AS (
            SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM e e1
            JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
            JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
        ),
        roles AS (
            SELECT x AS doc_id FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri
        ),
        tcount AS (
            SELECT doc_id, count(*) AS n_triangles FROM roles GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(d.degree AS BIGINT) AS degree,
               CAST(COALESCE(t.n_triangles, 0) AS BIGINT) AS n_triangles,
               CASE WHEN d.degree >= 2
                    THEN CAST(2 * COALESCE(t.n_triangles, 0) AS DOUBLE)
                         / (d.degree * (d.degree - 1))
                    ELSE CAST(0 AS DOUBLE) END AS clustering_coeff
        FROM deg d LEFT JOIN tcount t USING (doc_id)
    """,
    doc="Per-node triangle count + local clustering coefficient over the"
    " MinHash near-dup graph — the standard graph diagnostic separating"
    " tight duplicate CLIQUES (coeff ~1: one canonical doc suffices)"
    " from hub-and-spoke template families (coeff ~0: a shared"
    " boilerplate shell with distinct bodies — dedup must NOT collapse"
    " them to one survivor). Triangles enumerate on the id-oriented"
    " canonical edge list (a<b), the join-based node-iterator: each"
    " triangle materializes exactly once as x<y<z via two equi-joins."
    " At 100 TB orientation by DEGREE (not id) bounds the join fanout"
    " by the arboricity; id-orientation suffices here because near-dup"
    " components are cluster-sized. Everything is exact integer math"
    " plus one IEEE division, so the whole pipeline hash-matches the"
    " DuckDB replay.",
)
def q_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _checkpoint(q_minhash_neardup(spark, sf_dir))
    e = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy(F.col("a").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    tri = (
        e1.join(e2, "x")
        .filter(F.col("z") > F.col("y"))
        .join(e3, ["y", "z"])
    )
    roles = (
        tri.select(F.col("x").alias("doc_id"))
        .unionByName(tri.select(F.col("y").alias("doc_id")))
        .unionByName(tri.select(F.col("z").alias("doc_id")))
    )
    tcount = roles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_triangles"))
    coeff = F.when(
        F.col("degree") >= 2,
        (F.lit(2) * F.col("n_triangles")).cast("double")
        / (F.col("degree") * (F.col("degree") - 1)),
    ).otherwise(F.lit(0.0))
    return (
        deg.join(tcount, "doc_id", "left")
        .select(
            "doc_id",
            F.col("degree").cast("bigint").alias("degree"),
            F.coalesce(F.col("n_triangles"), F.lit(0))
            .cast("bigint")
            .alias("n_triangles"),
            coeff.alias("clustering_coeff"),
        )
    )
