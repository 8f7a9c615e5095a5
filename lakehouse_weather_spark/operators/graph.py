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

from lakehouse_weather_spark.operators.dedup import _checkpoint, q_minhash_neardup
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
    (contributions rounded at 1e-12 fixed point, integer-summed —
    associative), then rank = (1-d)/N + d * received. Nodes with no
    in-edges keep the teleport term. Scale shape per iteration: one
    broadcast-or-shuffle join of ranks onto edges + one partial-agg
    shuffle on dst.

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
                    f"CAST(round(rank / deg * {RANK_SCALE}, 0) AS BIGINT)"
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


@register(
    "q_pagerank_neardup",
    oracle=None,  # iterative; bit-exact numpy replay asserted in pytest
    doc="PageRank centrality over the symmetric MinHash near-dup graph"
    f" ({N_ITER} iterations, damping {DAMPING}): rank mass concentrates"
    " in large duplicate clusters — a corpus-importance /"
    " representative-selection signal. Iterative join + partial-agg"
    " shuffle per round with reliable checkpoints; fixed-point"
    " contribution sums make the result cluster-order-independent"
    " (verified bit-exact against a numpy replay).",
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
