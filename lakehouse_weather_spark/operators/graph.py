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
    minhash_pairs_cached,
    _minhash_pairs_cte,
    q_minhash_neardup,
)
from lakehouse_weather_spark.registry import register

RANK_SCALE = 1_000_000_000_000
N_ITER = 5
DAMPING = 0.85
# damping as an exact rational so every iteration stays in int64 —
# 0.85 == DAMP_NUM / DAMP_DEN
DAMP_NUM = 85
DAMP_DEN = 100


def pagerank(
    edges: DataFrame,
    n_iter: int = N_ITER,
    damping: float = DAMPING,
    checkpoint_every: int = 3,
) -> DataFrame:
    """PageRank over a directed edge list (src, dst) -> (node, rank).

    Rank is carried as int64 FIXED POINT (units of 1/RANK_SCALE) across
    ALL iterations; doubles appear only in the final output projection.
    Per iteration: each node sends rank_fx div out_degree along its
    out-edges (int64 truncating division — exact floor for the
    non-negative ranks), contributions are integer-summed (associative,
    order-independent), then
    rank_fx = tp_fx + (received * DAMP_NUM) div DAMP_DEN — exact
    rational damping, no float anywhere. Nodes with no in-edges keep
    the teleport term. The all-integer loop is bit-identical in Spark,
    numpy and DuckDB BY CONSTRUCTION: carrying a double rank between
    rounds (the previous design) left last-ulp daylight between
    engines' expression trees that surfaced at sf0.1 (36/568 rows one
    ulp apart). Magnitudes: total rank mass is ~RANK_SCALE = 1e12, so
    received*DAMP_NUM <= ~8.5e13 << 2**63. Scale shape per iteration:
    one broadcast-or-shuffle join of ranks onto edges + one partial-agg
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
    if n == 0:
        # empty edge list: no nodes, no ranks — avoid the 1/n teleport
        # division and return the empty (node, rank) frame directly
        return nodes.select(
            "node", F.lit(None).cast("double").alias("rank")
        )
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edges_deg = edges.join(out_deg, "src")

    assert damping == DAMP_NUM / DAMP_DEN, "fixed-point loop assumes 85/100"
    ranks = nodes.withColumn(
        "rank_fx", F.lit(RANK_SCALE // n).cast("bigint")
    )
    tp_fx = (RANK_SCALE * (DAMP_DEN - DAMP_NUM)) // (DAMP_DEN * n)
    for it in range(n_iter):
        contrib = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_fx div deg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("received"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(tp_fx).cast("bigint")
                    + F.expr(
                        f"(coalesce(received, 0L) * {DAMP_NUM})"
                        f" div {DAMP_DEN}"
                    )
                ).alias("rank_fx"),
            )
        )
        if checkpoint_every and it % checkpoint_every == checkpoint_every - 1:
            # eager=False: truncates the unrolled plan the same way but
            # defers materialization to the final action — the rank
            # chain computes once, block-backed, with no per-cut jobs
            ranks = _checkpoint(ranks, eager=False)
    return ranks.select(
        "node", (F.col("rank_fx").cast("double") / RANK_SCALE).alias("rank")
    )


def _pagerank_oracle() -> str:
    """Unrolled DuckDB replay of the N_ITER pagerank rounds. Everything
    through the last iteration is int64 fixed point (DuckDB's integer
    division // truncates like Spark's div on the non-negative ranks;
    sums are cast back to BIGINT from DuckDB's HUGEINT accumulator), so
    the replay is exactly the operator's arithmetic — the only float op
    is the shared final CAST/divide, which is one IEEE division of
    identical integers on both engines."""
    its = []
    prev = "r0"
    for i in range(1, N_ITER + 1):
        its.append(f"""
        recv{i} AS (
            SELECT ed.dst AS node,
                   CAST(sum(p.rank_fx // ed.deg) AS BIGINT) AS received
            FROM ed JOIN {prev} p ON ed.src = p.node
            GROUP BY ed.dst
        ),
        r{i} AS (
            SELECT n.node,
                   CAST((SELECT tp_fx FROM consts)
                        + (COALESCE(rc.received, 0) * {DAMP_NUM})
                          // {DAMP_DEN} AS BIGINT) AS rank_fx
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
            SELECT count(*) AS n,
                   CAST({RANK_SCALE} * {DAMP_DEN - DAMP_NUM}
                        // ({DAMP_DEN} * count(*)) AS BIGINT) AS tp_fx,
                   CAST({RANK_SCALE} // count(*) AS BIGINT) AS r_init_fx
            FROM nodes
        ),
        deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        ed AS (SELECT e.src, e.dst, d.deg FROM e JOIN deg d USING (src)),
        r0 AS (
            SELECT node, (SELECT r_init_fx FROM consts) AS rank_fx
            FROM nodes
        ),{chain}
        SELECT node, CAST(rank_fx AS DOUBLE) / {RANK_SCALE} AS rank
        FROM {prev}
    """


@register(
    "q_pagerank_neardup",
    oracle=_pagerank_oracle(),
    doc="PageRank centrality over the symmetric MinHash near-dup graph"
    f" ({N_ITER} iterations, damping {DAMPING}): rank mass concentrates"
    " in large duplicate clusters — a corpus-importance /"
    " representative-selection signal. Iterative join + partial-agg"
    " shuffle per round with reliable checkpoints; the loop is pure"
    " int64 fixed point (integer div/mul/sum only), so the result is"
    " cluster-order-independent and engine-independent — verified"
    " bit-exact against BOTH a numpy replay (pytest) and an unrolled"
    " DuckDB CTE replay of all iterations (oracle gate).",
)
def q_pagerank_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # materialize the (expensive) LSH pair query ONCE before the
    # symmetrizing union — both union branches and every pagerank
    # iteration read the checkpointed pair list, not the live plan
    pairs = minhash_pairs_cached(spark, sf_dir)
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
    pairs = minhash_pairs_cached(spark, sf_dir)
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


@register(
    "q_degree_hist",
    oracle=f"""
        WITH {_minhash_pairs_cte()},
        e AS (SELECT doc_a AS src, doc_b AS dst FROM mpairs
              UNION ALL SELECT doc_b, doc_a FROM mpairs),
        deg AS (SELECT src, count(*) AS degree FROM e GROUP BY src)
        SELECT CAST(degree AS BIGINT) AS degree,
               CAST(count(*) AS BIGINT) AS n_nodes
        FROM deg GROUP BY degree
    """,
    doc="Degree distribution of the MinHash near-dup graph — the"
    " one-glance diagnostic for duplicate-cluster structure (a heavy"
    " tail means mega-clusters that will dominate connected-components"
    " work and deserve df-cap / banding retuning BEFORE the expensive"
    " CC loop runs). Two partial-agg shuffles over the pair list;"
    " output is histogram buckets, constant-sized at any corpus"
    " scale.",
)
def q_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = minhash_pairs_cached(spark, sf_dir)
    e = pairs.select(F.col("doc_a").alias("src")).unionByName(
        pairs.select(F.col("doc_b").alias("src"))
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    ).select(F.col("degree").cast("bigint").alias("degree"), "n_nodes")


@register(
    "q_link_prediction",
    oracle=f"""
        WITH {_minhash_pairs_cte()},
        e AS (SELECT doc_a AS a, doc_b AS b FROM mpairs),
        sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
        deg AS (SELECT a AS node, count(*) AS degree FROM sym GROUP BY a),
        cand AS (
            SELECT s1.b AS u, s2.b AS v, count(*) AS n_common
            FROM sym s1 JOIN sym s2
              ON s1.a = s2.a AND s1.b < s2.b
            GROUP BY s1.b, s2.b
        ),
        nonedge AS (
            SELECT c.u, c.v, c.n_common
            FROM cand c
            LEFT JOIN e ON e.a = c.u AND e.b = c.v
            WHERE e.a IS NULL
        )
        SELECT n.u AS doc_a, n.v AS doc_b,
               CAST(n.n_common AS BIGINT) AS n_common,
               CAST(n.n_common AS DOUBLE)
                   / (du.degree + dv.degree - n.n_common)
                   AS neighborhood_jaccard
        FROM nonedge n
        JOIN deg du ON du.node = n.u
        JOIN deg dv ON dv.node = n.v
    """,
    doc="Link prediction over the MinHash near-dup graph: for every"
    " NON-adjacent doc pair with at least one common neighbor, the"
    " common-neighbor count and neighborhood Jaccard — the standard"
    " missing-edge recovery signal (LSH banding has false NEGATIVES;"
    " two docs sharing many near-dup neighbors are almost surely"
    " near-dups the bands missed, so these pairs are the re-score"
    " candidates a production dedup feeds back into exact verification)."
    " Shape: one wedge self-join on the shared middle node (the same"
    " 2-path enumeration as q_triangle_stats, bounded by the near-dup"
    " graph's cluster-sized components), one partial-agg, one anti-join"
    " against existing edges, two broadcast-sized degree joins. Exact"
    " integer counts + one IEEE division, bit-identical to the DuckDB"
    " replay.",
)
def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = minhash_pairs_cached(spark, sf_dir)
    e = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = sym.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    s1 = sym.select(F.col("a").alias("m"), F.col("b").alias("u"))
    s2 = sym.select(F.col("a").alias("m"), F.col("b").alias("v"))
    cand = (
        s1.join(s2, "m")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    nonedge = cand.join(
        e,
        (cand.u == e.a) & (cand.v == e.b),
        "left_anti",
    )
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("deg_v"))
    return (
        nonedge.join(du, "u")
        .join(dv, "v")
        .select(
            F.col("u").alias("doc_a"),
            F.col("v").alias("doc_b"),
            F.col("n_common").cast("bigint").alias("n_common"),
            (
                F.col("n_common").cast("double")
                / (F.col("deg_u") + F.col("deg_v") - F.col("n_common"))
            ).alias("neighborhood_jaccard"),
        )
    )


# --- semi-supervised label propagation -------------------------------

# Every 10th document is "labeled" (its lang is the class); the rest
# start unlabeled. Deterministic stand-in for a partially-labeled
# corpus — no rand().
_SEED_MOD = 10
# Fixed unrolled iteration count: 2 hops reach everything inside the
# cluster-sized near-dup components the banding produces.
_LP_ROUNDS = 2


def _lp_round_sql(prev: str, k: int) -> str:
    """One majority-vote round as a CTE chain extending ``prev``."""
    return f"""
        c{k} AS (
            SELECT s.u, l.label, count(*) AS cnt
            FROM sym s JOIN {prev} l ON l.doc_id = s.v
            GROUP BY s.u, l.label
        ),
        p{k} AS (
            SELECT u AS doc_id, label FROM (
                SELECT u, label,
                       row_number() OVER (PARTITION BY u
                           ORDER BY cnt DESC, label ASC) AS rk
                FROM c{k}
            ) WHERE rk = 1
        ),
        l{k} AS (
            SELECT doc_id, label FROM seeds
            UNION ALL
            SELECT p.doc_id, p.label FROM p{k} p
            LEFT JOIN seeds sd ON sd.doc_id = p.doc_id
            WHERE sd.doc_id IS NULL
        )"""


@register(
    "q_label_propagation",
    oracle=f"""
        WITH {_minhash_pairs_cte()},
        sym AS (
            SELECT doc_a AS u, doc_b AS v FROM mpairs
            UNION ALL
            SELECT doc_b, doc_a FROM mpairs
        ),
        seeds AS (
            SELECT doc_id, lang AS label FROM documents
            WHERE doc_id % {_SEED_MOD} = 0
        ),
        l0 AS (SELECT doc_id, label FROM seeds),
        {_lp_round_sql('l0', 1)},
        {_lp_round_sql('l1', 2)}
        SELECT l.doc_id, l.label,
               (l.doc_id % {_SEED_MOD} = 0) AS is_seed
        FROM l{_LP_ROUNDS} l
    """,
    doc="Semi-supervised label propagation (Zhu & Ghahramani 2002"
    " majority-vote variant) over the MinHash near-dup graph: every"
    " 10th document seeds its language as a class label; two"
    " synchronous rounds of neighbor majority vote (ties break to the"
    " lexicographically smallest label; seeds are clamped) spread"
    " labels through the duplicate clusters — the cheap annotation"
    " amplifier for weakly-labeled corpora. Each round is ONE"
    " join-of-labels-onto-edges + ONE partial agg + ONE rank window"
    " on the candidate votes, all keyed by node id; the driver holds"
    " nothing. Deterministic tie-breaks make the fixpoint replayable"
    " bit-for-bit in DuckDB.",
)
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from lakehouse_weather_spark.sources.tables import load_table

    pairs = minhash_pairs_cached(spark, sf_dir)
    sym = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    docs = load_table(spark, sf_dir, "documents")
    seeds = docs.filter(F.col("doc_id") % _SEED_MOD == 0).select(
        "doc_id", F.col("lang").alias("label")
    )

    labels = seeds
    for _ in range(_LP_ROUNDS):
        votes = (
            sym.join(
                labels.select(
                    F.col("doc_id").alias("v"), F.col("label")
                ),
                "v",
            )
            .groupBy("u", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        w = Window.partitionBy("u").orderBy(
            F.desc("cnt"), F.asc("label")
        )
        winner = (
            votes.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(F.col("u").alias("doc_id"), "label")
        )
        labels = seeds.unionByName(
            winner.join(seeds.select("doc_id"), "doc_id", "left_anti")
        )

    return labels.select(
        "doc_id",
        "label",
        (F.col("doc_id") % _SEED_MOD == 0).alias("is_seed"),
    )


# --- cross-source duplication matrix ---------------------------------


@register(
    "q_source_overlap",
    oracle=f"""
        WITH {_minhash_pairs_cte()},
        lab AS (
            SELECT p.doc_a, p.doc_b,
                   least(da.source, db.source) AS src_a,
                   greatest(da.source, db.source) AS src_b
            FROM mpairs p
            JOIN documents da ON da.doc_id = p.doc_a
            JOIN documents db ON db.doc_id = p.doc_b
        )
        SELECT src_a, src_b,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(count(DISTINCT doc_a) + count(DISTINCT doc_b)
                    AS BIGINT) AS n_docs_touched
        FROM lab GROUP BY src_a, src_b
    """,
    doc="Cross-source duplication matrix: the MinHash near-dup pairs"
    " labeled by the (unordered) source pair of their endpoints — the"
    " provenance diagnostic that tells a curation pipeline WHICH"
    " sources mirror each other (syndication, scraping loops) so"
    " dedup priorities and source caps can be set per-pair rather"
    " than globally. Derived entirely from the already-verified"
    " near-dup pair list via two broadcast-able doc-metadata joins +"
    " one partial agg; output is |sources|^2-bounded. Bit-exact.",
)
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_weather_spark.sources.tables import load_table

    pairs = minhash_pairs_cached(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    lab = (
        pairs.join(
            docs.select(
                F.col("doc_id").alias("doc_a"),
                F.col("source").alias("sa"),
            ),
            "doc_a",
        )
        .join(
            docs.select(
                F.col("doc_id").alias("doc_b"),
                F.col("source").alias("sb"),
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.least("sa", "sb").alias("src_a"),
            F.greatest("sa", "sb").alias("src_b"),
        )
    )
    return lab.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        (F.countDistinct("doc_a") + F.countDistinct("doc_b"))
        .cast("bigint")
        .alias("n_docs_touched"),
    )


# ---------------------------------------------------------------------------
# Recursive-CTE bounded-radius BFS (Spark 4 WITH RECURSIVE surface)
# ---------------------------------------------------------------------------

BFS_RADIUS = 3

# The recursive body + final select are IDENTICAL SQL on both engines —
# Spark 4 runs WITH RECURSIVE natively (UnionLoopExec iterations),
# DuckDB replays the same text in the oracle. Pairs come from `{pairs}`.
_BFS_BODY = f"""
    e AS (
        SELECT doc_a AS src, doc_b AS dst FROM {{pairs}}
        UNION ALL
        SELECT doc_b, doc_a FROM {{pairs}}
    ),
    seed AS (SELECT min(src) AS s FROM e),
    walk(node, hops) AS (
        SELECT s, 0 FROM seed
        UNION ALL
        SELECT e.dst, w.hops + 1
        FROM walk w JOIN e ON e.src = w.node
        WHERE w.hops < {BFS_RADIUS}
    )
"""
_BFS_SELECT = """
    SELECT CAST(node AS BIGINT) AS node,
           CAST(min(hops) AS BIGINT) AS hops
    FROM walk
    GROUP BY node
"""


@register(
    "q_bfs_radius",
    oracle=(
        f"WITH RECURSIVE {_minhash_pairs_cte()},"
        f" {_BFS_BODY.format(pairs='mpairs')} {_BFS_SELECT}"
    ),
    doc=f"Bounded-radius BFS (radius {BFS_RADIUS}) from the smallest"
    " edge-bearing doc over the MinHash near-dup graph, written as a"
    " NATIVE WITH RECURSIVE query — Spark 4's recursive-CTE surface"
    " running the IDENTICAL SQL text the DuckDB oracle replays;"
    " min-hop distance per reached node. The UNION ALL walk is"
    " exponential in dense neighborhoods, so the radius bound is"
    " load-bearing: bounded-radius ego networks are the legitimate"
    " recursive-CTE use (feature extraction around a seed), while"
    " UNBOUNDED closure at 100 TB belongs to the checkpointed"
    " DataFrame loops shipped in pagerank/label_propagate — same"
    " result, memory-safe frontier per round.",
)
def q_bfs_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = minhash_pairs_cached(spark, sf_dir)
    pairs.createOrReplaceTempView("lws_bfs_pairs")
    return spark.sql(
        f"WITH RECURSIVE {_BFS_BODY.format(pairs='lws_bfs_pairs')}"
        f" {_BFS_SELECT}"
    )


# --- k-core decomposition (bounded peel) -----------------------------

KCORE_K = 2  # keep nodes with >= K neighbors inside the surviving core
KCORE_ROUNDS = 16  # bounded peel rounds (both engines run exactly these)


def _kcore_oracle() -> str:
    """Unrolled DuckDB replay of KCORE_ROUNDS peel rounds. Each round
    recomputes degrees over the surviving edge set and keeps only
    edges whose BOTH endpoints still have degree >= K — aggregates in
    the loop body rule out a recursive CTE, so the rounds unroll as a
    CTE chain, each MATERIALIZED so multiple references do not inline
    exponentially (rounds past convergence are no-ops, so the bounded
    unroll equals the fixpoint whenever the peel converges early)."""
    parts = [
        f"WITH {_minhash_pairs_cte()},",
        "e0 AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM mpairs)",
    ]
    for r in range(1, KCORE_ROUNDS + 1):
        parts.append(
            f""",
        d{r} AS MATERIALIZED (
            SELECT n, count(*) AS deg FROM (
                SELECT a AS n FROM e{r - 1}
                UNION ALL SELECT b FROM e{r - 1}
            ) GROUP BY n
        ),
        k{r} AS (SELECT n FROM d{r} WHERE deg >= {KCORE_K}),
        e{r} AS MATERIALIZED (
            SELECT e.a, e.b FROM e{r - 1} e
            JOIN k{r} ka ON ka.n = e.a
            JOIN k{r} kb ON kb.n = e.b
        )"""
        )
    parts.append(
        f"""
        SELECT n AS doc_id, CAST(count(*) AS BIGINT) AS core_degree
        FROM (
            SELECT a AS n FROM e{KCORE_ROUNDS}
            UNION ALL SELECT b FROM e{KCORE_ROUNDS}
        ) GROUP BY n"""
    )
    return "".join(parts)


@register(
    "q_kcore",
    oracle=_kcore_oracle(),
    doc=f"{KCORE_K}-core decomposition of the MinHash near-dup graph by"
    f" iterative peeling (bounded at {KCORE_ROUNDS} rounds, early-exit"
    " on fixpoint): repeatedly drop nodes with fewer than"
    f" {KCORE_K} surviving neighbors until stable. The surviving core"
    " separates genuinely ENTANGLED duplicate families (every member"
    " near-dups >= 2 others — resolve carefully) from isolated pairs"
    " and chain tails that a simple keep-best handles; core degree is"
    " the standard graph-density curriculum signal. Each round is one"
    " partial-agg degree shuffle + two semi-joins on the shrinking"
    " edge list, checkpointed so lineage stays flat; the driver holds"
    " only the edge counter. Early exit is sound because peeling only"
    " removes: an unchanged edge count means an unchanged edge SET,"
    " so every later round is a no-op — which is also why the"
    " oracle's bounded unroll replays the fixpoint exactly.",
)
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = minhash_pairs_cached(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    n_prev = edges.count()
    for _ in range(KCORE_ROUNDS):
        if n_prev == 0:
            break
        sym = edges.unionByName(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        keep = (
            sym.groupBy(F.col("a").alias("n"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= KCORE_K)
            .select("n")
        )
        # eager=False: the count() below materializes the round's edge
        # blocks anyway — the eager form paid a second, identical job
        edges = _checkpoint(
            edges.join(keep.withColumnRenamed("n", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("n", "b"), "b", "left_semi")
            .select("a", "b"),
            eager=False,
        )
        n = edges.count()
        if n == n_prev:
            break
        n_prev = n
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    return sym.groupBy(F.col("a").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("core_degree")
    )


# --- degree assortativity --------------------------------------------


@register(
    "q_assortativity",
    oracle=f"""
        WITH {_minhash_pairs_cte()},
        e AS (SELECT doc_a AS a, doc_b AS b FROM mpairs),
        sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
        deg AS (SELECT a AS n, CAST(count(*) AS BIGINT) AS d
                FROM sym GROUP BY a),
        xy AS (
            SELECT da.d AS x, db.d AS y
            FROM sym s
            JOIN deg da ON da.n = s.a
            JOIN deg db ON db.n = s.b
        ),
        mom AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy,
                   CAST(sum(x * y) AS BIGINT) AS sxy
            FROM xy
        )
        SELECT n AS n_directed_edges,
               CASE WHEN n * sxx - sx * sx = 0
                      OR n * syy - sy * sy = 0 THEN CAST(0 AS DOUBLE)
                    ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                            * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
               END AS assortativity
        FROM mom
    """,
    doc="Degree assortativity of the MinHash near-dup graph: Pearson"
    " correlation of endpoint degrees over the symmetric edge list —"
    " positive means duplicate-heavy docs link to other hubs (big"
    " template families), negative means hub-and-spoke (one canonical"
    " doc with many singleton variants); it decides whether cluster"
    " representatives or star centers are the right dedup survivors."
    " Six exact int64 sufficient sums via one partial agg over the"
    " degree-joined edges (q_corr_matrix's one-scan moments pattern"
    " on graph data; at 100 TB the sums ride in DECIMAL(38,0)),"
    " then a single closed-form evaluation where int->double, sqrt,"
    " and division are all IEEE-exact — degenerate (constant-degree)"
    " graphs define r = 0 on the zero-variance guard.",
)
def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = minhash_pairs_cached(spark, sf_dir)
    e = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy(F.col("a").alias("n")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    xy = (
        sym.join(deg.select(F.col("n").alias("a"), F.col("d").alias("x")), "a")
        .join(deg.select(F.col("n").alias("b"), F.col("d").alias("y")), "b")
        .select("x", "y")
    )
    mom = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    r = F.when((vx == 0) | (vy == 0), F.lit(0.0)).otherwise(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double")))
    )
    return mom.select(
        F.col("n").alias("n_directed_edges"), r.alias("assortativity")
    )


# --- weighted shortest paths (bounded Bellman-Ford) -------------------

BF_ROUNDS = 4  # min-plus relaxation rounds (both engines run exactly these)

# Deterministic integer edge weight in [1, 9] from the canonical pair —
# a stand-in for a similarity distance; md5 (never hash()) so weights
# agree across engines, runs, and partitionings.
_BF_W_SPARK = (
    "1 + pmod(cast(conv(substr(md5(concat('bf_', cast(doc_a as string),"
    " '_', cast(doc_b as string))), 1, 15), 16, 10) as bigint), 9)"
)
_BF_W_DUCK = (
    "1 + CAST(('0x' || substr(md5('bf_' || CAST(doc_a AS VARCHAR) || '_'"
    " || CAST(doc_b AS VARCHAR)), 1, 15)) AS BIGINT) % 9"
)


def _bellman_oracle() -> str:
    parts = [
        f"WITH {_minhash_pairs_cte()},",
        f"""
        we AS MATERIALIZED (
            SELECT doc_a, doc_b, {_BF_W_DUCK} AS w FROM mpairs
        ),
        e AS MATERIALIZED (
            SELECT doc_a AS src, doc_b AS dst, w FROM we
            UNION ALL SELECT doc_b, doc_a, w FROM we
        ),
        d0 AS MATERIALIZED (
            SELECT min(src) AS node, CAST(0 AS BIGINT) AS dist FROM e
        )""",
    ]
    for r in range(1, BF_ROUNDS + 1):
        parts.append(
            f""",
        d{r} AS MATERIALIZED (
            SELECT node, min(dist) AS dist FROM (
                SELECT node, dist FROM d{r - 1}
                UNION ALL
                SELECT e.dst AS node, d.dist + e.w AS dist
                FROM d{r - 1} d JOIN e ON e.src = d.node
            ) GROUP BY node
        )"""
        )
    parts.append(
        f"""
        SELECT CAST(node AS BIGINT) AS node,
               CAST(dist AS BIGINT) AS dist
        FROM d{BF_ROUNDS}"""
    )
    return "".join(parts)


@register(
    "q_bellman_ford",
    oracle=_bellman_oracle(),
    doc=f"Weighted single-source shortest paths by {BF_ROUNDS} rounds of"
    " Bellman-Ford min-plus relaxation over the near-dup graph"
    " (deterministic md5 edge weights stand in for a similarity"
    " distance; source = smallest edge-bearing doc). Each round is"
    " ONE equi-join of the frontier table against the edge list +"
    " one min partial agg — the iterative-relaxation shape that"
    " scales where Dijkstra's priority queue cannot, and the"
    " weighted generalization of q_bfs_radius's hop counting."
    " Distances are exact int64 mins (no float accumulation), every"
    " round checkpoints, and the bounded round count is part of the"
    " semantics: both engines run EXACTLY the same relaxations, so"
    " nodes beyond the horizon carry identical partial bounds.",
)
def q_bellman_ford(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = minhash_pairs_cached(spark, sf_dir)
    we = pairs.select("doc_a", "doc_b", F.expr(_BF_W_SPARK).alias("w"))
    e = we.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"), "w"
    ).unionByName(
        we.select(
            F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"), "w"
        )
    )
    e = _checkpoint(e, eager=False)
    d = e.agg(F.min("src").alias("node")).select(
        "node", F.lit(0).cast("bigint").alias("dist")
    )
    for _ in range(BF_ROUNDS):
        relaxed = d.join(e, d["node"] == e["src"]).select(
            F.col("dst").alias("node"),
            (F.col("dist") + F.col("w")).alias("dist"),
        )
        d = _checkpoint(
            d.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").cast("bigint").alias("dist")),
            eager=False,
        )
    return d.select(F.col("node").cast("bigint").alias("node"), "dist")


# --- 2-hop neighborhoods ----------------------------------------------


@register(
    "q_graph_2hop",
    oracle=f"""
        WITH {_minhash_pairs_cte()},
        sym AS (
            SELECT doc_a AS u, doc_b AS v FROM mpairs
            UNION ALL
            SELECT doc_b, doc_a FROM mpairs
        ),
        hop2 AS (
            SELECT DISTINCT s1.u, s2.v
            FROM sym s1 JOIN sym s2 ON s1.v = s2.u AND s2.v <> s1.u
        ),
        strict2 AS (
            SELECT h.u, h.v FROM hop2 h
            WHERE NOT EXISTS (
                SELECT 1 FROM sym s WHERE s.u = h.u AND s.v = h.v
            )
        ),
        n1 AS (SELECT u, count(DISTINCT v) AS n_1hop FROM sym GROUP BY u),
        n2 AS (SELECT u, count(*) AS n_2hop FROM strict2 GROUP BY u)
        SELECT n1.u AS doc_id,
               CAST(n1.n_1hop AS BIGINT) AS n_1hop,
               CAST(coalesce(n2.n_2hop, 0) AS BIGINT) AS n_2hop_strict
        FROM n1 LEFT JOIN n2 USING (u)
    """,
    doc="Strict 2-hop neighborhood size per node over the MinHash"
    " near-dup graph (friends-of-friends that are not already"
    " neighbors, self excluded) — the transitive-duplication reach"
    " signal: a doc with small degree but large 2-hop reach sits"
    " between duplicate clusters that the pairwise threshold keeps"
    " separate. Plan: one self-equi-join of the symmetric edge list on"
    " the middle node + distinct + anti-join back onto edges + one agg"
    " — all equi-shuffles on node id. Scale: the join fan-out is"
    " bounded by the df-capped degree (the banding df-caps shingle"
    " buckets upstream), the standard guard for power-law graphs.",
)
def q_graph_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = minhash_pairs_cached(spark, sf_dir)
    sym = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    s2 = sym.select(F.col("u").alias("mid"), F.col("v").alias("w"))
    hop2 = (
        sym.join(s2, sym.v == s2.mid)
        .filter(F.col("w") != F.col("u"))
        .select("u", F.col("w").alias("v"))
        .distinct()
    )
    strict2 = hop2.join(sym, ["u", "v"], "left_anti")
    n1 = sym.groupBy("u").agg(
        F.countDistinct("v").cast("bigint").alias("n_1hop")
    )
    n2 = strict2.groupBy("u").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_2hop")
    )
    return (
        n1.join(n2, "u", "left")
        .select(
            F.col("u").alias("doc_id"),
            "n_1hop",
            F.coalesce("n_2hop", F.lit(0)).cast("bigint").alias("n_2hop_strict"),
        )
    )


# --- modularity of the source partition -------------------------------


@register(
    "q_modularity",
    oracle=f"""
        WITH {_minhash_pairs_cte()},
        m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM mpairs),
        sym AS (
            SELECT doc_a AS u, doc_b AS v FROM mpairs
            UNION ALL SELECT doc_b, doc_a FROM mpairs
        ),
        deg AS (SELECT u, count(*) AS deg FROM sym GROUP BY u),
        nsrc AS (
            SELECT d.u, doc.source FROM deg d
            JOIN documents doc ON doc.doc_id = d.u
        ),
        dsum AS (
            SELECT n.source, CAST(count(*) AS BIGINT) AS n_nodes,
                   CAST(sum(deg.deg) AS BIGINT) AS d_sum
            FROM nsrc n JOIN deg ON deg.u = n.u
            GROUP BY n.source
        ),
        ein AS (
            SELECT da.source, CAST(count(*) AS BIGINT) AS e_in
            FROM mpairs p
            JOIN documents da ON da.doc_id = p.doc_a
            JOIN documents db ON db.doc_id = p.doc_b
            WHERE da.source = db.source
            GROUP BY da.source
        ),
        rows_ AS (
            SELECT d.source, d.n_nodes, coalesce(e.e_in, 0) AS e_in,
                   d.d_sum,
                   4 * m.m * coalesce(e.e_in, 0) - d.d_sum * d.d_sum
                       AS q_num
            FROM dsum d LEFT JOIN ein e USING (source), m
        )
        SELECT r.source, r.n_nodes, r.e_in, r.d_sum,
               CAST(r.q_num AS DOUBLE) / (4.0 * m.m * m.m)
                   AS contribution,
               CAST((SELECT sum(q_num) FROM rows_) AS DOUBLE)
                   / (4.0 * m.m * m.m) AS modularity_total
        FROM rows_ r, m
    """,
    doc="Newman modularity of the SOURCE partition over the near-dup"
    " graph: Q = sum_c [e_c/m - (d_c/2m)^2], computed as one exact"
    " integer numerator per community over the common denominator 4m^2"
    " (sum of per-community doubles would be association-order-"
    " dependent; the integer form is engine- and partition-order-"
    " exact, int64-safe while d_c < 3e9 and m < 1.5e9). High Q means"
    " duplication is intra-source (dedup shards cleanly by source);"
    " Q near 0 means cross-source mirroring dominates — the decision"
    " signal for partitioning a 100 TB dedup by provenance. Plan:"
    " degree agg + two broadcast-dimension joins + a 2-row-level agg;"
    " raw pairs shuffle once.",
)
def q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_weather_spark.sources.tables import load_table

    pairs = minhash_pairs_cached(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    mrow = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    sym = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    dsum = (
        deg.join(F.broadcast(docs.withColumnRenamed("doc_id", "u")), "u")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("deg").cast("bigint").alias("d_sum"),
        )
    )
    ein = (
        pairs.join(
            F.broadcast(
                docs.select(
                    F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")
                )
            ),
            "doc_a",
        )
        .join(
            F.broadcast(
                docs.select(
                    F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")
                )
            ),
            "doc_b",
        )
        .filter(F.col("sa") == F.col("sb"))
        .groupBy(F.col("sa").alias("source"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_in"))
    )
    rows = (
        dsum.join(ein, "source", "left")
        .crossJoin(F.broadcast(mrow))
        .select(
            "source",
            "n_nodes",
            F.coalesce("e_in", F.lit(0)).cast("bigint").alias("e_in"),
            "d_sum",
            "m",
            (
                4 * F.col("m") * F.coalesce("e_in", F.lit(0))
                - F.col("d_sum") * F.col("d_sum")
            )
            .cast("bigint")
            .alias("q_num"),
        )
    )
    tot = rows.agg(F.sum("q_num").cast("bigint").alias("q_num_total"))
    return rows.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_nodes",
        "e_in",
        "d_sum",
        (
            F.col("q_num").cast("double")
            / (F.lit(4.0) * F.col("m") * F.col("m"))
        ).alias("contribution"),
        (
            F.col("q_num_total").cast("double")
            / (F.lit(4.0) * F.col("m") * F.col("m"))
        ).alias("modularity_total"),
    )


# ---------------------------------------------------------------------------
# Markov-chain stationary distribution over the event-type transition
# matrix (integer fixed-point power iteration, unrolled in the oracle)
# ---------------------------------------------------------------------------

_MK_SCALE = 1_000_000_000
_MK_ITERS = 8


def _mk_oracle() -> str:
    steps = []
    prev = "v0"
    for k in range(1, _MK_ITERS + 1):
        steps.append(
            f"""v{k} AS (
            SELECT m.to_t AS state,
                   CAST(sum((p.v * m.c) // m.r) AS BIGINT) AS v
            FROM m JOIN {prev} p ON p.state = m.from_t
            GROUP BY m.to_t
        )"""
        )
        prev = f"v{k}"
    joined = ",\n        ".join(steps)
    return f"""
        WITH ordered AS (
            -- complete cases: a NULL event_type would enter the
            -- DISTINCT state count here but drop from the matrix join
            -- (NULL never equi-joins), skewing v0's mass split; a NULL
            -- ts orders NULLS LAST here vs NULLS FIRST in Spark
            SELECT user_id, event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events
            WHERE event_type IS NOT NULL AND ts IS NOT NULL
        ),
        m0 AS (
            SELECT event_type AS from_t, next_type AS to_t,
                   CAST(count(*) AS BIGINT) AS c
            FROM ordered WHERE next_type IS NOT NULL
            GROUP BY 1, 2
        ),
        r AS (
            SELECT from_t, CAST(sum(c) AS BIGINT) AS r FROM m0
            GROUP BY from_t
        ),
        m AS (
            SELECT m0.from_t, m0.to_t, m0.c, r.r
            FROM m0 JOIN r ON r.from_t = m0.from_t
        ),
        states AS (SELECT DISTINCT from_t AS state FROM m0),
        ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM states),
        v0 AS (
            SELECT state, CAST({_MK_SCALE} // ns.n AS BIGINT) AS v
            FROM states CROSS JOIN ns
        ),
        {joined}
        SELECT state AS event_type, v AS pi_fx,
               CAST(CAST(v AS DOUBLE) / {_MK_SCALE}.0 AS DOUBLE) AS pi
        FROM {prev}
    """


@register(
    "q_markov_stationary",
    oracle=_mk_oracle(),
    doc="Stationary distribution of the user-journey Markov chain:"
    " per-user consecutive event-type transitions (lead window,"
    " user-sharded) build the row-stochastic matrix, then"
    f" {_MK_ITERS} unrolled power-iteration rounds in integer fixed"
    f" point — v'_j = sum_i (v_i * c_ij) div r_i at {_MK_SCALE:.0e}"
    " scale, transition probabilities applied as exact rationals"
    " c/r, truncating division identical on both engines (the"
    " q_power_iteration / pagerank discipline; the tiny truncation"
    " mass-leak per round is deterministic and identical). Where"
    " q_event_transitions reports the one-step matrix, this is its"
    " long-run fixed point — the equilibrium share of journey time"
    " per state. Scale: the corpus-sized work (lead window + count"
    " shuffle) is fully distributed; the iteration itself runs on the"
    " COLLECTED |event_types|^2 matrix (a few dozen rows — bounded by"
    " the type vocabulary, documented at the collect site) in exact"
    " int64 Python, the dbscan/knn-confusion bounded-driver"
    " precedent: 16 Spark jobs of scheduling overhead for 25 rows of"
    " arithmetic measured 3.3 s at sf0.1; the collect form is ~0.5 s"
    " with bit-identical results.",
)
def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from lakehouse_weather_spark.sources.tables import load_table, local_df

    # complete cases (mirrored in the oracle): NULL event_type would
    # desync the state count between engines, NULL ts the lead order
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    m0 = (
        ordered.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_t"),
            F.col("next_type").alias("to_t"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    r = m0.groupBy("from_t").agg(F.sum("c").cast("bigint").alias("r"))
    m = m0.join(r, "from_t")
    # BOUNDED driver iteration (the dbscan/knn-confusion precedent):
    # the transition matrix is |event_types|^2 <= a few dozen rows, so
    # the 8 fixed-point rounds run on the collected matrix in exact
    # Python int64 semantics (same truncating floor division as the
    # unrolled SQL — Python // on nonnegative ints == div == //),
    # instead of 8 rounds x 2 Spark jobs of pure scheduling overhead
    # (measured 3.3 s at sf0.1 for 25 rows of arithmetic; now one
    # collect). The corpus-scale work — the lead window and the count
    # shuffle — stays fully distributed above.
    mat = m.collect()  # bounded: |types|^2 rows, documented above
    if not mat:
        return local_df(
            spark, [], "event_type string, pi_fx bigint, pi double"
        )
    from_states = sorted({r["from_t"] for r in mat})
    n = len(from_states)
    v = {st: _MK_SCALE // n for st in from_states}
    for _ in range(_MK_ITERS):
        # keyed by RECEIVER (all to_t): mirrors the oracle's replay
        # exactly, including sink states that only ever receive —
        # their mass appears in the round's output and, lacking an
        # outgoing row, does not carry to the next round
        nxt: dict = {}
        for r in mat:
            if r["from_t"] in v:
                nxt[r["to_t"]] = nxt.get(r["to_t"], 0) + (
                    (v[r["from_t"]] * r["c"]) // r["r"]
                )
        v = nxt
    rows = [
        (st, v[st], float(v[st]) / float(_MK_SCALE))
        for st in sorted(v)
    ]
    return local_df(
        spark, rows, "event_type string, pi_fx bigint, pi double"
    )
