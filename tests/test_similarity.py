"""Similarity / dedup behavior tests beyond oracle parity: LSH recall vs
brute force, simhash near-dup hamming, minhash candidate quality."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lakehouse_weather_spark.registry import load_all


def test_lsh_recall_vs_brute_force(spark, sf_dir):
    brute = [r.vec_id for r in load_all()["q_vector_topk"].fn(spark, sf_dir).collect()]
    lsh = [r.vec_id for r in load_all()["q_vector_topk_lsh"].fn(spark, sf_dir).collect()]
    # hamming<=2 multiprobe over 4-bit codes; the fixture vectors are
    # near-orthogonal (max cosine ~0.5) which is the LSH worst case, so
    # the bar is recall >= 0.5 here (real near-dup corpora recall >>).
    recall = len(set(brute) & set(lsh)) / len(brute)
    assert recall >= 0.5, (recall, brute, lsh)


def test_minhash_candidates_are_similar(spark, sf_dir):
    cands = {
        (r.doc_a, r.doc_b)
        for r in load_all()["q_minhash_neardup"].fn(spark, sf_dir).collect()
    }
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in load_all()["q_ngram_jaccard"].fn(spark, sf_dir).collect()
    }
    assert cands, "expected planted near-dup candidates"
    # high-similarity pairs must be recalled by LSH banding
    high = {p for p, j in jac.items() if j >= 0.8}
    assert high <= cands, high - cands


def test_simhash_of_neardups_is_close(spark, sf_dir):
    sim = {
        r.doc_id: r.simhash for r in load_all()["q_simhash"].fn(spark, sf_dir).collect()
    }
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in load_all()["q_ngram_jaccard"].fn(spark, sf_dir).collect()
    }
    high = [p for p, j in jac.items() if j >= 0.9]
    assert high, "expected >= 1 planted high-similarity pair"
    for a, b in high:
        hamming = bin(sim[a] ^ sim[b]).count("1")
        assert hamming <= 4, (a, b, hamming)


def test_kmeans_refine_matches_numpy_replay(spark, sf_dir):
    """Lloyd refinement is fully deterministic: an independent numpy
    replay (same md5 seed order, same fixed-point distances and means,
    same tie-breaks) reproduces the Spark assignments and centroids
    BIT-exactly."""
    import hashlib

    import numpy as np

    from lakehouse_weather_spark.functions import DOT_SCALE
    from lakehouse_weather_spark.operators.similarity import (
        N_CENTROIDS,
        kmeans_refine,
    )
    from lakehouse_weather_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cent_df, assign_df = kmeans_refine(emb, n_iter=2)

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    A = np.array([r.embedding for r in rows], dtype=np.float64)

    def h(vid: int) -> int:
        return int(hashlib.md5(str(vid).encode()).hexdigest()[:15], 16)

    def fxround(x):
        return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)

    order = sorted(range(len(ids)), key=lambda i: (h(int(ids[i])), int(ids[i])))
    C = A[order[:N_CENTROIDS]].copy()  # cluster_id = index + 1
    for _ in range(2):
        D = fxround(((A[:, None, :] - C[None, :, :]) ** 2) * DOT_SCALE).sum(-1)
        assign = D.argmin(axis=1)  # first min == smallest cluster_id
        for c in range(N_CENTROIDS):
            members = A[assign == c]
            if len(members):
                ints = fxround(members * DOT_SCALE).sum(axis=0)
                C[c] = ints.astype(np.float64) / DOT_SCALE / len(members)

    got_assign = {r.vec_id: r.cluster_id for r in assign_df.collect()}
    want_assign = {int(v): int(a) + 1 for v, a in zip(ids, assign)}
    assert got_assign == want_assign

    got_cent = {r.cluster_id: list(r.centroid) for r in cent_df.collect()}
    for c in range(N_CENTROIDS):
        assert got_cent[c + 1] == list(C[c]), f"cluster {c + 1}"


def test_pq_recall_vs_brute_force(spark, sf_dir):
    brute = [r.vec_id for r in load_all()["q_vector_topk"].fn(spark, sf_dir).collect()]
    pq = [r.vec_id for r in load_all()["q_vector_topk_pq"].fn(spark, sf_dir).collect()]
    # The fixture vectors are near-orthogonal (max cosine ~0.5): every
    # candidate is roughly equidistant, so ADC ranking carries little
    # signal and measured recall is ~0.2 — the PQ worst case by
    # construction. The oracle gate already proves the computation
    # bit-exact; this test pins recall above chance
    # (rerank 50 of 500 => ~0.1 expected for a random cut).
    recall = len(set(brute) & set(pq)) / len(brute)
    assert recall >= 0.15, (recall, brute, pq)
    assert len(pq) == len(brute)


def test_pq_plan_shape(spark, sf_dir):
    df = load_all()["q_vector_topk_pq"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # ADC cut and final top-k both as TakeOrderedAndProject; codebook
    # and lookup table broadcast — no sort-merge anywhere
    assert plan.count("TakeOrderedAndProject") >= 2
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_label_outliers_per_label_ranks(spark, sf_dir):
    from lakehouse_weather_spark.operators.similarity import (
        OUTLIERS_PER_LABEL,
    )
    from lakehouse_weather_spark.registry import load_all

    rows = load_all()["q_label_outliers"].fn(spark, sf_dir).collect()
    assert rows
    by_label: dict = {}
    for r in rows:
        assert r.dist2 >= 0.0
        by_label.setdefault(r.label, []).append(r)
    n_labels = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("label")
        .distinct()
        .count()
    )
    assert len(by_label) == n_labels
    for label, cells in by_label.items():
        ranks = sorted(c.outlier_rank for c in cells)
        assert ranks == list(range(1, len(cells) + 1))
        assert len(cells) <= OUTLIERS_PER_LABEL
        # ranks ordered by distance descending
        cells.sort(key=lambda c: c.outlier_rank)
        dists = [c.dist2 for c in cells]
        assert dists == sorted(dists, reverse=True)


def test_minhash_scurve_cumulative(spark, sf_dir):
    from lakehouse_weather_spark.registry import load_all

    rows = load_all()["q_minhash_scurve"].fn(spark, sf_dir).collect()
    rows.sort(key=lambda r: -r.n_matching)
    total = load_all()["q_minhash_neardup"].fn(spark, sf_dir).count()
    running = 0
    for r in rows:
        running += r.n_pairs
        assert r.n_pairs_at_least == running
        assert r.jaccard_est == r.n_matching / 16
    assert running == total


def test_ndcg_bounds_and_ideal_ordering(spark, sf_dir):
    from lakehouse_weather_spark.operators.similarity import (
        _NDCG_W,
        q_ndcg,
    )

    rows = q_ndcg(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r.ndcg <= 1.0
        # idcg is the sum of the first min(10, n_rel) weights
        k = min(10, r.n_rel)
        assert r.idcg_fx == sum(_NDCG_W[:k])
        assert r.dcg_fx <= r.idcg_fx
    # weights are strictly decreasing (log discount) and integer
    assert all(a > b for a, b in zip(_NDCG_W, _NDCG_W[1:]))
    assert _NDCG_W[0] == 1_000_000  # rank 1: no discount


def test_hnsw_recall_vs_brute_force(spark, sf_dir):
    brute = [
        r.vec_id
        for r in load_all()["q_vector_topk"].fn(spark, sf_dir).collect()
    ]
    hnsw = [
        r.vec_id
        for r in load_all()["q_vector_topk_hnsw"].fn(spark, sf_dir).collect()
    ]
    # near-orthogonal fixture vectors are the graph-ANN worst case too
    # (weak neighborhood structure); the bar pins recall above chance
    # and regressions in graph build / beam search show up here
    recall = len(set(brute) & set(hnsw)) / len(brute)
    assert recall >= 0.3, (recall, brute, hnsw)


def test_hnsw_degree_is_bounded(spark, sf_dir):
    from pyspark.sql import functions as F

    from lakehouse_weather_spark.operators.similarity import (
        _HNSW_M,
        _hnsw_search,
    )

    # the graph the search consults must respect the degree cap — the
    # bound is what makes each hop's frontier BEAM*M, the 100 TB claim
    _beam, visited = _hnsw_search(spark, sf_dir)
    n = visited.count()
    assert n > 0
    # visited = entry layer + <= HOPS hops of beam expansion; with
    # beam width K and degree cap M the expansion alone is bounded by
    # HOPS * K * M even if every neighbor were fresh
    from lakehouse_weather_spark.operators.similarity import (
        _HNSW_HOPS,
        TOP_K,
    )
    from lakehouse_weather_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n_seeds = emb.filter(
        (F.col("vec_id") != 0)
        & (
            F.expr(
                "cast(conv(substr(md5(cast(vec_id as string)), 1, 15),"
                " 16, 10) as bigint)"
            )
            % 8
            == 0
        )
    ).count()
    assert n <= n_seeds + _HNSW_HOPS * TOP_K * (_HNSW_M + 1), (
        n,
        n_seeds,
    )


def test_ann_scorecard_exact_is_perfect(spark, sf_dir):
    rows = {
        r.arm: r
        for r in load_all()["q_ann_arm_scorecard"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == {"exact", "hnsw", "ivf", "lsh", "pq"}
    assert rows["exact"].recall_at_k == 1.0
    # every arm's candidate budget is a strict subset of brute force
    for arm in ("hnsw", "ivf", "lsh", "pq"):
        assert rows[arm].n_candidates <= rows["exact"].n_candidates, arm
        assert 0.0 <= rows[arm].recall_at_k <= 1.0, arm


def test_np_bucket_codes_match_sql_expr(spark, sf_dir):
    """The r10 NumPy pandas_udf twin of the sign-LSH bucket code must be
    bit-equal to the SQL fixed-point expression it replaced (HNSW graph
    build + scorecard candidate sets both key on it)."""
    from lakehouse_weather_spark.operators.similarity import (
        _bucket_code_expr,
        _bucket_code_udf,
    )
    from lakehouse_weather_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    sql_codes = sorted(
        (r.vec_id, r.b)
        for r in emb.select(
            "vec_id", _bucket_code_expr("embedding").alias("b")
        ).collect()
    )
    np_codes = sorted(
        (r.vec_id, r.b)
        for r in emb.select(
            "vec_id", _bucket_code_udf("embedding").alias("b")
        ).collect()
    )
    assert sql_codes == np_codes


def test_hnsw_adjacency_kernel_matches_window_plan(spark, sf_dir):
    """The r10 per-bucket NumPy adjacency kernel must reproduce the old
    bucket-self-join + row_number window EXACTLY: same fixed-point
    cosines, same (cos DESC, dst ASC) tie-breaks, same top-M cut."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lakehouse_weather_spark.operators.similarity import (
        _HNSW_M,
        _SPARK_DOT,
        _bucket_code_expr,
        _bucket_code_udf,
        _hnsw_adj_block,
        QUERY_VEC_ID,
    )
    from lakehouse_weather_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    norm = F.expr(
        "sqrt(" + _SPARK_DOT.format(a="embedding", b="embedding") + ")"
    )
    g = emb.select(
        "vec_id",
        "embedding",
        norm.alias("nrm"),
        _bucket_code_expr("embedding").alias("bucket"),
    ).filter(F.col("vec_id") != QUERY_VEC_ID)
    a = g.select(
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("s_emb"),
        F.col("nrm").alias("s_nrm"),
        "bucket",
    )
    b = g.select(
        F.col("vec_id").alias("dst"),
        F.col("embedding").alias("d_emb"),
        F.col("nrm").alias("d_nrm"),
        "bucket",
    )
    pdot = F.expr(_SPARK_DOT.format(a="s_emb", b="d_emb"))
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("src") != F.col("dst"))
        .select(
            "src",
            "dst",
            F.try_divide(pdot, F.col("s_nrm") * F.col("d_nrm")).alias(
                "cos"
            ),
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("cos"), F.asc("dst"))
    old = sorted(
        (r.src, r.dst)
        for r in pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _HNSW_M)
        .select("src", "dst")
        .collect()
    )
    new = sorted(
        (r.src, r.dst)
        for r in emb.select("vec_id", "embedding")
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select(
            "vec_id",
            "embedding",
            _bucket_code_udf("embedding").alias("bucket"),
        )
        .groupBy("bucket")
        .applyInPandas(_hnsw_adj_block, schema="src long, dst long")
        .collect()
    )
    assert old == new
