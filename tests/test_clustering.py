"""Embedding clustering + SemDeDup (operators/clustering.py): cluster
partition sanity, within-cluster dedup containment vs the exact
all-pairs baseline, and determinism across partitionings."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from lakehouse_weather_spark.operators.similarity import N_CENTROIDS
from lakehouse_weather_spark.registry import load_all
from lakehouse_weather_spark.sources.tables import load_table


def test_kmeans_partitions_whole_corpus(spark, sf_dir):
    out = load_all()["q_kmeans_clusters"].fn(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    # total partition: every vector in exactly one cluster
    assert out.count() == emb.count()
    assert out.select("vec_id").distinct().count() == emb.count()
    n_clusters = out.select("cluster_id").distinct().count()
    assert 1 < n_clusters <= N_CENTROIDS


def test_kmeans_deterministic_across_partitioning(spark, sf_dir):
    # fixed-point distances + tie-breaks: the assignment must not
    # depend on input partitioning
    fn = load_all()["q_kmeans_clusters"].fn
    a = {(r.vec_id, r.cluster_id) for r in fn(spark, sf_dir).collect()}
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        b = {(r.vec_id, r.cluster_id) for r in fn(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    assert a == b


def test_semantic_dedup_contained_in_exact_baseline(spark, sf_dir):
    """Every SemDeDup pair must appear in the exact all-pairs near-dup
    result with the SAME cosine (clustering only restricts the search
    space, never invents pairs), and both endpoints must share the
    pair's cluster."""
    specs = load_all()
    sem = specs["q_semantic_dedup"].fn(spark, sf_dir).collect()
    exact = {
        (r.vec_a, r.vec_b): r.cosine
        for r in specs["q_embed_neardup"].fn(spark, sf_dir).collect()
    }
    assign = {
        r.vec_id: r.cluster_id
        for r in specs["q_kmeans_clusters"].fn(spark, sf_dir).collect()
    }
    assert len(sem) > 0
    for r in sem:
        assert (r.vec_a, r.vec_b) in exact
        assert r.cosine == exact[(r.vec_a, r.vec_b)]  # bit-identical
        assert assign[r.vec_a] == assign[r.vec_b] == r.cluster_id


def test_semantic_dedup_recall_vs_exact(spark, sf_dir):
    """SemDeDup trades recall for cluster-local cost. The fixture is
    the ADVERSARIAL case for this tradeoff: its near-dup pairs peak at
    cosine ~0.5 on a near-orthogonal corpus (see similarity.py's LSH
    note), so k-means legitimately splits many of them — measured
    recall ~25% here, vs near-certain co-clustering for real near-dup
    corpora (cosine >= 0.9 pairs sit almost on top of each other).
    Guard the floor so a silently broken kernel (returning ~nothing)
    still fails."""
    specs = load_all()
    n_sem = specs["q_semantic_dedup"].fn(spark, sf_dir).count()
    n_exact = specs["q_embed_neardup"].fn(spark, sf_dir).count()
    assert n_exact > 0
    assert n_sem >= 0.15 * n_exact


def test_silhouette_bounds_and_assignment_consistency(spark, sf_dir):
    from lakehouse_weather_spark.operators.clustering import (
        q_kmeans_clusters,
        q_silhouette,
    )

    sil = {r.vec_id: r for r in q_silhouette(spark, sf_dir).collect()}
    assign = {
        r.vec_id: r.cluster_id
        for r in q_kmeans_clusters(spark, sf_dir).collect()
    }
    assert set(sil) == set(assign)
    for vid, r in sil.items():
        assert r.cluster_id == assign[vid]  # same argmin tie-break
        assert -1.0 <= r.silhouette <= 1.0
        assert r.a_fx <= r.b_fx  # own centroid IS the argmin
    # the fixture's clusters are non-degenerate: some separation exists
    assert sum(1 for r in sil.values() if r.silhouette > 0) > len(sil) // 2


def test_coreset_greedy_invariants(spark, sf_dir):
    import math

    from lakehouse_weather_spark.operators.clustering import (
        CORESET_K,
        q_coreset,
    )
    from lakehouse_weather_spark.sources.tables import load_table

    rows = sorted(q_coreset(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, CORESET_K + 1))
    assert rows[0].vec_id == 0 and rows[0].radius_fx is None
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == CORESET_K  # all distinct
    # coverage radius is non-increasing (greedy guarantee)
    radii = [r.radius_fx for r in rows[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:]))
    # python replay of farthest-first with the same fixed-point metric
    emb = {
        r.vec_id: r.embedding
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def d(a, b):
        return sum(
            round((float(x) - float(y)) * (float(x) - float(y)) * 1e12)
            for x, y in zip(a, b)
        )

    mind = {v: d(e, emb[0]) for v, e in emb.items()}
    want = [0]
    for _ in range(CORESET_K - 1):
        pick = max(mind, key=lambda v: (mind[v], -v))
        want.append(pick)
        for v in mind:
            mind[v] = min(mind[v], d(emb[v], emb[pick]))
    assert ids == want


def test_embed_neardup_vec_cap_bounds_input(spark, sf_dir):
    """vec_cap makes the exact O(n^2) arm safe by construction: the
    capped run's pair endpoints must all come from the deterministic
    md5-ordered sample, and every capped pair must appear in the
    uncapped result with the SAME cosine (the cap restricts the input,
    never changes scoring)."""
    from lakehouse_weather_spark.operators.dedup import q_embed_neardup
    from lakehouse_weather_spark.sources.tables import load_table

    cap = 100
    emb = load_table(spark, sf_dir, "embeddings")
    order = F.md5(F.concat(F.lit("cap_"), F.col("vec_id").cast("string")))
    sampled = {
        r.vec_id
        for r in emb.orderBy(order, "vec_id").limit(cap).select("vec_id").collect()
    }
    assert len(sampled) == min(cap, emb.count())
    capped = q_embed_neardup(spark, sf_dir, vec_cap=cap).collect()
    full = {
        (r.vec_a, r.vec_b): r.cosine
        for r in q_embed_neardup(spark, sf_dir).collect()
    }
    for r in capped:
        assert r.vec_a in sampled and r.vec_b in sampled
        assert full[(r.vec_a, r.vec_b)] == r.cosine  # bit-identical
    # the cap must also be COMPLETE over the sample: every full pair
    # with both endpoints sampled appears in the capped run
    expected = {k for k in full if k[0] in sampled and k[1] in sampled}
    assert expected == {(r.vec_a, r.vec_b) for r in capped}


# --- DBSCAN: grid-blocked census == brute-force reference -------------


def test_dbscan_grid_matches_bruteforce_reference(spark, sf_dir):
    """The grid equi-join candidate generation loses no pair and the
    census matches a from-scratch O(n^2) python DBSCAN (exact integer
    distances, min-id component labels) on the same capped sample."""
    import hashlib

    import duckdb

    from lakehouse_weather_spark.operators.clustering import (
        _DBS_CAP,
        _DBS_EPS_FX,
        _DBS_MINPTS,
    )
    from lakehouse_weather_spark.registry import load_all

    raw = duckdb.sql(
        f"SELECT vec_id, embedding[1] e1, embedding[2] e2"
        f" FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchall()
    keyed = sorted(
        raw,
        key=lambda r: (
            hashlib.md5(f"dbs_{r[0]}".encode()).hexdigest(),
            r[0],
        ),
    )[:_DBS_CAP]
    pts = {
        r[0]: (int(round(r[1] * 1_000_000)), int(round(r[2] * 1_000_000)))
        for r in keyed
    }
    eps2 = _DBS_EPS_FX * _DBS_EPS_FX
    ids = sorted(pts)
    nbrs = {i: set() for i in ids}
    for i in ids:
        for j in ids:
            if i < j:
                dx = pts[i][0] - pts[j][0]
                dy = pts[i][1] - pts[j][1]
                if dx * dx + dy * dy <= eps2:
                    nbrs[i].add(j)
                    nbrs[j].add(i)
    core = {i for i in ids if 1 + len(nbrs[i]) >= _DBS_MINPTS}
    # components over core-core edges: BFS, label = min id in component
    label = {}
    for c in sorted(core):
        if c in label:
            continue
        comp, todo = [], [c]
        seen = {c}
        while todo:
            v = todo.pop()
            comp.append(v)
            for w in nbrs[v]:
                if w in core and w not in seen:
                    seen.add(w)
                    todo.append(w)
        lab = min(comp)
        for v in comp:
            label[v] = lab
    border = {}
    for i in ids:
        if i in core:
            continue
        core_nb = [label[j] for j in nbrs[i] if j in core]
        if core_nb:
            border[i] = min(core_nb)
    assigned = {**label, **border}
    sizes: dict = {}
    for lab in assigned.values():
        sizes[lab] = sizes.get(lab, 0) + 1
    expect = {
        "n_points": len(ids),
        "n_core": len(core),
        "n_border": len(border),
        "n_noise": len(ids) - len(core) - len(border),
        "n_clusters": len(set(assigned.values())),
        "max_cluster_size": max(sizes.values()) if sizes else None,
    }
    got = load_all()["q_dbscan_grid"].fn(spark, sf_dir).collect()[0].asDict()
    assert got == expect, (got, expect)
