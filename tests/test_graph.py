"""PageRank: bit-exact numpy replay of the fixed-point iteration, plus
structural sanity (mass conservation, cluster concentration)."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lakehouse_weather_spark.operators.graph import (
    DAMP_DEN,
    DAMP_NUM,
    N_ITER,
    RANK_SCALE,
    pagerank,
)


def _numpy_pagerank(edge_list, n_iter):
    """All-integer replay of the operator: int64 fixed-point ranks,
    truncating division, exact rational damping — bit-identical to the
    Spark loop and the unrolled DuckDB oracle by construction."""
    nodes = sorted({s for s, _ in edge_list} | {d for _, d in edge_list})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n, dtype=np.int64)
    for s, _ in edge_list:
        deg[idx[s]] += 1
    rank_fx = np.full(n, RANK_SCALE // n, dtype=np.int64)
    tp_fx = (RANK_SCALE * (DAMP_DEN - DAMP_NUM)) // (DAMP_DEN * n)

    for _ in range(n_iter):
        received = np.zeros(n, dtype=np.int64)
        for s, d in edge_list:
            received[idx[d]] += int(rank_fx[idx[s]]) // int(deg[idx[s]])
        rank_fx = tp_fx + (received * DAMP_NUM) // DAMP_DEN
    return {v: rank_fx[idx[v]] / RANK_SCALE for v in nodes}


def test_pagerank_matches_numpy_replay(spark):
    edge_list = [
        (1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1),  # triangle
        (4, 5), (5, 4),                                  # pair
        (6, 1), (1, 6),                                  # appendage
    ]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(edges).collect()}
    want = _numpy_pagerank(edge_list, N_ITER)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == want[v], v  # bit-exact


def test_pagerank_mass_and_concentration(spark, sf_dir):
    from lakehouse_weather_spark.registry import load_all

    ranks = load_all()["q_pagerank_neardup"].fn(spark, sf_dir)
    rows = ranks.collect()
    total = sum(r.rank for r in rows)
    # rank mass stays ~1 (no dangling nodes in the symmetric graph)
    assert abs(total - 1.0) < 1e-6
    assert all(r.rank > 0 for r in rows)


def test_triangle_stats_invariants(spark, sf_dir):
    """Local clustering coefficients live in [0, 1]; nodes and degrees
    agree with the symmetric near-dup edge set; a triangle implies all
    three member coefficients are positive."""
    from lakehouse_weather_spark.registry import load_all

    rows = load_all()["q_triangle_stats"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    pairs = load_all()["q_minhash_neardup"].fn(spark, sf_dir).collect()
    deg = {}
    for p in pairs:
        deg[p.doc_a] = deg.get(p.doc_a, 0) + 1
        deg[p.doc_b] = deg.get(p.doc_b, 0) + 1
    assert {r.doc_id for r in rows} == set(deg)
    for r in rows:
        assert r.degree == deg[r.doc_id]
        assert 0.0 <= r.clustering_coeff <= 1.0
        assert (r.n_triangles > 0) == (r.clustering_coeff > 0)
        # n_triangles bounded by possible wedges at this node
        assert r.n_triangles <= r.degree * (r.degree - 1) // 2


def test_degree_hist_accounts_for_all_nodes(spark, sf_dir):
    from lakehouse_weather_spark.registry import load_all

    hist = load_all()["q_degree_hist"].fn(spark, sf_dir).collect()
    pairs = load_all()["q_minhash_neardup"].fn(spark, sf_dir).collect()
    deg: dict = {}
    for p in pairs:
        deg[p.doc_a] = deg.get(p.doc_a, 0) + 1
        deg[p.doc_b] = deg.get(p.doc_b, 0) + 1
    want: dict = {}
    for d in deg.values():
        want[d] = want.get(d, 0) + 1
    assert {(h.degree, h.n_nodes) for h in hist} == set(want.items())


def test_label_propagation_replay(spark, sf_dir):
    from collections import Counter

    from lakehouse_weather_spark.operators.dedup import q_minhash_neardup
    from lakehouse_weather_spark.operators.graph import (
        _LP_ROUNDS,
        _SEED_MOD,
        q_label_propagation,
    )
    from lakehouse_weather_spark.sources.tables import load_table

    got = {
        r.doc_id: (r.label, r.is_seed)
        for r in q_label_propagation(spark, sf_dir).collect()
    }

    pairs = [
        (r.doc_a, r.doc_b)
        for r in q_minhash_neardup(spark, sf_dir).collect()
    ]
    adj: dict[int, list[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    seeds = {
        r.doc_id: r.lang
        for r in load_table(spark, sf_dir, "documents").collect()
        if r.doc_id % _SEED_MOD == 0
    }
    labels = dict(seeds)
    for _ in range(_LP_ROUNDS):
        nxt = dict(seeds)
        for u, nbrs in adj.items():
            if u in seeds:
                continue
            votes = Counter(labels[v] for v in nbrs if v in labels)
            if votes:
                best = max(votes.items(), key=lambda kv: (kv[1], [-ord(c) for c in kv[0]]))
                nxt[u] = best[0]
        labels = nxt
    want = {u: (lab, u % _SEED_MOD == 0) for u, lab in labels.items()}
    assert got == want
    # propagation actually reached non-seed nodes
    assert any(not is_seed for (_, is_seed) in got.values())


def test_source_overlap_accounts_for_all_pairs(spark, sf_dir):
    from lakehouse_weather_spark.operators.dedup import q_minhash_neardup
    from lakehouse_weather_spark.operators.graph import q_source_overlap
    from lakehouse_weather_spark.sources.tables import load_table

    rows = q_source_overlap(spark, sf_dir).collect()
    n_pairs = q_minhash_neardup(spark, sf_dir).count()
    assert sum(r.n_pairs for r in rows) == n_pairs  # every pair labeled
    srcs = {
        r.source
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    for r in rows:
        assert r.src_a <= r.src_b  # canonical unordered pair
        assert {r.src_a, r.src_b} <= srcs
        assert 0 < r.n_pairs
