"""Semantic tests for the ML-feature family (operators/mlfeat.py):
out-of-fold encoding is genuinely leakage-free (each fold's own orders
never contribute to its encoding); contrastive triplets pair within
(source, lang) and negative-sample across sources 1:1; the hashing
trick conserves token counts and is vocabulary-order independent.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lakehouse_weather_spark.operators.mlfeat import N_BUCKETS, N_FOLDS
from lakehouse_weather_spark.registry import load_all
from lakehouse_weather_spark.sources.tables import load_table


def test_target_encode_oof_excludes_own_fold(spark, sf_dir):
    rows = load_all()["q_target_encode_oof"].fn(spark, sf_dir).collect()

    cust = {
        r.c_custkey: (r.c_mktsegment, r.c_custkey % N_FOLDS)
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    # (segment, fold) -> [sum_fx, n] built independently in Python
    stats: dict[tuple[str, int], list[int]] = {}
    for o in load_table(spark, sf_dir, "orders").collect():
        seg, fold = cust[o.o_custkey]
        s = stats.setdefault((seg, fold), [0, 0])
        s[0] += round(o.o_totalprice * 10_000)
        s[1] += 1

    assert len(rows) == len(cust)
    for r in rows:
        seg, fold = cust[r.c_custkey]
        assert (r.mktsegment, r.fold) == (seg, fold)
        oof_s = sum(v[0] for k, v in stats.items() if k[0] == seg and k[1] != fold)
        oof_n = sum(v[1] for k, v in stats.items() if k[0] == seg and k[1] != fold)
        assert r.n_oof == oof_n
        if oof_n:
            assert r.oof_enc_fx == oof_s // oof_n
        else:
            assert r.oof_enc_fx is None
        # leakage check: adding the own fold's orders CHANGES the mean
        # for at least one populated fold (guards against accidentally
        # encoding with the full-segment mean)
    populated = [
        r for r in rows if stats.get((r.mktsegment, r.fold), [0, 0])[1] > 0
    ]
    assert populated
    leak_diffs = 0
    for r in populated:
        seg = r.mktsegment
        full_s = sum(v[0] for k, v in stats.items() if k[0] == seg)
        full_n = sum(v[1] for k, v in stats.items() if k[0] == seg)
        if full_n and r.oof_enc_fx != full_s // full_n:
            leak_diffs += 1
    assert leak_diffs > 0


def test_contrastive_pairs_structure(spark, sf_dir):
    rows = load_all()["q_contrastive_pairs"].fn(spark, sf_dir).collect()
    docs = {
        r.doc_id: r for r in load_table(spark, sf_dir, "documents").collect()
    }
    sources = sorted({d.source for d in docs.values()})
    nxt = {s: sources[(i + 1) % len(sources)] for i, s in enumerate(sources)}

    assert rows
    seen_anchors = set()
    for r in rows:
        assert r.anchor_id not in seen_anchors  # 1 triplet per anchor
        seen_anchors.add(r.anchor_id)
        a, p, n = docs[r.anchor_id], docs[r.pos_id], docs[r.neg_id]
        # positive: same source AND language, never the anchor itself
        assert (a.source, a.lang) == (p.source, p.lang)
        assert r.pos_id != r.anchor_id
        assert r.pos_gap_chars == abs(p.n_chars - a.n_chars)
        # negative: from the cyclically-next source
        assert n.source == nxt[a.source]
        assert r.neg_source == n.source

    # every anchor with a same-(source, lang) length-successor appears
    by_key: dict[tuple[str, str], int] = {}
    for d in docs.values():
        by_key[(d.source, d.lang)] = by_key.get((d.source, d.lang), 0) + 1
    expected = sum(n - 1 for n in by_key.values())
    assert len(rows) == expected


def test_feature_hashing_conserves_tokens(spark, sf_dir):
    rows = load_all()["q_feature_hashing"].fn(spark, sf_dir).collect()
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    assert len(rows) == len(docs)
    for r in rows:
        feats = json.loads(r.features)  # ships as a JSON string
        assert len(feats) == N_BUCKETS
        n_words = len(docs[r.doc_id].lower().split(" "))
        assert sum(feats) == n_words == r.n_tokens
        assert all(c >= 0 for c in feats)

    # same word -> same bucket everywhere: two docs sharing a word get
    # correlated buckets. Cheap spot check: hash of a literal word is
    # stable across rows (md5 has no per-session salt).
    import hashlib

    def bucket(word: str) -> int:
        return int(hashlib.md5(f"fh_{word}".encode()).hexdigest()[:15], 16) % N_BUCKETS

    some_doc, text = next(iter(docs.items()))
    counts = [0] * N_BUCKETS
    for w in text.lower().split(" "):
        counts[bucket(w)] += 1
    got = next(r.features for r in rows if r.doc_id == some_doc)
    assert json.loads(got) == counts


def test_power_iteration_matches_exact_python_replay(spark, sf_dir):
    """Third independent implementation: replay the sampled Gram build
    and every integer iteration in plain python bignum arithmetic — the
    Spark result must match BIT-FOR-BIT (the DuckDB oracle is the
    second implementation; this one has no SQL in common with either).
    Also check the direction is sane vs the float eigenvector: after k
    steps the cosine must at least strictly beat the starting all-ones
    vector's cosine (flat random spectra converge slowly by design)."""
    import hashlib

    import numpy as np

    from lakehouse_weather_spark.operators.mlfeat import (
        _PI_ITERS,
        _PI_VEC_CAP,
        _PI_VNORM,
        _PI_X_SCALE,
        q_power_iteration,
    )

    rows = q_power_iteration(spark, sf_dir).orderBy("dim").collect()

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    emb.sort(
        key=lambda r: (
            hashlib.md5(f"cap_{r.vec_id}".encode()).hexdigest(),
            r.vec_id,
        )
    )
    Xi = np.array(
        [
            np.round(np.array(r.embedding, dtype=np.float64) * _PI_X_SCALE)
            for r in emb[:_PI_VEC_CAP]
        ]
    ).astype(np.int64)
    dim = Xi.shape[1]
    # int64 matmul is exact here: |x| <= 1e6 -> products <= 1e12,
    # summed over <= 4000 rows -> < 2^53 << 2^63
    G = (Xi.T @ Xi).tolist()
    gmax = max(abs(x) for r in G for x in r)
    d = gmax // _PI_VNORM + 1
    G2 = [[x // d for x in r] for r in G]  # python // IS floor div
    v = [_PI_VNORM] * dim
    for _ in range(_PI_ITERS):
        w = [sum(G2[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        dd = max(max(abs(x) for x in w), 1) // _PI_VNORM + 1
        v = [x // dd for x in w]
    assert [r.v_fx for r in rows] == v

    Gf = np.array(G2, dtype=np.float64)
    _, vecs = np.linalg.eigh(Gf)
    top = vecs[:, -1]
    vf = np.array(v, dtype=np.float64)
    ones = np.ones(dim)
    cos_v = abs(vf @ top) / (np.linalg.norm(vf) * np.linalg.norm(top))
    cos_1 = abs(ones @ top) / (np.linalg.norm(ones) * np.linalg.norm(top))
    assert cos_v > cos_1


def test_power_iteration_is_deterministic_across_runs(spark, sf_dir):
    from lakehouse_weather_spark.operators.mlfeat import q_power_iteration

    a = q_power_iteration(spark, sf_dir).orderBy("dim").collect()
    b = q_power_iteration(spark, sf_dir).orderBy("dim").collect()
    assert [r.v_fx for r in a] == [r.v_fx for r in b]
