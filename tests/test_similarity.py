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
