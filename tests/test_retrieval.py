"""Retrieval + eval operators: BM25 ranking invariants and the LSH
blocking scorecard's internal consistency. Value-level parity with
DuckDB is covered by the oracle gate; these tests pin the semantics
the hashes alone don't explain."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lakehouse_weather_spark.operators.retrieval import (
    BM25_TERMS,
    BM25_TOPK,
)
from lakehouse_weather_spark.registry import load_all


def test_bm25_ranking_invariants(spark, sf_dir):
    rows = load_all()["q_bm25"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= BM25_TOPK
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    # every returned doc really contains at least one query term
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    for r in rows:
        words = docs[r.doc_id].split(" ")
        assert any(w in words for w in BM25_TERMS), r.doc_id


def test_bm25_prefers_more_hits_at_equal_length(spark, sf_dir):
    # among returned docs of identical length, more total query-term
    # occurrences never scores lower (BM25 tf-monotonicity)
    rows = load_all()["q_bm25"].fn(spark, sf_dir).collect()
    docs = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    seen = {}
    for r in rows:
        words = docs[r.doc_id]
        # single-term tf comparison only: multi-term scores mix idfs
        tfs = tuple(sum(1 for w in words if w == t) for t in BM25_TERMS)
        key = (len(words), tuple(tf > 0 for tf in tfs))
        if key in seen:
            prev_tfs, prev_score = seen[key]
            if all(a >= b for a, b in zip(tfs, prev_tfs)):
                assert r.bm25 <= prev_score + 1e-12
        seen[key] = (tfs, r.bm25)


def test_lsh_eval_consistency(spark, sf_dir):
    row = load_all()["q_lsh_eval"].fn(spark, sf_dir).collect()[0]
    assert row.tp <= min(row.n_candidates, row.n_truth)
    assert 0.0 <= row.candidate_precision <= 1.0
    assert 0.0 <= row.candidate_recall <= 1.0
    # candidate count agrees with the pair query it audits
    n_pairs = load_all()["q_minhash_neardup"].fn(spark, sf_dir).count()
    assert row.n_candidates == n_pairs
    # truth count agrees with the exact-jaccard query at threshold 0.10
    n_truth = load_all()["q_ngram_jaccard"].fn(spark, sf_dir).count()
    assert row.n_truth == n_truth


def test_ann_recall_matches_component_queries(spark, sf_dir):
    row = load_all()["q_ann_recall"].fn(spark, sf_dir).collect()[0]
    exact = {
        r.vec_id for r in load_all()["q_vector_topk"].fn(spark, sf_dir).collect()
    }
    lsh = {
        r.vec_id
        for r in load_all()["q_vector_topk_lsh"].fn(spark, sf_dir).collect()
    }
    assert row.k == len(exact)
    assert row.n_hits == len(exact & lsh)
    assert row.recall_at_k == row.n_hits / row.k
    # the bar test_lsh_recall_vs_brute_force already enforces
    assert row.recall_at_k >= 0.5


def test_mmr_diversifies_and_is_deterministic(spark, sf_dir):
    from lakehouse_weather_spark.operators.retrieval import (
        MMR_K,
        q_mmr_rerank,
    )

    rows = sorted(q_mmr_rerank(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert len(rows) == MMR_K
    assert len({r.vec_id for r in rows}) == MMR_K
    assert rows[0].maxsim_fx is None  # first pick is pure relevance
    # rank 1 has the highest relevance of the whole selection
    assert rows[0].rel_fx == max(r.rel_fx for r in rows)
    # determinism: a second run returns the identical list
    again = sorted(q_mmr_rerank(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert [(r.rank, r.vec_id) for r in rows] == [
        (r.rank, r.vec_id) for r in again
    ]
