"""Decontamination + containment (operators/decontam.py): plan shape
(broadcast eval set), recall of the planted contamination, and the
containment >= jaccard dominance property.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import load_all


def test_decontaminate_broadcasts_eval_set(spark, sf_dir):
    df = load_all()["q_decontaminate"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the tiny holdout must be the broadcast build side; the corpus
    # stream must never sort-merge
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_decontaminate_flags_only_corpus_docs(spark, sf_dir):
    rows = load_all()["q_decontaminate"].fn(spark, sf_dir).collect()
    assert all(r["doc_id"] % 20 != 0 for r in rows)
    assert all(r["n_shared_ngrams"] >= 1 for r in rows)


def test_containment_dominates_jaccard(spark, sf_dir):
    """C(A,B) = i/min(na,nb) >= i/(na+nb-i) = J(A,B) for every pair, and
    the planted near-dup pairs must clear the containment threshold."""
    cont = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in load_all()["q_containment"].fn(spark, sf_dir).collect()
    }
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in load_all()["q_ngram_jaccard"]
        .fn(spark, sf_dir)
        .filter(F.col("jaccard") >= 0.5)
        .collect()
    }
    assert cont, "fixtures plant near-dup pairs; containment must find them"
    for pair, j in jac.items():
        assert pair in cont and cont[pair] >= j - 1e-12, pair


def test_curation_funnel_monotone(spark, sf_dir):
    """Each curation stage only removes documents, and the survivor set
    is consistent with its component queries."""
    from lakehouse_weather_spark.operators.quality import apply_quality_filter
    from lakehouse_weather_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = load_all()["q_corpus_curation"].fn(spark, sf_dir)
    rows = out.collect()
    survivors = {r["doc_id"] for r in rows}

    n_all = docs.count()
    n_quality = apply_quality_filter(docs).count()
    assert 0 < len(survivors) < n_quality <= n_all

    # no holdout docs, no flagged-contaminated docs in the output
    assert all(d % 20 != 0 for d in survivors)
    flagged = {
        r["doc_id"] for r in load_all()["q_decontaminate"].fn(spark, sf_dir).collect()
    }
    assert not (survivors & flagged)

    # split labels deterministic and complete
    assert {r["split"] for r in rows} <= {"train", "valid", "test"}
    n_train = sum(1 for r in rows if r["split"] == "train")
    assert n_train >= len(rows) // 2  # 80% bucket dominates


def test_dup_spans_flags_planted_duplicates(spark, sf_dir):
    """The fixture plants near-dup doc groups (shared long prefixes):
    docs in an exact-hash dup group must show high duplicated-span
    coverage, and fully unique word-soup docs should be mostly clean.
    Also sanity: covered_words <= n_words, dup_frac in [0, 1], spans
    only for docs long enough to hold a window."""
    from lakehouse_weather_spark.operators.dedup import SPAN_WORDS

    rows = load_all()["q_dup_spans"].fn(spark, sf_dir).collect()
    by_doc = {r.doc_id: r for r in rows}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    assert set(by_doc) == {d.doc_id for d in docs}
    for r in rows:
        assert 0 <= r.covered_words <= r.n_words
        assert 0.0 <= r.dup_frac <= 1.0
        if r.n_words < SPAN_WORDS:
            assert r.n_spans == 0

    # the fixture plants near-dup groups sharing (at least) an 80-char
    # prefix — every member of such a group must show duplicated spans
    # (the shared prefix alone is >= SPAN_WORDS words)
    groups = {}
    for d in docs:
        groups.setdefault(d.text[:80], []).append(d.doc_id)
    dup_ids = [ids for ids in groups.values() if len(ids) > 1]
    assert dup_ids, "fixture should contain prefix-dup groups"
    for ids in dup_ids:
        for i in ids:
            r = by_doc[i]
            assert r.n_spans >= 1, (i, r)
            assert r.dup_frac > 0.0
    # and the corpus is not all duplicated: some docs stay clean
    assert any(r.dup_frac == 0.0 for r in rows)


def test_cluster_split_has_zero_cluster_leakage(spark, sf_dir):
    """Every >= 0.8-jaccard near-dup pair must share a split under the
    cluster-aware assignment (and the naive doc-hash split is allowed
    to differ — that's the bug q_leakage_pairs measures)."""
    from pyspark.sql import functions as F

    from lakehouse_weather_spark.operators.dedup import (
        _CLUSTER_THRESHOLD,
        q_cluster_split,
        q_ngram_jaccard,
    )

    assign = q_cluster_split(spark, sf_dir)
    pairs = q_ngram_jaccard(spark, sf_dir).filter(
        F.col("jaccard") >= _CLUSTER_THRESHOLD
    )
    a = assign.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    b = assign.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    leaked = (
        pairs.join(a, "doc_a").join(b, "doc_b").filter(F.col("sa") != F.col("sb"))
    )
    assert leaked.count() == 0
    # sanity: the splits are still roughly 80/10/10 over all docs
    dist = {r.split: r.n for r in assign.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert set(dist) == {"train", "valid", "test"}
    assert dist["train"] > dist["valid"] and dist["train"] > dist["test"]
