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
