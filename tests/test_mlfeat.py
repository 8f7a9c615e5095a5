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
