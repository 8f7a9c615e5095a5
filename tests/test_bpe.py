"""BPE trainer (operators/bpe.py): the distributed merge loop must
reproduce a plain Python reference trainer exactly — same pair counts,
same merge picks, same tie-breaks."""

from __future__ import annotations

import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lakehouse_weather_spark.operators.bpe import bpe_train
from lakehouse_weather_spark.registry import load_all


def _py_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str, int]]:
    words = [list(w) for t in texts for w in t.split(" ")]
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for s in words:
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += 1
        if not counts:
            break
        # (count DESC, pair ASC) — the deterministic merge-pick order
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, n))
        merged = a + b
        out_words = []
        for s in words:
            out, pending = [], None
            for x in s:
                if pending is None:
                    pending = x
                elif pending == a and x == b:
                    out.append(merged)
                    pending = None
                else:
                    out.append(pending)
                    pending = x
            if pending is not None:
                out.append(pending)
            out_words.append(out)
        words = out_words
    return merges


def test_bpe_train_matches_python_reference(spark, sf_dir):
    texts = [
        r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    ]
    want = _py_bpe(texts, n_merges=6)
    got = bpe_train(spark, sf_dir, n_merges=6)
    assert got == want
    # merges must be well-formed: counts positive and non-increasing is
    # NOT guaranteed by BPE (a merge can create a hotter pair), but
    # every count is positive and every pick was the argmax of its round
    assert all(n > 0 for _, _, n in got)


def test_bpe_pair_counts_first_merge_consistent(spark, sf_dir):
    """The registered counting kernel's top pair == the trainer's first
    merge pick (same corpus, same tie-break)."""
    top = load_all()["q_bpe_pair_counts"].fn(spark, sf_dir).collect()
    assert len(top) > 0
    first = bpe_train(spark, sf_dir, n_merges=1)[0]
    assert top[0]["pair"] == first[0] + first[1]
    assert top[0]["n"] == first[2]
    # descending by count with ascending pair tie-break
    ns = [r["n"] for r in top]
    assert ns == sorted(ns, reverse=True)


def test_greedy_tokenizer_roundtrip_and_priority(spark, sf_dir):
    """Pieces concatenate back to the exact word (lossless encode), and
    every emitted piece respects longest-match priority at its
    position."""
    from lakehouse_weather_spark.operators.bpe import VOCAB2, VOCAB3
    from lakehouse_weather_spark.registry import load_all

    rows = load_all()["q_tokenize_greedy"].fn(spark, sf_dir).collect()
    assert rows
    docs = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    v3, v2 = set(VOCAB3), set(VOCAB2)
    by_word: dict = {}
    for r in rows:
        by_word.setdefault((r.doc_id, r.word_idx), []).append(
            (r.piece_idx, r.piece)
        )
    for (doc_id, wi), pieces in by_word.items():
        pieces.sort()
        word = docs[doc_id][wi - 1]
        assert "".join(p for _, p in pieces) == word
        pos = 0
        for _, p in pieces:
            rest = word[pos:]
            if len(p) < 3:
                assert rest[:3] not in v3  # a trigram would have won
            if len(p) < 2:
                assert rest[:2] not in v2
            pos += len(p)
    # every non-empty word of every doc is covered
    n_words = sum(1 for ws in docs.values() for w in ws if w)
    assert len(by_word) == n_words


def test_langid_eval_matrix_consistency(spark, sf_dir):
    from lakehouse_weather_spark.registry import load_all

    rows = load_all()["q_langid_eval"].fn(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n for r in rows) == n_docs
    by_true: dict = {}
    for r in rows:
        by_true.setdefault(r.true_lang, []).append(r)
    for true_lang, cells in by_true.items():
        assert abs(sum(c.frac for c in cells) - 1.0) < 1e-12
