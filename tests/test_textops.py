"""Property tests for the chunkers (SURVEY.md §5.2 invariants, mirroring
the reference splitter contract at dags/utils/chunks_data.py:101):
every chunk <= size; neighbors share the overlap region; ordered
reconstruction recovers the source.
"""

from __future__ import annotations

import sys
from pathlib import Path

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lakehouse_weather_spark.operators.textops import (
    CHUNK_OVERLAP,
    CHUNK_SIZE,
    CHUNK_STRIDE,
    recursive_split,
)
from lakehouse_weather_spark.registry import load_all


def fixed_chunks(text: str) -> list[str]:
    n = max(1, -(-(max(len(text) - CHUNK_OVERLAP, 1)) // CHUNK_STRIDE))
    return [text[i * CHUNK_STRIDE : i * CHUNK_STRIDE + CHUNK_SIZE] for i in range(n)]


def test_fixed_chunker_matches_spark(spark, sf_dir):
    df = load_all()["q_chunk_split"].fn(spark, sf_dir)
    rows = df.orderBy("doc_id", "chunk_id").collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    by_doc: dict[int, list[str]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.split_content)
    assert set(by_doc) == set(docs)
    for doc_id, chunks in by_doc.items():
        assert chunks == fixed_chunks(docs[doc_id])


@given(st.text(alphabet="ab \n", min_size=0, max_size=1000))
@settings(max_examples=200, deadline=None)
def test_fixed_chunker_invariants(text):
    chunks = fixed_chunks(text)
    assert all(len(c) <= CHUNK_SIZE for c in chunks)
    # neighbors share the overlap region
    for i in range(len(chunks) - 1):
        if len(chunks[i]) == CHUNK_SIZE:
            assert chunks[i][CHUNK_STRIDE:] == chunks[i + 1][: CHUNK_OVERLAP]
    # ordered reconstruction: first STRIDE chars of each + full last chunk
    rebuilt = "".join(c[:CHUNK_STRIDE] for c in chunks[:-1]) + chunks[-1]
    assert rebuilt == text or (text == "" and chunks == [""])


@given(st.text(alphabet="abc \n", min_size=0, max_size=2000))
@settings(max_examples=200, deadline=None)
def test_recursive_split_invariants(text):
    chunks = recursive_split(text)
    assert all(len(c) <= CHUNK_SIZE for c in chunks)
    assert all(c for c in chunks)  # no empty chunks
    # every chunk is a contiguous substring of the source
    for c in chunks:
        assert c in text
    # full coverage: every non-separator char position is inside some chunk
    joined = "".join(chunks)
    for ch in set(text.replace("\n", "").replace(" ", "")):
        assert text.count(ch) <= joined.count(ch) + 0  # chunks may duplicate via overlap
        assert joined.count(ch) >= text.count(ch)


def test_recursive_split_plain():
    text = "para one line.\n\npara two is here.\n\n" + "word " * 100
    chunks = recursive_split(text)
    assert all(len(c) <= CHUNK_SIZE for c in chunks)
    assert chunks[0].startswith("para one")


def test_recursive_oracle_assumptions_hold_on_corpus(spark, sf_dir):
    """The q_chunk_recursive DuckDB oracle replays only the greedy
    word-packing branch of the splitter; that is exact iff the corpus
    has no newlines, no space runs, no edge spaces, and no word long
    enough to trigger the char fallback. Assert those preconditions on
    the fixture so a future testdata generation that violates them
    fails HERE with a clear message instead of as an oracle mismatch."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bad = docs.filter(
        F.col("text").contains("\n")
        | F.col("text").contains("  ")
        | F.col("text").startswith(" ")
        | F.col("text").endswith(" ")
        | (F.col("text") == "")
        | F.col("text").isNull()
        | F.exists(
            F.split("text", " "),
            lambda w: F.length(w) > CHUNK_SIZE - CHUNK_OVERLAP - 1,
        )
    ).count()
    assert bad == 0, (
        "corpus violates q_chunk_recursive oracle preconditions;"
        " the recursive-CTE oracle no longer replays the live path"
    )


def test_recursive_split_matches_python_reference(spark, sf_dir):
    """End-to-end: the Spark pandas_udf output equals a driver-side
    replay of recursive_split for every fixture doc (the oracle gate
    re-proves this against DuckDB; this is the Python-side anchor)."""
    from lakehouse_weather_spark.registry import load_all

    out = load_all()["q_chunk_recursive"].fn(spark, sf_dir).collect()
    got: dict[int, dict[int, str]] = {}
    for r in out:
        got.setdefault(r.doc_id, {})[r.chunk_id] = r.split_content
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    for d in docs:
        expect = recursive_split(d.text)
        chunks = [got[d.doc_id][i] for i in range(len(got.get(d.doc_id, {})))]
        assert chunks == expect, d.doc_id


def test_unicode_nfc_collapses_decomposed(spark, sf_dir):
    from lakehouse_weather_spark.registry import load_all

    rows = load_all()["q_unicode_nfc"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.doc_id % 2 == 0:
            # decomposed prefix: combining acute collapses into é
            assert r.changed and r.n_after == r.n_before - 1
        else:
            assert not r.changed and r.n_after == r.n_before
        assert r.head == "Café "  # composed form either way


def test_word_diversity_bounds_and_degenerates(spark, sf_dir):
    from lakehouse_weather_spark.registry import load_all

    rows = load_all()["q_word_diversity"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_distinct <= r.n_words
        # Simpson index in [0, 1 - 1/n]; 0 iff single repeated word
        assert 0.0 <= r.simpson_diversity < 1.0
        if r.n_distinct == 1:
            assert r.simpson_diversity == 0.0


def test_source_cap_enforced(spark, sf_dir):
    from lakehouse_weather_spark.operators.sampling import SOURCE_CAP
    from lakehouse_weather_spark.registry import load_all

    rows = load_all()["q_source_cap"].fn(spark, sf_dir).collect()
    per_source = {}
    for r in rows:
        per_source.setdefault(r.source, []).append(r.keep_rank)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    for src, ranks in per_source.items():
        assert len(ranks) <= SOURCE_CAP
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    assert len(rows) <= n_docs


def test_collocations_lift_definition(spark, sf_dir):
    from lakehouse_weather_spark.operators.textops import (
        COLLOC_MIN_SUPPORT,
        COLLOC_TOPK,
    )
    from lakehouse_weather_spark.registry import load_all

    rows = load_all()["q_collocations"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= COLLOC_TOPK
    # recompute counts in plain python
    texts = [
        r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .collect()
    ]
    uni: dict = {}
    bi: dict = {}
    n_bi = 0
    for t in texts:
        ws = t.split(" ")
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        if len(ws) >= 2:
            n_bi += len(ws) - 1
            for a, b in zip(ws, ws[1:]):
                bi[(a, b)] = bi.get((a, b), 0) + 1
    for r in rows:
        assert r.c_ab == bi[(r.w1, r.w2)] >= COLLOC_MIN_SUPPORT
        assert r.lift == (n_bi * r.c_ab) / (uni[r.w1] * uni[r.w2])
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_unigram_surprisal_definition(spark, sf_dir):
    from lakehouse_weather_spark.registry import load_all

    rows = load_all()["q_unigram_surprisal"].fn(spark, sf_dir).collect()
    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    assert len(rows) == len(texts)
    freq: dict = {}
    for t in texts.values():
        for w in t.split(" "):
            freq[w] = freq.get(w, 0) + 1
    ranked = sorted(freq, key=lambda w: (-freq[w], w))
    rank = {w: i + 1 for i, w in enumerate(ranked)}
    for r in rows[:50]:
        ws = texts[r.doc_id].split(" ")
        assert r.n_words == len(ws)
        assert r.rank_sum == sum(rank[w] for w in ws)
        assert r.mean_word_rank == r.rank_sum / r.n_words


def _cdc_python(text: str) -> list[tuple[int, int]]:
    from lakehouse_weather_spark.operators.textops import (
        CDC_MASK,
        CDC_W,
        _CDC_POWS,
    )

    n = len(text)
    cuts = set()
    for i in range(CDC_W, n + 1):  # 1-based window end
        h = sum(
            ord(text[i - 1 - j]) * _CDC_POWS[j] for j in range(CDC_W)
        )
        if h % CDC_MASK == 0:
            cuts.add(i)
    bounds = sorted({0, n} | cuts)
    return [(bounds[k] + 1, bounds[k + 1] - bounds[k]) for k in range(len(bounds) - 1)]


def test_cdc_chunks_tile_and_match_python_replay(spark, sf_dir):
    from lakehouse_weather_spark.registry import load_all

    rows = load_all()["q_cdc_chunks"].fn(spark, sf_dir).collect()
    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(texts)
    import hashlib

    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda c: c.chunk_idx)
        text = texts[doc_id]
        # chunks tile the document exactly
        pos = 1
        for c in chunks:
            assert c.start_pos == pos and c.chunk_len > 0
            pos += c.chunk_len
        assert pos == len(text) + 1
        # bit-identical to the pure-python replay
        want = _cdc_python(text)
        assert [(c.start_pos, c.chunk_len) for c in chunks] == want
        for c in chunks[:3]:
            seg = text[c.start_pos - 1 : c.start_pos - 1 + c.chunk_len]
            assert c.chunk_md5 == hashlib.md5(seg.encode()).hexdigest()


def test_cdc_boundaries_stable_under_insertion(spark):
    """The CDC property itself: inserting a char near the front leaves
    all chunks beyond the next boundary byte-identical (fixed-size
    splitting would shift every one). Pure-python check of the same
    hash/mask the operator uses."""
    import hashlib

    base = (
        "key agg row scan slow fast table value part hash value table"
        " part a row fast merge batch part value fast spark a a the"
        " line sort table window table table key"
    )
    edited = base[:5] + "X" + base[5:]
    h_base = {
        hashlib.md5(base[s - 1 : s - 1 + ln].encode()).hexdigest()
        for s, ln in _cdc_python(base)[1:]
    }
    h_edit = {
        hashlib.md5(edited[s - 1 : s - 1 + ln].encode()).hexdigest()
        for s, ln in _cdc_python(edited)[1:]
    }
    assert len(h_base & h_edit) >= len(h_base) - 2
