"""Text-processing dataflow operators (SURVEY.md §2.9) + the text-analysis
closure a large-scale training-data pipeline needs (language-ID, quality
scoring, token counting, document fingerprinting).

Reference anchors:
- Chunk splitting: ``dags/utils/chunks_data.py:101-102`` —
  ``RecursiveCharacterTextSplitter(chunk_size=5000, chunk_overlap=500)``.
  Here the *fixed-size* variant is the oracle-checked query (size=120,
  overlap=20 — scaled to the fixture's ~150-500-char docs); the
  recursive-separator variant is a pandas_udf (rows-only check).
- Everything below stays in built-in Spark SQL expressions (JVM,
  whole-stage codegen) except the recursive splitter, which is an
  Arrow-batched pandas_udf. At 100 TB each of these is a narrow,
  shuffle-free map over the documents scan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import fan_out, load_table

# Chunking config (reference: chunk_size=5000, chunk_overlap=500 at
# chunks_data.py:101; scaled 1:41.7 for the fixture corpus).
CHUNK_SIZE = 120
CHUNK_OVERLAP = 20
CHUNK_STRIDE = CHUNK_SIZE - CHUNK_OVERLAP

# Tiny deterministic stopword lexicons for the language-ID heuristic.
_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "on", "for", "it"),
    "es": ("el", "la", "de", "y", "en", "es", "los", "las", "un", "una"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "von", "zu", "den"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1", "zhe4", "bu4"),
}
# Deterministic tie-break order for argmax.
_LANG_ORDER = ("en", "es", "fr", "de", "zh")

# BPE-ish tokenizer regex: letter runs, digit runs, single punctuation.
_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


@register(
    "q_chunk_split",
    oracle=f"""
        WITH idx AS (
            SELECT doc_id, text,
                   unnest(generate_series(
                       0,
                       greatest((length(text) - {CHUNK_OVERLAP} + {CHUNK_STRIDE} - 1)
                                // {CHUNK_STRIDE}, 1) - 1)) AS i
            FROM documents
        )
        SELECT doc_id,
               CAST(i AS INTEGER) AS chunk_id,
               substring(text, CAST(i AS INTEGER) * {CHUNK_STRIDE} + 1,
                         {CHUNK_SIZE}) AS split_content
        FROM idx
    """,
    doc="Fixed-size overlapping chunker (ref: chunks_data.py:101 splitter"
    " config; Milvus int64 chunk-index field 106). Pure SQL: sequence +"
    " transform + posexplode — no UDF, fully codegen'd, shuffle-free.",
)
def q_chunk_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # integer division via expr to match DuckDB's // exactly
    return docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, int(greatest((length(text) - {CHUNK_OVERLAP}"
                f" + {CHUNK_STRIDE - 1}) div {CHUNK_STRIDE}, 1)) - 1),"
                f" i -> substring(text, i * {CHUNK_STRIDE} + 1, {CHUNK_SIZE}))"
            )
        ).alias("chunk_id", "split_content"),
    )


def recursive_split(text: str, size: int = CHUNK_SIZE, overlap: int = CHUNK_OVERLAP) -> list[str]:
    """Deterministic recursive-character splitter (same contract as the
    reference's RecursiveCharacterTextSplitter at chunks_data.py:101:
    hierarchical separators, max ``size`` chars, ~``overlap`` carry-over).

    Own implementation — splits on the coarsest separator whose pieces
    fit, packs greedily, and carries a tail overlap between chunks.
    """
    seps = ["\n\n", "\n", " ", ""]

    def _split(t: str, sep_idx: int) -> list[str]:
        if len(t) <= size:
            return [t] if t else []
        if sep_idx >= len(seps) - 1:
            # character-level fallback: fixed windows with overlap
            out = []
            start = 0
            while start < len(t):
                out.append(t[start : start + size])
                if start + size >= len(t):
                    break
                start += size - overlap
            return out
        sep = seps[sep_idx]
        parts = t.split(sep)
        chunks: list[str] = []
        cur = ""
        for part in parts:
            candidate = cur + sep + part if cur else part
            if len(candidate) <= size:
                cur = candidate
                continue
            if cur:
                chunks.append(cur)
                # carry overlap tail into the next chunk
                tail = cur[-overlap:] if overlap else ""
                cur = (tail + sep + part) if tail else part
                if len(cur) > size:
                    chunks.extend(_split(cur, sep_idx + 1))
                    cur = ""
            else:
                chunks.extend(_split(part, sep_idx + 1))
        if cur:
            chunks.append(cur)
        return chunks

    return _split(text, 0)


@F.pandas_udf(ArrayType(StringType()))
def _recursive_split_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: recursive_split(t or ""))


@register(
    "q_chunk_recursive",
    # The separator hierarchy collapses on this corpus: the fixture
    # texts contain no newlines, no space runs, and no word longer
    # than size-overlap-1 (asserted in tests/test_textops.py), so the
    # splitter's live path is exactly greedy word-packing with a
    # right(cur, overlap) tail carry — which a DuckDB recursive CTE
    # replays word-by-word. The deeper separator/char-fallback branches
    # stay covered by the Python property tests.
    oracle=f"""
        WITH RECURSIVE w AS (
            SELECT doc_id, string_split(text, ' ') AS words,
                   len(string_split(text, ' ')) AS n
            FROM documents
        ), step AS (
            SELECT doc_id, words, n, 1 AS i, words[1] AS cur,
                   CAST([] AS VARCHAR[]) AS done
            FROM w
            UNION ALL
            SELECT doc_id, words, n, i + 1,
                   CASE WHEN len(cur || ' ' || words[i + 1]) <= {CHUNK_SIZE}
                        THEN cur || ' ' || words[i + 1]
                        ELSE right(cur, {CHUNK_OVERLAP}) || ' ' || words[i + 1]
                   END,
                   CASE WHEN len(cur || ' ' || words[i + 1]) <= {CHUNK_SIZE}
                        THEN done ELSE list_append(done, cur) END
            FROM step WHERE i < n
        ), fin AS (
            SELECT doc_id, list_append(done, cur) AS chunks
            FROM step WHERE i = n
        )
        SELECT doc_id,
               CAST(u.s['i'] AS INTEGER) AS chunk_id,
               CAST(u.s['c'] AS VARCHAR) AS split_content
        FROM fin,
             unnest(list_transform(chunks,
                    (c, i) -> {{'i': i - 1, 'c': c}})) AS u(s)
    """,
    doc="Recursive-separator chunker as an Arrow-batched pandas_udf +"
    " posexplode (the reference's actual splitter semantics,"
    " chunks_data.py:101-110). Hash-checked against a DuckDB recursive"
    " CTE that replays the greedy word-packing + overlap-carry loop"
    " (the hierarchy's live path on this corpus — see oracle note);"
    " invariants are property-tested in tests/test_textops.py.",
)
def q_chunk_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.posexplode(_recursive_split_udf(F.col("text"))).alias(
            "chunk_id", "split_content"
        ),
    )


def _lang_score_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in _LEXICONS[lang])
    return f"count(*) FILTER (WHERE word IN ({words})) AS s_{lang}"


_LANGID_ORACLE = f"""
    WITH words AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        FROM documents
    ),
    scores AS (
        SELECT doc_id, {", ".join(_lang_score_sql(lg) for lg in _LANG_ORDER)}
        FROM words GROUP BY doc_id
    )
    SELECT doc_id,
           CASE
             WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en >= s_zh THEN 'en'
             WHEN s_es >= s_fr AND s_es >= s_de AND s_es >= s_zh THEN 'es'
             WHEN s_fr >= s_de AND s_fr >= s_zh THEN 'fr'
             WHEN s_de >= s_zh THEN 'de'
             ELSE 'zh'
           END AS pred_lang,
           CAST(s_en AS BIGINT) AS en_hits
    FROM scores
"""


@register(
    "q_text_langid",
    oracle=_LANGID_ORACLE,
    doc="Stopword-lexicon language-ID heuristic (training-data pipeline"
    " closure): explode words, count lexicon hits per language, argmax"
    " with deterministic tie-break. At scale the lexicon is a broadcast"
    " literal; the word explode stays narrow (agg back on doc_id).",
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    words = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word")
    )
    aggs = [
        F.count(F.when(F.col("word").isin(*_LEXICONS[lg]), F.lit(1))).alias(f"s_{lg}")
        for lg in _LANG_ORDER
    ]
    scores = words.groupBy("doc_id").agg(*aggs)
    s = {lg: F.col(f"s_{lg}") for lg in _LANG_ORDER}
    pred = (
        F.when(
            (s["en"] >= s["es"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["de"]) & (s["en"] >= s["zh"]),
            F.lit("en"),
        )
        .when((s["es"] >= s["fr"]) & (s["es"] >= s["de"]) & (s["es"] >= s["zh"]), F.lit("es"))
        .when((s["fr"] >= s["de"]) & (s["fr"] >= s["zh"]), F.lit("fr"))
        .when(s["de"] >= s["zh"], F.lit("de"))
        .otherwise(F.lit("zh"))
    )
    return scores.select("doc_id", pred.alias("pred_lang"), F.col("s_en").alias("en_hits"))


@register(
    "q_text_tokens",
    oracle=f"""
        SELECT doc_id,
               CAST(len(string_split_regex(text, '\\s+')) AS INTEGER) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '{_TOKEN_RE}')) AS INTEGER)
                   AS bpe_tokens,
               CAST(length(text) AS INTEGER) AS n_chars_measured
        FROM documents
    """,
    doc="Token counting (training-data closure): whitespace tokens + a"
    " BPE-ish regex token count (letter runs / digit runs / single"
    " punctuation). Pure regex expressions — JVM-side, no UDF.",
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", r"\s+")).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_TOKEN_RE), F.lit(0))).alias(
            "bpe_tokens"
        ),
        F.length("text").alias("n_chars_measured"),
    )


@register(
    "q_text_quality",
    oracle="""
        SELECT doc_id,
               CAST(length(text) AS INTEGER) AS n_chars_q,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
               CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE)
                   / NULLIF(length(text), 0) AS punct_ratio,
               CAST(len(list_filter(string_split(text, ' '),
                        w -> w IN ('the','a','of','and','to','in','is','on','for','it')))
                    AS DOUBLE) / len(string_split(text, ' ')) AS stopword_ratio,
               least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0, 1.0)
                 * (1.0 - CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE)
                          / NULLIF(length(text), 0)) AS quality_score
        FROM documents
    """,
    doc="Document quality scoring (training-data closure): length, word"
    " count, punctuation ratio, stopword ratio, and a composite score —"
    " the standard pre-training filter features, all as codegen'd"
    " expressions.",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_words = F.size(words).cast("double")
    punct = F.size(F.regexp_extract_all("text", F.lit("[^a-z0-9 ]"), F.lit(0))).cast(
        "double"
    )
    stop_hits = F.size(
        F.filter(words, lambda w: w.isin(*_LEXICONS["en"]))
    ).cast("double")
    # an EMPTY document has no defined punctuation ratio: NULL, not a
    # divide-by-zero (mirrored in the oracle)
    punct_ratio = punct / F.expr("nullif(length(text), 0)")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_q"),
        F.size(words).alias("n_words"),
        punct_ratio.alias("punct_ratio"),
        (stop_hits / n_words).alias("stopword_ratio"),
        (F.least(n_words / F.lit(50.0), F.lit(1.0)) * (F.lit(1.0) - punct_ratio)).alias(
            "quality_score"
        ),
    )


@register(
    "q_lang_doc_stats",
    oracle="""
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
                   AS total_tokens,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources
        FROM documents
        GROUP BY lang
    """,
    doc="Per-language corpus statistics (dataset-card material: docs,"
    " tokens, chars, sources per language) — the summary pass after"
    " language-ID in a training-data pipeline.",
)
def q_lang_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " ")).cast("bigint")).alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


@register(
    "q_word_topk",
    oracle="""
        SELECT word, count(*) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        GROUP BY word
        ORDER BY freq DESC, word
        LIMIT 20
    """,
    doc="Corpus word-frequency top-k (the canonical distributed"
    " word count; vocabulary statistics for tokenizer training)."
    " explode -> partial-agg -> final agg -> TakeOrderedAndProject;"
    " the shuffle carries only (word, partial_count) pairs.",
)
def q_word_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(20)
    )


@register(
    "q_text_fingerprint",
    oracle="""
        WITH idx AS (
            SELECT doc_id, string_split(text, ' ') AS words,
                   unnest(generate_series(
                       1, greatest(len(string_split(text, ' ')) - 4, 1))) AS i
            FROM documents
        )
        SELECT doc_id,
               min(CAST(('0x' || substr(md5(array_to_string(
                       words[i : i + 4], ' ')), 1, 15)) AS BIGINT)) AS fingerprint
        FROM idx
        GROUP BY doc_id
    """,
    doc="Document fingerprint (training-data closure): min-hash over word"
    " 5-shingles using a shared md5-prefix hash — the rolling-hash dedup"
    " fingerprint, computed as array expressions (no shuffle; GROUP BY"
    " is per-doc local).",
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(
            "array_min(transform(sequence(1, greatest(size(split(text, ' ')) - 4, 1)),"
            " i -> cast(conv(substr(md5(concat_ws(' ',"
            " slice(split(text, ' '), i, 5))), 1, 15), 16, 10) as bigint)))"
        ).alias("fingerprint"),
    )


@register(
    "q_keyword_extract",
    oracle="""
        WITH tf AS (
            SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
            FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS word
                FROM documents
            )
            GROUP BY doc_id, word
        ),
        df AS (
            SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
            FROM tf GROUP BY word
        ),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        scored AS (
            SELECT t.doc_id, t.word,
                   CAST(t.tf AS DOUBLE) * n.n_docs / d.df AS score,
                   row_number() OVER (
                       PARTITION BY t.doc_id
                       ORDER BY CAST(t.tf AS DOUBLE) * n.n_docs / d.df DESC,
                                t.word
                   ) AS rn
            FROM tf t JOIN df d USING (word) CROSS JOIN n
        )
        SELECT doc_id, word, score, CAST(rn AS INTEGER) AS rn
        FROM scored WHERE rn <= 3
    """,
    doc="Keyword extraction: top-3 terms per document by the rational"
    " tf-idf surrogate tf * N/df (one exact division — deliberately no"
    " log-idf, whose libm rounding differs per engine; the RANKING it"
    " induces is identical for single-term scores). One tf groupBy,"
    " one df groupBy joined back on the term, a per-doc window for the"
    " top-3 — the summarize/tag stage of corpus curation, shuffle-"
    "bounded by the term and doc keys.",
)
def q_keyword_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    tf = words.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    df = tf.groupBy("word").agg(
        F.countDistinct("doc_id").cast("bigint").alias("df")
    )
    n = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    score = F.col("tf").cast("double") * F.col("n_docs") / F.col("df")
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("word")
    )
    scored = (
        tf.join(df, "word")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "word", score.alias("score"))
        .withColumn("rn", F.row_number().over(w))
    )
    return scored.filter(F.col("rn") <= 3).select(
        "doc_id", "word", "score", F.col("rn").cast("int").alias("rn")
    )


@register(
    "q_readability",
    oracle="""
        WITH m AS (
            SELECT doc_id,
                   CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                        AS BIGINT) AS n_sentences,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                   CAST(greatest(len(regexp_extract_all(lower(text),
                        '[aeiouy]+')), 1) AS BIGINT) AS n_syllables
            FROM documents
        )
        SELECT doc_id, n_sentences, n_words, n_syllables,
               206.835
               - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
               - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words)
                   AS flesch_score
        FROM m
    """,
    doc="Flesch reading-ease per document from three deterministic"
    " counts — sentence terminators, words, and vowel-group syllable"
    " proxies (regexp_extract_all lengths, identical in Java and RE2"
    " for these classes) — combined by the classic formula as mirrored"
    " IEEE arithmetic. Narrow scan-speed text featurization; the"
    " readability band is a standard pretraining quality signal"
    " alongside the Gopher repetition metrics.",
)
def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    n_sent = F.greatest(
        F.expr("size(regexp_extract_all(text, '[.!?]+', 0))"), F.lit(1)
    ).cast("bigint")
    n_words = F.size(F.split("text", " ")).cast("bigint")
    n_syll = F.greatest(
        F.expr("size(regexp_extract_all(lower(text), '[aeiouy]+', 0))"),
        F.lit(1),
    ).cast("bigint")
    m = docs.select(
        "doc_id",
        n_sent.alias("n_sentences"),
        n_words.alias("n_words"),
        n_syll.alias("n_syllables"),
    )
    score = (
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("n_words").cast("double") / F.col("n_sentences"))
        - F.lit(84.6)
        * (F.col("n_syllables").cast("double") / F.col("n_words"))
    )
    return m.withColumn("flesch_score", score)


# ---------------------------------------------------------------------------
# Unicode NFC normalization (multilingual cleaning stage)
# ---------------------------------------------------------------------------

# Deterministic synthetic mojibake: even doc_ids get a DECOMPOSED
# prefix (e + U+0301 combining acute), odd ids the COMPOSED form
# (U+00E9) — so NFC is a real transformation on half the corpus and an
# identity on the other half, and both cases are value-checked.
_NFC_DECOMPOSED = "Café "
_NFC_COMPOSED = "Café "


@F.pandas_udf(StringType())
def _nfc_udf(s: pd.Series) -> pd.Series:
    import unicodedata

    return s.map(lambda x: unicodedata.normalize("NFC", x))


@register(
    "q_unicode_nfc",
    oracle="""
        WITH synth AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 2 = 0
                        THEN 'Cafe' || chr(769) || ' ' || text
                        ELSE 'Caf' || chr(233) || ' ' || text
                   END AS raw
            FROM documents
        )
        SELECT doc_id,
               CAST(length(raw) AS BIGINT) AS n_before,
               CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_after,
               length(nfc_normalize(raw)) <> length(raw) AS changed,
               substr(nfc_normalize(raw), 1, 5) AS head
        FROM synth
    """,
    doc="Unicode NFC normalization — the canonicalization pass every"
    " multilingual corpus runs before hashing/dedup (the same text in"
    " composed vs decomposed form must not count as two documents)."
    " Spark lacks a built-in normalizer, so the kernel is an"
    " Arrow-batched pandas_udf over unicodedata.normalize('NFC') — a"
    " narrow per-row map, no shuffle — checked against DuckDB's native"
    " nfc_normalize on a synthetic composed/decomposed column pair"
    " (python unicodedata and DuckDB's utf8proc both implement the"
    " Unicode canonical-composition algorithm, so outputs agree"
    " byte-for-byte). At 100 TB this is scan-speed Arrow batches;"
    " the char-count columns prove the combining sequences actually"
    " collapsed.",
)
def q_unicode_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    raw = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit(_NFC_DECOMPOSED), F.col("text")),
    ).otherwise(F.concat(F.lit(_NFC_COMPOSED), F.col("text")))
    synth = docs.select("doc_id", raw.alias("raw"))
    norm = synth.select(
        "doc_id", "raw", _nfc_udf("raw").alias("nfc")
    )
    return norm.select(
        "doc_id",
        F.length("raw").cast("bigint").alias("n_before"),
        F.length("nfc").cast("bigint").alias("n_after"),
        (F.length("nfc") != F.length("raw")).alias("changed"),
        F.substring("nfc", 1, 5).alias("head"),
    )


# ---------------------------------------------------------------------------
# Language-ID evaluation: confusion matrix vs the labeled lang column
# ---------------------------------------------------------------------------

_PRED_CASE = """
           CASE
             WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en >= s_zh THEN 'en'
             WHEN s_es >= s_fr AND s_es >= s_de AND s_es >= s_zh THEN 'es'
             WHEN s_fr >= s_de AND s_fr >= s_zh THEN 'fr'
             WHEN s_de >= s_zh THEN 'de'
             ELSE 'zh'
           END
"""


@register(
    "q_langid_eval",
    oracle=f"""
        WITH words AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
            FROM documents
        ),
        scores AS (
            SELECT doc_id, {", ".join(_lang_score_sql(lg) for lg in _LANG_ORDER)}
            FROM words GROUP BY doc_id
        ),
        pred AS (
            SELECT doc_id, {_PRED_CASE} AS pred_lang FROM scores
        ),
        cm AS (
            SELECT d.lang AS true_lang, p.pred_lang, count(*) AS n
            FROM documents d JOIN pred p USING (doc_id)
            GROUP BY d.lang, p.pred_lang
        )
        SELECT true_lang, pred_lang,
               CAST(n AS BIGINT) AS n,
               CAST(n AS DOUBLE)
                   / CAST(sum(n) OVER (PARTITION BY true_lang) AS DOUBLE)
                   AS frac
        FROM cm
    """,
    doc="Language-ID quality scorecard: confusion matrix of the"
    " stopword-lexicon classifier (q_text_langid) against the corpus's"
    " labeled lang column — (true_lang, pred_lang, count, row-share)."
    " The eval every multilingual curation pipeline keeps on a"
    " dashboard: the diagonal is per-language recall, off-diagonal"
    " cells say which language pairs the lexicon confuses. Integer"
    " counts + one division per cell over a per-true-lang window sum,"
    " so the matrix hash-matches the oracle. Scale: the classifier's"
    " explode/agg dominates; the matrix itself is a languages^2-row"
    " aggregate.",
)
def q_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    pred = q_text_langid(spark, sf_dir).select("doc_id", "pred_lang")
    cm = (
        docs.select("doc_id", F.col("lang").alias("true_lang"))
        .join(pred, "doc_id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = F.sum("n").over(Window.partitionBy("true_lang"))
    return cm.select(
        "true_lang",
        "pred_lang",
        F.col("n").cast("bigint").alias("n"),
        (F.col("n").cast("double") / total.cast("double")).alias("frac"),
    )


# ---------------------------------------------------------------------------
# Collocation / phrase mining: adjacent-bigram lift (rational PMI)
# ---------------------------------------------------------------------------

COLLOC_MIN_SUPPORT = 3
COLLOC_TOPK = 30


@register(
    "q_collocations",
    oracle=f"""
        WITH w AS (
            SELECT string_split(text, ' ') AS words FROM documents
        ),
        uni AS (
            SELECT word, count(*) AS c FROM (
                SELECT unnest(words) AS word FROM w
            ) GROUP BY word
        ),
        bi AS (
            SELECT w1, w2, count(*) AS c_ab FROM (
                SELECT words[i] AS w1, words[i + 1] AS w2
                FROM (
                    SELECT words,
                           unnest(generate_series(1, len(words) - 1)) AS i
                    FROM w WHERE len(words) >= 2
                )
            ) GROUP BY w1, w2
        ),
        n AS (
            SELECT CAST(sum(len(words) - 1) AS BIGINT) AS n_bi FROM w
            WHERE len(words) >= 2
        )
        SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab,
               CAST(n.n_bi * c_ab AS DOUBLE)
                   / CAST(u1.c * u2.c AS DOUBLE) AS lift
        FROM bi, n
        JOIN uni u1 ON bi.w1 = u1.word
        JOIN uni u2 ON bi.w2 = u2.word
        WHERE c_ab >= {COLLOC_MIN_SUPPORT}
        ORDER BY lift DESC, w1, w2
        LIMIT {COLLOC_TOPK}
    """,
    doc=f"Collocation mining: top-{COLLOC_TOPK} adjacent word bigrams by"
    " LIFT — n_bigrams * c(a,b) / (c(a) * c(b)), the rational core of"
    " PMI (PMI = log2(lift); log dropped for cross-engine bit parity —"
    " the ranking is identical since log is monotone). Phrase"
    " discovery for tokenizer vocab construction and boilerplate"
    " detection. Support floor {COLLOC_MIN_SUPPORT} kills"
    " one-off pairs. All counts are exact integers; lift is one IEEE"
    " division of exact int64 products, so the list hash-matches the"
    " oracle. Scale shape: two partial-agg shuffles (unigrams,"
    " bigrams) + two broadcast-able joins of the bigram table against"
    " the unigram table + TakeOrdered top-k; nothing global-sorts.",
)
def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(F.split("text", " ").alias("words"))
    uni = (
        w.select(F.explode("words").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        w.filter(F.size("words") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(words) - 1),"
                    " i -> struct(words[i - 1] AS w1, words[i] AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    n_bi = (
        w.filter(F.size("words") >= 2)
        .agg(F.sum(F.size("words") - 1).cast("bigint").alias("n_bi"))
    )
    u1 = uni.select(F.col("word").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("word").alias("w2"), F.col("c").alias("c2"))
    return (
        bi.crossJoin(F.broadcast(n_bi))
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .filter(F.col("c_ab") >= COLLOC_MIN_SUPPORT)
        .select(
            "w1",
            "w2",
            F.col("c_ab").cast("bigint").alias("c_ab"),
            (
                (F.col("n_bi") * F.col("c_ab")).cast("double")
                / (F.col("c1") * F.col("c2")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("w1"), F.asc("w2"))
        .limit(COLLOC_TOPK)
    )


# ---------------------------------------------------------------------------
# Unigram-LM surprisal proxy (perplexity stand-in without libm log)
# ---------------------------------------------------------------------------


@register(
    "q_unigram_surprisal",
    oracle="""
        WITH words AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents
        ),
        freq AS (
            SELECT word, count(*) AS c FROM words GROUP BY word
        ),
        ranks AS (
            SELECT word,
                   CAST(row_number() OVER (ORDER BY c DESC, word)
                        AS BIGINT) AS rnk
            FROM freq
        )
        SELECT w.doc_id,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(r.rnk) AS BIGINT) AS rank_sum,
               CAST(sum(r.rnk) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                   AS mean_word_rank
        FROM words w JOIN ranks r ON w.word = r.word
        GROUP BY w.doc_id
    """,
    doc="Unigram-LM surprisal proxy: every word gets its corpus"
    " frequency RANK (1 = most common), and each doc scores the mean"
    " rank of its words — the deterministic stand-in for LM perplexity"
    " filtering (CCNet-style): low mean rank = stereotypical common"
    " text, high = rare-word-heavy (specialist or garbage), both ends"
    " get human review in a curation funnel. Ranks instead of"
    " -log p keeps every value integer until one final division, so"
    " rows hash-match the oracle. Scale shape: one agg builds the"
    " frequency table (the 'model'), a rank window over the VOCAB"
    " (not the corpus), then a broadcast-able join back + per-doc agg."
    " The vocab rank window is the only total order and it sorts"
    " vocab-sized data, never corpus-sized.",
)
def q_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    ranks = freq.select(
        "word",
        F.row_number()
        .over(Window.orderBy(F.desc("c"), F.asc("word")))
        .cast("bigint")
        .alias("rnk"),
    )
    return (
        words.join(F.broadcast(ranks), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("rnk").cast("bigint").alias("rank_sum"),
            (
                F.sum("rnk").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_word_rank"),
        )
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (rolling-hash boundaries, dedup-storage style)
# ---------------------------------------------------------------------------

CDC_W = 8            # rolling window (chars)
CDC_MASK = 32        # boundary when window hash % CDC_MASK == 0 (~32-char avg)
_CDC_B = 31
_CDC_POWS = [_CDC_B**j for j in range(CDC_W)]


def _cdc_hash(engine: str) -> str:
    """Window hash at position i (chars i-W+1..i), int64-exact in both
    engines: sum_j code(text[i-j]) * B^j with B-powers inlined as
    literals (max term 255*31^7 ~ 7e12, sum < 6e13 << 2**63). The
    Spark side reads a PRE-SPLIT per-char code array `codes` via O(1)
    element_at — substr(text, i, 1) walks the UTF8 buffer from the
    start, turning the whole scan O(len^2) (measured 15.7 s at sf0.1;
    the array form is ~1.5 s, identical hashes)."""
    pows = ", ".join(str(p) for p in _CDC_POWS)
    if engine == "spark":
        return (
            f"aggregate(transform(sequence(0, {CDC_W - 1}),"
            f" j -> element_at(codes, CAST(i - j AS INT))"
            f" * element_at(array({pows}), j + 1)),"
            " 0L, (a, x) -> a + CAST(x AS BIGINT))"
        )
    return (
        f"list_sum(list_transform(generate_series(0, {CDC_W - 1}),"
        f" j -> ascii(substr(text, CAST(i - j AS INT), 1))"
        f" * ([{pows}])[j + 1]))"
    )


def _cdc_kernel(batches):
    """NumPy twin of the SQL rolling-hash chunker (guide §4.2): per
    doc, codepoints via utf-32 decode (== Spark ascii() per split
    char), the {CDC_W}-wide polynomial hash as W vectorized int64
    shifted-slice adds (exact — max sum ~6e13 << 2^63, identical
    integers to the SQL aggregate), boundaries where hash % CDC_MASK
    == 0, chunk md5 via hashlib (== Spark md5 of the same UTF-8
    bytes). The interpreted lambda form evaluated ~40 M per-position
    closures per bench run (~3.5 s at sf0.1; this kernel ~1 s)."""
    import hashlib

    import numpy as np
    import pandas as pd

    pows = np.array(_CDC_POWS, dtype=np.int64)
    for pdf in batches:
        out_doc: list = []
        out_idx: list = []
        out_start: list = []
        out_len: list = []
        out_md5: list = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            n = len(text)
            if n >= CDC_W:
                codes = np.frombuffer(
                    text.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                h = np.zeros(n - CDC_W + 1, dtype=np.int64)
                for j in range(CDC_W):
                    h += codes[CDC_W - 1 - j : n - j] * pows[j]
                cuts = np.nonzero(h % CDC_MASK == 0)[0] + CDC_W
            else:
                cuts = np.empty(0, dtype=np.int64)
            bounds = np.unique(
                np.concatenate(
                    ([0], cuts, [n])
                ).astype(np.int64)
            )
            for k in range(len(bounds) - 1):
                s, e = int(bounds[k]), int(bounds[k + 1])
                out_doc.append(doc_id)
                out_idx.append(k + 1)
                out_start.append(s + 1)
                out_len.append(e - s)
                out_md5.append(
                    hashlib.md5(text[s:e].encode("utf-8")).hexdigest()
                )
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out_doc, dtype="int64"),
                "chunk_idx": pd.Series(out_idx, dtype="int64"),
                "start_pos": pd.Series(out_start, dtype="int64"),
                "chunk_len": pd.Series(out_len, dtype="int64"),
                "chunk_md5": pd.Series(out_md5, dtype="object"),
            }
        )


@register(
    "q_cdc_chunks",
    oracle=f"""
        WITH cuts AS (
            SELECT doc_id, text, length(text) AS n,
                   list_sort(list_distinct(
                       [CAST(0 AS BIGINT)]
                       || list_transform(
                              list_filter(
                                  CASE WHEN length(text) >= {CDC_W}
                                       THEN generate_series({CDC_W},
                                                            length(text))
                                       ELSE [] END,
                                  i -> {_cdc_hash('duck')} % {CDC_MASK} = 0),
                              i -> CAST(i AS BIGINT))
                       || [CAST(length(text) AS BIGINT)]
                   )) AS bounds
            FROM documents
        )
        SELECT doc_id,
               CAST(j AS BIGINT) AS chunk_idx,
               bounds[j] + 1 AS start_pos,
               bounds[j + 1] - bounds[j] AS chunk_len,
               md5(substr(text, CAST(bounds[j] + 1 AS INT),
                          CAST(bounds[j + 1] - bounds[j] AS INT)))
                   AS chunk_md5
        FROM (
            SELECT doc_id, text, bounds,
                   unnest(generate_series(1, len(bounds) - 1)) AS j
            FROM cuts
        )
    """,
    doc=f"Content-defined chunking: boundaries fall where the"
    f" {CDC_W}-char polynomial rolling hash is 0 mod {CDC_MASK}"
    " (~32-char expected chunks) — the storage-dedup technique (LBFS /"
    " restic / borg lineage) that keeps chunk boundaries STABLE under"
    " insertions, unlike fixed-size splitting where one inserted byte"
    " shifts every later chunk. Emits (doc_id, chunk_idx, start, len,"
    " md5) — the md5 column is the dedup key downstream. The whole"
    " boundary computation is ONE narrow projection (nested"
    " transform/filter/aggregate over char positions, int64-exact"
    " hash) + a posexplode — zero shuffles, scan-speed at any corpus"
    " size; the DuckDB replay uses the same lambda pipeline, so every"
    " chunk hash-matches.",
)
def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(
        _cdc_kernel,
        schema="doc_id long, chunk_idx long, start_pos long,"
        " chunk_len long, chunk_md5 string",
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (MOSS local-min k-gram selection)
# ---------------------------------------------------------------------------

WINNOW_K = 3  # k-gram width (words)
WINNOW_W = 4  # winnowing window (grams)
_WH_SPARK = "cast(conv(substr(md5({expr}), 1, 15), 16, 10) as bigint)"
_WH_DUCK = "CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


@register(
    "q_winnow_fingerprint",
    oracle=f"""
        WITH grams AS (
            SELECT doc_id, i AS p,
                   {_WH_DUCK.format(
                       expr=f"array_to_string(words[i : i + {WINNOW_K - 1}], ' ')"
                   )} AS h,
                   len(words) - {WINNOW_K - 1} AS n_grams
            FROM (
                SELECT doc_id, string_split(text, ' ') AS words,
                       unnest(generate_series(
                           1, len(string_split(text, ' ')) - {WINNOW_K - 1}
                       )) AS i
                FROM documents
                WHERE len(string_split(text, ' ')) >= {WINNOW_K}
            )
        ),
        starts AS (
            SELECT doc_id, p,
                   min(h) OVER (
                       PARTITION BY doc_id ORDER BY p
                       ROWS BETWEEN CURRENT ROW
                                AND {WINNOW_W - 1} FOLLOWING
                   ) AS wmin
            FROM grams
            QUALIFY p <= greatest(1, n_grams - {WINNOW_W - 1})
        )
        SELECT DISTINCT g.doc_id, max(g.p) AS pos, s.wmin AS fingerprint
        FROM starts s
        JOIN grams g
          ON g.doc_id = s.doc_id
         AND g.p BETWEEN s.p AND s.p + {WINNOW_W - 1}
         AND g.h = s.wmin
        GROUP BY g.doc_id, s.p, s.wmin
    """,
    doc=f"Winnowing document fingerprints (Schleimer/Wilkerson/Aiken"
    " 2003, the MOSS algorithm): hash every {k}-word gram, slide a"
    f" {WINNOW_W}-gram window, keep the RIGHTMOST minimal hash per"
    " window — guarantees every shared substring of >= w+k-1 words"
    " yields at least one common fingerprint while storing only"
    " ~2/(w+1) of the grams. The selection is pure relational algebra:"
    " a following-rows min window over gram positions plus a width-"
    " bounded band self-join for the rightmost-argmin, so Catalyst"
    " keeps the whole plan in codegen (no UDF) and the per-doc"
    " partitions bound every frame. The md5-derived 60-bit gram hash"
    " is the engine-portable contract the dedup family already uses;"
    " fingerprints feed plagiarism/overlap detection at ~1/3 the"
    " storage of full shingle sets.",
)
def q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    w = F.split("text", " ")
    grams = (
        docs.select("doc_id", w.alias("words"), F.size(w).alias("n"))
        .filter(F.col("n") >= WINNOW_K)
        .select(
            "doc_id",
            (F.col("n") - (WINNOW_K - 1)).alias("n_grams"),
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(words) - {WINNOW_K - 1}),"
                    f" i -> struct(i AS p, {_WH_SPARK.format(expr=f'concat_ws(%r, slice(words, i, {WINNOW_K}))' % ' ')} AS h))"
                )
            ).alias("g"),
        )
        .select("doc_id", "n_grams", F.col("g.p").alias("p"), F.col("g.h").alias("h"))
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.currentRow, WINNOW_W - 1)
    )
    # r11 (guide §2.4): the rightmost-minimal gram per window needs no
    # band self-join — min(struct(h, -p)) over the SAME following-rows
    # frame is lexicographic (smallest hash first, ties to the largest
    # p), so one window pass yields both the oracle's wmin and its
    # max-position fetch. The old shape re-derived the whole explode+
    # md5 gram subtree as the join probe and shuffled it twice more
    # (join + groupBy); plan drops to scan -> window -> distinct.
    ms = F.min(F.struct(F.col("h"), (-F.col("p")).alias("np"))).over(win)
    starts = grams.withColumn("ms", ms).filter(
        F.col("p")
        <= F.greatest(F.lit(1), F.col("n_grams") - (WINNOW_W - 1))
    )
    return starts.select(
        "doc_id",
        (-F.col("ms.np")).alias("pos"),
        F.col("ms.h").alias("fingerprint"),
    ).distinct()


# ---------------------------------------------------------------------------
# Vocabulary coverage curve
# ---------------------------------------------------------------------------

VOCAB_SIZES = (100, 500, 2000)


@register(
    "q_vocab_coverage",
    oracle=f"""
        WITH words AS (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        ),
        freq AS (SELECT word, count(*) AS c FROM words GROUP BY word),
        ranked AS (
            SELECT word, c,
                   row_number() OVER (ORDER BY c DESC, word) AS rnk,
                   sum(c) OVER () AS total
            FROM freq
        )
        SELECT CAST(v.n AS BIGINT) AS vocab_size,
               CAST(sum(r.c) FILTER (WHERE r.rnk <= v.n) AS BIGINT)
                   AS covered_tokens,
               CAST(max(r.total) AS BIGINT) AS total_tokens,
               CAST(sum(r.c) FILTER (WHERE r.rnk <= v.n) AS DOUBLE)
                   / max(r.total) AS coverage
        FROM ranked r
        CROSS JOIN (SELECT unnest({list(VOCAB_SIZES)}) AS n) v
        GROUP BY v.n
    """,
    doc=f"Vocabulary coverage curve: the fraction of all corpus tokens"
    f" covered by the top-{{{', '.join(map(str, VOCAB_SIZES))}}} most"
    " frequent words — the sizing curve that picks a word-level vocab"
    " (or decides subword is required) before tokenizer training;"
    " read together with q_tokenizer_fertility (cost of the subword"
    " fallback) and q_bpe_pair_counts (what the subword vocab learns)."
    " One frequency agg, a rank window over the VOCAB (never the"
    " corpus), and a |sizes|-row rollup — all integer counts until"
    " the final division.",
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("word"))
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    ranked = freq.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.desc("c"), F.asc("word")))
        .alias("rnk"),
        F.sum("c").over(Window.partitionBy()).alias("total"),
    )
    sizes = F.explode(
        F.array(*[F.lit(n) for n in VOCAB_SIZES])
    ).alias("vocab_size")
    return (
        ranked.select("c", "rnk", "total", sizes)
        .groupBy("vocab_size")
        .agg(
            F.sum(F.when(F.col("rnk") <= F.col("vocab_size"), F.col("c")))
            .cast("bigint")
            .alias("covered_tokens"),
            F.max("total").cast("bigint").alias("total_tokens"),
            (
                F.sum(
                    F.when(F.col("rnk") <= F.col("vocab_size"), F.col("c"))
                ).cast("double")
                / F.max("total")
            ).alias("coverage"),
        )
        .select(
            F.col("vocab_size").cast("bigint").alias("vocab_size"),
            "covered_tokens",
            "total_tokens",
            "coverage",
        )
    )


# --- out-of-vocabulary audit -----------------------------------------

# Vocabulary size for the OOV audit: the top-2k words by corpus
# frequency (deterministic freq-desc, word-asc rank).
OOV_VOCAB = 2_000


@register(
    "q_oov_rate",
    oracle=f"""
        WITH words AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents
        ),
        freq AS (
            SELECT word, count(*) AS c FROM words GROUP BY word
        ),
        vocab AS (
            SELECT word FROM (
                SELECT word, row_number() OVER (
                    ORDER BY c DESC, word ASC) AS rnk
                FROM freq
            ) WHERE rnk <= {OOV_VOCAB}
        )
        SELECT w.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_oov,
               CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END)
                    * 10000 // count(*) AS BIGINT) AS oov_bp
        FROM words w LEFT JOIN vocab v USING (word)
        GROUP BY w.doc_id
    """,
    doc="Per-document out-of-vocabulary audit against the corpus"
    " top-2000 vocabulary: token total, OOV token count, and OOV rate"
    " in integer basis points — the tokenizer-coverage risk score"
    " (docs with high OOV explode into byte-fallback tokens and blow"
    " up sequence length; they are re-route or re-tokenize"
    " candidates). Complements q_vocab_coverage (corpus-level curve)"
    " with the per-doc grain that feeds filtering. The vocabulary is"
    " |V|<=2000 rows — built with one word-count agg + rank, then"
    " BROADCAST back onto the exploded token stream; one partial-agg"
    " shuffle on doc_id finishes. Integer-only arithmetic.",
)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    # rank window over the |vocab|-row frequency table (bounded input,
    # same precedent as q_vocab_coverage)
    vocab = (
        freq.select(
            "word",
            F.row_number()
            .over(Window.orderBy(F.desc("c"), F.asc("word")))
            .alias("rnk"),
        )
        .filter(F.col("rnk") <= OOV_VOCAB)
        .select("word", F.lit(1).alias("in_vocab"))
    )
    return (
        words.join(F.broadcast(vocab), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
            F.expr(
                "cast(sum(case when in_vocab is null then 1 else 0 end)"
                " * 10000 div count(*) as bigint)"
            ).alias("oov_bp"),
        )
    )


# --- TF-IDF top terms ------------------------------------------------

TFIDF_SCALE = 10_000  # fixed-point scale for the rational idf
TFIDF_TOPK = 5  # terms reported per document


@register(
    "q_tfidf",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents
        ),
        tf AS (
            SELECT doc_id, word, count(*) AS tf
            FROM tok GROUP BY doc_id, word
        ),
        df AS (
            SELECT word, count(*) AS df FROM tf GROUP BY word
        ),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.word,
                   CAST(tf.tf AS BIGINT) AS tf,
                   CAST(df.df AS BIGINT) AS df,
                   CAST(tf.tf * ((n.n_docs * {TFIDF_SCALE}) // df.df)
                        AS BIGINT) AS score_fp
            FROM tf JOIN df USING (word) CROSS JOIN n
        )
        SELECT doc_id, word, tf, df, score_fp,
               CAST(term_rank AS BIGINT) AS term_rank
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY score_fp DESC, word) AS term_rank
            FROM scored
        ) WHERE term_rank <= {TFIDF_TOPK}
    """,
    doc=f"Per-document top-{TFIDF_TOPK} TF-IDF terms — the classic"
    " keyword/feature-weighting primitive. The idf is the RATIONAL"
    f" fixed-point form (N * {TFIDF_SCALE}) DIV df instead of the"
    " textbook log(N/df): same BM25 trick as retrieval.py — libm log"
    " rounds differently per engine, integer division doesn't, so the"
    " whole score is exact int64 and hash-matches any replayer (log"
    " is monotone in df, so rankings agree except across extreme df"
    " gaps the linear form separates MORE sharply). Shape: explode ->"
    " (doc, word) partial-agg -> word df agg -> broadcast-joined"
    " 1-row corpus count -> per-doc top-k window. The df table is"
    " vocabulary-sized (Heaps-sublinear), the big shuffle carries"
    " (word, count) pairs only.",
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    tf = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "word")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            (
                F.col("tf")
                * F.expr(f"(n_docs * {TFIDF_SCALE}) div df")
            )
            .cast("bigint")
            .alias("score_fp"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_fp"), F.asc("word")
    )
    return (
        scored.withColumn(
            "term_rank", F.row_number().over(w).cast("bigint")
        )
        .filter(F.col("term_rank") <= TFIDF_TOPK)
    )


# --- positional phrase search ----------------------------------------


@register(
    "q_phrase_search",
    oracle="""
        WITH tok AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        tri AS (
            SELECT doc_id, i AS pos,
                   w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS trigram
            FROM (
                SELECT doc_id, w,
                       unnest(generate_series(1, len(w) - 2)) AS i
                FROM tok
            )
        ),
        top AS (
            SELECT trigram AS phrase, count(*) AS corpus_freq
            FROM tri GROUP BY trigram
            ORDER BY corpus_freq DESC, phrase
            LIMIT 1
        )
        SELECT t.doc_id, top.phrase,
               CAST(count(*) AS BIGINT) AS n_occurrences,
               CAST(min(t.pos) AS BIGINT) AS first_pos,
               CAST(top.corpus_freq AS BIGINT) AS corpus_freq
        FROM tri t JOIN top ON t.trigram = top.phrase
        GROUP BY t.doc_id, top.phrase, top.corpus_freq
    """,
    doc="Positional phrase search through an inverted trigram stream —"
    " 'distributed grep' done as dataflow, self-contained: the query"
    " first finds the corpus's most frequent word trigram (count"
    " shuffle + deterministic top-1 tiebreak), then reports every"
    " document containing it with occurrence count and first token"
    " position. Trigrams come from per-doc lead() windows (parallel"
    " across docs, no self-join on positions); the chosen phrase is a"
    " broadcast single row. At 100 TB this is the shape of phrase /"
    " n-gram contamination scans: one pass builds positional postings,"
    " every subsequent phrase probe is an equi-join against a"
    " broadcast needle — never a substring scan over raw text.",
)
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("idx", "word")
    )
    w = Window.partitionBy("doc_id").orderBy("idx")
    tri = tok.select(
        "doc_id",
        (F.col("idx") + 1).alias("pos"),
        F.concat_ws(
            " ",
            "word",
            F.lead("word", 1).over(w),
            F.lead("word", 2).over(w),
        ).alias("trigram"),
        F.lead("word", 2).over(w).alias("_w3"),
    ).filter(F.col("_w3").isNotNull())
    top = (
        tri.groupBy(F.col("trigram").alias("phrase"))
        .agg(F.count(F.lit(1)).alias("corpus_freq"))
        .orderBy(F.desc("corpus_freq"), F.asc("phrase"))
        .limit(1)
    )
    return (
        tri.join(
            F.broadcast(top), tri["trigram"] == top["phrase"]
        )
        .groupBy("doc_id", "phrase", "corpus_freq")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.min("pos").cast("bigint").alias("first_pos"),
        )
        .select(
            "doc_id",
            "phrase",
            "n_occurrences",
            "first_pos",
            F.col("corpus_freq").cast("bigint").alias("corpus_freq"),
        )
    )


# --- skip-gram context pairs -----------------------------------------

_SG_WINDOW = 3  # max center->context distance
_SG_TOPK = 30


@register(
    "q_skipgram",
    oracle=f"""
        WITH w AS (
            SELECT string_split(text, ' ') AS words FROM documents
        ),
        pairs AS (
            SELECT words[i] AS w1, words[i + d] AS w2, d
            FROM (
                SELECT words,
                       unnest(generate_series(1, len(words))) AS i
                FROM w
            )
            CROSS JOIN (
                SELECT unnest(generate_series(1, {_SG_WINDOW})) AS d
            )
            WHERE i + d <= len(words)
        )
        SELECT w1, w2, CAST(d AS INT) AS distance,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM pairs
        GROUP BY w1, w2, d
        ORDER BY n_pairs DESC, w1, w2, d
        LIMIT {_SG_TOPK}
    """,
    doc=f"Skip-gram context-pair counts (window {_SG_WINDOW}, directional):"
    " the (center, context, distance) co-occurrence table that seeds"
    " word2vec-style embedding training and distance-weighted PMI —"
    " the multi-distance generalization of q_collocations' adjacent"
    " bigrams. Spark generates the three offset streams as per-doc"
    " lead() windows (parallel across docs, no position self-join),"
    " then one (pair, distance) partial-agg count shuffle and a"
    f" TakeOrdered top-{_SG_TOPK}. At 100 TB the pair vocabulary is"
    " the heavy object; distance-bucketed counts compose mergeably"
    " across corpus shards, which is why this exact shape is the"
    " standard pre-aggregation before any embedding trainer sees"
    " the data.",
)
def q_skipgram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("idx", "word")
    )
    w = Window.partitionBy("doc_id").orderBy("idx")
    streams = None
    for d in range(1, _SG_WINDOW + 1):
        s = tok.select(
            F.col("word").alias("w1"),
            F.lead("word", d).over(w).alias("w2"),
            F.lit(d).cast("int").alias("distance"),
        ).filter(F.col("w2").isNotNull())
        streams = s if streams is None else streams.unionByName(s)
    return (
        streams.groupBy("w1", "w2", "distance")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), "w1", "w2", "distance")
        .limit(_SG_TOPK)
    )


# ---------------------------------------------------------------------------
# Doc-level word co-occurrence lift (market-basket association)
# ---------------------------------------------------------------------------

_LIFT_MIN_SUPPORT = 25
_LIFT_TOPK = 30


@register(
    "q_cooccur_lift",
    oracle=f"""
        WITH dw AS (
            SELECT DISTINCT doc_id, word
            FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS word
                FROM documents
            )
        ),
        n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
              FROM dw),
        wc AS (SELECT word, CAST(count(*) AS BIGINT) AS c FROM dw
               GROUP BY word),
        pairs AS (
            SELECT a.word AS w1, b.word AS w2,
                   CAST(count(*) AS BIGINT) AS c_both
            FROM dw a JOIN dw b
              ON a.doc_id = b.doc_id AND a.word < b.word
            GROUP BY a.word, b.word
        )
        SELECT p.w1, p.w2, p.c_both, ca.c AS c_w1, cb.c AS c_w2,
               CAST(n.n_docs * p.c_both AS DOUBLE) / (ca.c * cb.c) AS lift
        FROM pairs p
        JOIN wc ca ON ca.word = p.w1
        JOIN wc cb ON cb.word = p.w2
        CROSS JOIN n
        WHERE p.c_both >= {_LIFT_MIN_SUPPORT}
        ORDER BY CAST(n.n_docs * p.c_both AS DOUBLE) / (ca.c * cb.c) DESC,
                 w1, w2
        LIMIT {_LIFT_TOPK}
    """,
    doc=f"Document-level word co-occurrence LIFT, top {_LIFT_TOPK} pairs"
    f" with support >= {_LIFT_MIN_SUPPORT} docs: lift ="
    " N*c(a,b)/(c(a)*c(b)) — the rational-arithmetic association"
    " measure (PMI without the engine-dependent log; same ranking)."
    " Pair generation is per-document over the DISTINCT word set"
    " (array pair expansion is bounded by per-doc vocabulary, the"
    " market-basket analogue of the df-cap), counts aggregate with"
    " map-side partials, and the result is a TakeOrdered top-k —"
    " no global sort. The lift division is the single float step.",
)
def q_cooccur_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    dw = docs.select(
        "doc_id",
        F.explode(F.expr("array_distinct(split(text, ' '))")).alias("word"),
    )
    n = dw.agg(F.countDistinct("doc_id").cast("bigint").alias("n_docs"))
    wc = dw.groupBy("word").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    # per-doc sorted word array -> nested pair expansion (w1 < w2 by
    # construction), same narrow pattern as the jaccard bucket pair-gen
    pair_expr = F.expr(
        "flatten(transform(ws, (x, i) ->"
        " transform(slice(ws, i + 2, size(ws)), y -> struct(x AS w1, y AS w2))))"
    )
    pairs = (
        dw.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("word")).alias("ws"))
        .select(F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_both"))
        .filter(F.col("c_both") >= _LIFT_MIN_SUPPORT)
    )
    lift = (
        F.col("n_docs").cast("double") * F.col("c_both")
    ) / (F.col("c_w1") * F.col("c_w2"))
    return (
        pairs.join(wc.select(F.col("word").alias("w1"), F.col("c").alias("c_w1")), "w1")
        .join(wc.select(F.col("word").alias("w2"), F.col("c").alias("c_w2")), "w2")
        .crossJoin(F.broadcast(n))
        .select("w1", "w2", "c_both", "c_w1", "c_w2", lift.alias("lift"))
        .orderBy(F.desc("lift"), "w1", "w2")
        .limit(_LIFT_TOPK)
    )


# ---------------------------------------------------------------------------
# Generation-loop detector: runs of identical fixed-size blocks
# ---------------------------------------------------------------------------

_LOOP_BLOCK = 16
_LOOP_MIN_RUN = 3


@register(
    "q_repetition_loops",
    oracle=f"""
        WITH blocks AS (
            SELECT doc_id, i,
                   substring(text, (i - 1) * {_LOOP_BLOCK} + 1,
                             {_LOOP_BLOCK}) AS blk
            FROM (
                SELECT doc_id, text,
                       unnest(generate_series(
                           1, (length(text) + {_LOOP_BLOCK - 1})
                              // {_LOOP_BLOCK})) AS i
                FROM documents
            )
        ),
        flagged AS (
            SELECT doc_id, i, blk,
                   CASE WHEN blk = lag(blk) OVER
                       (PARTITION BY doc_id ORDER BY i)
                       THEN 0 ELSE 1 END AS is_new
            FROM blocks
        ),
        grp AS (
            SELECT doc_id,
                   sum(is_new) OVER (PARTITION BY doc_id ORDER BY i
                       ROWS UNBOUNDED PRECEDING) AS g
            FROM flagged
        ),
        runs AS (
            SELECT doc_id, g, CAST(count(*) AS BIGINT) AS run_len
            FROM grp GROUP BY doc_id, g
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_runs,
               max(run_len) AS max_run,
               max(run_len) >= {_LOOP_MIN_RUN} AS has_loop
        FROM runs GROUP BY doc_id
    """,
    doc=f"Degenerate-repetition (generation-loop) detector: chunk each"
    f" doc into fixed {_LOOP_BLOCK}-char blocks and measure the longest"
    " run of IDENTICAL consecutive blocks (lag-compare -> gaps-and-"
    f"islands run grouping); max_run >= {_LOOP_MIN_RUN} flags the"
    " doc. The cheap screen for model-generated loop text and boiler-"
    "plate stutter that n-gram ratio filters (q_quality_repetition)"
    " miss when the loop period exceeds the n-gram. All windows"
    " partition by doc_id — narrow per-doc work at any corpus size;"
    " backreference regexes (the other way to find loops) are"
    " RE2-incompatible and unscannable.",
)
def q_repetition_loops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    blocks = docs.select(
        "doc_id",
        F.posexplode(
            # guard the empty/NULL-text case: Spark's sequence(1, 0)
            # DESCENDS to [1, 0] (two bogus empty blocks) while
            # DuckDB's generate_series(1, 0) is empty — emit an empty
            # array so both engines drop zero-length docs
            F.expr(
                f"CASE WHEN length(text) > 0 THEN"
                f" transform(sequence(1, (length(text) + {_LOOP_BLOCK - 1})"
                f" div {_LOOP_BLOCK}),"
                f" i -> substring(text, (i - 1) * {_LOOP_BLOCK} + 1,"
                f" {_LOOP_BLOCK}))"
                f" ELSE array() END"
            )
        ).alias("i", "blk"),
    )
    wo = Window.partitionBy("doc_id").orderBy("i")
    flagged = blocks.withColumn(
        "is_new",
        F.when(F.col("blk") == F.lag("blk").over(wo), 0).otherwise(1),
    )
    grp = flagged.withColumn(
        "g", F.sum("is_new").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    )
    runs = grp.groupBy("doc_id", "g").agg(
        F.count(F.lit(1)).cast("bigint").alias("run_len")
    )
    return runs.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_runs"),
        F.max("run_len").alias("max_run"),
        (F.max("run_len") >= _LOOP_MIN_RUN).alias("has_loop"),
    )
