"""BPE tokenizer training primitives (training-data closure).

Training a byte-pair-encoding vocabulary over a 100 TB corpus is a
loop of exactly one distributed kernel: count adjacent symbol pairs
across the corpus, pick the most frequent pair, merge it everywhere,
repeat. The corpus stays distributed as per-word symbol arrays the
whole time; the driver only ever holds the merge table (the model),
never data — the same shape as the k-means codebook loop.

``q_bpe_pair_counts`` is the counting kernel itself (round-1 pair
frequencies, oracle-checked top-k); :func:`bpe_train` runs the full
loop with a deterministic tie-break and is verified against a plain
Python reference trainer in tests/test_bpe.py.

The reference repo tokenizes nothing (chunks go to the embedding API
as raw text); this is the vocabulary-construction stage a pretraining
pipeline runs before token counting and packing (q_text_tokens /
q_token_packing consume the result downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import fan_out, load_table

TOP_PAIRS = 30


@register(
    "q_bpe_pair_counts",
    oracle=f"""
        WITH words AS (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents
        ),
        pairs AS (
            SELECT substr(w, i, 2) AS pair
            FROM (
                SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
                FROM words WHERE len(w) >= 2
            )
        )
        SELECT pair, CAST(count(*) AS BIGINT) AS n
        FROM pairs
        GROUP BY pair
        ORDER BY n DESC, pair
        LIMIT {TOP_PAIRS}
    """,
    doc=f"BPE round-1 pair statistics: corpus-wide adjacent-character"
    f" pair frequencies within words, top {TOP_PAIRS} by (count DESC,"
    " pair ASC — the deterministic merge-pick order). This is the one"
    " distributed kernel of BPE training: explode pairs (narrow), one"
    " partial-agg groupBy shuffle, TakeOrdered top-k. bpe_train() runs"
    " the full merge loop on the same kernel.",
)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    words = docs.select(F.explode(F.split("text", " ")).alias("w")).filter(
        F.length("w") >= 2
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(TOP_PAIRS)
    )


def _sql_quote(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _merge_expr(col: str, a: str, b: str) -> str:
    """Left-to-right non-overlapping merge of the symbol pair (a, b)
    inside a symbol array, as one aggregate fold: carry a pending
    symbol; when (pending, current) == (a, b) emit the merged token and
    clear the carry (the merged token joins the NEXT round's counting,
    not this pass — classic BPE)."""
    qa, qb = _sql_quote(a), _sql_quote(b)
    qm = _sql_quote(a + b)
    return (
        f"aggregate({col},"
        " named_struct('p', CAST(NULL AS STRING),"
        " 'out', CAST(array() AS ARRAY<STRING>)),"
        " (acc, x) -> IF(acc.p IS NULL,"
        "   named_struct('p', x, 'out', acc.out),"
        f"  IF(acc.p = {qa} AND x = {qb},"
        "    named_struct('p', CAST(NULL AS STRING),"
        f"     'out', array_append(acc.out, {qm})),"
        "    named_struct('p', x, 'out', array_append(acc.out, acc.p)))),"
        " acc -> IF(acc.p IS NULL, acc.out, array_append(acc.out, acc.p)))"
    )


def bpe_train(
    spark: SparkSession, sf_dir: str, n_merges: int = 8
) -> list[tuple[str, str, int]]:
    """Full distributed BPE training loop: ``n_merges`` rounds of
    (count adjacent symbol pairs -> pick (count DESC, pair ASC) argmax
    -> merge everywhere). Returns the merge table
    [(left, right, count), ...] — the trained model.

    Scale shape per round: one narrow pair-explode map + one groupBy
    shuffle + a 1-row driver fetch, then the merge applies as a narrow
    per-row fold (no shuffle). The corpus symbol table would be
    persisted/checkpointed between rounds on a real cluster; at fixture
    scale lineage is shallow enough that the plan chain (one fold per
    round) stays cheap, and correctness is partitioning-independent
    either way (verified against a Python reference in tests)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    syms = docs.select(
        F.expr("transform(split(text, ' '), w -> split(w, ''))").alias("ws")
    ).select(F.explode("ws").alias("s"))

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pair_col = F.expr(
            "transform(sequence(1, size(s) - 1),"
            " i -> named_struct('a', element_at(s, i), 'b', element_at(s, i + 1)))"
        )
        top = (
            syms.filter(F.size("s") >= 2)
            .select(F.explode(pair_col).alias("p"))
            .groupBy("p")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("p.a"), F.asc("p.b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0]["p"]["a"], top[0]["p"]["b"], top[0]["n"]
        merges.append((a, b, int(n)))
        syms = syms.select(F.expr(_merge_expr("s", a, b)).alias("s"))
    return merges


# ---------------------------------------------------------------------------
# Tokenizer INFERENCE: greedy longest-match subword encoding
# ---------------------------------------------------------------------------

# The trained vocabulary handed to the encoder (WordPiece-style
# inference: longest matching piece wins, single chars are the implicit
# fallback alphabet). Static here — in production this is the artifact
# bpe_train/q_bpe_pair_counts produce, broadcast to every executor.
VOCAB3 = (
    "tab", "val", "par", "has", "mer", "bat", "spa", "win",
    "sca", "lin", "sor", "the", "ast", "dow", "rge",
)
VOCAB2 = (
    "ke", "ag", "ro", "sc", "an", "sl", "ow", "fa", "st", "ta",
    "bl", "le", "va", "lu", "pa", "rt", "ha", "sh", "me", "er",
    "ba", "tc", "ch", "sp", "ar", "li", "ne", "so", "wi", "nd",
    "ey", "gg", "ue", "ab",
)


@F.pandas_udf(ArrayType(ArrayType(StringType())))
def _greedy_tok_udf(texts):

    v3, v2 = set(VOCAB3), set(VOCAB2)
    # word-level memo: the tokenization is a pure function of the word
    # and corpus vocabularies are heavy-tailed, so most words repeat —
    # the greedy per-char Python loop runs once per DISTINCT word per
    # batch series instead of once per occurrence (guide §4.5 class:
    # amortize per-task work)
    memo: dict[str, list[str]] = {}

    def tok_word(w: str) -> list[str]:
        got = memo.get(w)
        if got is not None:
            return got
        out, i = [], 0
        while i < len(w):
            if w[i : i + 3] in v3:
                out.append(w[i : i + 3])
                i += 3
            elif w[i : i + 2] in v2:
                out.append(w[i : i + 2])
                i += 2
            else:
                out.append(w[i])
                i += 1
        memo[w] = out
        return out

    return texts.map(lambda t: [tok_word(w) for w in t.split(" ")])


def _tok_case(v3: str, v2: str) -> str:
    return (
        f"CASE WHEN substr(word, pos, 3) IN ({v3})"
        f" THEN substr(word, pos, 3)"
        f" WHEN substr(word, pos, 2) IN ({v2})"
        f" THEN substr(word, pos, 2)"
        f" ELSE substr(word, pos, 1) END"
    )


def _greedy_tok_cte() -> str:
    """Shared recursive-CTE prefix replaying the greedy tokenizer:
    defines ``wd`` (doc_id, word_idx, word) and ``tok`` (one row per
    emitted piece, piece NULL on seed rows)."""
    v3 = ", ".join(f"'{p}'" for p in VOCAB3)
    v2 = ", ".join(f"'{p}'" for p in VOCAB2)
    piece = _tok_case(v3, v2)
    return f"""
        WITH RECURSIVE wd AS (
            SELECT doc_id, CAST(i AS BIGINT) AS word_idx, words[i] AS word
            FROM (
                SELECT doc_id, string_split(text, ' ') AS words,
                       unnest(generate_series(
                           1, len(string_split(text, ' ')))) AS i
                FROM documents
            )
        ),
        tok AS (
            SELECT doc_id, word_idx, word, 1 AS pos, 0 AS piece_idx,
                   CAST(NULL AS VARCHAR) AS piece
            FROM wd
            UNION ALL
            SELECT doc_id, word_idx, word,
                   pos + length({piece}) AS pos,
                   piece_idx + 1,
                   {piece} AS piece
            FROM tok
            WHERE pos <= length(word)
        )
    """


def _greedy_tok_oracle() -> str:
    return f"""
        {_greedy_tok_cte()}
        SELECT doc_id, word_idx, CAST(piece_idx AS BIGINT) AS piece_idx,
               piece
        FROM tok WHERE piece IS NOT NULL
    """


@register(
    "q_tokenize_greedy",
    oracle=_greedy_tok_oracle(),
    doc="Tokenizer inference — the apply half of the BPE family:"
    " greedy longest-match subword encoding of every word against a"
    " trained vocabulary (trigraph/digraph pieces, single-char"
    " fallback alphabet), emitting (doc_id, word_idx, piece_idx,"
    " piece). The kernel is a genuinely imperative per-word scan"
    " (variable-length advance), so it runs as an Arrow-batched"
    " pandas_udf with the vocab in the closure — a narrow scan-speed"
    " map, no shuffle; the double posexplode stays JVM-side. The"
    " DuckDB oracle replays the same greedy loop as a recursive CTE,"
    " so every emitted piece is hash-checked. At 100 TB the vocab is"
    " a broadcast model artifact and this stage is the corpus-wide"
    " tokenize-and-count pass before sequence packing"
    " (q_token_packing / q_pack_sequences consume its output shape).",
)
def q_tokenize_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select("doc_id", _greedy_tok_udf("text").alias("toks"))
    words = toks.select(
        "doc_id", F.posexplode("toks").alias("wi0", "pieces")
    )
    return words.select(
        "doc_id",
        (F.col("wi0") + 1).cast("bigint").alias("word_idx"),
        F.posexplode("pieces").alias("pi0", "piece"),
    ).select(
        "doc_id",
        "word_idx",
        (F.col("pi0") + 1).cast("bigint").alias("piece_idx"),
        "piece",
    )


@register(
    "q_tokenizer_fertility",
    oracle=_greedy_tok_cte()
    + """, pieces AS (
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_pieces,
                   CAST(sum(length(piece)) AS BIGINT) AS n_piece_chars,
                   CAST(count(DISTINCT word_idx) AS BIGINT) AS n_words
            FROM tok WHERE piece IS NOT NULL
            GROUP BY doc_id
        )
        SELECT d.lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(p.n_pieces) AS BIGINT) AS total_pieces,
               CAST(sum(p.n_words) AS BIGINT) AS total_words,
               CAST(sum(p.n_pieces) AS DOUBLE) / sum(p.n_words)
                   AS fertility,
               CAST(sum(p.n_piece_chars) AS DOUBLE) / sum(p.n_pieces)
                   AS mean_piece_len
        FROM pieces p JOIN documents d USING (doc_id)
        GROUP BY d.lang""",
    doc="Tokenizer fertility scorecard: pieces-per-word and mean piece"
    " length per language under the trained greedy subword vocabulary"
    " — THE tokenizer-quality metric multilingual pipelines track"
    " (fertility >> 1 for a language means its text costs"
    " proportionally more sequence length per word, skewing the"
    " effective mixture; this feeds back into q_mixture_plan"
    " weights). One tokenize pass (Arrow pandas_udf, narrow),"
    " per-doc partial agg, then a |langs|-row rollup; the recursive-"
    "CTE oracle replays the greedy loop so the aggregate is still"
    " hash-exact.",
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select(
        "doc_id", "lang", _greedy_tok_udf("text").alias("toks")
    )
    per_doc = toks.select(
        "doc_id",
        "lang",
        F.expr("size(flatten(toks))").cast("bigint").alias("n_pieces"),
        F.expr(
            "aggregate(flatten(toks), 0L, (a, p) -> a + length(p))"
        ).alias("n_piece_chars"),
        F.expr("size(toks)").cast("bigint").alias("n_words"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_pieces").cast("bigint").alias("total_pieces"),
        F.sum("n_words").cast("bigint").alias("total_words"),
        (
            F.sum("n_pieces").cast("double") / F.sum("n_words")
        ).alias("fertility"),
        (
            F.sum("n_piece_chars").cast("double") / F.sum("n_pieces")
        ).alias("mean_piece_len"),
    )
