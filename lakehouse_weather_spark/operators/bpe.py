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
