"""Ranked keyword retrieval + retrieval-quality evaluation operators
(training-data closure; the reference's RAG stack retrieves via Milvus
vector search seeded at dags/utils/seed_milvus.py:71-84 — this module
adds the classical-IR half and the eval harness a production corpus
pipeline runs alongside it).

Float-parity design: every score is an IEEE expression tree written
CHARACTER-FOR-CHARACTER the same in the Spark plan and the DuckDB
oracle (same literals, same association), over exact integer inputs
(term frequencies, doc frequencies, doc lengths) — so results
hash-match without any fixed-point machinery. BM25's usual log-idf is
replaced by its rational Robertson-Sparck-Jones core
(N - df + 0.5)/(df + 0.5): libm log rounding differs per engine (same
trick as q_keyword_extract's tf*N/df surrogate), and the RANKING —
the thing BM25 exists to produce — is preserved for single-term
scores and near-identical for short conjunctive queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table

# The "query text", shared with q_hybrid_rrf's keyword side.
BM25_TERMS = ("data", "system", "table")
BM25_TOPK = 20
# k1=1.2, b=0.75 — the standard BM25 constants. 0.75/0.25 are exact
# binary doubles; 1.2/2.2 are the same nearest-double in both parsers.

# Per-term scoring templates. `{tf}`, `{df}` are integer-valued
# engine-side expressions; n / sdl are integer literals formatted in;
# `{dl}` is the doc-length expression. The numerator/denominator
# association is identical in both engines by construction.
_TF = {
    "spark": "CAST(size(filter(split(text, ' '), x -> x = '{w}')) AS DOUBLE)",
    "duck": "CAST(len(list_filter(string_split(text, ' '), x -> x = '{w}')) AS DOUBLE)",
}
_DL = {
    "spark": "CAST(size(split(text, ' ')) AS DOUBLE)",
    "duck": "CAST(len(string_split(text, ' ')) AS DOUBLE)",
}


def _score_sql(engine: str, n: int, sdl: int, dfs: list[int]) -> str:
    """Full BM25 score expression with the corpus stats folded in as
    integer literals (they are exact in both engines), left-associated
    term sum."""
    dl = _DL[engine]
    avgdl = f"(CAST({sdl} AS DOUBLE) / CAST({n} AS DOUBLE))"
    parts = []
    for w, df in zip(BM25_TERMS, dfs):
        tf = _TF[engine].format(w=w)
        denom = f"({tf} + 1.2 * (0.25 + 0.75 * ({dl} / {avgdl})))"
        tfpart = f"(({tf} * 2.2) / {denom})"
        idf = (
            f"((CAST({n - df} AS DOUBLE) + 0.5)"
            f" / (CAST({df} AS DOUBLE) + 0.5))"
        )
        parts.append(f"({tfpart} * {idf})")
    score = parts[0]
    for p in parts[1:]:
        score = f"({score} + {p})"
    return score


def _duck_bm25_oracle() -> str:
    # The oracle recomputes the corpus stats as scalar subqueries; the
    # Spark side computes the same integers with one aggregate scan and
    # folds them in as literals — integer stats are engine-independent,
    # so both sides score with identical numbers.
    dl = _DL["duck"]
    tf_exprs = [
        f"len(list_filter(string_split(text, ' '), x -> x = '{w}'))"
        for w in BM25_TERMS
    ]
    stats = (
        "SELECT count(*) AS n, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sdl, "
        + ", ".join(
            f"CAST(sum(CASE WHEN {tf} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
            for i, tf in enumerate(tf_exprs)
        )
        + " FROM documents"
    )
    avgdl = "(CAST(s.sdl AS DOUBLE) / CAST(s.n AS DOUBLE))"
    parts = []
    for i, w in enumerate(BM25_TERMS):
        tf = _TF["duck"].format(w=w)
        denom = f"({tf} + 1.2 * (0.25 + 0.75 * ({dl} / {avgdl})))"
        tfpart = f"(({tf} * 2.2) / {denom})"
        idf = (
            f"((CAST(s.n - s.df{i} AS DOUBLE) + 0.5)"
            f" / (CAST(s.df{i} AS DOUBLE) + 0.5))"
        )
        parts.append(f"({tfpart} * {idf})")
    score = parts[0]
    for p in parts[1:]:
        score = f"({score} + {p})"
    return f"""
        WITH stats AS ({stats})
        SELECT doc_id, {score} AS bm25
        FROM documents, stats s
        WHERE {" + ".join(f"CASE WHEN {tf} > 0 THEN 1 ELSE 0 END" for tf in tf_exprs)} > 0
        ORDER BY bm25 DESC, doc_id
        LIMIT {BM25_TOPK}
    """


@register(
    "q_bm25",
    oracle=_duck_bm25_oracle(),
    doc=f"BM25-style ranked retrieval (k1=1.2, b=0.75, rational"
    " Robertson-Sparck-Jones idf — no libm log, so scores hash-match"
    " the oracle) for the fixed query terms"
    f" {BM25_TERMS}, top-{BM25_TOPK} via TakeOrdered. Plan: one"
    " aggregate scan collects the integer corpus stats (N, total doc"
    " length, per-term document frequencies — a handful of scalars,"
    " the moral equivalent of broadcasting an IDF model), then one"
    " scoring scan + top-k. Two corpus scans, no join, no global sort"
    " — the 100 TB shape for query-time scoring over a static corpus.",
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tf_int = [
        f"size(filter(split(text, ' '), x -> x = '{w}'))" for w in BM25_TERMS
    ]
    stats_row = (
        docs.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("size(split(text, ' '))")).cast("bigint").alias("sdl"),
            *[
                F.sum(F.expr(f"CASE WHEN {tf} > 0 THEN 1 ELSE 0 END"))
                .cast("bigint")
                .alias(f"df{i}")
                for i, tf in enumerate(tf_int)
            ],
        )
        .collect()[0]
    )
    n, sdl = stats_row["n"], stats_row["sdl"]
    dfs = [stats_row[f"df{i}"] for i in range(len(BM25_TERMS))]
    score = _score_sql("spark", n, sdl, dfs)
    hits = " + ".join(f"CASE WHEN {tf} > 0 THEN 1 ELSE 0 END" for tf in tf_int)
    return (
        docs.filter(F.expr(f"({hits}) > 0"))
        .select("doc_id", F.expr(score).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(BM25_TOPK)
    )


# ---------------------------------------------------------------------------
# Blocking-quality evaluation: banded MinHash LSH vs exact Jaccard truth
# ---------------------------------------------------------------------------

from lakehouse_weather_spark.operators.dedup import (  # noqa: E402
    _DUCK_CAPPED_CTE,
    _checkpoint,
    _jaccard_pairs,
    _minhash_pairs_cte,
    q_minhash_neardup,
)

LSH_EVAL_T = 0.10  # truth threshold — q_ngram_jaccard's near-dup bar


@register(
    "q_lsh_eval",
    oracle=f"""
        WITH {_minhash_pairs_cte()},
        {_DUCK_CAPPED_CTE},
        truth AS (
            SELECT doc_a, doc_b FROM inter
            JOIN sizes sa ON doc_a = sa.doc_id
            JOIN sizes sb ON doc_b = sb.doc_id
            WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {LSH_EVAL_T}
        )
        SELECT n_candidates, n_truth, tp,
               CAST(tp AS DOUBLE) / n_candidates AS candidate_precision,
               CAST(tp AS DOUBLE) / n_truth AS candidate_recall
        FROM (
            SELECT
                (SELECT count(*) FROM mpairs) AS n_candidates,
                (SELECT count(*) FROM truth) AS n_truth,
                (SELECT count(*) FROM mpairs m
                 JOIN truth t ON m.doc_a = t.doc_a AND m.doc_b = t.doc_b)
                    AS tp
        )
    """,
    doc="Blocking-quality scorecard for the MinHash LSH stage: precision"
    f" and recall of the banded candidate pairs against exact df-capped"
    f" word-3-gram Jaccard truth at threshold {LSH_EVAL_T} (the"
    " q_ngram_jaccard bar). This is the eval every production dedup"
    " pipeline runs before committing to banding parameters — recall"
    " says how many true near-dups the bands can ever surface,"
    " precision says how much the verify stage overpays. Truth comes"
    " from the inverted-index equi-join (never an all-pairs scan) so"
    " the eval itself has the same 100 TB shape as the dedup it"
    " audits; both pair sets checkpoint once and the three counts are"
    " single aggregates. Counts are integers and the two divisions are"
    " single IEEE ops, so the row hash-matches the oracle.",
)
def q_lsh_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    cand = _checkpoint(q_minhash_neardup(spark, sf_dir))
    truth = _checkpoint(
        _jaccard_pairs(spark, sf_dir)
        .filter(F.col("jaccard") >= LSH_EVAL_T)
        .select("doc_a", "doc_b")
    )
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    tp = cand.join(truth, ["doc_a", "doc_b"]).agg(
        F.count(F.lit(1)).alias("tp")
    )
    return (
        n_cand.crossJoin(n_truth)
        .crossJoin(tp)
        .select(
            "n_candidates",
            "n_truth",
            "tp",
            (F.col("tp").cast("double") / F.col("n_candidates")).alias(
                "candidate_precision"
            ),
            (F.col("tp").cast("double") / F.col("n_truth")).alias(
                "candidate_recall"
            ),
        )
    )
