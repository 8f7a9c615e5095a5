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
from lakehouse_weather_spark.sources.tables import load_table, local_df

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
    if not n:
        # empty corpus: no stats to score against — the oracle's WHERE
        # hits > 0 selects nothing the same way
        return docs.select(
            "doc_id", F.lit(None).cast("double").alias("bm25")
        ).limit(0)
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

from lakehouse_weather_spark.operators.dedup import (
    _spark_shingle_hashes,  # noqa: E402
    _DUCK_CAPPED_CTE,
    minhash_pairs_from_signatures,
    minhash_signatures,
    _checkpoint,
    _jaccard_pairs,
    _minhash_pairs_cte,
)

LSH_EVAL_T = 0.10  # truth threshold — q_ngram_jaccard's near-dup bar
# Deterministic doc-sample cap for the eval's exact-truth arm: at most
# this many md5-ordered documents enter shingling, so the audit is
# bounded BY CONSTRUCTION when pointed at a full-scale corpus (the
# quadratic-in-principle exact arm runs on a fixed-size sample, the
# statistically standard way to score blocking quality). Fixture
# corpora are far below the cap, so sampled == full there and the
# DuckDB oracle (which replays the identical md5-ordered LIMIT)
# hash-matches.
LSH_EVAL_DOC_CAP = 20_000
_EVAL_DOCS_CTE = f"""docs_sample AS (
            SELECT * FROM documents
            ORDER BY md5('cap_' || CAST(doc_id AS VARCHAR)), doc_id
            LIMIT {LSH_EVAL_DOC_CAP}
        )"""


@register(
    "q_lsh_eval",
    oracle=f"""
        WITH {_EVAL_DOCS_CTE},
        {_minhash_pairs_cte(src="docs_sample")},
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
    " precision says how much the verify stage overpays. Both arms"
    f" run over the same deterministic {LSH_EVAL_DOC_CAP}-doc"
    " md5-ordered sample (LSH_EVAL_DOC_CAP), so the audit stays"
    " fixed-cost on an arbitrarily large corpus. Truth comes"
    " from the inverted-index equi-join (never an all-pairs scan) so"
    " the eval itself has the same 100 TB shape as the dedup it"
    " audits; both pair sets checkpoint once and the three counts are"
    " single aggregates. Counts are integers and the two divisions are"
    " single IEEE ops, so the row hash-matches the oracle.",
)
def q_lsh_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE checkpointed shingle table feeds both arms — the signature
    # path and the exact-truth path previously re-shingled the sample
    # independently (two md5 explodes over the same docs)
    # eager=False on all three (r11, guide §5): each subtree still
    # computes exactly once into the block store (the first consumer
    # materializes, the remaining aggregates read blocks) but the
    # three dedicated materialization jobs are gone — the r10 scaling
    # data showed this query is job-overhead-bound at sf0.1
    sh = _checkpoint(
        _spark_shingle_hashes(spark, sf_dir, LSH_EVAL_DOC_CAP),
        eager=False,
    )
    cand = _checkpoint(
        minhash_pairs_from_signatures(
            minhash_signatures(spark, sf_dir, shingles=sh)
        ),
        eager=False,
    )
    truth = _checkpoint(
        _jaccard_pairs(spark, sf_dir, shingles=sh)
        .filter(F.col("jaccard") >= LSH_EVAL_T)
        .select("doc_a", "doc_b"),
        eager=False,
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
            # try_divide: on an empty candidate/truth set the ratio is
            # NULL, matching DuckDB's x/0 -> NULL (ANSI / would throw)
            F.try_divide(F.col("tp").cast("double"), F.col("n_candidates"))
            .alias("candidate_precision"),
            F.try_divide(F.col("tp").cast("double"), F.col("n_truth"))
            .alias("candidate_recall"),
        )
    )


# --- maximal marginal relevance re-ranking ---------------------------

from lakehouse_weather_spark.functions import duck_dot_sum as _dds  # noqa: E402
from lakehouse_weather_spark.operators.dedup import (  # noqa: E402
    _DUCK_VEC_CTE as _VEC_CTE,
    _SPARK_DOT as _SDOT,
)

# MMR pool/output sizes and the relevance/diversity trade: score =
# LAM_NUM * rel - (LAM_DEN - LAM_NUM) * max_sim, i.e. lambda = 0.7.
MMR_POOL = 20
MMR_K = 10
_LAM_NUM = 7
_LAM_DEN = 10
# cosine -> int fixed point for order-free integer scoring
_CFX = 1_000_000_000_000


def _mmr_oracle() -> str:
    head = f"""
        WITH {_VEC_CTE},
        q AS (SELECT pos, val FROM vals WHERE vec_id = 0),
        dots AS (
            SELECT v.vec_id, {_dds('v.val', 'q.val')} AS dot
            FROM vals v JOIN q ON v.pos = q.pos
            WHERE v.vec_id <> 0
            GROUP BY v.vec_id
        ),
        pool AS MATERIALIZED (
            SELECT d.vec_id,
                   CAST(round(d.dot / (n.nrm * (SELECT nrm FROM norms
                        WHERE vec_id = 0)) * {_CFX}) AS BIGINT) AS rel_fx
            FROM dots d JOIN norms n USING (vec_id)
            ORDER BY d.dot / (n.nrm * (SELECT nrm FROM norms
                     WHERE vec_id = 0)) DESC, d.vec_id
            LIMIT {MMR_POOL}
        ),
        pd AS (
            SELECT va.vec_id AS a, vb.vec_id AS b,
                   {_dds('va.val', 'vb.val')} AS dot
            FROM vals va
            JOIN vals vb ON va.pos = vb.pos AND va.vec_id <> vb.vec_id
            JOIN pool pa ON pa.vec_id = va.vec_id
            JOIN pool pb ON pb.vec_id = vb.vec_id
            GROUP BY va.vec_id, vb.vec_id
        ),
        sims AS MATERIALIZED (
            SELECT p.a, p.b,
                   CAST(round(p.dot / (na.nrm * nb.nrm) * {_CFX})
                        AS BIGINT) AS sim_fx
            FROM pd p
            JOIN norms na ON na.vec_id = p.a
            JOIN norms nb ON nb.vec_id = p.b
        ),
        p1 AS MATERIALIZED (SELECT vec_id, rel_fx FROM pool
               ORDER BY rel_fx DESC, vec_id LIMIT 1),
        m1 AS MATERIALIZED (
            SELECT c.vec_id, c.rel_fx, s.sim_fx AS maxsim
            FROM pool c JOIN sims s
              ON s.a = c.vec_id AND s.b = (SELECT vec_id FROM p1)
        )"""
    parts = [head]
    for i in range(2, MMR_K + 1):
        parts.append(f"""
        p{i} AS MATERIALIZED (
            SELECT vec_id, rel_fx, maxsim FROM m{i - 1}
            ORDER BY {_LAM_NUM} * rel_fx
                     - {_LAM_DEN - _LAM_NUM} * maxsim DESC, vec_id
            LIMIT 1
        )""")
        if i < MMR_K:
            parts.append(f"""
        m{i} AS MATERIALIZED (
            SELECT m.vec_id, m.rel_fx,
                   greatest(m.maxsim, s.sim_fx) AS maxsim
            FROM m{i - 1} m JOIN sims s
              ON s.a = m.vec_id AND s.b = (SELECT vec_id FROM p{i})
            WHERE m.vec_id <> (SELECT vec_id FROM p{i})
        )""")
    picks = [
        "SELECT 1 AS rank, vec_id, rel_fx,"
        " CAST(NULL AS BIGINT) AS maxsim_fx FROM p1"
    ] + [
        f"SELECT {i} AS rank, vec_id, rel_fx, CAST(maxsim AS BIGINT)"
        f" FROM p{i}"
        for i in range(2, MMR_K + 1)
    ]
    return ",".join(parts) + "\n" + "\nUNION ALL\n".join(picks)


@register(
    "q_mmr_rerank",
    oracle=_mmr_oracle(),
    doc=f"Maximal-marginal-relevance re-ranking (Carbonell & Goldstein"
    f" 1998): from the exact top-{MMR_POOL} cosine pool for the fixed"
    f" query vector, greedily select {MMR_K} results maximizing"
    f" 0.7*relevance - 0.3*max-similarity-to-already-selected — the"
    " diversity re-rank every RAG retriever runs so near-duplicate"
    " passages don't crowd the context window (q_coreset is its"
    " relevance-free cousin). Scores are integer fixed point"
    " (cosines rounded at 1e12), so the greedy argmax — tie-broken"
    " on vec_id — is deterministic and the 10-step unrolled DuckDB"
    " replay is bit-exact. The relational plan produces the pool +"
    f" its {MMR_POOL}x{MMR_POOL} similarity grid; the greedy loop"
    " touches only that bounded model-sized result.",
)
def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    nrm = F.expr("sqrt(" + _SDOT.format(a="embedding", b="embedding") + ")")
    e = emb.select("vec_id", "embedding", nrm.alias("nrm"))
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    dot = F.expr(_SDOT.format(a="embedding", b="q_emb"))
    pool = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "embedding",
            "nrm",
            (dot / (F.col("nrm") * F.col("q_nrm"))).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(MMR_POOL)
        .select(
            "vec_id",
            "embedding",
            "nrm",
            F.round(F.col("cosine") * _CFX, 0).cast("bigint").alias("rel_fx"),
        )
    )
    a = pool.select(
        F.col("vec_id").alias("a"),
        F.col("embedding").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
    )
    b = pool.select(
        F.col("vec_id").alias("b"),
        F.col("embedding").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
    )
    pdot = F.expr(_SDOT.format(a="a_emb", b="b_emb"))
    sims = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("a") != F.col("b"))
        .select(
            "a",
            "b",
            F.round(pdot / (F.col("a_nrm") * F.col("b_nrm")) * _CFX, 0)
            .cast("bigint")
            .alias("sim_fx"),
        )
    )
    # bounded model fetch: the pool and its similarity grid
    prows = {r.vec_id: r.rel_fx for r in pool.collect()}
    srows = {(r.a, r.b): r.sim_fx for r in sims.collect()}
    picks = []
    if prows:
        first = max(prows, key=lambda v: (prows[v], -v))
        picks = [(1, first, prows[first], None)]
        maxsim = {
            v: srows[(v, first)] for v in prows if v != first
        }
        # pool smaller than MMR_K (or empty): the oracle's p{i} CTEs
        # run dry the same way — emit only the reachable picks
        for i in range(2, MMR_K + 1):
            if not maxsim:
                break
            pick = max(
                maxsim,
                key=lambda v: (
                    _LAM_NUM * prows[v]
                    - (_LAM_DEN - _LAM_NUM) * maxsim[v],
                    -v,
                ),
            )
            picks.append((i, pick, prows[pick], maxsim[pick]))
            del maxsim[pick]
            for v in maxsim:
                maxsim[v] = max(maxsim[v], srows[(v, pick)])
    schema = "rank int, vec_id long, rel_fx long, maxsim_fx long"
    return local_df(emb.sparkSession, picks, schema)


# ---------------------------------------------------------------------------
# ROUGE overlap between paired documents (summarization-eval primitive)
# ---------------------------------------------------------------------------


@register(
    "q_rouge_overlap",
    oracle="""
        WITH paired AS (
            SELECT doc_id, doc_id // 2 AS pid, doc_id % 2 AS role, text
            FROM documents
        ),
        uni AS (
            SELECT pid, role, word, count(*) AS c
            FROM (
                SELECT pid, role, unnest(string_split(text, ' ')) AS word
                FROM paired
            ) GROUP BY pid, role, word
        ),
        lens AS (
            SELECT pid, role, CAST(sum(c) AS BIGINT) AS n_words
            FROM uni GROUP BY pid, role
        ),
        clip1 AS (
            SELECT a.pid,
                   CAST(sum(least(a.c, b.c)) AS BIGINT) AS clip
            FROM uni a JOIN uni b
              ON a.pid = b.pid AND a.role = 0 AND b.role = 1
             AND a.word = b.word
            GROUP BY a.pid
        ),
        bi AS (
            SELECT pid, role, w1 || ' ' || w2 AS bg, count(*) AS c
            FROM (
                SELECT pid, role, words[i] AS w1, words[i + 1] AS w2
                FROM (
                    SELECT pid, role, string_split(text, ' ') AS words,
                           unnest(generate_series(
                               1, len(string_split(text, ' ')) - 1)) AS i
                    FROM paired
                )
            ) GROUP BY pid, role, bg
        ),
        bilens AS (
            SELECT pid, role, CAST(sum(c) AS BIGINT) AS n_bg
            FROM bi GROUP BY pid, role
        ),
        clip2 AS (
            SELECT a.pid, CAST(sum(least(a.c, b.c)) AS BIGINT) AS clip
            FROM bi a JOIN bi b
              ON a.pid = b.pid AND a.role = 0 AND b.role = 1
             AND a.bg = b.bg
            GROUP BY a.pid
        )
        SELECT lr.pid,
               lr.n_words AS ref_words, lc.n_words AS cand_words,
               coalesce(c1.clip, 0) AS rouge1_clip,
               coalesce(c2.clip, 0) AS rouge2_clip,
               CAST(coalesce(c1.clip, 0) AS DOUBLE) / lr.n_words
                   AS rouge1_recall,
               CAST(coalesce(c1.clip, 0) AS DOUBLE) / lc.n_words
                   AS rouge1_precision,
               CAST(2 * coalesce(c1.clip, 0) AS DOUBLE)
                   / (lr.n_words + lc.n_words) AS rouge1_f1,
               CAST(coalesce(c2.clip, 0) AS DOUBLE) / br.n_bg
                   AS rouge2_recall
        FROM lens lr
        JOIN lens lc ON lc.pid = lr.pid AND lc.role = 1
        JOIN bilens br ON br.pid = lr.pid AND br.role = 0
        LEFT JOIN clip1 c1 ON c1.pid = lr.pid
        LEFT JOIN clip2 c2 ON c2.pid = lr.pid
        WHERE lr.role = 0
    """,
    doc="ROUGE-1/2 overlap (Lin 2004, clipped n-gram counts) between"
    " deterministically paired documents (doc 2p = reference, 2p+1 ="
    " candidate) — the summarization / near-dup-explanation eval"
    " primitive. Clipped overlap = sum over n-grams of"
    " min(count_ref, count_cand) via ONE equi-join on (pair, n-gram)"
    " of the per-doc count tables; F1 = 2*clip/(len_r + len_c) is"
    " algebraically identical to the harmonic mean but avoids the"
    " intermediate P,R divisions (one IEEE division per output column,"
    " engine-exact). Scale: n-gram count tables are narrow explodes +"
    " one partial agg; the join key (pid, ngram) is high-cardinality,"
    " skew-free.",
)
def q_rouge_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    paired = docs.select(
        (F.col("doc_id") / 2).cast("bigint").alias("pid"),
        (F.col("doc_id") % 2).alias("role"),
        "text",
    )
    # Pivot the two roles into (c0, c1) per n-gram instead of building a
    # per-role count table and self-joining it (guide §2.4 — the old
    # plan recomputed the explode+agg subtree for each of its three
    # consumers and paid an extra (pid, ngram)-keyed join per n-gram
    # order). sum(least(c0, c1)) over ALL grams equals the inner-join
    # clip: grams on one side only contribute least(c, 0) = 0, exactly
    # the rows the join dropped / the LEFT JOIN coalesced to 0. Presence
    # filters replace the old inner joins: every existing doc yields
    # >= 1 word row (split returns [''] on empty text), so
    # ref_words > 0 AND cand_words > 0 <=> both lens rows existed, and
    # ref_bg > 0 <=> the bilens role-0 row existed.
    wstats = (
        paired.select(
            "pid", "role", F.explode(F.split("text", " ")).alias("word")
        )
        .groupBy("pid", "word")
        .agg(
            F.sum(F.when(F.col("role") == 0, 1).otherwise(0)).alias("c0"),
            F.sum(F.when(F.col("role") == 1, 1).otherwise(0)).alias("c1"),
        )
        .groupBy("pid")
        .agg(
            F.sum("c0").cast("bigint").alias("ref_words"),
            F.sum("c1").cast("bigint").alias("cand_words"),
            F.sum(F.least("c0", "c1")).cast("bigint").alias("clip1"),
        )
        .filter((F.col("ref_words") > 0) & (F.col("cand_words") > 0))
    )
    bstats = (
        paired.select(
            "pid",
            "role",
            F.explode(
                F.expr(
                    # slice-to-length, NOT sequence(1, n-1): Spark's
                    # sequence DESCENDS when stop < start, so a 1-word
                    # doc would yield [1, 0] instead of no bigrams
                    "transform(slice(sequence(1, size(split(text, ' '))), 1,"
                    " greatest(size(split(text, ' ')) - 1, 0)),"
                    " i -> concat_ws(' ', slice(split(text, ' '), i, 2)))"
                )
            ).alias("bg"),
        )
        .groupBy("pid", "bg")
        .agg(
            F.sum(F.when(F.col("role") == 0, 1).otherwise(0)).alias("c0"),
            F.sum(F.when(F.col("role") == 1, 1).otherwise(0)).alias("c1"),
        )
        .groupBy("pid")
        .agg(
            F.sum("c0").cast("bigint").alias("ref_bg"),
            F.sum(F.least("c0", "c1")).cast("bigint").alias("clip2"),
        )
        .filter(F.col("ref_bg") > 0)
    )
    return wstats.join(bstats, "pid").select(
        "pid",
        "ref_words",
        "cand_words",
        F.col("clip1").cast("bigint").alias("rouge1_clip"),
        F.col("clip2").cast("bigint").alias("rouge2_clip"),
        (F.col("clip1").cast("double") / F.col("ref_words")).alias(
            "rouge1_recall"
        ),
        (F.col("clip1").cast("double") / F.col("cand_words")).alias(
            "rouge1_precision"
        ),
        (
            (2 * F.col("clip1")).cast("double")
            / (F.col("ref_words") + F.col("cand_words"))
        ).alias("rouge1_f1"),
        (F.col("clip2").cast("double") / F.col("ref_bg")).alias(
            "rouge2_recall"
        ),
    )
