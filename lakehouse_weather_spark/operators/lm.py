"""Corpus language-model statistics (training-data closure): the
model-based curation passes a pretraining pipeline runs between dedup
and sampling.

- ``q_lm_bigram_score``: add-one-smoothed bigram-LM likelihood per
  document — the quality/fluency filter (CCNet-style perplexity
  filtering, Wenzek et al. 2020). Stereotypically-fluent text scores
  high, rare-transition-heavy text (specialist or garbage) scores low;
  both tails get review in a curation funnel.
- ``q_dsir_weights``: Data Selection with Importance Resampling (Xie
  et al. 2023) — hashed-bigram importance ratios of a TARGET
  distribution (here the ``lang='en'`` slice) over the raw pool; raw
  docs resembling the target up-weight.
- ``q_vocab_growth``: Heaps'-law vocabulary-growth table in ingestion
  order — the dataset-scaling diagnostic (is new data still
  contributing new types, or is the crawl saturating?).
- ``q_zipf_constancy``: rank x frequency product per rank octave —
  Zipf's law predicts a constant; corpus segments that deviate
  (flat head = boilerplate flood, heavy tail = OCR noise) surface
  immediately.

Everything stays INTEGER (counts, ranks, bit lengths) or exact-rational
(one IEEE division of identical integers, then the dsum fixed-point
round-and-integer-sum pattern from ``functions.py``) until at most one
final division, so every row hash-matches the DuckDB oracle —
transcendental log() is banned engine-wide (per-libm rounding, see
``operators/anomaly.py``).

The reference has no model-based curation at all — its silver layer
maps documents through an LLM-cleaning UDF one row at a time
(``dags/utils/chunks_data.py:33-45``); these are the statistical
passes that decide WHICH documents deserve that per-row spend.

Scale shape: every query is explode -> count-aggregate (model tables
are vocab- or bucket-sized, never corpus-sized) -> join back ->
per-doc aggregate. The only total-order windows sort vocab-sized or
bucket-count-sized frames, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import fan_out, load_table

# fixed-point scales: probabilities are <= 1 (1e-12 resolution, per-doc
# sums bounded by n_bigrams * 1e12 ~ 5e14 << 2**63); DSIR ratios are
# bounded by |target|+1 (1e-6 resolution keeps the same headroom)
P_SCALE = 1_000_000_000_000
R_SCALE = 1_000_000

# DSIR feature-hash buckets: the model table is at most this many rows,
# so the score join is always a broadcast
DSIR_BUCKETS = 4096

# vocab-growth ingestion buckets (the cumsum window sorts exactly this
# many rows)
GROWTH_BUCKETS = 20

_SPARK_H = "cast(conv(substr(md5({expr}), 1, 15), 16, 10) as bigint)"
_DUCK_H = "CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"

# Bigram occurrence CTE (DuckDB): one row per adjacent word pair, in
# document order, docs with < 2 words contribute nothing
# (generate_series(1, 0) is empty).
_DUCK_BIGRAMS_CTE = """
    bg AS (
        SELECT doc_id, words[i] AS w1, words[i + 1] AS w2
        FROM (
            SELECT doc_id, string_split(text, ' ') AS words,
                   unnest(generate_series(
                       1, len(string_split(text, ' ')) - 1
                   )) AS i
            FROM documents
        )
    )
"""


def _spark_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, w1, w2) bigram occurrences — narrow explode, no shuffle.
    Docs with < 2 words are filtered BEFORE the sequence (Spark's
    sequence(1, 0) steps DOWN to [1, 0]; DuckDB's generate_series is
    empty — the filter keeps both engines on the same rows)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    return (
        docs.select("doc_id", F.split("text", " ").alias("words"))
        .filter(F.size("words") >= 2)
        .select(
            "doc_id",
            "words",
            F.explode(F.expr("sequence(1, size(words) - 1)")).alias("i"),
        )
        .select(
            "doc_id",
            F.expr("element_at(words, CAST(i AS INT))").alias("w1"),
            F.expr("element_at(words, CAST(i + 1 AS INT))").alias("w2"),
        )
    )


@register(
    "q_lm_bigram_score",
    oracle=f"""
        WITH {_DUCK_BIGRAMS_CTE},
        v AS (
            SELECT count(DISTINCT word) AS vocab FROM (
                SELECT unnest(string_split(text, ' ')) AS word
                FROM documents
            )
        ),
        bgc AS (SELECT w1, w2, count(*) AS c_bg FROM bg GROUP BY w1, w2),
        ctx AS (
            SELECT w1, CAST(sum(c_bg) AS BIGINT) AS c_ctx
            FROM bgc GROUP BY w1
        ),
        scored AS (
            SELECT bg.doc_id,
                   CAST(round(
                       CAST(bgc.c_bg + 1 AS DOUBLE)
                       / CAST(ctx.c_ctx + v.vocab AS DOUBLE)
                       * {P_SCALE}
                   ) AS BIGINT) AS p_fx
            FROM bg
            JOIN bgc ON bg.w1 = bgc.w1 AND bg.w2 = bgc.w2
            JOIN ctx ON bg.w1 = ctx.w1
            CROSS JOIN v
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(p_fx) AS BIGINT) AS sum_p_fx,
               CAST(sum(p_fx) AS DOUBLE) / {P_SCALE} / count(*)
                   AS mean_bigram_prob
        FROM scored
        GROUP BY doc_id
    """,
    doc="Add-one-smoothed bigram-LM likelihood per document (CCNet-style"
    " fluency filter): p(w2|w1) = (c(w1,w2)+1)/(c(w1)+V), scored over"
    " every bigram occurrence, per-doc MEAN probability. Each p is one"
    " IEEE division of identical integers (exactly rounded in every"
    " engine), fixed-point-rounded and integer-summed (the dsum"
    " pattern), so rows hash-match the oracle without transcendental"
    " log(). Scale shape: narrow bigram explode; ONE corpus-level"
    " count agg builds the bigram model and the context model derives"
    " from it (vocab-sized agg, not a second corpus pass — measured"
    " 2.2x faster cold than the two-pass plan; 60-bit hash keys were"
    " also tried and LOST, md5 cost exceeds the string-shuffle"
    " saving at word-token sizes); join back + per-doc agg.",
)
def q_lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    bg = _spark_bigrams(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .agg(F.count_distinct("word").alias("vocab"))
    )
    bgc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bg"))
    ctx = bgc.groupBy("w1").agg(F.sum("c_bg").cast("bigint").alias("c_ctx"))
    scored = (
        bg.join(bgc, ["w1", "w2"])
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.round(
                (F.col("c_bg") + 1).cast("double")
                / (F.col("c_ctx") + F.col("vocab")).cast("double")
                * P_SCALE,
                0,
            )
            .cast("bigint")
            .alias("p_fx"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("p_fx").cast("bigint").alias("sum_p_fx"),
        (
            F.sum("p_fx").cast("double") / P_SCALE / F.count(F.lit(1))
        ).alias("mean_bigram_prob"),
    )


_DSIR_F = "({h} % {n})".format(
    h=_SPARK_H.format(expr="concat(w1, ' ', w2)"), n=DSIR_BUCKETS
)
_DSIR_F_DUCK = "({h} % {n})".format(
    h=_DUCK_H.format(expr="w1 || ' ' || w2"), n=DSIR_BUCKETS
)


@register(
    "q_dsir_weights",
    oracle=f"""
        WITH {_DUCK_BIGRAMS_CTE},
        dfeat AS (
            SELECT bg.doc_id, d.lang, {_DSIR_F_DUCK} AS f,
                   CAST(count(*) AS BIGINT) AS m
            FROM bg JOIN documents d ON bg.doc_id = d.doc_id
            GROUP BY bg.doc_id, d.lang, {_DSIR_F_DUCK}
        ),
        model AS (
            SELECT f,
                   CAST(sum(CASE WHEN lang = 'en' THEN m ELSE 0 END)
                        AS BIGINT) AS t_c,
                   CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE m END)
                        AS BIGINT) AS r_c
            FROM dfeat GROUP BY f
        )
        SELECT fe.doc_id,
               CAST(sum(fe.m) AS BIGINT) AS n_feats,
               CAST(sum(fe.m * CAST(round(
                   CAST(mo.t_c + 1 AS DOUBLE) / CAST(mo.r_c + 1 AS DOUBLE)
                   * {R_SCALE}
               ) AS BIGINT)) AS BIGINT) AS weight_fx,
               CAST(sum(fe.m * CAST(round(
                   CAST(mo.t_c + 1 AS DOUBLE) / CAST(mo.r_c + 1 AS DOUBLE)
                   * {R_SCALE}
               ) AS BIGINT)) AS DOUBLE) / {R_SCALE} / sum(fe.m)
                   AS mean_ratio
        FROM dfeat fe JOIN model mo ON fe.f = mo.f
        WHERE fe.lang <> 'en'
        GROUP BY fe.doc_id
    """,
    doc="DSIR importance weights (Xie et al. 2023, 'Data Selection via"
    " Importance Resampling'): hashed-bigram features (md5 mod"
    f" {DSIR_BUCKETS}), per-feature smoothed target/raw occurrence"
    " ratio (target = the lang='en' slice), per RAW doc the mean ratio"
    " over its feature occurrences — docs resembling the target"
    " distribution up-weight for resampling. The ratio replaces DSIR's"
    " log-ratio sum as the deterministic monotone stand-in (log() is"
    " banned for oracle parity; same precedent as q_unigram_surprisal's"
    " rank proxy). Scale shape: the model is AT MOST"
    f" {DSIR_BUCKETS} rows — it broadcasts; scoring is one narrow"
    " explode + broadcast join + per-doc agg, no corpus shuffle beyond"
    " the doc_id groupBy.",
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    dfeat = (
        _spark_bigrams(spark, sf_dir)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", F.expr(_DSIR_F).alias("f"))
        .groupBy("doc_id", "lang", "f")
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    )
    model = dfeat.groupBy("f").agg(
        F.sum(F.when(F.col("lang") == "en", F.col("m")).otherwise(0))
        .cast("bigint")
        .alias("t_c"),
        F.sum(F.when(F.col("lang") == "en", 0).otherwise(F.col("m")))
        .cast("bigint")
        .alias("r_c"),
    )
    ratio_fx = (
        F.round(
            (F.col("t_c") + 1).cast("double")
            / (F.col("r_c") + 1).cast("double")
            * R_SCALE,
            0,
        ).cast("bigint")
    )
    return (
        dfeat.filter(F.col("lang") != "en")
        .join(F.broadcast(model), "f")
        .groupBy("doc_id")
        .agg(
            F.sum("m").cast("bigint").alias("n_feats"),
            F.sum(F.col("m") * ratio_fx).cast("bigint").alias("weight_fx"),
            (
                F.sum(F.col("m") * ratio_fx).cast("double")
                / R_SCALE
                / F.sum("m")
            ).alias("mean_ratio"),
        )
    )


@register(
    "q_vocab_growth",
    oracle=f"""
        WITH nb AS (
            SELECT max(doc_id) + 1 AS n_docs FROM documents
        ),
        words AS (
            SELECT doc_id * {GROWTH_BUCKETS} // nb.n_docs AS bucket,
                   unnest(string_split(text, ' ')) AS word
            FROM documents CROSS JOIN nb
        ),
        toks AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens
            FROM words GROUP BY bucket
        ),
        firsts AS (
            SELECT min(bucket) AS bucket, word FROM words GROUP BY word
        ),
        news AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS new_types
            FROM firsts GROUP BY bucket
        )
        SELECT t.bucket,
               t.n_tokens,
               CAST(sum(t.n_tokens) OVER w AS BIGINT) AS cum_tokens,
               CAST(COALESCE(n.new_types, 0) AS BIGINT) AS new_types,
               CAST(sum(COALESCE(n.new_types, 0)) OVER w AS BIGINT)
                   AS vocab_size
        FROM toks t LEFT JOIN news n ON t.bucket = n.bucket
        WINDOW w AS (ORDER BY t.bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="Heaps'-law vocabulary-growth table: docs bucketed into"
    f" {GROWTH_BUCKETS} sequential ingestion slices (doc_id order = the"
    " fixture's ingest order), per slice the token count and the count"
    " of word types FIRST seen there, plus running totals — the"
    " is-the-crawl-saturating diagnostic (vocab_size flattening against"
    " cum_tokens = diminishing new content). All-integer. Scale shape:"
    " one explode + two count aggs; the first-occurrence agg is"
    " vocab-sized and the cumsum window sorts exactly"
    f" {GROWTH_BUCKETS} rows, never the corpus.",
)
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    nb = docs.agg((F.max("doc_id") + 1).alias("n_docs"))
    words = (
        docs.crossJoin(F.broadcast(nb))
        .select(
            F.expr(f"doc_id * {GROWTH_BUCKETS} div n_docs").alias("bucket"),
            F.explode(F.split("text", " ")).alias("word"),
        )
    )
    toks = words.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens")
    )
    news = (
        words.groupBy("word")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("new_types"))
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        toks.join(news, "bucket", "left")
        .select(
            "bucket",
            "n_tokens",
            F.sum("n_tokens").over(w).cast("bigint").alias("cum_tokens"),
            F.coalesce("new_types", F.lit(0))
            .cast("bigint")
            .alias("new_types"),
            F.sum(F.coalesce("new_types", F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("vocab_size"),
        )
    )


@register(
    "q_zipf_constancy",
    oracle="""
        WITH freq AS (
            SELECT word, CAST(count(*) AS BIGINT) AS c FROM (
                SELECT unnest(string_split(text, ' ')) AS word
                FROM documents
            ) GROUP BY word
        ),
        ranked AS (
            SELECT c,
                   CAST(row_number() OVER (ORDER BY c DESC, word)
                        AS BIGINT) AS rnk
            FROM freq
        )
        SELECT CAST(length(bin(rnk)) AS BIGINT) AS rank_octave,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(c) AS BIGINT) AS total_freq,
               CAST(sum(rnk * c) AS BIGINT) AS sum_rank_freq,
               CAST(sum(rnk * c) AS DOUBLE) / count(*) AS mean_rank_freq
        FROM ranked
        GROUP BY length(bin(rnk))
    """,
    doc="Zipf-constancy audit: frequency-ranked vocabulary grouped into"
    " rank OCTAVES (floor(log2)+1 computed integer-exactly as the"
    " binary-representation length — no float log), per octave the"
    " rank x frequency product Zipf's law predicts constant. A flat"
    " head octave = boilerplate flood; an exploding tail = OCR/noise"
    " vocabulary. Scale shape: one count agg builds the frequency"
    " table, the ONLY total-order window ranks the vocab (not the"
    " corpus), then an octave-count-sized groupBy.",
)
def q_zipf_constancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    ranked = freq.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.desc("c"), F.asc("word")))
        .cast("bigint")
        .alias("rnk"),
    )
    return (
        ranked.groupBy(
            F.length(F.bin("rnk")).cast("bigint").alias("rank_octave")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("c").cast("bigint").alias("total_freq"),
            F.sum(F.col("rnk") * F.col("c"))
            .cast("bigint")
            .alias("sum_rank_freq"),
            (
                F.sum(F.col("rnk") * F.col("c")).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_rank_freq"),
        )
    )


# Kneser-Ney absolute discount: 3/4 is exactly representable in
# binary, so int - D and D * int stay EXACT doubles below 2^51 and
# every downstream IEEE op is correctly rounded (identical per engine).
_KN_D = "CAST('0.75' AS DOUBLE)"


@register(
    "q_kn_bigram_score",
    oracle=f"""
        WITH {_DUCK_BIGRAMS_CTE},
        bgc AS (SELECT w1, w2, count(*) AS c_bg FROM bg GROUP BY w1, w2),
        ctx AS (
            SELECT w1, CAST(sum(c_bg) AS BIGINT) AS c_ctx,
                   CAST(count(*) AS BIGINT) AS n1f
            FROM bgc GROUP BY w1
        ),
        hist AS (
            SELECT w2, CAST(count(*) AS BIGINT) AS n1b
            FROM bgc GROUP BY w2
        ),
        tt AS (SELECT CAST(count(*) AS BIGINT) AS t_types FROM bgc),
        scored AS (
            SELECT bg.doc_id,
                   CAST(round(
                       ((CAST(bgc.c_bg AS DOUBLE) - {_KN_D})
                            / CAST(ctx.c_ctx AS DOUBLE)
                        + ({_KN_D} * CAST(ctx.n1f AS DOUBLE)
                               / CAST(ctx.c_ctx AS DOUBLE))
                          * (CAST(hist.n1b AS DOUBLE)
                               / CAST(tt.t_types AS DOUBLE)))
                       * {P_SCALE}
                   ) AS BIGINT) AS p_fx
            FROM bg
            JOIN bgc ON bg.w1 = bgc.w1 AND bg.w2 = bgc.w2
            JOIN ctx ON bg.w1 = ctx.w1
            JOIN hist ON bg.w2 = hist.w2
            CROSS JOIN tt
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(p_fx) AS BIGINT) AS sum_p_fx,
               CAST(sum(p_fx) AS DOUBLE) / {P_SCALE} / count(*)
                   AS mean_kn_prob
        FROM scored
        GROUP BY doc_id
    """,
    doc="Interpolated Kneser-Ney bigram score per document (Kneser &"
    " Ney 1995; Chen & Goodman 1999): p(w2|w1) = max(c12-D,0)/c1 +"
    " (D*N1+(w1,.)/c1) * (N1+(.,w2)/T) with absolute discount D=3/4"
    " — the production-grade smoothing next to q_lm_bigram_score's"
    " add-one baseline; its continuation probability famously"
    " down-weights words that only ever follow one context"
    " ('Francisco'). D=0.75 is a dyadic rational, so the whole"
    " expression is exact-int-to-double plus correctly-rounded IEEE"
    " ops — hash-exact with NO transcendental log. Scale shape"
    " identical to the add-one scorer: one corpus bigram-count agg,"
    " two vocab-sized derived model tables (context + continuation),"
    " join back, per-doc agg. The continuation table is the only"
    " addition and is vocab-sized, not corpus-sized.",
)
def q_kn_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    bg = _spark_bigrams(spark, sf_dir)
    bgc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bg"))
    ctx = bgc.groupBy("w1").agg(
        F.sum("c_bg").cast("bigint").alias("c_ctx"),
        F.count(F.lit(1)).cast("bigint").alias("n1f"),
    )
    hist = bgc.groupBy("w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n1b")
    )
    tt = bgc.agg(F.count(F.lit(1)).cast("bigint").alias("t_types"))
    d = F.expr(_KN_D)
    p = (
        (F.col("c_bg").cast("double") - d) / F.col("c_ctx").cast("double")
        + (d * F.col("n1f").cast("double") / F.col("c_ctx").cast("double"))
        * (F.col("n1b").cast("double") / F.col("t_types").cast("double"))
    )
    scored = (
        bg.join(bgc, ["w1", "w2"])
        .join(ctx, "w1")
        .join(hist, "w2")
        .crossJoin(F.broadcast(tt))
        .select(
            "doc_id",
            F.round(p * P_SCALE, 0).cast("bigint").alias("p_fx"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("p_fx").cast("bigint").alias("sum_p_fx"),
        (
            F.sum("p_fx").cast("double") / P_SCALE / F.count(F.lit(1))
        ).alias("mean_kn_prob"),
    )
