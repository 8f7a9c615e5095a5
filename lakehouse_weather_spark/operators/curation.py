"""End-to-end corpus curation as ONE declarative plan.

The full pretraining data-prep flow the individual operators exist
for, composed: repetition-quality filter -> exact content dedup (keep
lowest doc_id per fingerprint) -> benchmark decontamination (drop docs
sharing an 8-gram with the holdout) -> deterministic leakage-safe
train/valid/test assignment. Because every stage is built-in
expressions with total tie-breaks, the whole pipeline stays a single
Catalyst plan (the optimizer can reorder/pushdown across stage
boundaries — e.g. the quality filter prunes the dedup shuffle's input)
and the DuckDB oracle replays it bit-exactly end to end.

This is the composition the reference runs as four separate Airflow
tasks materializing intermediate object-store state between each
(``dags/silver.py`` -> ``dags/gold.py``); here intermediates are
logical, so nothing hits storage until the final write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.operators.decontam import (
    _DUCK_DECON_CTE,
    _decon_shingle_hashes,
)
from lakehouse_weather_spark.operators.dedup import _minhash_pairs_cte
from lakehouse_weather_spark.operators.quality import (
    _G_STOPS,
    G_MAX_MWL,
    G_MAX_WORDS,
    G_MIN_MWL,
    G_MIN_STOPWORDS,
    G_MIN_WORDS,
    MAX_DUP_WORD_FRAC,
    MAX_TOP_WORD_FRAC,
    MIN_WORDS,
    apply_quality_filter,
)
from lakehouse_weather_spark.operators.sampling import _DUCK_H100, _SPARK_H100
from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table

# split hash qualified for the final SELECT's join scope
_H_QUALIFIED = _DUCK_H100.replace("doc_id", "d.doc_id")


@register(
    "q_corpus_curation",
    oracle=f"""
        WITH {_DUCK_DECON_CTE},
        kept AS (
            SELECT doc_id, text,
                   len(string_split(text, ' ')) AS n
            FROM documents
            WHERE len(string_split(text, ' ')) >= {MIN_WORDS}
              AND 1.0 - CAST(len(list_distinct(string_split(text, ' ')))
                             AS DOUBLE) / len(string_split(text, ' '))
                  <= {MAX_DUP_WORD_FRAC}
              AND CAST(list_max(list_transform(
                           list_distinct(string_split(text, ' ')),
                           u -> len(list_filter(string_split(text, ' '),
                                                x -> x = u)))) AS DOUBLE)
                  / len(string_split(text, ' ')) <= {MAX_TOP_WORD_FRAC}
        ),
        dedup AS (
            SELECT k.doc_id, k.n
            FROM kept k
            JOIN (
                SELECT sha256(substr(text, 1, 80)) AS fp,
                       min(doc_id) AS keep_id
                FROM kept GROUP BY 1
            ) g ON sha256(substr(k.text, 1, 80)) = g.fp
               AND k.doc_id = g.keep_id
        ),
        bench AS (SELECT DISTINCT h FROM dsh WHERE doc_id % 20 = 0),
        contaminated AS (
            SELECT DISTINCT dsh.doc_id
            FROM dsh JOIN bench USING (h)
            WHERE dsh.doc_id % 20 <> 0
        )
        SELECT d.doc_id AS doc_id,
               CAST(d.n AS INTEGER) AS n_words,
               CASE WHEN ({_H_QUALIFIED}) < 80 THEN 'train'
                    WHEN ({_H_QUALIFIED}) < 90 THEN 'valid'
                    ELSE 'test' END AS split
        FROM dedup d
        LEFT JOIN contaminated c ON d.doc_id = c.doc_id
        WHERE d.doc_id % 20 <> 0 AND c.doc_id IS NULL
    """,
    doc="Full corpus-curation composition in one Catalyst plan:"
    " repetition-quality gate (narrow array algebra) -> exact"
    " fingerprint dedup keeping the lowest doc_id -> benchmark"
    " decontamination (broadcast holdout n-grams, anti-join) ->"
    " md5-keyed 80/10/10 split. Stage boundaries are logical only, so"
    " pushdown and join planning cross them; at 100 TB the quality"
    " filter prunes every later shuffle's input and nothing"
    " materializes between stages.",
)
def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    kept = apply_quality_filter(docs).select(
        "doc_id", "text", F.size(F.split("text", " ")).alias("n_words")
    )
    fp = F.sha2(F.substring("text", 1, 80), 256)
    keyed = kept.withColumn("fp", fp)
    mins = keyed.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    deduped = (
        keyed.join(mins, "fp")
        .filter(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "n_words")
    )
    sh = _decon_shingle_hashes(spark, sf_dir)
    bench = sh.filter(F.col("doc_id") % 20 == 0).select("h").distinct()
    contaminated = (
        sh.filter(F.col("doc_id") % 20 != 0)
        .join(F.broadcast(bench), "h")
        .select("doc_id")
        .distinct()
    )
    h = F.expr(_SPARK_H100)
    return (
        deduped.filter(F.col("doc_id") % 20 != 0)
        .join(contaminated, "doc_id", "left_anti")
        .select(
            "doc_id",
            "n_words",
            F.when(h < 80, "train").when(h < 90, "valid").otherwise("test")
            .alias("split"),
        )
    )


@register(
    "q_data_card",
    oracle="""
        WITH w AS (
            SELECT doc_id, len(string_split(text, ' ')) AS n_words
            FROM documents
        )
        SELECT
            (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
            (SELECT CAST(count(DISTINCT lang) AS BIGINT) FROM documents)
                AS n_langs,
            (SELECT CAST(count(DISTINCT source) AS BIGINT) FROM documents)
                AS n_sources,
            (SELECT CAST(sum(n_words) AS BIGINT) FROM w) AS total_words,
            (SELECT CAST(min(n_words) AS BIGINT) FROM w) AS min_words,
            (SELECT CAST(max(n_words) AS BIGINT) FROM w) AS max_words,
            (SELECT CAST(count(*) AS BIGINT) FROM w WHERE n_words >= 30)
                AS n_docs_min_len,
            (SELECT CAST(count(*) AS BIGINT) FROM (
                SELECT sha256(text) FROM documents
                GROUP BY sha256(text) HAVING count(*) > 1))
                AS n_dup_content_groups
    """,
    doc="Corpus data card in ONE declarative plan: document/language/"
    "source counts, token volume, length extremes, length-gate pass"
    " count, and exact duplicate-content groups — the summary artifact"
    " a training run records next to its data snapshot (datasheets-"
    "for-datasets practice). Scalar subqueries fold into one job;"
    " every number is an exact integer, oracle-identical.",
)
def q_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "v_documents_card"
    )
    return spark.sql(
        """
        WITH w AS (
            SELECT doc_id, size(split(text, ' ')) AS n_words
            FROM v_documents_card
        )
        SELECT
            (SELECT CAST(count(*) AS BIGINT) FROM v_documents_card) AS n_docs,
            (SELECT CAST(count(DISTINCT lang) AS BIGINT)
             FROM v_documents_card) AS n_langs,
            (SELECT CAST(count(DISTINCT source) AS BIGINT)
             FROM v_documents_card) AS n_sources,
            (SELECT CAST(sum(n_words) AS BIGINT) FROM w) AS total_words,
            (SELECT CAST(min(n_words) AS BIGINT) FROM w) AS min_words,
            (SELECT CAST(max(n_words) AS BIGINT) FROM w) AS max_words,
            (SELECT CAST(count(*) AS BIGINT) FROM w WHERE n_words >= 30)
                AS n_docs_min_len,
            (SELECT CAST(count(*) AS BIGINT) FROM (
                SELECT sha2(text, 256) FROM v_documents_card
                GROUP BY sha2(text, 256) HAVING count(*) > 1))
                AS n_dup_content_groups
        """
    )


# ---------------------------------------------------------------------------
# Per-source curation scorecard
# ---------------------------------------------------------------------------


@register(
    "q_source_scorecard",
    oracle=f"""
        WITH {_minhash_pairs_cte()},
        m AS (
            SELECT doc_id, source,
                   len(string_split(text, ' ')) AS n_words,
                   CAST(list_sum(list_transform(string_split(text, ' '),
                        x -> length(x))) AS BIGINT) AS sum_wl,
                   CAST(len(list_distinct(list_filter(string_split(text, ' '),
                        x -> x IN {_G_STOPS!r}))) AS BIGINT) AS n_dstops
            FROM documents
        ),
        keepflag AS (
            SELECT doc_id, source, n_words,
                   (n_words BETWEEN {G_MIN_WORDS} AND {G_MAX_WORDS})
                   AND (CAST(sum_wl AS DOUBLE) / n_words
                        BETWEEN {G_MIN_MWL} AND {G_MAX_MWL})
                   AND (n_dstops >= {G_MIN_STOPWORDS}) AS keep
            FROM m
        ),
        dupdocs AS (
            SELECT DISTINCT doc_id FROM (
                SELECT doc_a AS doc_id FROM mpairs
                UNION ALL SELECT doc_b FROM mpairs
            )
        )
        SELECT k.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN k.keep THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_keep,
               CAST(sum(CASE WHEN k.keep THEN 1 ELSE 0 END) * 10000
                    // count(*) AS BIGINT) AS keep_bp,
               CAST(sum(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_neardup_docs,
               CAST(sum(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                    * 10000 // count(*) AS BIGINT) AS neardup_bp,
               CAST(sum(k.n_words) AS BIGINT) AS total_words
        FROM keepflag k LEFT JOIN dupdocs d USING (doc_id)
        GROUP BY k.source
    """,
    doc="Per-source curation scorecard: for every source, its document"
    " count, Gopher-gate keep rate (word-count + mean-word-length +"
    " stopword rules, basis points), the share of docs involved in at"
    " least one MinHash near-dup pair, and total word mass — the"
    " include/exclude decision table a corpus owner reads before"
    " q_mixture_plan assigns weights (a source that is 40% duplicates"
    " and 30% gate-failures contributes far less unique signal than"
    " its raw size suggests). Composes two verified stages (gopher"
    " rules, LSH pair stream) into one |sources|-row rollup; integer"
    " basis points keep it hash-exact.",
)
def q_source_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_weather_spark.operators.dedup import minhash_pairs_cached
    from lakehouse_weather_spark.operators.quality import q_gopher_rules

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    gopher = q_gopher_rules(spark, sf_dir).select(
        "doc_id",
        "n_words",
        (
            F.col("pass_word_count")
            & F.col("pass_mean_word_len")
            & F.col("pass_stopwords")
        ).alias("keep"),
    )
    pairs = minhash_pairs_cached(spark, sf_dir)
    dupdocs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    joined = (
        docs.join(gopher, "doc_id")
        .join(dupdocs, "doc_id", "left")
    )
    keep_n = F.sum(F.when(F.col("keep"), 1).otherwise(0))
    dup_n = F.sum(F.coalesce(F.col("is_dup"), F.lit(0)))
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        keep_n.cast("bigint").alias("n_keep"),
        F.expr(
            "sum(CASE WHEN keep THEN 1 ELSE 0 END) * 10000 DIV count(*)"
        )
        .cast("bigint")
        .alias("keep_bp"),
        dup_n.cast("bigint").alias("n_neardup_docs"),
        F.expr(
            "sum(coalesce(is_dup, 0)) * 10000 DIV count(*)"
        )
        .cast("bigint")
        .alias("neardup_bp"),
        F.sum("n_words").cast("bigint").alias("total_words"),
    )
