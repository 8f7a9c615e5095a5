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
from lakehouse_weather_spark.operators.quality import (
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
