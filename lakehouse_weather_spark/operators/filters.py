"""Projection / filter / predicate queries (SURVEY.md §2.2).

Each mirrors a concrete reference behavior (cited per query). All are
narrow, shuffle-free plans; predicates are Catalyst-pushable so at
100 TB they become parquet row-group skips, not full scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table


@register(
    "q_project_rename",
    oracle="SELECT doc_id, text AS page_content, source FROM documents",
    doc="Field projection + rename (ref: dags/utils/chunks_data.py:84-87 maps"
    " page_content into Document, drops the rest).",
)
def q_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").alias("page_content"), "source"
    )


@register(
    "q_filter_notnull",
    oracle="SELECT doc_id, source FROM documents WHERE text IS NOT NULL",
    doc="Defensive key filter (ref: dags/utils/chunks_data.py:82-92 keeps"
    " records having page_content).",
)
def q_filter_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "source")
    )


@register(
    "q_filter_nonempty",
    oracle="SELECT doc_id, n_chars FROM documents"
    " WHERE length(text) > 0 AND n_chars > 0",
    doc="Empty-payload filter (ref: dags/utils/chunks_data.py:73-75,94-96;"
    " seed_milvus.py:46-48).",
)
def q_filter_nonempty(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .filter((F.length("text") > 0) & (F.col("n_chars") > 0))
        .select("doc_id", "n_chars")
    )


@register(
    "q_filter_contains",
    oracle="SELECT doc_id, lang FROM documents WHERE text LIKE '%spark%'",
    doc="Substring predicate (ref: dags/access/test.py:19 filters rows whose"
    " content contains a marker string).",
)
def q_filter_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").contains("spark"))
        .select("doc_id", "lang")
    )


@register(
    "q_filter_links",
    oracle="""
        SELECT doc_id, href FROM (
            SELECT doc_id,
                   unnest(['mailto:admin@example.com',
                           'tel:+84123456789',
                           '#top',
                           'https://' || source || '/page',
                           '/relative/' || source]) AS href
            FROM documents
        )
        WHERE href NOT LIKE 'mailto:%'
          AND href NOT LIKE 'tel:%'
          AND href NOT LIKE '#%'
    """,
    doc="Link-scheme predicate over an exploded links array (ref:"
    " dags/utils/crawl_web.py:90-94 drops mailto:/tel:/#anchor hrefs)."
    " The links array is synthesized deterministically per document since"
    " the test tables carry no link column.",
)
def q_filter_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    links = F.array(
        F.lit("mailto:admin@example.com"),
        F.lit("tel:+84123456789"),
        F.lit("#top"),
        F.concat(F.lit("https://"), F.col("source"), F.lit("/page")),
        F.concat(F.lit("/relative/"), F.col("source")),
    )
    exploded = docs.select("doc_id", F.explode(links).alias("href"))
    return exploded.filter(
        ~F.col("href").startswith("mailto:")
        & ~F.col("href").startswith("tel:")
        & ~F.col("href").startswith("#")
    )


@register(
    "q_coalesce_defaults",
    oracle="""
        SELECT doc_id,
               coalesce(nullif(lang, 'en'), 'untitled_lang') AS lang_filled,
               coalesce(nullif(source, ''), 'Untitled') AS title_filled
        FROM documents
    """,
    doc="Null-default projection (ref: dags/utils/seed_milvus.py:53-59"
    " injects title='Untitled' etc. when metadata keys are missing).",
)
def q_coalesce_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.coalesce(F.nullif(F.col("lang"), F.lit("en")), F.lit("untitled_lang")).alias(
            "lang_filled"
        ),
        F.coalesce(F.nullif(F.col("source"), F.lit("")), F.lit("Untitled")).alias(
            "title_filled"
        ),
    )


@register(
    "q_filter_pred",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        FROM lineitem
        WHERE l_quantity BETWEEN 10 AND 20
          AND l_returnflag IN ('A', 'R')
          AND NOT (l_discount < 0.02)
          AND l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_linestatus IS NOT NULL
    """,
    doc="General predicate surface: =,<,BETWEEN,IN,AND/OR/NOT,IS NULL"
    " (DERIVED; SURVEY §2.2). All conjuncts push into the parquet scan.",
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("A", "R")
        & ~(F.col("l_discount") < 0.02)
        & (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & F.col("l_linestatus").isNotNull()
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")
