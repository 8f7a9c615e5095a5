"""UDF surface demos (SURVEY.md §2.11): the reference's "UDFs" are plain
Python functions applied in loops; the engine's surface is the full
Spark ladder — row Python UDF (slowest, only for genuinely scalar
Python logic), Arrow pandas_udf (scalar + grouped-agg), and
mapInPandas / UDTF-via-explode (covered in textops/medallion).

``q_udf_urljoin`` uses a scalar Python UDF wrapping
``urllib.parse.urljoin`` — the reference's exact logic
(``dags/utils/crawl_web.py:91``). The oracle replicates the
relative-URL resolution rules in SQL for the synthetic inputs, so this
is the one place a Python scalar UDF is oracle-checked. It runs with
``useArrow=True`` so batches cross the JVM/Python boundary as Arrow
columns rather than pickled rows — the per-element Python call remains
(that IS the §2.11 surface being demonstrated), but the serialization
path is the vectorized one. Everything hot stays off this path entirely
(see test_plans.py's no-Python-UDF gate for relational ops).
"""

from __future__ import annotations

from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table


@F.udf(StringType(), useArrow=True)
def _urljoin_udf(base, href):
    return urljoin(base or "", href or "")


@register(
    "q_udf_urljoin",
    oracle="""
        SELECT doc_id, href,
               CASE
                 WHEN href LIKE 'http://%' OR href LIKE 'https://%' THEN href
                 WHEN href LIKE '/%' THEN 'https://' || source || href
                 ELSE 'https://' || source || '/a/' || href
               END AS absolute_url
        FROM (
            SELECT doc_id, source,
                   unnest(['page2.html',
                           '/rooted/x.html',
                           'https://other.example/abs.html']) AS href
            FROM documents
        )
    """,
    doc="Relative->absolute URL resolution via an Arrow-serialized"
    " scalar Python UDF wrapping urllib.parse.urljoin (ref:"
    " crawl_web.py:91). Base is 'https://<source>/a/b.html'; the three"
    " href shapes (relative, root-relative, absolute) cover urljoin's"
    " main branches. useArrow=True removes the row-pickle path while"
    " keeping the scalar-Python-UDF surface the registry demonstrates.",
)
def q_udf_urljoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = F.concat(F.lit("https://"), F.col("source"), F.lit("/a/b.html"))
    hrefs = F.array(
        F.lit("page2.html"),
        F.lit("/rooted/x.html"),
        F.lit("https://other.example/abs.html"),
    )
    return docs.select(
        "doc_id", base.alias("base"), F.explode(hrefs).alias("href")
    ).select(
        "doc_id", "href", _urljoin_udf("base", "href").alias("absolute_url")
    )


@register(
    "q_group_normalize",
    oracle=None,  # pandas float accumulation differs at the last ulp
    doc="Grouped-map applyInPandas: per-user z-score normalization of"
    " event values (each group arrives as one pandas DataFrame) — the"
    " §2.11 grouped-map UDF shape for group-local algorithms (fit,"
    " normalize, resample). Equivalence to the window-SQL z-score is"
    " asserted (1e-9) in tests/test_udfs.py.",
)
def q_group_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("value_z", DoubleType()),
        ]
    )

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["value"].std(ddof=1)
        mean = pdf["value"].mean()
        z = (pdf["value"] - mean) / std if std > 0 else pdf["value"] * 0.0
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "value_z": z}
        )

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").applyInPandas(normalize, schema=out_schema)


@register(
    "q_pandas_grouped_agg",
    oracle=None,  # float accumulation order inside pandas is engine-specific
    doc="Grouped-aggregate pandas_udf (Arrow-batched): interquartile"
    " range of order totals per priority — the §2.11 grouped-agg UDF"
    " shape for statistics Spark lacks as builtins. Rows-only check;"
    " distribution sanity asserted in tests.",
)
def q_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(DoubleType())
    def iqr(v: pd.Series) -> float:
        return float(v.quantile(0.75) - v.quantile(0.25))

    orders = load_table(spark, sf_dir, "orders")
    # grouped-agg pandas UDFs can't mix with JVM aggregates in one agg
    return orders.groupBy("o_orderpriority").agg(
        iqr("o_totalprice").alias("price_iqr")
    )


@register(
    "q_udtf_ngrams",
    oracle="""
        SELECT doc_id,
               CAST(i AS INTEGER) AS pos,
               array_to_string(words[i : i + 1], ' ') AS bigram
        FROM (
            SELECT doc_id, string_split(text, ' ') AS words,
                   unnest(generate_series(
                       1, len(string_split(text, ' ')) - 1
                   )) AS i
            FROM documents WHERE doc_id < 50
        )
    """,
    doc="Python UDTF (Spark 4 table function): one input row expands to"
    " N output rows — word bigrams with positions. The lateral-join"
    " UDTF shape complements the explode-based UDTF-via-builtin"
    " (q_array_explode): use a real Python UDTF only when the expansion"
    " logic genuinely needs Python; the oracle replays it in SQL.",
)
def q_udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos: int, bigram: string")
    class BigramUDTF:
        def eval(self, text: str):
            words = (text or "").split(" ")
            for i in range(len(words) - 1):
                yield i + 1, f"{words[i]} {words[i + 1]}"

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    spark.udtf.register("bigrams_udtf", BigramUDTF)
    docs.createOrReplaceTempView("v_docs_udtf")
    return spark.sql(
        "SELECT d.doc_id, b.pos, b.bigram"
        " FROM v_docs_udtf d, LATERAL bigrams_udtf(d.text) b"
    )
