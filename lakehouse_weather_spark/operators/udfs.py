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


_ZSCALE = 10_000  # value resolution (2-decimal money-ish inputs)
# Squared-deviation resolution. Deliberately moderate: the scaled
# squares must stay far below 2^52 (where adding 0.5 inside a HALF_UP
# kernel skips doubles and where int64 partial sums could overflow),
# so the quantization uses floor() — exact on the binary double at
# EVERY magnitude and identical in numpy and DuckDB — rather than
# round()'s half-boundary semantics.
_DSCALE = 1_000_000


@register(
    "q_group_normalize",
    # Same fixed-point moment idea as functions.dsum: the mean is an
    # exact integer sum unscaled once, the variance an exact integer
    # sum of floor-quantized squared deviations — every remaining op is
    # a deterministic IEEE double op, so the pandas kernel and DuckDB
    # agree bit-for-bit (naive pandas mean()/std() accumulate in
    # engine-specific order and differ at the last ulp).
    oracle=f"""
        WITH ev AS (
            -- complete cases: a NULL user_id row would drop from this
            -- inner join but survive Spark's NULL groupBy group, and a
            -- NULL value would poison the fixed-point moments
            SELECT * FROM events
            WHERE user_id IS NOT NULL AND value IS NOT NULL
        ),
        m AS (
            SELECT user_id,
                   CAST(sum(CAST(floor(value * {_ZSCALE}) AS BIGINT))
                        AS DOUBLE) / {_ZSCALE} / count(*) AS mean,
                   count(*) AS n
            FROM ev GROUP BY user_id
        ),
        v AS (
            SELECT e.user_id,
                   CAST(sum(CAST(floor((e.value - m.mean) * (e.value - m.mean)
                                       * {_DSCALE}) AS BIGINT)) AS DOUBLE)
                       / {_DSCALE} / (m.n - 1) AS var
            FROM ev e JOIN m USING (user_id)
            WHERE m.n > 1
            GROUP BY e.user_id, m.n
        )
        SELECT e.event_id, e.user_id,
               CASE WHEN v.var > 0
                    THEN (e.value - m.mean) / sqrt(v.var)
                    ELSE 0.0 END AS value_z
        FROM ev e
        JOIN m USING (user_id)
        LEFT JOIN v USING (user_id)
    """,
    doc="Grouped-map applyInPandas: per-user z-score normalization of"
    " event values (each group arrives as one pandas DataFrame) — the"
    " §2.11 grouped-map UDF shape for group-local algorithms (fit,"
    " normalize, resample). Hash-checked: the kernel computes the"
    " moments in fixed point (exact int64 sums of floor-quantized"
    " terms), so the z-scores match the DuckDB replay bit-for-bit;"
    " groups of one or zero variance emit 0.0 on both engines.",
)
def q_group_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("value_z", DoubleType()),
        ]
    )

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["value"].to_numpy(dtype=np.float64)
        n = len(x)
        mean = float(np.floor(x * _ZSCALE).astype(np.int64).sum()) / _ZSCALE / n
        if n > 1:
            d = x - mean
            var = (
                float(np.floor(d * d * _DSCALE).astype(np.int64).sum())
                / _DSCALE
                / (n - 1)
            )
        else:
            var = 0.0
        z = (x - mean) / np.sqrt(var) if var > 0 else np.zeros_like(x)
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "value_z": z}
        )

    # complete cases (mirrored in the oracle): NULL user_id would form
    # its own pandas group here but drop from the oracle's inner join,
    # and a NaN value would poison the int64 fixed-point casts
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    return ev.groupBy("user_id").applyInPandas(normalize, schema=out_schema)


@register(
    "q_pandas_grouped_agg",
    # The quantile interpolation is CODED OUT (a[lo] + (a[hi]-a[lo]) *
    # frac over the sorted group; frac is an exact multiple of 0.25, so
    # every op is deterministic IEEE) instead of calling
    # pandas.quantile, whose internal lerp varies across numpy
    # versions — the oracle mirrors the exact same expression on a
    # sorted DuckDB list.
    oracle="""
        WITH g AS (
            SELECT o_orderpriority,
                   list(o_totalprice ORDER BY o_totalprice) AS a,
                   count(*) AS n
            FROM orders GROUP BY o_orderpriority
        ),
        q AS (
            SELECT o_orderpriority, a, n,
                   CAST(floor((n - 1) * 0.75) AS BIGINT) AS lo75,
                   (n - 1) * 0.75 - floor((n - 1) * 0.75) AS f75,
                   CAST(floor((n - 1) * 0.25) AS BIGINT) AS lo25,
                   (n - 1) * 0.25 - floor((n - 1) * 0.25) AS f25
            FROM g
        )
        SELECT o_orderpriority,
               (a[lo75 + 1] + (a[least(lo75 + 2, n)] - a[lo75 + 1]) * f75)
             - (a[lo25 + 1] + (a[least(lo25 + 2, n)] - a[lo25 + 1]) * f25)
                   AS price_iqr
        FROM q
    """,
    doc="Grouped-aggregate pandas_udf (Arrow-batched): interquartile"
    " range of order totals per priority — the §2.11 grouped-agg UDF"
    " shape for statistics Spark lacks as builtins. Hash-checked: the"
    " linear interpolation is written out explicitly (sorted array,"
    " a[lo] + (a[hi]-a[lo])*frac, frac an exact multiple of 0.25) so"
    " the kernel and the DuckDB list replay agree bit-for-bit.",
)
def q_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    @F.pandas_udf(DoubleType())
    def iqr(v: pd.Series) -> float:
        a = np.sort(v.to_numpy(dtype=np.float64))
        n = len(a)

        def quant(q: float) -> float:
            pos = (n - 1) * q
            lo = int(np.floor(pos))
            frac = pos - lo
            hi = min(lo + 1, n - 1)
            return float(a[lo] + (a[hi] - a[lo]) * frac)

        return quant(0.75) - quant(0.25)

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


# ---------------------------------------------------------------------------
# SQL UDFs (Spark 4 CREATE FUNCTION ... RETURN): the fast UDF path
# ---------------------------------------------------------------------------


@register(
    "q_sql_udf",
    oracle="""
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                             AS BIGINT)) AS BIGINT) AS net_fx,
               CAST(sum(CASE
                        WHEN l_quantity < 10 THEN 0
                        WHEN l_quantity < 30 THEN 1
                        ELSE 2 END) AS BIGINT) AS bracket_sum
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="SQL UDFs (Spark 4 `CREATE TEMPORARY FUNCTION ... RETURN expr`):"
    " net_price_fx(price, discount) and qty_bracket(qty) defined ONCE"
    " in SQL and reused across queries — the UDF abstraction that stays"
    " INSIDE Catalyst. Unlike a Python UDF (row-at-a-time, plan-opaque,"
    " banned from this repo's hot paths by the plan gate), a SQL UDF is"
    " inlined into the logical plan at resolution: it codegen-fuses,"
    " pushes down, and costs exactly what the raw expression costs —"
    " tests/test_plans.py asserts the plan contains no BatchEvalPython"
    " and the same WholeStageCodegen span as the inline form. The"
    " oracle runs the macro-expanded expressions.",
)
def q_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_price_fx("
        "price DOUBLE, discount DOUBLE) RETURNS BIGINT"
        " RETURN CAST(round(price * (1 - discount) * 100) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION qty_bracket(qty DOUBLE)"
        " RETURNS INT RETURN CASE WHEN qty < 10 THEN 0"
        " WHEN qty < 30 THEN 1 ELSE 2 END"
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "v_lineitem_sqludf"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(net_price_fx(l_extendedprice, l_discount))
                    AS BIGINT) AS net_fx,
               CAST(sum(qty_bracket(l_quantity)) AS BIGINT) AS bracket_sum
        FROM v_lineitem_sqludf
        GROUP BY l_returnflag
        """
    )


# ---------------------------------------------------------------------------
# mapInArrow: zero-copy Arrow-batch kernel (round 9 — completes the
# UDF API ladder: row UDF -> Arrow UDF -> pandas_udf -> mapInPandas ->
# mapInArrow -> UDTF -> SQL UDF)
# ---------------------------------------------------------------------------


@register(
    "q_arrow_scan_stats",
    oracle="""
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(octet_length(encode(text))) AS BIGINT) AS n_bytes,
               CAST(sum(len(regexp_split_to_array(text, '[ \t\n]+')) - 1)
                    AS BIGINT) AS n_ws_runs
        FROM documents
        GROUP BY source
    """,
    doc="mapInArrow surface: per-batch byte/whitespace statistics"
    " computed with pyarrow.compute kernels directly on the Arrow"
    " RecordBatch — NO pandas materialization, the zero-copy rung of"
    " the Python-UDF ladder (vs mapInPandas' Arrow->pandas->Arrow"
    " round trip; for byte-shuffling kernels like this the conversion"
    " IS the cost). The per-batch partials then partial-aggregate"
    " per source, so the Python boundary moves one narrow struct per"
    " batch, not per row. Whitespace runs count via"
    " count_substring_regex == split-segments-minus-one, mirrored in"
    " the oracle; byte length is binary_length on the raw buffer.",
)
def q_arrow_scan_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    out_schema = StructType(
        [
            StructField("source", StringType()),
            StructField("n_docs", LongType()),
            StructField("n_bytes", LongType()),
            StructField("n_ws_runs", LongType()),
        ]
    )

    def batch_stats(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            tbl = pa.table(
                {"source": batch.column(batch.schema.get_field_index("source")),
                 "text": batch.column(batch.schema.get_field_index("text"))}
            )
            nbytes = pc.binary_length(
                pc.cast(tbl.column("text"), pa.binary())
            )
            ws = pc.count_substring_regex(
                tbl.column("text"), "[ \t\n]+"
            )
            grouped = pa.table(
                {
                    "source": tbl.column("source"),
                    "one": pa.array([1] * tbl.num_rows, pa.int64())
                    if tbl.num_rows
                    else pa.array([], pa.int64()),
                    "nb": pc.cast(nbytes, pa.int64()),
                    "ws": pc.cast(ws, pa.int64()),
                }
            ).group_by("source").aggregate(
                [("one", "sum"), ("nb", "sum"), ("ws", "sum")]
            )
            yield pa.RecordBatch.from_arrays(
                [
                    grouped.column("source").combine_chunks(),
                    pc.cast(
                        grouped.column("one_sum"), pa.int64()
                    ).combine_chunks(),
                    pc.cast(
                        grouped.column("nb_sum"), pa.int64()
                    ).combine_chunks(),
                    pc.cast(
                        grouped.column("ws_sum"), pa.int64()
                    ).combine_chunks(),
                ],
                schema=pa.schema(
                    [
                        ("source", pa.string()),
                        ("n_docs", pa.int64()),
                        ("n_bytes", pa.int64()),
                        ("n_ws_runs", pa.int64()),
                    ]
                ),
            )

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    partials = docs.mapInArrow(batch_stats, schema=out_schema)
    return partials.groupBy("source").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("n_bytes").cast("bigint").alias("n_bytes"),
        F.sum("n_ws_runs").cast("bigint").alias("n_ws_runs"),
    )
