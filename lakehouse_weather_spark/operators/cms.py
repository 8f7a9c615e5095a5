"""Count-min sketch (CMS): sublinear frequency estimation, fully in SQL.

The classic streaming sketch (Cormode & Muthukrishnan 2005) as a
DataFrame program: D independent md5-derived hash rows x W buckets;
``count`` into (d, bucket) cells; estimate(word) = min over d of its D
cells. The sketch table is MERGEABLE — cells sum across partitions,
days, or clusters (groupBy already does the map-side partial), which is
what makes it the 100 TB answer for "approximate counts of everything":
the shuffle carries at most D*W rows per partition no matter how many
distinct keys the data has (vs exact word-count whose shuffle grows
with the vocabulary).

Both engines compute the identical sketch from the identical hash
(md5-prefix -> bigint, shared idiom with sampling.py/textops.py), so
the estimates — normally "approximate" — are bit-reproducible and
oracle-checkable. CMS never underestimates: est >= true always, with
overestimates bounded by collisions (W=1024 against a ~few-thousand-word
fixture vocabulary keeps them visible but small; tests assert the
one-sided error invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table

CMS_DEPTH = 4
CMS_WIDTH = 1024
TOP_K = 20


def _spark_bucket(d_col: str, word_col: str) -> str:
    """Spark SQL expr: md5-derived CMS bucket for (depth, word)."""
    return (
        f"pmod(cast(conv(substr(md5(concat('cms', cast({d_col} as string),"
        f" '|', {word_col})), 1, 15), 16, 10) as bigint), {CMS_WIDTH})"
    )


def _duck_bucket(d_col: str, word_col: str) -> str:
    """DuckDB expr for the same bucket (md5 prefix is non-negative)."""
    return (
        f"CAST(('0x' || substr(md5('cms' || CAST({d_col} AS VARCHAR)"
        f" || '|' || {word_col}), 1, 15)) AS BIGINT) % {CMS_WIDTH}"
    )


def cms_sketch(tokens: DataFrame, token_col: str = "word") -> DataFrame:
    """Build the (d, bucket, c) sketch table from a token column.

    The result has at most CMS_DEPTH * CMS_WIDTH rows and merges with
    another sketch by ``union -> groupBy(d, bucket) -> sum(c)``.
    """
    depths = F.explode(
        F.array(*[F.lit(d) for d in range(CMS_DEPTH)])
    ).alias("d")
    return (
        tokens.select(F.col(token_col).alias("word"), depths)
        .select("word", "d", F.expr(_spark_bucket("d", "word")).alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(sketch: DataFrame, words: DataFrame) -> DataFrame:
    """Probe the sketch: min over depths of the word's cells.

    ``words`` must have a ``word`` column; other columns pass through.
    """
    depths = F.explode(
        F.array(*[F.lit(d) for d in range(CMS_DEPTH)])
    ).alias("d")
    probe = words.select("*", depths).withColumn(
        "bucket", F.expr(_spark_bucket("d", "word"))
    )
    passthrough = [c for c in words.columns]
    return (
        F.broadcast(probe)
        .join(sketch, ["d", "bucket"])
        .groupBy(*passthrough)
        .agg(F.min("c").alias("est_cnt"))
    )


@register(
    "q_countmin_words",
    oracle=f"""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        ),
        dep AS (SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS d),
        sketch AS (
            SELECT d, {_duck_bucket('d', 'word')} AS bucket, count(*) AS c
            FROM tok CROSS JOIN dep
            GROUP BY 1, 2
        ),
        topw AS (
            SELECT word, count(*) AS true_cnt
            FROM tok GROUP BY word
            ORDER BY true_cnt DESC, word LIMIT {TOP_K}
        ),
        probe AS (
            SELECT word, true_cnt, d, {_duck_bucket('d', 'word')} AS bucket
            FROM topw CROSS JOIN dep
        )
        SELECT word, true_cnt, min(c) AS est_cnt
        FROM probe JOIN sketch USING (d, bucket)
        GROUP BY word, true_cnt
    """,
    doc="Count-min sketch frequency estimation, oracle-exact: build a"
    f" {CMS_DEPTH}x{CMS_WIDTH} cell table with shared md5 hashing, probe"
    f" the exact top-{TOP_K} words, estimate = min over depth cells."
    " The sketch shuffle is bounded by D*W cells regardless of"
    " vocabulary size — the sublinear alternative to exact word-count"
    " at 100 TB — and cells are mergeable partials (sum) across any"
    " partitioning of the corpus. est_cnt >= true_cnt by construction"
    " (one-sided CMS error); both engines derive identical buckets so"
    " the estimates match bit-for-bit.",
)
def q_countmin_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_weather_spark.operators.dedup import _checkpoint

    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(F.split("text", " ")).alias("word"))
    # aggregate BEFORE hashing (guide §2.3): one word-count pass feeds
    # both the sketch and the exact top-k probe, so the D md5 bucket
    # hashes are computed per DISTINCT word instead of per token
    # occurrence (fixture: ~4e5 tokens x D -> |vocab| x D evals) and
    # the token explode runs once instead of twice. Cell values are
    # unchanged: sum of per-word counts == count of tokens per cell.
    # The vocab table is |vocab| rows — a cheap checkpoint that stops
    # the two consumers re-running the explode+agg subtree.
    wc = _checkpoint(
        tokens.groupBy("word").agg(F.count(F.lit(1)).alias("true_cnt")),
        eager=False,
    )
    depths = F.explode(
        F.array(*[F.lit(d) for d in range(CMS_DEPTH)])
    ).alias("d")
    sketch = (
        wc.select("word", "true_cnt", depths)
        .select(
            "true_cnt", "d", F.expr(_spark_bucket("d", "word")).alias("bucket")
        )
        .groupBy("d", "bucket")
        .agg(F.sum("true_cnt").alias("c"))
    )
    topw = (
        wc.orderBy(F.desc("true_cnt"), F.asc("word"))
        .limit(TOP_K)
    )
    return cms_estimate(sketch, topw)
