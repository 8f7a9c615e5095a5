"""Benchmark decontamination + containment dedup (training-data closure).

Two corpus-hygiene operators every pretraining pipeline runs and the
reference lacks entirely:

- **q_decontaminate** — flag training documents that share any long
  word n-gram (n=8 here; GPT-3 appendix-C style used 13-grams) with a
  held-out evaluation set. The eval set is always tiny relative to the
  corpus, so its distinct n-gram hashes are a BROADCAST build side: at
  100 TB the corpus scan streams once against an in-memory hash set —
  no shuffle of corpus shingles at all.
- **q_containment** — asymmetric near-dup detection: containment
  C(A,B) = |sh(A) ∩ sh(B)| / min(|sh(A)|,|sh(B)|) catches a short doc
  embedded inside a longer one, which symmetric Jaccard dilutes below
  threshold. Reuses the df-capped inverted-index pair stream from
  operators/dedup.py (one wide shuffle, no self-join, bounded bucket
  fan-out — see DF_CAP there).

The holdout split is deterministic (doc_id % 20 == 0 plays the eval
set) so both engines and every run see the same contamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.operators.dedup import (
    _minhash_pairs_cte,
    _DUCK_CAPPED_CTE,
    _DUCK_SHINGLES_CTE,
    _SPARK_H,
    _capped_shingle_buckets,
)
from lakehouse_weather_spark.operators.sampling import _DUCK_H100
from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table

DECON_NGRAM = 8  # words per decontamination shingle
CONTAINMENT_MIN = 0.5

_DUCK_DECON_CTE = f"""
    dsh AS (
        SELECT DISTINCT doc_id,
               CAST(('0x' || substr(md5(
                   array_to_string(words[i : i + {DECON_NGRAM - 1}], ' ')
               ), 1, 15)) AS BIGINT) AS h
        FROM (
            SELECT doc_id, string_split(text, ' ') AS words,
                   unnest(generate_series(
                       1, greatest(len(string_split(text, ' '))
                                   - {DECON_NGRAM - 1}, 1)
                   )) AS i
            FROM documents
        )
    )
"""


def _decon_shingle_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_id, h) 8-word-gram hashes; same narrow
    array_distinct-before-explode shape as the 3-gram builder in
    operators/dedup.py (hash ints, not strings, as join currency)."""
    docs = load_table(spark, sf_dir, "documents")
    # file count as the split-count proxy (same contract as
    # tables.fan_out); df.rdd.getNumPartitions() forced a full
    # plan->RDD physical compile just to read a partition count
    par = min(spark.sparkContext.defaultParallelism, 8)
    if len(docs.inputFiles()) < par:
        docs = docs.repartition(par, "doc_id")
    w = "split(text, ' ')"
    grams = (
        f"transform(sequence(1, greatest(size({w}) - {DECON_NGRAM - 1}, 1)),"
        f" i -> concat_ws(' ', slice({w}, i, {DECON_NGRAM})))"
    )
    hashes = F.expr(
        f"array_distinct(transform({grams}, s -> {_SPARK_H.format(expr='s')}))"
    )
    return docs.select("doc_id", F.explode(hashes).alias("h"))


@register(
    "q_decontaminate",
    oracle=f"""
        WITH {_DUCK_DECON_CTE},
        bench AS (SELECT DISTINCT h FROM dsh WHERE doc_id % 20 = 0),
        corpus AS (SELECT * FROM dsh WHERE doc_id % 20 <> 0)
        SELECT corpus.doc_id,
               CAST(count(*) AS BIGINT) AS n_shared_ngrams
        FROM corpus JOIN bench USING (h)
        GROUP BY corpus.doc_id
    """,
    doc="Benchmark decontamination: corpus docs sharing any 8-word"
    " n-gram with the deterministic holdout (doc_id %% 20 == 0)."
    " The holdout's distinct n-gram hashes broadcast (eval sets are"
    " tiny); the corpus side streams through the broadcast join and"
    " aggregates hits per doc — zero corpus-side shuffle before the"
    " final per-doc count. On the fixtures this flags exactly the"
    " planted near-dup docs that straddle the split.",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _decon_shingle_hashes(spark, sf_dir)
    bench = sh.filter(F.col("doc_id") % 20 == 0).select("h").distinct()
    corpus = sh.filter(F.col("doc_id") % 20 != 0)
    return (
        corpus.join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )


@register(
    "q_containment",
    oracle=f"""
        WITH {_DUCK_SHINGLES_CTE},
        {_DUCK_CAPPED_CTE}
        SELECT doc_a, doc_b,
               CAST(i AS DOUBLE) / least(sa.n, sb.n) AS containment
        FROM inter
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE CAST(i AS DOUBLE) / least(sa.n, sb.n) >= {CONTAINMENT_MIN}
    """,
    doc="Asymmetric containment near-dup: |intersection| / min(set"
    " sizes) over df-capped word-3-gram shingles, threshold 0.5 —"
    " catches subset-duplication (quoted/embedded docs) that symmetric"
    " Jaccard dilutes. Same single-wide-shuffle inverted-index pair"
    " stream as q_ngram_jaccard (operators/dedup.py), different final"
    " ratio.",
)
def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    buckets = _capped_shingle_buckets(spark, sf_dir)
    pair_expr = F.expr(
        "flatten(transform(ids, (x, i) ->"
        " transform(slice(ids, i + 2, size(ids)),"
        " y -> struct(x AS doc_a, y AS doc_b))))"
    )
    inter = (
        buckets.filter(F.size("ids") >= 2)
        .select(F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sizes = (
        buckets.select(F.explode("ids").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    containment = F.col("i").cast("double") / F.least("na", "nb")
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", containment.alias("containment"))
        .filter(F.col("containment") >= CONTAINMENT_MIN)
    )


# ---------------------------------------------------------------------------
# Cross-split leakage audit
# ---------------------------------------------------------------------------


@register(
    "q_leakage_pairs",
    oracle=f"""
        WITH {_minhash_pairs_cte()},
        assign AS (
            SELECT doc_id,
                   CASE WHEN ({_DUCK_H100}) < 80 THEN 'train'
                        WHEN ({_DUCK_H100}) < 90 THEN 'valid'
                        ELSE 'test' END AS split
            FROM documents
        )
        SELECT least(a.split, b.split) AS split_a,
               greatest(a.split, b.split) AS split_b,
               CAST(count(*) AS BIGINT) AS n_neardup_pairs
        FROM mpairs p
        JOIN assign a ON a.doc_id = p.doc_a
        JOIN assign b ON b.doc_id = p.doc_b
        WHERE a.split <> b.split
        GROUP BY 1, 2
    """,
    doc="Train/eval leakage audit: MinHash near-duplicate pairs whose"
    " members landed in DIFFERENT splits of q_split_assign, counted"
    " per split-pair — the check that catches the classic ordering"
    " bug (split before dedup) where an eval doc's near-twin sits in"
    " train and inflates every metric. Composition of two verified"
    " stages: the banded-LSH pair stream joins the hash-split"
    " assignment (two broadcast-able id->split joins), emitting a"
    " <= 3-row scorecard. A healthy pipeline drives this to zero by"
    " deduping FIRST (q_dedup_keep_best) or splitting by CLUSTER"
    " (q_dedup_clusters ids as the split key) instead of by doc.",
)
def q_leakage_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_weather_spark.operators.dedup import minhash_pairs_cached
    from lakehouse_weather_spark.operators.sampling import q_split_assign

    pairs = minhash_pairs_cached(spark, sf_dir)
    assign = q_split_assign(spark, sf_dir)
    a = assign.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")
    )
    b = assign.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")
    )
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .filter(F.col("sa") != F.col("sb"))
        .groupBy(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_neardup_pairs"))
    )
