"""Dataset-mixture planning and batching-efficiency operators
(training-data closure).

Pretraining corpora are assembled to TARGET mixture weights (DoReMi /
The Pile style): given per-language availability and target shares, the
planner finds the largest corpus the weights admit and the per-language
take. Batching then groups documents into length buckets to bound
padding waste. CCNet (Wenzek et al. 2020) closes the loop by splitting
each language into head/middle/tail perplexity terciles so curation can
sample quality-stratified.

All three are tiny-aggregate arithmetic over one corpus scan — the
actual work is one partial agg (mixture, buckets) or one per-lang rank
window over doc-level stats (terciles); everything stays integer until
one final division, so the DuckDB oracles hash-match.

The reference ingests one source with no mixing/batching layer at all
(its whole pipeline is the bronze/silver/gold DAG chain,
``dags/bronze.py``/``silver.py``/``gold.py``); this module is that
missing assembly stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_weather_spark.operators.textops import q_unigram_surprisal
from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table

# Target mixture in basis points (sums to 10000): en-heavy with a
# long-tail floor, the standard pretraining shape.
MIX_BP = {"en": 5000, "zh": 2000, "de": 1000, "fr": 1000, "es": 1000}
_BP_DEN = 10_000

# Length-bucket caps (chars): docs pad up to their bucket cap.
LEN_BUCKETS = (128, 256, 512, 1024, 4096)


def _bucket_case(col: str) -> str:
    """CASE ladder mapping a length to its bucket cap (same text in
    Spark SQL and DuckDB)."""
    whens = " ".join(
        f"WHEN {col} <= {cap} THEN {cap}" for cap in LEN_BUCKETS
    )
    return f"CASE {whens} ELSE {LEN_BUCKETS[-1]} END"


@register(
    "q_mixture_plan",
    oracle=f"""
        WITH avail AS (
            SELECT lang, CAST(count(*) AS BIGINT) AS avail_docs,
                   CAST(sum(n_chars) AS BIGINT) AS avail_chars
            FROM documents GROUP BY lang
        ),
        t AS (
            SELECT lang, avail_docs, avail_chars,
                   CASE lang
                       {" ".join(f"WHEN '{k}' THEN {v}" for k, v in MIX_BP.items())}
                       ELSE 0 END AS target_bp
            FROM avail
        ),
        cap AS (
            SELECT min(avail_chars * {_BP_DEN} // target_bp) AS c_star
            FROM t WHERE target_bp > 0
        )
        SELECT t.lang, t.avail_docs, t.avail_chars,
               CAST(t.target_bp AS BIGINT) AS target_bp,
               CAST(cap.c_star * t.target_bp // {_BP_DEN} AS BIGINT)
                   AS planned_chars,
               CAST(cap.c_star * t.target_bp // {_BP_DEN} AS DOUBLE)
                   / t.avail_chars AS utilization
        FROM t CROSS JOIN cap
        WHERE t.target_bp > 0
    """,
    doc="Dataset-mixture planning: given target language shares (basis"
    " points) and per-language availability, the largest corpus the"
    " weights admit is C* = min over langs of avail*10000//target —"
    " the binding-constraint computation every mixture assembly (Pile/"
    " DoReMi style) runs before sampling. One partial agg per language"
    " + a 1-row broadcast of the binding cap; all integer floor"
    " arithmetic until the final utilization division, bit-identical"
    " to the oracle.",
)
def q_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    avail = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("avail_docs"),
        F.sum("n_chars").cast("bigint").alias("avail_chars"),
    )
    target = F.expr(
        "CASE lang "
        + " ".join(f"WHEN '{k}' THEN {v}" for k, v in MIX_BP.items())
        + " ELSE 0 END"
    ).cast("bigint")
    t = avail.withColumn("target_bp", target).filter(F.col("target_bp") > 0)
    cap = t.agg(
        F.min(
            F.expr(f"avail_chars * {_BP_DEN} DIV target_bp")
        ).alias("c_star")
    )
    planned = F.expr(f"c_star * target_bp DIV {_BP_DEN}").cast("bigint")
    return t.crossJoin(F.broadcast(cap)).select(
        "lang",
        "avail_docs",
        "avail_chars",
        "target_bp",
        planned.alias("planned_chars"),
        (planned.cast("double") / F.col("avail_chars")).alias("utilization"),
    )


@register(
    "q_length_buckets",
    oracle=f"""
        SELECT {_bucket_case("n_chars")} AS bucket_cap,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(({_bucket_case("n_chars")}) * count(*) - sum(n_chars)
                    AS BIGINT) AS padding_chars,
               CAST(({_bucket_case("n_chars")}) * count(*) - sum(n_chars)
                    AS DOUBLE)
                   / (({_bucket_case("n_chars")}) * count(*))
                   AS padding_frac
        FROM documents
        GROUP BY 1
    """,
    doc="Length-bucket batching audit: docs group into power-of-two"
    " char buckets and each bucket reports its padding waste (cap *"
    " n_docs - payload) — the batching-efficiency lens that decides"
    " bucket boundaries for fixed-shape training batches. A single"
    " partial agg over the scan (the CASE ladder is the grouping"
    " key); output is |buckets| rows at any corpus size.",
)
def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cap = F.expr(_bucket_case("n_chars")).cast("bigint")
    g = docs.groupBy(cap.alias("bucket_cap")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
    pad = F.col("bucket_cap") * F.col("n_docs") - F.col("total_chars")
    return g.select(
        "bucket_cap",
        "n_docs",
        "total_chars",
        pad.cast("bigint").alias("padding_chars"),
        (
            pad.cast("double") / (F.col("bucket_cap") * F.col("n_docs"))
        ).alias("padding_frac"),
    )


@register(
    "q_ccnet_buckets",
    oracle="""
        WITH words AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents
        ),
        freq AS (SELECT word, count(*) AS c FROM words GROUP BY word),
        ranks AS (
            SELECT word,
                   CAST(row_number() OVER (ORDER BY c DESC, word)
                        AS BIGINT) AS rnk
            FROM freq
        ),
        surp AS (
            SELECT w.doc_id,
                   CAST(sum(r.rnk) AS DOUBLE) / count(*) AS mean_word_rank
            FROM words w JOIN ranks r USING (word)
            GROUP BY w.doc_id
        ),
        tiled AS (
            SELECT d.doc_id, d.lang, s.mean_word_rank,
                   ntile(3) OVER (PARTITION BY d.lang
                                  ORDER BY s.mean_word_rank, d.doc_id)
                       AS tercile
            FROM documents d JOIN surp s USING (doc_id)
        )
        SELECT doc_id, lang, mean_word_rank,
               CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM tiled
    """,
    doc="CCNet head/middle/tail quality bucketing (Wenzek et al. 2020):"
    " each language splits into terciles of the unigram-surprisal proxy"
    " (low mean word rank = stereotypical 'head' text), the stratified"
    " sampling key CCNet-style curation draws from. The tercile is an"
    " ntile window per language over DOC-level stats (corpus-sized"
    " input never enters the window; at real scale the exact ntile"
    " swaps for approx-quantile cuts broadcast back, same output"
    " contract). Deterministic: rank-based surprisal (no libm), ntile"
    " over a total (rank, doc_id) order.",
)
def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    surp = q_unigram_surprisal(spark, sf_dir).select(
        "doc_id", "mean_word_rank"
    )
    tiled = docs.select("doc_id", "lang").join(surp, "doc_id").withColumn(
        "tercile",
        F.ntile(3).over(
            Window.partitionBy("lang").orderBy("mean_word_rank", "doc_id")
        ),
    )
    return tiled.select(
        "doc_id",
        "lang",
        "mean_word_rank",
        F.when(F.col("tercile") == 1, "head")
        .when(F.col("tercile") == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


# --- Neyman sample allocation ----------------------------------------

# Eval-sample budget to allocate across sources.
NEYMAN_BUDGET = 1_000
# Fixed-point scale for the per-stratum standard deviation.
_SD_S = 100


@register(
    "q_neyman_allocation",
    oracle=f"""
        WITH mom AS (
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS s,
                   CAST(sum(CAST(n_chars AS HUGEINT) * n_chars)
                        AS DOUBLE) AS q
            FROM documents GROUP BY source
        ),
        sd AS (
            SELECT source, n_docs,
                   CASE WHEN n_docs < 2 THEN CAST(0 AS BIGINT)
                        ELSE CAST(floor(sqrt((q - (CAST(s AS DOUBLE)
                            * CAST(s AS DOUBLE)) / n_docs)
                            / (n_docs - 1)) * {_SD_S}) AS BIGINT)
                   END AS sd_fx
            FROM mom
        ),
        wt0 AS (
            SELECT source, n_docs, sd_fx,
                   n_docs * sd_fx AS w,
                   CAST(sum(n_docs * sd_fx) OVER () AS BIGINT) AS w_tot,
                   CAST(sum(n_docs) OVER () AS BIGINT) AS n_tot
            FROM sd
        ),
        wt AS (
            SELECT source, n_docs, sd_fx,
                   CASE WHEN w_tot = 0 THEN n_docs ELSE w END AS w,
                   CASE WHEN w_tot = 0 THEN n_tot ELSE w_tot END AS w_tot
            FROM wt0
        ),
        base AS (
            SELECT source, n_docs, sd_fx, w, w_tot,
                   ({NEYMAN_BUDGET} * w) // w_tot AS alloc0,
                   ({NEYMAN_BUDGET} * w) % w_tot AS rem,
                   CAST(sum(({NEYMAN_BUDGET} * w) // w_tot) OVER ()
                        AS BIGINT) AS base_tot
            FROM wt
        ),
        ranked AS (
            SELECT *, row_number() OVER (ORDER BY rem DESC, source ASC)
                       AS rk
            FROM base
        )
        SELECT source, n_docs, sd_fx,
               CAST(alloc0 + CASE WHEN rk <= {NEYMAN_BUDGET} - base_tot
                                  THEN 1 ELSE 0 END AS BIGINT) AS alloc
        FROM ranked
    """,
    doc="Neyman optimal sample allocation: split a 1000-doc eval"
    " budget across sources proportional to N_h x sd_h(n_chars) —"
    " the minimum-variance stratified design (Neyman 1934), the"
    " principled alternative to proportional sampling when strata"
    " differ in spread. Per-stratum variance comes from exact integer"
    " moments (hugeint/decimal sums of squares); the sd enters as a"
    " FIXED-POINT floor (one mirrored IEEE sqrt), so the weights are"
    " integers and the largest-remainder rounding — which makes the"
    " allocations sum to the budget EXACTLY — is pure integer"
    " arithmetic with a deterministic tie-break. One scan, one"
    " partial agg; every window runs over the |sources|-row table.",
)
def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mom = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("s"),
        F.expr(
            "cast(sum(cast(n_chars as decimal(19, 0))"
            " * cast(n_chars as decimal(19, 0))) as double)"
        ).alias("q"),
    )
    # single-doc strata have undefined variance: weight them 0 rather
    # than dividing by (n - 1) = 0 (mirrored in the oracle)
    sd = mom.select(
        "source",
        "n_docs",
        F.expr(
            "case when n_docs < 2 then cast(0 as bigint)"
            " else cast(floor(sqrt((q - (cast(s as double)"
            " * cast(s as double))"
            f" / n_docs) / (n_docs - 1)) * {_SD_S}) as bigint) end"
        ).alias("sd_fx"),
    )
    # all remaining windows run over the |sources|-row weight table
    wall = Window.partitionBy()
    # if EVERY stratum has zero spread (all single-doc or constant),
    # Neyman weights vanish: fall back to proportional-by-count
    # allocation rather than dividing by a zero total (mirrored)
    wt0 = (
        sd.select(
            "source",
            "n_docs",
            "sd_fx",
            (F.col("n_docs") * F.col("sd_fx")).alias("w"),
        )
        .withColumn("w_tot", F.sum("w").over(wall).cast("bigint"))
        .withColumn("n_tot", F.sum("n_docs").over(wall).cast("bigint"))
    )
    wt = wt0.select(
        "source",
        "n_docs",
        "sd_fx",
        F.expr("case when w_tot = 0 then n_docs else w end").alias("w"),
        F.expr("case when w_tot = 0 then n_tot else w_tot end").alias(
            "w_tot"
        ),
    )
    base = (
        wt.withColumn("alloc0", F.expr(f"({NEYMAN_BUDGET} * w) div w_tot"))
        .withColumn("rem", F.expr(f"({NEYMAN_BUDGET} * w) % w_tot"))
        .withColumn(
            "base_tot", F.sum("alloc0").over(wall).cast("bigint")
        )
    )
    ranked = base.withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.desc("rem"), F.asc("source"))
        ),
    )
    return ranked.select(
        "source",
        "n_docs",
        "sd_fx",
        F.expr(
            f"cast(alloc0 + case when rk <= {NEYMAN_BUDGET} - base_tot"
            " then 1 else 0 end as bigint)"
        ).alias("alloc"),
    )


@register(
    "q_hhi_concentration",
    oracle="""
        WITH cnt AS (
            SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS n_chars
            FROM documents GROUP BY lang, source
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_sources,
               CAST(sum(n_docs) AS BIGINT) AS total_docs,
               max(n_docs) AS max_source_docs,
               CAST(sum(n_docs * n_docs) AS BIGINT) AS sum_sq_docs,
               CAST(CAST(sum(n_docs * n_docs) AS BIGINT) AS DOUBLE)
                   / CAST(CAST(sum(n_docs) AS BIGINT)
                          * CAST(sum(n_docs) AS BIGINT) AS DOUBLE)
                   AS hhi_docs,
               CAST(CAST(sum(n_chars * n_chars) AS BIGINT) AS DOUBLE)
                   / CAST(CAST(sum(n_chars) AS BIGINT)
                          * CAST(sum(n_chars) AS BIGINT) AS DOUBLE)
                   AS hhi_chars
        FROM cnt GROUP BY lang
    """,
    doc="Herfindahl-Hirschman source-concentration index per language:"
    " HHI = sum over sources of (share)^2, computed on both document"
    " counts and character volume — the one-number answer to 'is one"
    " domain dominating this slice of the corpus' (HHI -> 1: a single"
    " source; -> 1/n_sources: perfectly balanced), which every corpus"
    " card reports next to its mixture weights. Division-free until"
    " the end: sum(n_s^2)/N^2 is a single IEEE divide of exact int64"
    " sums, so rows hash-match. One groupBy to per-(lang, source)"
    " counts (map-side partial agg), then an alphabet-sized rollup —"
    " constant-size output at any corpus scale.",
)
def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cnt = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
    )
    sum_docs = F.sum("n_docs").cast("bigint")
    sum_chars = F.sum("n_chars").cast("bigint")
    sq_docs = F.sum(F.col("n_docs") * F.col("n_docs")).cast("bigint")
    sq_chars = F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint")
    return cnt.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        sum_docs.alias("total_docs"),
        F.max("n_docs").alias("max_source_docs"),
        sq_docs.alias("sum_sq_docs"),
        (
            sq_docs.cast("double")
            / (sum_docs * sum_docs).cast("double")
        ).alias("hhi_docs"),
        (
            sq_chars.cast("double")
            / (sum_chars * sum_chars).cast("double")
        ).alias("hhi_chars"),
    )
