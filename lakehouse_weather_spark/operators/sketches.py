"""Mergeable-sketch aggregation (100 TB closure beyond SURVEY §2.4).

At cluster scale, "count distinct" is the canonical shuffle-killer:
exact ``COUNT(DISTINCT x)`` re-shuffles raw values, while a *mergeable
sketch* reduces each partition to a small binary summary that combines
associatively — the map-side partial carries kilobytes, not rows, and
the same artifact can be stored per-partition and re-merged later
(incremental rollups, cross-table overlap) without touching the data
again. Spark 4 ships two built-in mergeable families:

- **Roaring-style bitmaps** (``bitmap_construct_agg`` /
  ``bitmap_or_agg`` / ``bitmap_count``): EXACT distinct counts of
  integral keys, so ``q_bitmap_distinct`` is fully oracle-checkable
  against ``COUNT(DISTINCT ...)``.
- **Apache DataSketches HLL** (``hll_sketch_agg`` / ``hll_union_agg`` /
  ``hll_sketch_estimate``): approximate but fixed-size for arbitrary
  types. Estimates are implementation-defined, so ``q_hll_distinct``
  is registered rows-only; accuracy (<5% vs exact) and merge
  consistency (union-of-partials vs direct sketch) are asserted in
  tests/test_sketches.py.

The reference has no sketch surface (its distinct counts are Python
``set`` scans over collected lists, e.g. pandas ``drop_duplicates`` in
``dags/utils/chunks_data.py``); these operators are the scale-out
replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import fan_out, load_table

# lgConfigK for every HLL sketch in this module. 12 -> 2^12 registers
# (~2.5 KB dense), relative error ~1.6%/sqrt(2^12) ~= 2.5%. Partials
# built with one lgK merge losslessly; mixing lgKs degrades to the
# smaller, so it is pinned here and shared by build + union sites.
HLL_LG_K = 12


@register(
    "q_bitmap_distinct",
    oracle="""
        SELECT o_orderpriority,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="Exact distinct customers per order priority via mergeable"
    " roaring bitmaps: map bucket/bit-position per key, OR partial"
    " bitmaps per (priority, bucket), then sum popcounts. Two narrow"
    " shuffles of kilobyte bitmaps replace a COUNT(DISTINCT) shuffle of"
    " raw keys; the per-bucket bitmap artifacts are reusable for later"
    " re-merges. Oracle-exact (bitmaps are not approximate).",
)
def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.select(
        "o_orderpriority",
        F.bitmap_bucket_number("o_custkey").alias("bucket"),
        F.bitmap_bit_position("o_custkey").alias("pos"),
    )
    per_bucket = keyed.groupBy("o_orderpriority", "bucket").agg(
        F.bitmap_construct_agg("pos").alias("bm"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return per_bucket.groupBy("o_orderpriority").agg(
        F.sum(F.bitmap_count("bm")).alias("n_customers"),
        F.sum("n_rows").alias("n_orders"),
    )


@register(
    "q_hll_distinct",
    oracle=None,  # DataSketches HLL estimates are impl-defined; DuckDB
    # cannot replay them. Accuracy + mergeability asserted in pytest.
    doc="Approximate distinct order-dates per priority via DataSketches"
    " HLL (lgK=12, ~2.5 KB per sketch), plus an ALL row merged from the"
    " per-priority sketches with hll_union_agg — the store-partials-"
    "then-remerge pattern that makes 100 TB rollups incremental."
    " Rows-only by necessity; tests assert <5% error vs exact and"
    " union-vs-direct consistency.",
)
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    per_prio = orders.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg(F.col("o_custkey"), F.lit(HLL_LG_K)).alias("sk")
    )
    detail = per_prio.select(
        "o_orderpriority",
        F.hll_sketch_estimate("sk").alias("approx_customers"),
    )
    merged = per_prio.agg(
        F.hll_union_agg(F.col("sk")).alias("sk")
    ).select(
        F.lit("ALL").alias("o_orderpriority"),
        F.hll_sketch_estimate("sk").alias("approx_customers"),
    )
    return detail.unionByName(merged)


def hll_partition_sketches(
    df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Reduce ``df`` to one HLL sketch row per ``key_col`` — the
    storable partial artifact. ``hll_merge_estimates`` re-merges any
    union of these (across runs, tables, or partitions) without
    rescanning raw data; pair with the incremental-signature pattern in
    operators/dedup.py (incremental_neardup_candidates).
    """
    return df.groupBy(key_col).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(HLL_LG_K)).alias("hll_sketch")
    )


def hll_merge_estimates(sketches: DataFrame, key_col: str) -> DataFrame:
    """Merge stored sketch partials per key and estimate cardinality."""
    return sketches.groupBy(key_col).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("hll_sketch"))
        ).alias("approx_ndv")
    )


# ---------------------------------------------------------------------------
# Bounded-memory heavy hitters (Misra-Gries candidates + exact recount)
# ---------------------------------------------------------------------------

HH_K = 50  # summary size; reported items have frequency > N/HH_K


@register(
    "q_heavy_hitters",
    oracle=f"""
        WITH w AS (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        ),
        tot AS (SELECT count(*) AS n FROM w)
        SELECT word, CAST(count(*) AS BIGINT) AS n_occurrences
        FROM w
        GROUP BY word
        HAVING count(*) > (SELECT n FROM tot) / {HH_K}.0
    """,
    doc=f"Exact frequency-threshold heavy hitters (words with global"
    f" frequency > N/{HH_K}) via the two-pass bounded-memory pattern:"
    f" pass 1 runs a Misra-Gries summary of size {HH_K} per partition"
    " inside mapInPandas (constant memory regardless of vocabulary"
    " size — the union of per-partition summaries provably contains"
    " every global heavy hitter), pass 2 exactly recounts ONLY the"
    " candidate set via a broadcast semi-join and applies the"
    " threshold. The full groupBy the oracle runs would shuffle the"
    " whole vocabulary; this shuffles candidates only — the standard"
    " trick when the item universe (URLs, tokens, IPs) is unbounded"
    " at 100 TB. Result is exact, so the oracle is a plain HAVING.",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    words = docs.select(F.explode(F.split("text", " ")).alias("word"))

    def mg_candidates(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for w in pdf["word"]:
                if w in counters:
                    counters[w] += 1
                elif len(counters) < HH_K - 1:
                    counters[w] = 1
                else:
                    # decrement-all step: drop zeros
                    dead = []
                    for k in counters:
                        counters[k] -= 1
                        if counters[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del counters[k]
        yield pd.DataFrame({"word": list(counters.keys())})

    candidates = F.broadcast(
        words.mapInPandas(mg_candidates, schema="word string").distinct()
    )
    total = words.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        words.join(candidates, "word", "left_semi")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") > F.col("n_total") / HH_K)
        .select("word", "n_occurrences")
    )


def hll_overlap_estimate(
    df_a: DataFrame, df_b: DataFrame, value_col: str
) -> dict[str, float]:
    """Estimate |A|, |B|, |A∪B| and (by inclusion-exclusion) |A∩B|
    between two keysets from three HLL sketches — the cross-corpus
    overlap probe (shared users, URL overlap between crawls,
    train/eval contamination rate) that at 100 TB replaces a raw
    distinct-join with three kilobyte-sized aggregates. Returns driver-
    side floats because the result is four scalars, not a dataset.
    Accuracy bounds are asserted in tests/test_sketches.py.
    """
    sk = lambda df: F.hll_sketch_agg(F.col(value_col), F.lit(HLL_LG_K))  # noqa: E731
    a = df_a.agg(sk(df_a).alias("s"))
    b = df_b.agg(sk(df_b).alias("s"))
    est = lambda frame: float(  # noqa: E731
        frame.select(F.hll_sketch_estimate("s").alias("e")).collect()[0]["e"]
    )
    na, nb = est(a), est(b)
    union = a.unionByName(b).agg(F.hll_union_agg(F.col("s")).alias("s"))
    nu = est(union)
    return {
        "n_a": na,
        "n_b": nb,
        "n_union": nu,
        "n_intersect": max(0.0, na + nb - nu),
    }


@register(
    "q_type_overlap",
    oracle="""
        WITH pairs AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b
            FROM (SELECT DISTINCT event_type FROM events) a
            JOIN (SELECT DISTINCT event_type FROM events) b
              ON a.event_type < b.event_type
        )
        SELECT p.type_a, p.type_b,
               (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events
                 WHERE event_type = p.type_a) AS n_a,
               (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events
                 WHERE event_type = p.type_b) AS n_b,
               (SELECT CAST(count(DISTINCT e1.user_id) AS BIGINT)
                  FROM events e1
                 WHERE e1.event_type = p.type_a
                   AND EXISTS (SELECT 1 FROM events e2
                                WHERE e2.event_type = p.type_b
                                  AND e2.user_id = e1.user_id))
                   AS n_shared
        FROM pairs p
    """,
    doc="Exact audience-overlap matrix from MERGEABLE bitmap artifacts:"
    " one bitmap per (event_type, bucket) — built in a single pass —"
    " gives |A|, |B| directly and |A union B| by OR-merging, so"
    " |A intersect B| = |A| + |B| - |A union B| by inclusion-exclusion"
    " with NO pairwise join over raw users. The oracle recomputes each"
    " overlap the expensive way (distinct + EXISTS); at 100 TB the"
    " bitmap route touches the event log once and the k^2 pair math"
    " runs over kilobyte summaries. Exact (bitmaps, not sketches).",
)
def q_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # one pass: per (type, bucket) bitmap partials
    keyed = ev.select(
        "event_type",
        F.bitmap_bucket_number("user_id").alias("bucket"),
        F.bitmap_bit_position("user_id").alias("pos"),
    )
    per_bucket = keyed.groupBy("event_type", "bucket").agg(
        F.bitmap_construct_agg("pos").alias("bm")
    )
    singles = per_bucket.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).cast("bigint").alias("n")
    )
    # pairwise: union cardinality by OR-merging the two types' bucket
    # bitmaps. Route every (type, bucket, bm) row to every pair the type
    # participates in via two broadcast equi-joins against the tiny pair
    # list, then union-all — so a bucket populated by only ONE of the
    # two types still contributes its bits to n_union (an inner join on
    # bucket would drop such exclusive buckets and overcount n_shared).
    types = per_bucket.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .join(
            types.select(F.col("event_type").alias("type_b")),
            F.col("type_a") < F.col("type_b"),
        )
    )
    contrib_a = per_bucket.join(
        F.broadcast(pairs), F.col("event_type") == F.col("type_a")
    ).select("type_a", "type_b", "bucket", "bm")
    contrib_b = per_bucket.join(
        F.broadcast(pairs), F.col("event_type") == F.col("type_b")
    ).select("type_a", "type_b", "bucket", "bm")
    pair_buckets = (
        contrib_a.unionByName(contrib_b)
        .groupBy("type_a", "type_b", "bucket")
        .agg(F.bitmap_count(F.bitmap_or_agg("bm")).alias("n_bits"))
    )
    union_counts = pair_buckets.groupBy("type_a", "type_b").agg(
        F.sum("n_bits").cast("bigint").alias("n_union")
    )
    sa = singles.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = singles.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        union_counts.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            (F.col("n_a") + F.col("n_b") - F.col("n_union")).alias("n_shared"),
        )
    )


# ---------------------------------------------------------------------------
# Mergeable histogram-quantile sketch vs exact order statistic
# ---------------------------------------------------------------------------

QS_BINS = 64


@register(
    "q_quantile_sketch",
    oracle=f"""
        WITH rng AS (
            SELECT min(value) AS vmin, max(value) AS vmax FROM events
        ),
        binned AS (
            -- degenerate range (all values equal, e.g. one event):
            -- bin 0 on BOTH engines (DuckDB's 0/0 is NULL and its
            -- least() ignores NULLs -> bin 9; Spark's ANSI division
            -- throws — the explicit CASE removes both behaviors)
            SELECT e.event_type,
                   CASE WHEN r.vmax = r.vmin THEN 0
                        ELSE least(CAST(floor((e.value - r.vmin)
                                        * {QS_BINS}
                                        / (r.vmax - r.vmin)) AS BIGINT),
                                   {QS_BINS - 1}) END AS bin
            FROM events e CROSS JOIN rng r
            -- complete cases: NULL value makes a NULL bin, ordered
            -- NULLS LAST here but NULLS FIRST in Spark's cum walk
            WHERE e.value IS NOT NULL
        ),
        hist AS (
            SELECT event_type, bin, CAST(count(*) AS BIGINT) AS c
            FROM binned GROUP BY event_type, bin
        ),
        cum AS (
            SELECT event_type, bin, c,
                   sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
                   sum(c) OVER (PARTITION BY event_type) AS n
            FROM hist
        ),
        est AS (
            SELECT event_type, min(bin) AS med_bin
            FROM cum WHERE cum * 2 >= n GROUP BY event_type
        ),
        fx AS (
            SELECT event_type, event_id,
                   CAST(round(value * 10000) AS BIGINT) AS vfx
            FROM events
            WHERE value IS NOT NULL
        ),
        ranked AS (
            SELECT event_type, vfx,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY vfx, event_id) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM fx
        ),
        exact AS (
            SELECT event_type, CAST(min(vfx) AS DOUBLE) / 10000
                       AS exact_median
            FROM ranked WHERE rn = (n + 1) // 2 GROUP BY event_type
        )
        SELECT x.event_type,
               x.exact_median,
               r.vmin + (e.med_bin + 0.5) * (r.vmax - r.vmin) / {QS_BINS}
                   AS est_median,
               abs(r.vmin + (e.med_bin + 0.5) * (r.vmax - r.vmin)
                       / {QS_BINS} - x.exact_median) AS abs_err
        FROM exact x
        JOIN est e USING (event_type)
        CROSS JOIN rng r
    """,
    doc=f"Histogram-quantile sketch scorecard: a {QS_BINS}-bin"
    " equi-width histogram (the mergeable, constant-memory quantile"
    " sketch — per-partition partial bins combine by addition, the"
    " same partial-agg contract as the bitmap/CMS family) estimates"
    " each event type's median as its crossing bin's midpoint, scored"
    " against the exact rank-statistic median. The scorecard pattern"
    " (estimate JOIN exact truth) matches q_ann_recall/q_lsh_eval:"
    " the approximation ships with its measured error. Bin width"
    " derives from one global min/max broadcast; the exact median"
    " windows per type for oracle parity (at 100 TB that arm swaps"
    " for approx_percentile while the SKETCH arm is already scale-"
    " shaped).",
)
def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # complete cases (mirrored in the oracle): a NULL value makes a
    # NULL bin / NULL vfx, ordered NULLS FIRST here vs DuckDB's LAST
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    rng = ev.agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    )
    binned = ev.crossJoin(F.broadcast(rng)).select(
        "event_type",
        "event_id",
        "value",
        "vmin",
        "vmax",
        # degenerate range -> bin 0 (mirrored in the oracle: DuckDB's
        # 0/0-is-NULL + NULL-ignoring least() would pick bin 9 and
        # Spark's ANSI division would throw)
        F.when(F.col("vmax") == F.col("vmin"), F.lit(0).cast("bigint"))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("value") - F.col("vmin"))
                    * QS_BINS
                    / (F.col("vmax") - F.col("vmin"))
                ).cast("bigint"),
                F.lit(QS_BINS - 1),
            )
        )
        .alias("bin"),
    )
    hist = binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wcum = Window.partitionBy("event_type").orderBy("bin")
    wn = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "bin",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wn).alias("n"),
    )
    est = (
        cum.filter(F.col("cum") * 2 >= F.col("n"))
        .groupBy("event_type")
        .agg(F.min("bin").alias("med_bin"))
    )
    fx = ev.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 10000, 0).cast("bigint").alias("vfx"),
    )
    wr = Window.partitionBy("event_type").orderBy("vfx", "event_id")
    ranked = fx.select(
        "event_type",
        "vfx",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    exact = (
        ranked.filter(F.col("rn") == F.expr("(n + 1) DIV 2"))
        .groupBy("event_type")
        .agg((F.min("vfx").cast("double") / 10000).alias("exact_median"))
    )
    est_val = F.col("vmin") + (F.col("med_bin") + 0.5) * (
        F.col("vmax") - F.col("vmin")
    ) / QS_BINS
    return (
        exact.join(est, "event_type")
        .crossJoin(F.broadcast(rng))
        .select(
            "event_type",
            "exact_median",
            est_val.alias("est_median"),
            F.abs(est_val - F.col("exact_median")).alias("abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# Hand-rolled HyperLogLog with an engine-exact estimate
# ---------------------------------------------------------------------------

HLL_P = 8                      # 2^8 = 256 registers
HLL_M = 1 << HLL_P
_HLL_REST_BITS = 52            # 60-bit md5 hash minus 8 register bits
# alpha_256 * m^2 with alpha = 0.7213 / (1 + 1.079/m) — computed once in
# Python; the SAME literal lands in both engines' final expression.
_HLL_ALPHA_M2 = (0.7213 / (1 + 1.079 / HLL_M)) * HLL_M * HLL_M


@register(
    "q_hll_manual",
    oracle=f"""
        WITH h AS (
            SELECT event_type,
                   CAST(('0x' || substr(md5('hll_' || CAST(user_id AS VARCHAR)),
                                        1, 15)) AS BIGINT) AS hv
            FROM events
        ),
        reg AS (
            SELECT event_type,
                   hv % {HLL_M} AS register,
                   hv // {HLL_M} AS rest
            FROM h
        ),
        rho AS (
            -- register stores MAX rho = 53 - MIN msb (msb 0 for rest=0)
            SELECT event_type, register,
                   CAST(min(CASE WHEN rest = 0 THEN 0
                            ELSE length(bin(rest)) END) AS BIGINT) AS msb
            FROM reg GROUP BY event_type, register
        ),
        z AS (
            -- Z scaled by 2^53: used register adds 2^msb, empty adds 2^53
            SELECT event_type,
                   CAST(sum(CAST(1 AS BIGINT) << msb) AS BIGINT) AS zsum,
                   CAST(count(*) AS BIGINT) AS n_used
            FROM rho GROUP BY event_type
        ),
        exact AS (
            SELECT event_type,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
            FROM events GROUP BY event_type
        )
        SELECT e.event_type, e.n_exact,
               CAST({HLL_M} - z.n_used AS BIGINT) AS n_empty_registers,
               {_HLL_ALPHA_M2!r} * {1 << (_HLL_REST_BITS + 1)}
                   / (z.zsum + ({HLL_M} - z.n_used)
                      * {1 << (_HLL_REST_BITS + 1)}) AS hll_estimate
        FROM exact e JOIN z USING (event_type)
    """,
    doc=f"Hand-rolled HyperLogLog ({HLL_M} registers) whose ESTIMATE is"
    " engine-exact — unlike q_hll_distinct (Spark's DataSketches"
    " binding, rows-only by necessity), every stage here is"
    " deterministic relational algebra: md5-derived 60-bit hashes,"
    " register = h mod m, rho from length(bin(rest)) (identical in"
    " both engines), per-register MAX partial agg (the mergeable-"
    "sketch property: partials combine by max, constant memory), and"
    " the harmonic mean computed on EXACT integers — 2^-rho terms"
    " scaled by 2^53 to int64s (used register adds 2^msb, empty adds"
    " 2^53; max total 256 * 2^53 fits int64),"
    " one final literal-coefficient division. Shipped next to the"
    " exact distinct per type, so the estimate's error is visible in"
    " the result itself.",
)
def q_hll_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hv = F.expr(
        "cast(conv(substr(md5(concat('hll_', cast(user_id as string))),"
        " 1, 15), 16, 10) as bigint)"
    )
    reg = ev.select(
        "event_type",
        "user_id",
        (hv % HLL_M).alias("register"),
        F.expr(
            "cast(conv(substr(md5(concat('hll_', cast(user_id as string))),"
            f" 1, 15), 16, 10) as bigint) DIV {HLL_M}"
        ).alias("rest"),
    )
    # register stores MAX rho = 53 - MIN msb (msb 0 for rest = 0)
    rho = reg.groupBy("event_type", "register").agg(
        F.min(
            F.when(F.col("rest") == 0, 0).otherwise(
                F.length(F.expr("bin(rest)"))
            )
        )
        .cast("bigint")
        .alias("msb")
    )
    z = rho.groupBy("event_type").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(msb AS INT))"))
        .cast("bigint")
        .alias("zsum"),
        F.count(F.lit(1)).cast("bigint").alias("n_used"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_exact")
    )
    full = F.lit(1 << (_HLL_REST_BITS + 1)).cast("bigint")
    return exact.join(z, "event_type").select(
        "event_type",
        "n_exact",
        (F.lit(HLL_M) - F.col("n_used")).cast("bigint").alias(
            "n_empty_registers"
        ),
        (
            F.lit(_HLL_ALPHA_M2)
            * full.cast("double")
            / (
                F.col("zsum")
                + (F.lit(HLL_M) - F.col("n_used")) * full
            ).cast("double")
        ).alias("hll_estimate"),
    )


# --- sliding-window exact distinct -----------------------------------

# Sliding window width in days (inclusive of the end day).
SLIDE_DAYS = 7


@register(
    "q_sliding_distinct",
    oracle=f"""
        WITH days AS (
            SELECT DISTINCT date_trunc('day', ts) AS d FROM events
        )
        SELECT days.d AS window_end,
               CAST(count(DISTINCT date_trunc('day', e.ts)) AS BIGINT)
                   AS n_days,
               CAST(count(DISTINCT e.user_id) AS BIGINT)
                   AS distinct_users
        FROM days JOIN events e
          ON date_trunc('day', e.ts)
             BETWEEN days.d - INTERVAL {SLIDE_DAYS - 1} DAY AND days.d
        GROUP BY days.d
    """,
    doc="EXACT distinct users over a sliding 7-day window ending at"
    " every active day — the metric (weekly actives, daily grain)"
    " that naive COUNT(DISTINCT) recomputes from raw events 7x over."
    " The scale answer: build ONE mergeable roaring-bitmap partial"
    " per (day, bucket), then fan each partial out to the <=7 windows"
    " it serves (a constant-factor explode of kilobyte bitmaps, not"
    " of events) and OR-merge per window. Raw user ids shuffle"
    " exactly once; re-use across overlapping windows is free because"
    " bitmaps merge associatively — the same partials also serve"
    " monthly rollups or backfills without touching events again."
    " Bitmaps are exact, so the DuckDB brute-force range-join oracle"
    " hash-matches.",
)
def q_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.date_trunc("day", "ts").alias("d"),
        F.bitmap_bucket_number("user_id").alias("bucket"),
        F.bitmap_bit_position("user_id").alias("pos"),
    )
    partials = base.groupBy("d", "bucket").agg(
        F.bitmap_construct_agg("pos").alias("bm")
    )
    days = ev.select(F.date_trunc("day", "ts").alias("window_end")).distinct()
    contrib = (
        partials.withColumn(
            "k", F.explode(F.expr(f"sequence(0, {SLIDE_DAYS - 1})"))
        )
        .withColumn("window_end", F.expr("timestampadd(DAY, k, d)"))
        .join(F.broadcast(days), "window_end")
    )
    unions = contrib.groupBy("window_end", "bucket").agg(
        F.bitmap_or_agg("bm").alias("bm")
    )
    counts = unions.groupBy("window_end").agg(
        F.sum(F.bitmap_count("bm")).cast("bigint").alias("distinct_users")
    )
    # contributing-day count per window from the tiny day directory
    day_src = days.select(F.col("window_end").alias("d"))
    n_days = (
        day_src.withColumn(
            "k", F.explode(F.expr(f"sequence(0, {SLIDE_DAYS - 1})"))
        )
        .withColumn("window_end", F.expr("timestampadd(DAY, k, d)"))
        .join(F.broadcast(days), "window_end")
        .groupBy("window_end")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    )
    return counts.join(F.broadcast(n_days), "window_end").select(
        "window_end", "n_days", "distinct_users"
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — engine-exact estimate
# ---------------------------------------------------------------------------

KMV_K = 32
_KMV_HASH_SPACE = 1 << 60  # 60-bit md5-derived hash domain


@register(
    "q_kmv_distinct",
    oracle=f"""
        WITH h AS (
            SELECT DISTINCT event_type,
                   CAST(('0x' || substr(md5('kmv_' || CAST(user_id AS VARCHAR)),
                                        1, 15)) AS BIGINT) AS hv
            FROM events
        ),
        ranked AS (
            SELECT event_type, hv,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY hv) AS rn
            FROM h
        ),
        kth AS (
            SELECT event_type, hv AS kth_min FROM ranked
            WHERE rn = {KMV_K}
        ),
        nh AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_hashes
            FROM h GROUP BY event_type
        ),
        exact AS (
            SELECT event_type,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
            FROM events GROUP BY event_type
        )
        SELECT e.event_type, e.n_exact, n.n_hashes,
               k.kth_min,
               CASE WHEN k.kth_min IS NULL
                    THEN CAST(n.n_hashes AS DOUBLE)
                    ELSE CAST({KMV_K - 1} AS DOUBLE)
                         * {_KMV_HASH_SPACE}
                         / k.kth_min END AS kmv_estimate
        FROM exact e
        JOIN nh n USING (event_type)
        LEFT JOIN kth k USING (event_type)
    """,
    doc=f"KMV (k-minimum-values / bottom-k, Bar-Yossef et al. 2002)"
    f" distinct sketch with k={KMV_K}: hash each user to a 60-bit"
    " md5 value, keep the k smallest distinct hashes per event type,"
    " and estimate NDV as (k-1) * H / h_(k) — the k-th minimum"
    " normalized by the hash domain. The third distinct-count sketch"
    " beside HLL (q_hll_manual) and bitmaps (q_bitmap_distinct), and"
    " the one that also supports set EXPRESSIONS (union = merged"
    " bottom-k, intersection via Jaccard on the combined sketch)."
    " Types with fewer than k distinct hashes fall back to the exact"
    " count (standard KMV rule), exercised by the pathological"
    " fixture's singleton types. (k-1)*2^60 needs only 5 mantissa"
    " bits so the IEEE division is the sole rounding — engine-exact."
    " Scale: the per-type window formalizes the textbook build; the"
    " mergeable form (per-partition bottom-k, merge by re-sorting"
    " k-sized lists) has the same output by construction, and the"
    " exact-NDV column exists here only to make the estimate's error"
    " visible in the result.",
)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hv = F.expr(
        "cast(conv(substr(md5(concat('kmv_', cast(user_id as string))),"
        " 1, 15), 16, 10) as bigint)"
    )
    h = ev.select("event_type", hv.alias("hv")).distinct()
    w = Window.partitionBy("event_type").orderBy("hv")
    kth = (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == KMV_K)
        .select("event_type", F.col("hv").alias("kth_min"))
    )
    nh = h.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hashes")
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("n_exact")
    )
    return (
        exact.join(nh, "event_type")
        .join(F.broadcast(kth), "event_type", "left")
        .select(
            "event_type",
            "n_exact",
            "n_hashes",
            "kth_min",
            F.when(
                F.col("kth_min").isNull(),
                F.col("n_hashes").cast("double"),
            )
            .otherwise(
                F.lit(KMV_K - 1).cast("double")
                * _KMV_HASH_SPACE
                / F.col("kth_min")
            )
            .alias("kmv_estimate"),
        )
    )


# ---------------------------------------------------------------------------
# KMV set algebra: pairwise intersection estimates (theta-sketch style)
# ---------------------------------------------------------------------------


@register(
    "q_kmv_intersect",
    oracle=f"""
        WITH h AS (
            SELECT DISTINCT event_type,
                   CAST(('0x' || substr(md5('kmv_' || CAST(user_id AS VARCHAR)),
                                        1, 15)) AS BIGINT) AS hv
            FROM events
        ),
        tp AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b
            FROM (SELECT DISTINCT event_type FROM h) a
            JOIN (SELECT DISTINCT event_type FROM h) b
              ON a.event_type < b.event_type
        ),
        member AS (
            SELECT tp.type_a, tp.type_b, h.hv,
                   max(CASE WHEN h.event_type = tp.type_a THEN 1 ELSE 0 END)
                       AS in_a,
                   max(CASE WHEN h.event_type = tp.type_b THEN 1 ELSE 0 END)
                       AS in_b
            FROM tp JOIN h
              ON h.event_type = tp.type_a OR h.event_type = tp.type_b
            GROUP BY tp.type_a, tp.type_b, h.hv
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY type_a, type_b
                                         ORDER BY hv) AS rn
            FROM member
        ),
        bottom AS (SELECT * FROM ranked WHERE rn <= {KMV_K}),
        agg AS (
            SELECT type_a, type_b,
                   CAST(count(*) AS BIGINT) AS n_sample,
                   CAST(sum(in_a * in_b) AS BIGINT) AS n_both,
                   max(CASE WHEN rn = {KMV_K} THEN hv END) AS kth_min
            FROM bottom GROUP BY type_a, type_b
        ),
        exact AS (
            SELECT type_a, type_b,
                   CAST(sum(in_a * in_b) AS BIGINT) AS n_exact_inter
            FROM member GROUP BY type_a, type_b
        )
        SELECT a.type_a, a.type_b, e.n_exact_inter, a.n_both,
               CASE WHEN a.kth_min IS NULL
                    THEN CAST(a.n_sample AS DOUBLE)
                    ELSE CAST({KMV_K - 1} AS DOUBLE) * {_KMV_HASH_SPACE}
                         / a.kth_min END AS union_estimate,
               CASE WHEN a.kth_min IS NULL
                    THEN CAST(a.n_both AS DOUBLE)
                    ELSE (CAST(a.n_both AS DOUBLE) / {KMV_K})
                         * (CAST({KMV_K - 1} AS DOUBLE) * {_KMV_HASH_SPACE}
                            / a.kth_min) END AS inter_estimate
        FROM agg a JOIN exact e USING (type_a, type_b)
    """,
    doc=f"KMV/theta-sketch SET ALGEBRA: pairwise audience-overlap"
    f" estimates between event-type user sets. The union's bottom-{KMV_K}"
    " sketch is a uniform sample of A UNION B, so the fraction of its"
    " entries present in both sides estimates the Jaccard, and"
    " intersection = jaccard_hat * union_hat — the composition"
    " theta sketches use (Dasgupta et al., DataSketches). Deterministic"
    " md5 hashing makes the estimate EXACTLY replayable (hash-checked"
    " against DuckDB, with the exact intersection beside it to expose"
    " the error). Scale: per-type bottom-k partials are k-row"
    " mergeables; the pair expansion is over the tiny type directory,"
    " never over raw events. The n_both/k ratio and the (k-1)*H/kth"
    " division are the only float steps (5-bit mantissa numerators"
    " - engine-exact).",
)
def q_kmv_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hv = F.expr(
        "cast(conv(substr(md5(concat('kmv_', cast(user_id as string))),"
        " 1, 15), 16, 10) as bigint)"
    )
    h = ev.select("event_type", hv.alias("hv")).distinct()
    types = h.select("event_type").distinct()
    tp = (
        types.select(F.col("event_type").alias("type_a"))
        .join(
            types.select(F.col("event_type").alias("type_b")),
            F.col("type_a") < F.col("type_b"),
        )
    )
    member = (
        h.join(
            F.broadcast(tp),
            (F.col("event_type") == F.col("type_a"))
            | (F.col("event_type") == F.col("type_b")),
        )
        .groupBy("type_a", "type_b", "hv")
        .agg(
            F.max((F.col("event_type") == F.col("type_a")).cast("int")).alias("in_a"),
            F.max((F.col("event_type") == F.col("type_b")).cast("int")).alias("in_b"),
        )
    )
    w = Window.partitionBy("type_a", "type_b").orderBy("hv")
    bottom = member.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= KMV_K
    )
    agg = bottom.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sample"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("n_both"),
        F.max(F.when(F.col("rn") == KMV_K, F.col("hv"))).alias("kth_min"),
    )
    exact = member.groupBy("type_a", "type_b").agg(
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("n_exact_inter")
    )
    union_est = F.when(
        F.col("kth_min").isNull(), F.col("n_sample").cast("double")
    ).otherwise(
        F.lit(float(KMV_K - 1)) * F.lit(float(_KMV_HASH_SPACE)) / F.col("kth_min")
    )
    inter_est = F.when(
        F.col("kth_min").isNull(), F.col("n_both").cast("double")
    ).otherwise(
        (F.col("n_both").cast("double") / F.lit(float(KMV_K)))
        * (
            F.lit(float(KMV_K - 1))
            * F.lit(float(_KMV_HASH_SPACE))
            / F.col("kth_min")
        )
    )
    return agg.join(exact, ["type_a", "type_b"]).select(
        "type_a",
        "type_b",
        "n_exact_inter",
        "n_both",
        union_est.alias("union_estimate"),
        inter_est.alias("inter_estimate"),
    )


# ---------------------------------------------------------------------------
# HLL mergeability: daily partials merged == whole-range build
# ---------------------------------------------------------------------------


@register(
    "q_hll_merge_daily",
    oracle=f"""
        WITH reg AS (
            SELECT event_type, date_trunc('day', ts) AS d,
                   hv % {HLL_M} AS register,
                   hv // {HLL_M} AS rest
            FROM (
                SELECT event_type, ts,
                       CAST(('0x' || substr(md5('hll_' || CAST(user_id AS VARCHAR)),
                                            1, 15)) AS BIGINT) AS hv
                FROM events
            )
        ),
        daily AS (
            SELECT event_type, d, register,
                   min(CASE WHEN rest = 0 THEN 0
                            ELSE length(bin(rest)) END) AS msb
            FROM reg GROUP BY event_type, d, register
        ),
        merged AS (
            SELECT event_type, register, min(msb) AS msb
            FROM daily GROUP BY event_type, register
        ),
        direct AS (
            SELECT event_type, register,
                   min(CASE WHEN rest = 0 THEN 0
                            ELSE length(bin(rest)) END) AS msb
            FROM reg GROUP BY event_type, register
        ),
        zm AS (
            SELECT event_type,
                   CAST(sum(CAST(1 AS BIGINT) << msb) AS BIGINT) AS zsum,
                   CAST(count(*) AS BIGINT) AS n_used
            FROM merged GROUP BY event_type
        ),
        zd AS (
            SELECT event_type,
                   CAST(sum(CAST(1 AS BIGINT) << msb) AS BIGINT) AS zsum,
                   CAST(count(*) AS BIGINT) AS n_used
            FROM direct GROUP BY event_type
        ),
        nd AS (
            SELECT event_type,
                   CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT)
                       AS n_days
            FROM events GROUP BY event_type
        )
        SELECT m.event_type, nd.n_days,
               {_HLL_ALPHA_M2} * CAST({1 << (_HLL_REST_BITS + 1)} AS DOUBLE)
                   / (m.zsum + (CAST({HLL_M} AS BIGINT) - m.n_used)
                      * CAST({1 << (_HLL_REST_BITS + 1)} AS BIGINT))
                   AS est_merged,
               {_HLL_ALPHA_M2} * CAST({1 << (_HLL_REST_BITS + 1)} AS DOUBLE)
                   / (d.zsum + (CAST({HLL_M} AS BIGINT) - d.n_used)
                      * CAST({1 << (_HLL_REST_BITS + 1)} AS BIGINT))
                   AS est_direct,
               CAST(m.zsum = d.zsum AND m.n_used = d.n_used AS BOOLEAN)
                   AS partials_lossless
        FROM zm m JOIN zd d USING (event_type) JOIN nd USING (event_type)
    """,
    doc="HLL MERGEABILITY, proven on data: build one register-vector"
    " partial per (event_type, day), merge the daily partials"
    " (register-wise min-msb = max-rho), and show the merged estimate"
    " equals the whole-range single-pass build BIT-FOR-BIT"
    " (partials_lossless column). This is the property that makes"
    " sketch rollups work at 100 TB: daily partials are built once in"
    " the ingest pass, and any date-range NDV (weekly, monthly,"
    " backfill) is a register-wise min over partials — no re-scan of"
    " raw events, associative, and exactly as accurate as a direct"
    " build. Same hand-rolled exact-replay HLL as q_hll_manual"
    " (integer registers, one final literal-coefficient division), so"
    " DuckDB replays both arms hash-exactly.",
)
def q_hll_merge_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hv = F.expr(
        "cast(conv(substr(md5(concat('hll_', cast(user_id as string))),"
        " 1, 15), 16, 10) as bigint)"
    )
    reg = ev.select(
        "event_type",
        F.date_trunc("day", "ts").alias("d"),
        (hv % HLL_M).alias("register"),
        F.expr(
            "cast(conv(substr(md5(concat('hll_', cast(user_id as string))),"
            f" 1, 15), 16, 10) as bigint) DIV {HLL_M}"
        ).alias("rest"),
    )
    msb = F.min(
        F.when(F.col("rest") == 0, 0).otherwise(F.length(F.expr("bin(rest)")))
    ).cast("bigint")
    daily = reg.groupBy("event_type", "d", "register").agg(msb.alias("msb"))
    merged = daily.groupBy("event_type", "register").agg(
        F.min("msb").cast("bigint").alias("msb")
    )
    direct = reg.groupBy("event_type", "register").agg(msb.alias("msb"))

    def z(frame):
        return frame.groupBy("event_type").agg(
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(msb AS INT))"))
            .cast("bigint")
            .alias("zsum"),
            F.count(F.lit(1)).cast("bigint").alias("n_used"),
        )

    full = F.lit(1 << (_HLL_REST_BITS + 1)).cast("bigint")

    def est(zsum, n_used):
        return (
            F.lit(_HLL_ALPHA_M2)
            * full.cast("double")
            / (zsum + (F.lit(HLL_M) - n_used) * full).cast("double")
        )

    zm = z(merged)
    zd = z(direct).select(
        "event_type",
        F.col("zsum").alias("zsum_d"),
        F.col("n_used").alias("n_used_d"),
    )
    nd = ev.groupBy("event_type").agg(
        F.countDistinct(F.date_trunc("day", "ts")).cast("bigint").alias("n_days")
    )
    return (
        zm.join(zd, "event_type")
        .join(nd, "event_type")
        .select(
            "event_type",
            "n_days",
            est(F.col("zsum"), F.col("n_used")).alias("est_merged"),
            est(F.col("zsum_d"), F.col("n_used_d")).alias("est_direct"),
            (
                (F.col("zsum") == F.col("zsum_d"))
                & (F.col("n_used") == F.col("n_used_d"))
            ).alias("partials_lossless"),
        )
    )
