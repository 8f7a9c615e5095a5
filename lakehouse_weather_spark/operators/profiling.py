"""Data-profiling + complex-type operators (DERIVED closure).

``q_profile_lineitem`` is the lakehouse table-stats pass (per-column
min/max/null-count/NDV in ONE scan) — what ANALYZE TABLE computes and
what file-skipping metadata is built from. ``q_array_ops`` exercises the
array-algebra surface over the word arrays of documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table, local_df

_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "q_profile_lineitem",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS col_name,
               min({c}) AS min_val, max({c}) AS max_val,
               count(*) - count({c}) AS null_count,
               CAST(count(DISTINCT {c}) AS BIGINT) AS ndv
        FROM lineitem
        """
        for c in _PROFILE_COLS
    ),
    doc="Single-pass column profiling (ANALYZE TABLE shape): min/max/"
    "null-count/NDV per measure column, unpivoted to one row per column."
    " At 100 TB this is the stats pass that powers CBO and file skipping;"
    " Spark computes all columns' aggregates in one scan then unpivots.",
)
def q_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__ndv"),
        ]
    wide = li.agg(*aggs)
    per_col = [
        wide.select(
            F.lit(c).alias("col_name"),
            F.col(f"{c}__min").alias("min_val"),
            F.col(f"{c}__max").alias("max_val"),
            F.col(f"{c}__nulls").alias("null_count"),
            F.col(f"{c}__ndv").alias("ndv"),
        )
        for c in _PROFILE_COLS
    ]
    out = per_col[0]
    for p in per_col[1:]:
        out = out.unionByName(p)
    return out


@register(
    "q_array_ops",
    oracle="""
        SELECT doc_id,
               CAST(len(words) AS INTEGER) AS n_words,
               list_contains(words, 'spark') AS has_spark,
               CAST(len(list_distinct(words)) AS INTEGER) AS n_unique,
               list_sort(list_distinct(words))[1] AS first_word,
               CAST(len(list_intersect(list_distinct(words),
                    ['spark', 'table', 'query', 'data'])) AS INTEGER)
                   AS kw_hits,
               array_to_string(list_sort(list_distinct(words))[1:3], '|')
                   AS first3
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    """,
    doc="Array algebra over word arrays: size, membership, distinct,"
    " sort, intersect, slice, join — the JVM-side (codegen) complex-type"
    " surface; no shuffle, no Python.",
)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    uniq = F.array_sort(F.array_distinct(words))
    kws = F.array(*[F.lit(w) for w in ("spark", "table", "query", "data")])
    return docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.array_contains(words, "spark").alias("has_spark"),
        F.size(F.array_distinct(words)).alias("n_unique"),
        uniq.getItem(0).alias("first_word"),
        F.size(F.array_intersect(F.array_distinct(words), kws)).alias("kw_hits"),
        F.array_join(F.slice(uniq, 1, 3), "|").alias("first3"),
    )


@register(
    "q_dq_constraints",
    oracle="""
        SELECT
            (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
                AS null_custkeys,
            (SELECT count(*) FROM (
                 SELECT o_orderkey FROM orders
                 GROUP BY o_orderkey HAVING count(*) > 1))
                AS dup_orderkeys,
            (SELECT count(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey))
                AS orphan_orders,
            (SELECT count(*) FROM lineitem
              WHERE l_quantity <= 0 OR l_discount < 0 OR l_discount > 1)
                AS range_violations,
            (SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey))
                AS orphan_lineitems
    """,
    doc="Data-quality constraint suite in one query (Deequ/dbt-test"
    " shape): null checks, key uniqueness, referential integrity"
    " (orders->customer, lineitem->orders), and value-range assertions"
    " — each violation count computable from one scan + anti joins."
    " A CI gate asserts all-zeros on trusted tables; at 100 TB the"
    " anti joins ride the same broadcast/shuffle machinery as queries.",
)
def q_dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one declarative plan (scalar subqueries -> anti joins), no driver
    # actions: the whole suite is a single job the scheduler can overlap
    for t in ("orders", "customer", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}_dq")
    return spark.sql(
        """
        SELECT
            (SELECT count(*) FROM v_orders_dq WHERE o_custkey IS NULL)
                AS null_custkeys,
            (SELECT count(*) FROM (
                 SELECT o_orderkey FROM v_orders_dq
                 GROUP BY o_orderkey HAVING count(*) > 1))
                AS dup_orderkeys,
            (SELECT count(*) FROM v_orders_dq o
              WHERE NOT EXISTS (SELECT 1 FROM v_customer_dq c
                                WHERE c.c_custkey = o.o_custkey))
                AS orphan_orders,
            (SELECT count(*) FROM v_lineitem_dq
              WHERE l_quantity <= 0 OR l_discount < 0 OR l_discount > 1)
                AS range_violations,
            (SELECT count(*) FROM v_lineitem_dq l
              WHERE NOT EXISTS (SELECT 1 FROM v_orders_dq o
                                WHERE o.o_orderkey = l.l_orderkey))
                AS orphan_lineitems
        """
    )


# ---------------------------------------------------------------------------
# Equi-depth histogram via a deterministic bounded sample
# ---------------------------------------------------------------------------

# Equi-depth bucketing (each bucket holds ~the same row count) is the
# primitive under range partitioning, z-order ranks (zorder.py), and
# skew diagnosis — but the naive global ntile() window funnels the
# whole table through ONE task. The scale-safe form: take a FIXED-SIZE
# deterministic sample (top-SAMPLE_K rows by md5 of the key — a
# TakeOrderedAndProject, no shuffle of the table), compute exact
# quantile cut points of the sample on the driver side of the plan
# (SAMPLE_K rows — bounded), broadcast them, and bucket rows narrowly.
# Bucket counts are approximate equi-depth (sampling error ~1/sqrt(K))
# but every step is deterministic, so the DuckDB oracle replays it
# bit-for-bit — including the cut points.

EQUI_BUCKETS = 8
SAMPLE_K = 1009  # fixed sample size: bounded at ANY table size

_SAMPLE_H_SPARK = (
    "cast(conv(substr(md5(cast(l_orderkey as string) || '-' ||"
    " cast(l_linenumber as string)), 1, 15), 16, 10) as bigint)"
)
_SAMPLE_H_DUCK = (
    "CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '-' ||"
    " CAST(l_linenumber AS VARCHAR)), 1, 15)) AS BIGINT)"
)


@register(
    "q_equidepth_hist",
    oracle=f"""
        WITH s AS (
            SELECT l_extendedprice AS v
            FROM lineitem
            ORDER BY {_SAMPLE_H_DUCK}, l_orderkey, l_linenumber
            LIMIT {SAMPLE_K}
        ),
        ranked AS (
            SELECT v, row_number() OVER (ORDER BY v) AS rn FROM s
        ),
        cuts AS (
            SELECT k,
                   (SELECT v FROM ranked
                    WHERE rn = (k * {SAMPLE_K}) // {EQUI_BUCKETS}) AS cut
            FROM (SELECT unnest(generate_series(1, {EQUI_BUCKETS - 1})) AS k)
        ),
        bucketed AS (
            SELECT (SELECT count(*) FROM cuts
                    WHERE cut < l.l_extendedprice) AS bucket
            FROM lineitem l
        )
        SELECT CAST(bucket AS INTEGER) AS bucket, count(*) AS n_rows
        FROM bucketed GROUP BY bucket
    """,
    doc=f"Approximate equi-depth histogram of l_extendedprice in"
    f" {EQUI_BUCKETS} buckets: fixed-size deterministic sample"
    f" (top-{SAMPLE_K} by md5 of the row key — TakeOrdered, bounded at"
    " any scale), exact sample quantiles as cut points, broadcast"
    " bucket assignment. The scale-safe replacement for a global"
    " ntile() window (one-task bottleneck); the same sampled-cutpoint"
    " machinery backs zorder.py's rank computation. Deterministic"
    " end-to-end, so even the cut points oracle-match.",
)
def q_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    sample = (
        li.select(
            F.col("l_extendedprice").alias("v"),
            F.expr(_SAMPLE_H_SPARK).alias("h"),
            "l_orderkey",
            "l_linenumber",
        )
        .orderBy("h", "l_orderkey", "l_linenumber")
        .limit(SAMPLE_K)
    )
    ranked = sample.select(
        "v", F.row_number().over(Window.orderBy("v")).alias("rn")
    )
    ks = [(k * SAMPLE_K) // EQUI_BUCKETS for k in range(1, EQUI_BUCKETS)]
    # all cut points as ONE sorted array row, broadcast: bucket
    # assignment is then a narrow per-row array filter (no row
    # blow-up, no extra shuffle — the only wide op is the final
    # 8-group count)
    cuts_arr = F.broadcast(
        ranked.filter(F.col("rn").isin(ks)).agg(
            F.sort_array(F.collect_list("v")).alias("cuts")
        )
    )
    bucketed = li.crossJoin(cuts_arr).select(
        F.expr(
            "cast(size(filter(cuts, c -> c < l_extendedprice)) as int)"
        ).alias("bucket")
    )
    return bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_rows"))


@register(
    "q_skew_profile",
    oracle="""
        WITH freq AS (
            SELECT l_suppkey AS key, CAST(count(*) AS BIGINT) AS cnt
            FROM lineitem GROUP BY l_suppkey
        ),
        stats AS (
            SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
                   CAST(count(*) AS BIGINT) AS n_keys,
                   CAST(max(cnt) AS BIGINT) AS max_cnt
            FROM freq
        )
        SELECT f.key, f.cnt,
               CAST(f.cnt AS DOUBLE) * s.n_keys / s.n_rows AS skew_factor
        FROM freq f CROSS JOIN stats s
        ORDER BY f.cnt DESC, f.key
        LIMIT 20
    """,
    doc="Join-key skew diagnostic: top-20 hottest l_suppkey values with"
    " their skew factor (key count / mean key count). One partial-agg"
    " groupBy + a 3-number broadcast + TakeOrderedAndProject — the"
    " cheap pre-flight that tells you WHICH keys need the salted-join"
    " treatment (plans.salted_join) before a billion-row shuffle"
    " stalls on them. skew_factor ~1 = uniform; >>1 = salt or isolate.",
)
def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    freq = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    stats = freq.agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
    )
    return (
        freq.crossJoin(F.broadcast(stats))
        .select(
            "key",
            "cnt",
            (
                F.col("cnt").cast("double")
                * F.col("n_keys")
                / F.col("n_rows")
            ).alias("skew_factor"),
        )
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# k-anonymity audit over quasi-identifier combinations
# ---------------------------------------------------------------------------

K_ANON = 5


@register(
    "q_k_anonymity",
    oracle=f"""
        SELECT lang, source,
               CAST(count(*) AS BIGINT) AS n,
               count(*) < {K_ANON} AS at_risk
        FROM documents
        GROUP BY lang, source
    """,
    doc=f"k-anonymity audit (k={K_ANON}) over the (lang, source)"
    " quasi-identifier combination: equivalence classes smaller than k"
    " are re-identification risks that a privacy-aware release"
    " pipeline must suppress or generalize before publishing corpus"
    " statistics. One partial-agg shuffle on the quasi-identifier"
    " tuple; the output is cells, not rows, so it stays tiny at any"
    " corpus size. The same shape audits any QI set — swap the"
    " grouping columns.",
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.count(F.lit(1)) < K_ANON).alias("at_risk"),
    )


# ---------------------------------------------------------------------------
# t-closeness audit (completes the k-anonymity / l-diversity trio)
# ---------------------------------------------------------------------------

# Release threshold on the per-class total-variation distance.
T_CLOSE_BP = 2000  # 0.20 in basis points — compared integer-exactly


@register(
    "q_t_closeness",
    oracle=f"""
        WITH g AS (
            SELECT lang, CAST(count(*) AS BIGINT) AS c_g FROM documents
            GROUP BY lang
        ),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        s AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM documents
            GROUP BY source
        ),
        sl AS (
            SELECT source, lang, CAST(count(*) AS BIGINT) AS c_sl
            FROM documents GROUP BY source, lang
        ),
        cells AS (
            SELECT s.source, s.n_s, g.lang, g.c_g, tot.n,
                   COALESCE(sl.c_sl, 0) AS c_sl
            FROM s CROSS JOIN g CROSS JOIN tot
            LEFT JOIN sl ON sl.source = s.source AND sl.lang = g.lang
        )
        SELECT source,
               CAST(min(n_s) AS BIGINT) AS n_docs,
               CAST(sum(abs(c_sl * n - c_g * n_s)) AS BIGINT) AS tvd_num,
               CAST(sum(abs(c_sl * n - c_g * n_s)) AS DOUBLE)
                   / (2.0 * min(n_s) * min(n)) AS t,
               sum(abs(c_sl * n - c_g * n_s)) * {10_000}
                   <= {T_CLOSE_BP} * 2 * min(n_s) * min(n) AS meets_t
        FROM cells
        GROUP BY source
    """,
    doc=f"t-closeness audit (t={T_CLOSE_BP / 10_000}) completing the"
    " k-anonymity / l-diversity trio: l-diversity still leaks when a"
    " class's sensitive-value DISTRIBUTION differs sharply from the"
    " corpus (skewness attack), so each source's language distribution"
    " must sit within total-variation distance t of the global one"
    " before a per-source release. The distance is the categorical"
    " earth-mover's distance Σ|c_sl/n_s - c_g/N|/2 computed as EXACT"
    " cross-multiplied integers (|c_sl*N - c_g*n_s|, the q_ks_drift"
    " ECDF precedent — headroom holds to ~3e9 rows; rescale to"
    " per-million counts beyond), and the pass/fail compare is"
    " integer-exact in basis points, so no float boundary can flip a"
    " verdict. One corpus scan; every model frame is"
    " |sources| x |langs| cells.",
)
def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("c_g"))
    tot = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_s")
    )
    sl = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_sl")
    )
    cells = (
        s.crossJoin(F.broadcast(g))
        .crossJoin(F.broadcast(tot))
        .join(sl, ["source", "lang"], "left")
        .select(
            "source",
            "n_s",
            "c_g",
            "n",
            F.coalesce("c_sl", F.lit(0)).alias("c_sl"),
        )
    )
    num = F.sum(
        F.abs(F.col("c_sl") * F.col("n") - F.col("c_g") * F.col("n_s"))
    )
    return cells.groupBy("source").agg(
        F.min("n_s").cast("bigint").alias("n_docs"),
        num.cast("bigint").alias("tvd_num"),
        (
            num.cast("double") / (2.0 * F.min("n_s") * F.min("n"))
        ).alias("t"),
        (
            num * 10_000 <= F.lit(T_CLOSE_BP) * 2 * F.min("n_s") * F.min("n")
        ).alias("meets_t"),
    )


# ---------------------------------------------------------------------------
# Self-join fanout planning
# ---------------------------------------------------------------------------

FANOUT_TOP = 20


@register(
    "q_selfjoin_fanout",
    oracle=f"""
        WITH freq AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY user_id
        ),
        tot AS (
            SELECT CAST(sum(cnt * cnt) AS BIGINT) AS total_pairs FROM freq
        )
        SELECT f.user_id, f.cnt,
               CAST(f.cnt * f.cnt AS BIGINT) AS pairs,
               CAST(f.cnt * f.cnt * 10000 // t.total_pairs AS BIGINT)
                   AS share_bp,
               t.total_pairs
        FROM freq f CROSS JOIN tot t
        ORDER BY pairs DESC, user_id
        LIMIT {FANOUT_TOP}
    """,
    doc="Self-join fanout planner: per-key pair counts (cnt^2) for an"
    " events-on-user_id self-join, the exact output-size estimate a"
    " join planner needs BEFORE running a sessionize/self-correlation"
    " — the top keys by share tell you whether to salt, df-cap, or"
    " AQE-skew-split the join (the q_join_salted / dedup df-cap"
    " machinery consumes exactly this diagnostic). One partial agg +"
    " a 1-row broadcast total + top-k; integer basis-point shares"
    " hash-match the oracle.",
)
def q_selfjoin_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    freq = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    tot = freq.agg(
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("total_pairs")
    )
    pairs = (F.col("cnt") * F.col("cnt")).cast("bigint")
    return (
        freq.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "cnt",
            pairs.alias("pairs"),
            F.expr("cnt * cnt * 10000 DIV total_pairs")
            .cast("bigint")
            .alias("share_bp"),
            "total_pairs",
        )
        .orderBy(F.desc("pairs"), "user_id")
        .limit(FANOUT_TOP)
    )


# ---------------------------------------------------------------------------
# Join-cardinality audit
# ---------------------------------------------------------------------------


def _card_cte(rel: str, left: str, lkey: str, right: str, rkey: str) -> str:
    """One relationship row: max per-key multiplicity on each side and
    the 1:1 / 1:N / N:1 / M:N classification."""
    return f"""
        SELECT '{rel}' AS relationship,
               CAST((SELECT max(c) FROM (
                   SELECT count(*) AS c FROM {left} GROUP BY {lkey})) AS BIGINT)
                   AS max_left_mult,
               CAST((SELECT max(c) FROM (
                   SELECT count(*) AS c FROM {right} GROUP BY {rkey})) AS BIGINT)
                   AS max_right_mult,
               CASE
                   WHEN (SELECT max(c) FROM (SELECT count(*) AS c
                         FROM {left} GROUP BY {lkey})) = 1
                    AND (SELECT max(c) FROM (SELECT count(*) AS c
                         FROM {right} GROUP BY {rkey})) = 1 THEN '1:1'
                   WHEN (SELECT max(c) FROM (SELECT count(*) AS c
                         FROM {left} GROUP BY {lkey})) = 1 THEN '1:N'
                   WHEN (SELECT max(c) FROM (SELECT count(*) AS c
                         FROM {right} GROUP BY {rkey})) = 1 THEN 'N:1'
                   ELSE 'M:N' END AS cardinality
    """


_CARD_RELS = (
    ("customer-orders", "customer", "c_custkey", "orders", "o_custkey"),
    ("orders-lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("part-lineitem", "part", "p_partkey", "lineitem", "l_partkey"),
    ("supplier-lineitem", "supplier", "s_suppkey", "lineitem", "l_suppkey"),
)


@register(
    "q_join_cardinality",
    oracle=" UNION ALL ".join(_card_cte(*r) for r in _CARD_RELS),
    doc="Join-cardinality audit: for each schema relationship, the max"
    " per-key multiplicity on both sides and its 1:1 / 1:N / N:1 / M:N"
    " class — the profiling fact a join planner (and a human) checks"
    " BEFORE trusting a broadcast or estimating output size"
    " (q_selfjoin_fanout quantifies the M:N blow-up this classifies)."
    " Each side is one partial-agg max over per-key counts; output is"
    " |relationships| rows at any scale.",
)
def q_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for rel, lt, lk, rt, rk in _CARD_RELS:
        lmax = (
            load_table(spark, sf_dir, lt)
            .groupBy(lk)
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.max("c").cast("bigint").alias("max_left_mult"))
        )
        rmax = (
            load_table(spark, sf_dir, rt)
            .groupBy(rk)
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.max("c").cast("bigint").alias("max_right_mult"))
        )
        row = (
            lmax.crossJoin(rmax)
            .select(
                F.lit(rel).alias("relationship"),
                "max_left_mult",
                "max_right_mult",
                F.when(
                    (F.col("max_left_mult") == 1)
                    & (F.col("max_right_mult") == 1),
                    "1:1",
                )
                .when(F.col("max_left_mult") == 1, "1:N")
                .when(F.col("max_right_mult") == 1, "N:1")
                .otherwise("M:N")
                .alias("cardinality"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# --- order-independent table checksum --------------------------------

# Modulus for the additive signature: keeps sum(h % P) far inside int64
# at any per-group row count this side of 9e9 rows (ANSI overflow-safe).
_CK_P = 1_000_000_007


@register(
    "q_table_checksum",
    oracle=f"""
        WITH canon AS (
            SELECT l_returnflag,
                   COALESCE(CAST(l_orderkey AS VARCHAR), chr(0)) || '|' ||
                   COALESCE(CAST(l_partkey AS VARCHAR), chr(0)) || '|' ||
                   COALESCE(CAST(l_suppkey AS VARCHAR), chr(0)) || '|' ||
                   COALESCE(CAST(l_linenumber AS VARCHAR), chr(0))
                       || '|' ||
                   COALESCE(CAST(CAST(round(l_quantity * 10000) AS BIGINT)
                        AS VARCHAR), chr(0)) || '|' ||
                   COALESCE(CAST(CAST(round(l_extendedprice * 10000)
                        AS BIGINT) AS VARCHAR), chr(0)) || '|' ||
                   COALESCE(CAST(CAST(round(l_discount * 10000) AS BIGINT)
                        AS VARCHAR), chr(0)) || '|' ||
                   COALESCE(CAST(CAST(round(l_tax * 10000) AS BIGINT)
                        AS VARCHAR), chr(0)) || '|' ||
                   COALESCE(l_returnflag, chr(0)) || '|' ||
                   COALESCE(l_linestatus, chr(0)) || '|' ||
                   COALESCE(CAST(epoch_us(l_shipdate) AS VARCHAR), chr(0))
                       AS row_str
            FROM lineitem
        ),
        hashed AS (
            SELECT l_returnflag,
                   CAST(('0x' || substr(md5(row_str), 1, 15)) AS BIGINT)
                       AS h
            FROM canon
        )
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(bit_xor(h) AS BIGINT) AS sig_xor,
               CAST(sum(h % {_CK_P}) AS BIGINT) AS sig_sum
        FROM hashed GROUP BY l_returnflag
    """,
    doc="Order-independent table fingerprint for migration / replication"
    " parity: every row canonicalizes to a pipe-joined string of"
    " integer-exact fields (money in fixed point, dates as epoch"
    " micros — no engine-dependent float or timestamp formatting),"
    " md5-hashes to a 60-bit int, and folds into TWO commutative"
    " signatures per return-flag group — bit_xor (cheap, but blind to"
    " duplicated row pairs) and a modular sum (catches what xor"
    " cancels). Copy a 100 TB table between engines, run this on both"
    " sides, diff a handful of rows. ONE scan + ONE partial-agg"
    " shuffle; both aggregates combine associatively, so map-side"
    " partials do almost all the work.",
)
def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # NULL-safe canonicalization: concat_ws silently SKIPS nulls (a
    # null column would alias with its neighbor), so every piece
    # coalesces to an explicit NUL sentinel — mirrored in the oracle
    nul = F.expr("chr(0)")
    fx = lambda c: F.coalesce(  # noqa: E731
        F.round(F.col(c) * 10_000, 0).cast("bigint").cast("string"), nul
    )
    sc = lambda c: F.coalesce(F.col(c).cast("string"), nul)  # noqa: E731
    row_str = F.concat_ws(
        "|",
        sc("l_orderkey"),
        sc("l_partkey"),
        sc("l_suppkey"),
        sc("l_linenumber"),
        fx("l_quantity"),
        fx("l_extendedprice"),
        fx("l_discount"),
        fx("l_tax"),
        sc("l_returnflag"),
        sc("l_linestatus"),
        F.coalesce(
            F.expr("unix_micros(cast(l_shipdate as timestamp))").cast(
                "string"
            ),
            nul,
        ),
    )
    hashed = li.withColumn("row_str", row_str).select(
        "l_returnflag",
        F.expr(
            "cast(conv(substr(md5(row_str), 1, 15), 16, 10) as bigint)"
        ).alias("h"),
    )
    return hashed.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.expr("bit_xor(h)").cast("bigint").alias("sig_xor"),
        F.sum(F.col("h") % _CK_P).cast("bigint").alias("sig_sum"),
    )


# --- l-diversity audit -----------------------------------------------

# Minimum distinct sensitive values per equivalence class.
L_DIV = 5


@register(
    "q_l_diversity",
    oracle=f"""
        SELECT event_type, date_trunc('day', ts) AS d,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_sensitive,
               count(DISTINCT user_id) >= {L_DIV} AS meets_l
        FROM events
        GROUP BY event_type, date_trunc('day', ts)
    """,
    doc=f"l-diversity audit (l={L_DIV}) companion to q_k_anonymity:"
    " k-anonymity alone fails homogeneity attacks (a class of 10 rows"
    " that all belong to ONE user still identifies them); each"
    " (event_type, day) equivalence class must contain at least l"
    " DISTINCT sensitive values (user ids) before release. One"
    " partial-agg shuffle; at 100 TB the distinct count swaps to the"
    " mergeable-bitmap partials of q_bitmap_distinct with the same"
    " output contract.",
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("user_id").cast("bigint").alias("n_sensitive"),
        (F.countDistinct("user_id") >= L_DIV).alias("meets_l"),
    )


# --- consistent-hashing ring audit -----------------------------------

# Virtual nodes per physical shard on the md5 ring.
_RING_VNODES = 16
_RING_NODES_BEFORE = 4  # shards s0..s3
# The audit measures what fraction of keys MOVE when shard s4 joins.


def _ring_cte(n_nodes: int, alias: str) -> str:
    """DuckDB CTE: the md5 ring positions of n_nodes x VNODES tokens."""
    return f"""
        {alias} AS (
            SELECT ('s' || CAST(node AS VARCHAR)) AS node,
                   CAST(('0x' || substr(md5('ring_s'
                       || CAST(node AS VARCHAR) || '_'
                       || CAST(v AS VARCHAR)), 1, 15)) AS BIGINT) AS pos
            FROM (SELECT unnest(generate_series(0, {n_nodes - 1}))
                  AS node)
            CROSS JOIN (SELECT unnest(generate_series(0,
                  {_RING_VNODES - 1})) AS v)
        )"""


def _ring_assign(ring: str, out: str) -> str:
    """Assign each key hash to the first ring token clockwise (wrap to
    the ring minimum)."""
    return f"""
        {out} AS (
            SELECT k.user_id,
                   COALESCE(
                       (SELECT r.node FROM {ring} r
                        WHERE r.pos >= k.kpos
                        ORDER BY r.pos, r.node LIMIT 1),
                       (SELECT r.node FROM {ring} r
                        ORDER BY r.pos, r.node LIMIT 1)) AS node
            FROM keys k
        )"""


@register(
    "q_hash_ring",
    oracle=f"""
        WITH keys AS MATERIALIZED (
            SELECT DISTINCT user_id,
                   CAST(('0x' || substr(md5('key_'
                       || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
                       AS kpos
            FROM events
        ),
        {_ring_cte(_RING_NODES_BEFORE, 'ring_a')},
        {_ring_cte(_RING_NODES_BEFORE + 1, 'ring_b')},
        {_ring_assign('ring_a', 'a')},
        {_ring_assign('ring_b', 'b')}
        SELECT b.node,
               CAST(count(*) AS BIGINT) AS n_keys_after,
               CAST(sum(CASE WHEN a.node <> b.node THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_moved_in
        FROM a JOIN b USING (user_id)
        GROUP BY b.node
    """,
    doc=f"Consistent-hashing ring audit (Karger et al. 1997): user keys"
    f" and {_RING_VNODES} virtual tokens per shard hash onto an md5"
    " ring; each key belongs to the first token clockwise. The audit"
    " replays assignment BEFORE and AFTER a fifth shard joins and"
    " reports, per post-join shard, how many keys it owns and how"
    " many MOVED — the property that makes consistent hashing the"
    " resharding strategy (≈1/(n+1) of keys move, vs ~all for mod-N)."
    " Ring tokens are a tiny broadcast table; assignment is a"
    " min-over-candidates per key (a broadcast range lookup, the"
    " sort-merge interval pattern at scale). Pure md5 integers —"
    " bit-exact everywhere.",
)
def q_hash_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    keys = ev.select("user_id").distinct().select(
        "user_id",
        F.expr(
            "cast(conv(substr(md5(concat('key_', cast(user_id as"
            " string))), 1, 15), 16, 10) as bigint)"
        ).alias("kpos"),
    )

    def ring(n_nodes: int):
        rows = [
            (f"s{node}", node, v)
            for node in range(n_nodes)
            for v in range(_RING_VNODES)
        ]
        df = local_df(
            ev.sparkSession, rows, "node string, node_i int, v int"
        )
        return df.select(
            "node",
            F.expr(
                "cast(conv(substr(md5(concat('ring_s',"
                " cast(node_i as string), '_', cast(v as string))),"
                " 1, 15), 16, 10) as bigint)"
            ).alias("pos"),
        )

    def assign(ring_df, out_node: str):
        # broadcast the ring; per key keep the first token clockwise
        # (min pos >= kpos), wrapping to the global minimum token
        r = F.broadcast(ring_df)
        cand = keys.join(r, F.col("pos") >= F.col("kpos"), "left")
        best = cand.groupBy("user_id", "kpos").agg(
            F.min(F.struct("pos", "node")).alias("m")
        )
        wrap = ring_df.orderBy("pos", "node").limit(1).select(
            F.col("node").alias("wrap_node")
        )
        return (
            best.crossJoin(F.broadcast(wrap))
            .select(
                "user_id",
                F.coalesce(F.col("m.node"), F.col("wrap_node")).alias(
                    out_node
                ),
            )
        )

    a = assign(ring(_RING_NODES_BEFORE), "node_a")
    b = assign(ring(_RING_NODES_BEFORE + 1), "node_b")
    return (
        a.join(b, "user_id")
        .groupBy(F.col("node_b").alias("node"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys_after"),
            F.sum(
                F.when(F.col("node_a") != F.col("node_b"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_moved_in"),
        )
    )


# Benford first-digit probabilities log10(1 + 1/d), embedded as string
# literals and parsed with CAST(x AS DOUBLE) on BOTH engines: decimal
# string -> double parsing is correctly rounded in Java and C, so the
# constants are bit-identical (the engine-wide transcendental-log ban
# applies to computing them at runtime, not to shipping them).
_BENFORD_P = {
    1: "0.3010299956639812",
    2: "0.17609125905568124",
    3: "0.12493873660829992",
    4: "0.09691001300805642",
    5: "0.07918124604762482",
    6: "0.06694678963061322",
    7: "0.05799194697768673",
    8: "0.05115252244738129",
    9: "0.04575749056067514",
}

_BENFORD_CASE = "CASE first_digit " + " ".join(
    f"WHEN {d} THEN CAST('{p}' AS DOUBLE)" for d, p in _BENFORD_P.items()
) + " END"


@register(
    "q_benford",
    oracle=f"""
        WITH digits AS (
            SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                               AS VARCHAR), 1, 1) AS BIGINT) AS first_digit
            FROM orders WHERE o_totalprice >= 1
        ),
        obs AS (
            SELECT first_digit, CAST(count(*) AS BIGINT) AS n,
                   sum(CAST(count(*) AS BIGINT)) OVER () AS total
            FROM digits GROUP BY first_digit
        )
        SELECT first_digit, n,
               ({_BENFORD_CASE}) * total AS expected_n,
               (n - ({_BENFORD_CASE}) * total)
                   * (n - ({_BENFORD_CASE}) * total)
                   / (({_BENFORD_CASE}) * total) AS chi2_term
        FROM obs
    """,
    doc="Benford's-law first-digit audit over order totals: observed"
    " first-significant-digit counts vs the log10(1+1/d) expectation,"
    " with the per-digit chi-square contribution — the classic"
    " fabricated-/synthetic-data detector a data-quality suite runs on"
    " financial measures. Counts are exact integers; the expectation"
    " constants are embedded decimal strings (correctly-rounded parse"
    " on both engines) and every float op after them is a single"
    " correctly-rounded IEEE multiply/subtract/divide, so rows"
    " hash-match without any fixed-point machinery. One groupBy on a"
    " 9-value key: constant-size result at any corpus scale.",
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    digits = orders.where(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("first_digit")
    )
    from pyspark.sql import Window

    obs = digits.groupBy("first_digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).withColumn(
        "total",
        F.sum("n").over(
            Window.partitionBy()
        ),  # 9-row frame: bounded by the digit alphabet, never the table
    )
    p = F.expr(
        "CASE first_digit "
        + " ".join(
            f"WHEN {d} THEN CAST('{v}' AS DOUBLE)"
            for d, v in _BENFORD_P.items()
        )
        + " END"
    )
    exp_n = p * F.col("total")
    return obs.select(
        "first_digit",
        "n",
        exp_n.alias("expected_n"),
        ((F.col("n") - exp_n) * (F.col("n") - exp_n) / exp_n).alias(
            "chi2_term"
        ),
    )


# Zone-map audit: shard count kept at 64 so the per-shard stats table
# is trivially broadcastable; the pruning predicate is a fixed date.
_ZM_SHARDS = 64
_ZM_CUTOFF = "1997-01-01"


@register(
    "q_zone_map",
    oracle=f"""
        WITH sharded AS (
            SELECT o_orderdate,
                   o_orderkey % {_ZM_SHARDS} AS hash_shard,
                   (CAST(year(o_orderdate) AS BIGINT) * 12
                    + month(o_orderdate) - 1) AS time_shard
            FROM orders
        ),
        z AS (
            SELECT 'hash' AS strategy, hash_shard AS shard,
                   max(o_orderdate) AS max_date,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM sharded GROUP BY hash_shard
            UNION ALL
            SELECT 'time' AS strategy, time_shard AS shard,
                   max(o_orderdate) AS max_date,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM sharded GROUP BY time_shard
        )
        SELECT strategy,
               CAST(count(*) AS BIGINT) AS n_shards,
               CAST(count(CASE WHEN max_date < DATE '{_ZM_CUTOFF}'
                          THEN 1 END) AS BIGINT) AS n_prunable,
               CAST(sum(n_rows) AS BIGINT) AS rows_total,
               CAST(coalesce(sum(CASE WHEN max_date < DATE '{_ZM_CUTOFF}'
                             THEN n_rows END), 0) AS BIGINT)
                   AS rows_prunable
        FROM z GROUP BY strategy
    """,
    doc="Zone-map (file-skipping) effectiveness audit: shard orders two"
    " ways — hash on the key (what naive writes produce) vs"
    " time-partitioned by order month (what a date-clustered layout"
    " produces) — compute each shard's max(o_orderdate) zone stat, and"
    " count how many shards (and rows) the predicate o_orderdate >="
    f" {_ZM_CUTOFF} could prune from each layout. The number that"
    " justifies partitioning/Z-ordering at 100 TB: hash layouts prune"
    " ~nothing, time layouts prune every closed month. Two counts-only"
    " aggregations; the result is O(shards), constant in table size."
    " All integers and dates — hash-exact by construction.",
)
def q_zone_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    sharded = orders.select(
        "o_orderdate",
        (F.col("o_orderkey") % _ZM_SHARDS).alias("hash_shard"),
        (
            F.year("o_orderdate").cast("bigint") * 12
            + F.month("o_orderdate")
            - 1
        ).alias("time_shard"),
    )

    def zstats(col: str, label: str) -> DataFrame:
        return sharded.groupBy(F.col(col).alias("shard")).agg(
            F.max("o_orderdate").alias("max_date"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        ).select(F.lit(label).alias("strategy"), "shard", "max_date", "n_rows")

    z = zstats("hash_shard", "hash").unionAll(zstats("time_shard", "time"))
    cutoff = F.lit(_ZM_CUTOFF).cast("date")
    return z.groupBy("strategy").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shards"),
        F.count(F.when(F.col("max_date") < cutoff, 1))
        .cast("bigint")
        .alias("n_prunable"),
        F.sum("n_rows").cast("bigint").alias("rows_total"),
        F.coalesce(
            F.sum(F.when(F.col("max_date") < cutoff, F.col("n_rows"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("rows_prunable"),
    )


# --- merkle-style anti-entropy bucket diff ---------------------------

# Hash-range bucket count for the per-bucket signatures. 64 keeps the
# demo readable; a real 100 TB sync uses ~1e5 buckets so each bucket's
# re-transfer unit stays small.
_MK_BUCKETS = 64
# Deterministic "replication loss": the replica is missing every row
# whose key hash lands in _MK_DROP_LT of _MK_DROP_MOD residues (~0.5%).
_MK_DROP_MOD = 1000
_MK_DROP_LT = 5

_MK_KH_DUCK = (
    "CAST(('0x' || substr(md5('mk_' || CAST(l_orderkey AS VARCHAR)"
    " || '_' || CAST(l_linenumber AS VARCHAR)), 1, 15)) AS BIGINT)"
)
_MK_RH_DUCK = (
    "CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '|'"
    " || CAST(l_linenumber AS VARCHAR) || '|'"
    " || CAST(CAST(round(l_quantity * 10000) AS BIGINT) AS VARCHAR)"
    " || '|'"
    " || CAST(CAST(round(l_extendedprice * 10000) AS BIGINT)"
    " AS VARCHAR)), 1, 15)) AS BIGINT)"
)


@register(
    "q_merkle_diff",
    oracle=f"""
        WITH hashed AS (
            SELECT {_MK_KH_DUCK} AS kh, {_MK_RH_DUCK} AS rh
            FROM lineitem
        ),
        b AS (SELECT kh % {_MK_BUCKETS} AS bucket, kh, rh FROM hashed),
        src AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS n_src,
                   CAST(sum(rh % {_CK_P}) AS BIGINT) AS sig_src,
                   CAST(bit_xor(rh) AS BIGINT) AS xor_src
            FROM b GROUP BY bucket
        ),
        dst AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS n_dst,
                   CAST(sum(rh % {_CK_P}) AS BIGINT) AS sig_dst,
                   CAST(bit_xor(rh) AS BIGINT) AS xor_dst
            FROM b WHERE kh % {_MK_DROP_MOD} >= {_MK_DROP_LT}
            GROUP BY bucket
        )
        SELECT s.bucket, s.n_src, d.n_dst,
               s.n_src - d.n_dst AS rows_missing
        FROM src s JOIN dst d USING (bucket)
        WHERE s.sig_src != d.sig_dst OR s.xor_src != d.xor_dst
           OR s.n_src != d.n_dst
    """,
    doc=f"Merkle-style anti-entropy diff between a table and a replica"
    f" that silently lost ~0.5% of its rows (deterministic key-hash"
    f" drop rule stands in for the lossy copy): every row hashes once,"
    f" buckets by key-hash range into {_MK_BUCKETS} buckets, and each"
    " side folds per-bucket commutative signatures (modular sum +"
    " bit_xor + count). Only buckets whose signatures DISAGREE are"
    " reported — the Cassandra/Dynamo repair primitive that lets two"
    " 100 TB replicas find their delta by exchanging kilobytes of"
    " bucket digests instead of re-reading each other. One scan per"
    " side, partial-agg shuffles on a perfectly uniform synthetic key;"
    " key-hash bucketing (not row-hash) keeps a MUTATED row in the"
    " same bucket so value drift is caught, not just loss.",
)
def q_merkle_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    kh = F.expr(
        "cast(conv(substr(md5(concat('mk_', cast(l_orderkey as string),"
        " '_', cast(l_linenumber as string))), 1, 15), 16, 10) as bigint)"
    )
    rh = F.expr(
        "cast(conv(substr(md5(concat_ws('|',"
        " cast(l_orderkey as string), cast(l_linenumber as string),"
        " cast(cast(round(l_quantity * 10000, 0) as bigint) as string),"
        " cast(cast(round(l_extendedprice * 10000, 0) as bigint)"
        " as string))), 1, 15), 16, 10) as bigint)"
    )
    b = li.select(
        (kh % _MK_BUCKETS).alias("bucket"),
        (kh % _MK_DROP_MOD >= _MK_DROP_LT).alias("kept"),
        rh.alias("rh"),
    )
    # both replicas fold in ONE scan + ONE shuffle: the dst side is a
    # conditional aggregate over the kept rows (0 is bit_xor's
    # identity, so the CASE form is exact) — halves the lineitem
    # scans and md5 work vs aggregating src and dst separately
    both = b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_src"),
        F.sum(F.col("rh") % _CK_P).cast("bigint").alias("sig_src"),
        F.expr("bit_xor(rh)").cast("bigint").alias("xor_src"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_dst"),
        F.sum(F.when(F.col("kept"), F.col("rh") % _CK_P).otherwise(0))
        .cast("bigint")
        .alias("sig_dst"),
        F.expr("bit_xor(case when kept then rh else 0 end)")
        .cast("bigint")
        .alias("xor_dst"),
    )
    return (
        both
        .filter(
            (F.col("sig_src") != F.col("sig_dst"))
            | (F.col("xor_src") != F.col("xor_dst"))
            | (F.col("n_src") != F.col("n_dst"))
        )
        .select(
            "bucket",
            "n_src",
            "n_dst",
            (F.col("n_src") - F.col("n_dst")).alias("rows_missing"),
        )
    )


# --- functional-dependency discovery ---------------------------------

# Candidate X -> Y dependencies to audit (table, determinant, dependent).
_FD_CANDIDATES = [
    ("orders", "o_orderkey", "o_custkey"),  # key -> attr: must hold
    ("orders", "o_custkey", "o_orderpriority"),  # behavioral: usually broken
    ("lineitem", "l_orderkey", "l_returnflag"),  # order-level flag? broken
    ("lineitem", "l_partkey", "l_suppkey"),  # sourcing exclusivity audit
    ("customer", "c_custkey", "c_mktsegment"),  # key -> attr: must hold
]


def _fd_oracle() -> str:
    parts = []
    for tbl, x, y in _FD_CANDIDATES:
        parts.append(
            f"""
        SELECT '{tbl}.{x} -> {tbl}.{y}' AS candidate,
               CAST(count(*) AS BIGINT) AS n_groups,
               CAST(sum(CASE WHEN n_y > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violating,
               CAST(max(n_y) AS BIGINT) AS worst_fanout,
               sum(CASE WHEN n_y > 1 THEN 1 ELSE 0 END) = 0 AS holds
        FROM (
            SELECT {x}, count(DISTINCT {y}) AS n_y
            FROM {tbl} GROUP BY {x}
        )"""
        )
    return " UNION ALL ".join(parts)


@register(
    "q_fd_discovery",
    oracle=_fd_oracle(),
    doc="Functional-dependency audit (Metanome-style data profiling):"
    " for each candidate X -> Y, group by the determinant and count"
    " groups carrying more than one distinct dependent value — zero"
    " violations certifies the dependency, the violation count + worst"
    " fanout grade how badly a 'soft key' leaks. This is the check"
    " behind dedup-key selection, normalization decisions, and"
    " upstream-contract monitoring. Each candidate is one"
    " partial-agg distinct shuffle on (X, Y) projections (column"
    " pruning keeps the scans 2-column); candidates union into one"
    " 5-row report, so a 100 TB audit is N independent"
    " scan-agg pipelines Spark schedules concurrently.",
)
def q_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for tbl, x, y in _FD_CANDIDATES:
        grouped = (
            load_table(spark, sf_dir, tbl)
            .groupBy(x)
            .agg(F.countDistinct(y).alias("n_y"))
        )
        row = grouped.agg(
            F.lit(f"{tbl}.{x} -> {tbl}.{y}").alias("candidate"),
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum(F.when(F.col("n_y") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating"),
            F.max("n_y").cast("bigint").alias("worst_fanout"),
            (
                F.sum(F.when(F.col("n_y") > 1, 1).otherwise(0)) == 0
            ).alias("holds"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# --- value format-mask profiling -------------------------------------

_MASK_TOPK = 15


@register(
    "q_format_masks",
    oracle=f"""
        WITH vals AS (
            SELECT 'event_type' AS col, event_type AS v FROM events
            UNION ALL
            SELECT 'props', props FROM events
            UNION ALL
            SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
        ),
        masked AS (
            SELECT col,
                   regexp_replace(regexp_replace(regexp_replace(
                       coalesce(v, '<NULL>'),
                       '[0-9]', '9', 'g'),
                       '[a-z]', 'a', 'g'),
                       '[A-Z]', 'A', 'g') AS mask
            FROM vals
        ),
        counts AS (
            SELECT col, mask, count(*) AS n
            FROM masked GROUP BY col, mask
        ),
        ranked AS (
            SELECT col, mask, n,
                   row_number() OVER (PARTITION BY col
                                      ORDER BY n DESC, mask) AS rn
            FROM counts
        )
        SELECT col, mask, CAST(n AS BIGINT) AS n_values,
               CAST(rn AS BIGINT) AS mask_rank
        FROM ranked WHERE rn <= {_MASK_TOPK}
    """,
    doc="Value format-mask profiling (pattern discovery a la Potter's"
    " Wheel / Trifacta): every value collapses to a shape mask —"
    " digits to 9, lowercase to a, uppercase to A, punctuation kept"
    f" — and the top {_MASK_TOPK} masks per column surface. One"
    " glance separates '9-Aaaaa' codes from free text, and"
    " mask-count outliers ARE the malformed rows (the profiling"
    " pass that writes validation regexes for q_dq_constraints)."
    " Masks collapse the value space by orders of magnitude before"
    " the count shuffle, so the aggregate runs on shape vocabulary,"
    " not raw values; character classes are ASCII-explicit ranges"
    " so Java and RE2 regex engines agree byte-for-byte.",
)
def q_format_masks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    vals = (
        ev.select(F.lit("event_type").alias("col"), F.col("event_type").alias("v"))
        .unionByName(ev.select(F.lit("props").alias("col"), F.col("props").alias("v")))
        .unionByName(
            ev.select(
                F.lit("user_id").alias("col"),
                F.col("user_id").cast("string").alias("v"),
            )
        )
    )
    mask = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.coalesce(F.col("v"), F.lit("<NULL>")), "[0-9]", "9"
            ),
            "[a-z]",
            "a",
        ),
        "[A-Z]",
        "A",
    )
    counts = vals.select("col", mask.alias("mask")).groupBy(
        "col", "mask"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("col").orderBy(F.desc("n"), F.asc("mask"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _MASK_TOPK)
        .select(
            "col",
            "mask",
            F.col("n").cast("bigint").alias("n_values"),
            F.col("rn").cast("bigint").alias("mask_rank"),
        )
    )


# --- column-level snapshot diff (CDC row diff) ------------------------

# Deterministic "second snapshot": drop ~0.5% of rows by key hash and
# bump l_quantity on a disjoint ~1% (an update), so the diff contains
# both change types. Same md5 machinery as q_merkle_diff.
_RD_MOD = 1000
_RD_DEL_LT = 5
_RD_UPD_LO, _RD_UPD_HI = 5, 15


@register(
    "q_row_diff",
    oracle=f"""
        WITH src AS (
            -- pk is (orderkey, linenumber, partkey, suppkey): the
            -- 2-col prefix is NOT unique in this fixture, and a CDC
            -- diff on a non-key fans out the join
            SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                   l_quantity, l_extendedprice, l_returnflag,
                   CAST(('0x' || substr(md5('rd_'
                       || CAST(l_orderkey AS VARCHAR) || '_'
                       || CAST(l_linenumber AS VARCHAR) || '_'
                       || CAST(l_partkey AS VARCHAR) || '_'
                       || CAST(l_suppkey AS VARCHAR)), 1, 15)) AS BIGINT)
                       % {_RD_MOD} AS r
            FROM lineitem
        ),
        dst AS (
            SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                   CASE WHEN r >= {_RD_UPD_LO} AND r < {_RD_UPD_HI}
                        THEN l_quantity + 1 ELSE l_quantity END
                       AS l_quantity,
                   l_extendedprice, l_returnflag
            FROM src WHERE r >= {_RD_DEL_LT}
        )
        SELECT s.l_orderkey, s.l_linenumber, s.l_partkey, s.l_suppkey,
               CASE WHEN d.l_orderkey IS NULL THEN 'D' ELSE 'U' END
                   AS change_type,
               CASE WHEN d.l_orderkey IS NULL THEN ''
                    ELSE concat_ws(',',
                        CASE WHEN s.l_quantity IS DISTINCT FROM
                                  d.l_quantity THEN 'l_quantity' END,
                        CASE WHEN s.l_extendedprice IS DISTINCT FROM
                                  d.l_extendedprice
                             THEN 'l_extendedprice' END,
                        CASE WHEN s.l_returnflag IS DISTINCT FROM
                                  d.l_returnflag THEN 'l_returnflag' END)
               END AS changed_cols
        FROM src s
        LEFT JOIN dst d
          ON d.l_orderkey = s.l_orderkey
         AND d.l_linenumber = s.l_linenumber
         AND d.l_partkey = s.l_partkey
         AND d.l_suppkey = s.l_suppkey
        WHERE d.l_orderkey IS NULL
           OR s.l_quantity IS DISTINCT FROM d.l_quantity
           OR s.l_extendedprice IS DISTINCT FROM d.l_extendedprice
           OR s.l_returnflag IS DISTINCT FROM d.l_returnflag
    """,
    doc="Column-level snapshot diff (the Debezium-style CDC readout):"
    " two table versions join on the primary key and every surviving"
    " row reports WHICH columns changed (IS DISTINCT FROM — NULL-safe,"
    " so NULL->value and value->NULL both register), deletes report"
    " as 'D' — the audit that turns 'the tables differ' (q_merkle"
    " diff / q_table_checksum) into an actionable migration worklist."
    " The second snapshot derives deterministically (md5 key-hash"
    " delete + disjoint quantity-bump update bands), so both engines"
    " diff identical inputs. ONE key-partitioned join; at 100 TB you"
    " run it bucket-by-bucket behind the merkle diff so only"
    " disagreeing hash ranges ever join.",
)
def q_row_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    kh = F.expr(
        "cast(conv(substr(md5(concat('rd_', cast(l_orderkey as string),"
        " '_', cast(l_linenumber as string),"
        " '_', cast(l_partkey as string),"
        " '_', cast(l_suppkey as string))), 1, 15), 16, 10) as bigint)"
    )
    src = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
        (kh % _RD_MOD).alias("r"),
    )
    dst = src.filter(F.col("r") >= _RD_DEL_LT).select(
        F.col("l_orderkey").alias("d_orderkey"),
        F.col("l_linenumber").alias("d_linenumber"),
        F.col("l_partkey").alias("d_partkey"),
        F.col("l_suppkey").alias("d_suppkey"),
        F.when(
            (F.col("r") >= _RD_UPD_LO) & (F.col("r") < _RD_UPD_HI),
            F.col("l_quantity") + 1,
        )
        .otherwise(F.col("l_quantity"))
        .alias("d_quantity"),
        F.col("l_extendedprice").alias("d_extendedprice"),
        F.col("l_returnflag").alias("d_returnflag"),
    )
    j = src.join(
        dst,
        (src["l_orderkey"] == dst["d_orderkey"])
        & (src["l_linenumber"] == dst["d_linenumber"])
        & (src["l_partkey"] == dst["d_partkey"])
        & (src["l_suppkey"] == dst["d_suppkey"]),
        "left",
    )
    deleted = F.col("d_orderkey").isNull()
    diff = lambda a, b, name: F.when(  # noqa: E731
        ~F.col(a).eqNullSafe(F.col(b)), F.lit(name)
    )
    changed = F.concat_ws(
        ",",
        diff("l_quantity", "d_quantity", "l_quantity"),
        diff("l_extendedprice", "d_extendedprice", "l_extendedprice"),
        diff("l_returnflag", "d_returnflag", "l_returnflag"),
    )
    return j.filter(
        deleted
        | ~F.col("l_quantity").eqNullSafe(F.col("d_quantity"))
        | ~F.col("l_extendedprice").eqNullSafe(F.col("d_extendedprice"))
        | ~F.col("l_returnflag").eqNullSafe(F.col("d_returnflag"))
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        F.when(deleted, "D").otherwise("U").alias("change_type"),
        F.when(deleted, "").otherwise(changed).alias("changed_cols"),
    )


# ---------------------------------------------------------------------------
# Range-partition planner: sampled split points + balance audit
# ---------------------------------------------------------------------------

_RSP_PARTS = 16
_RSP_SAMPLE = 1009

_RSP_H_SPARK = (
    "cast(conv(substr(md5(concat('rsp_', cast(o_orderkey as string))),"
    " 1, 15), 16, 10) as bigint)"
)
_RSP_H_DUCK = (
    "CAST(('0x' || substr(md5('rsp_' || CAST(o_orderkey AS VARCHAR)),"
    " 1, 15)) AS BIGINT)"
)


@register(
    "q_range_split_points",
    oracle=f"""
        WITH s AS (
            SELECT o_orderdate AS v FROM orders
            ORDER BY {_RSP_H_DUCK}, o_orderkey
            LIMIT {_RSP_SAMPLE}
        ),
        ranked AS (
            SELECT v, row_number() OVER (ORDER BY v) AS rn FROM s
        ),
        cuts AS (
            SELECT k,
                   (SELECT v FROM ranked
                    WHERE rn = (k * {_RSP_SAMPLE}) // {_RSP_PARTS}) AS cut
            FROM (SELECT unnest(generate_series(1, {_RSP_PARTS - 1})) AS k)
        ),
        assigned AS (
            SELECT (SELECT count(*) FROM cuts
                    WHERE cut < o.o_orderdate) AS part_id,
                   o.o_orderdate
            FROM orders o
        ),
        total AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders)
        SELECT CAST(part_id AS INTEGER) AS part_id,
               CAST(count(*) AS BIGINT) AS n_rows,
               min(o_orderdate) AS min_key,
               max(o_orderdate) AS max_key,
               CAST(count(*) * {_RSP_PARTS} AS DOUBLE) / total.n
                   AS balance_ratio
        FROM assigned, total
        GROUP BY part_id, total.n
    """,
    doc=f"Range-partition PLANNER audit: compute {_RSP_PARTS}-way"
    " split points for a date-ordered rewrite of orders (the layout a"
    " lakehouse write uses for time-travel-friendly, range-prunable"
    " files) from a fixed deterministic sample, assign every row, and"
    " report per-partition balance (ratio 1.0 = perfectly equi-depth)."
    " This is what repartitionByRange does internally with a"
    " NONDETERMINISTIC reservoir sample; the md5-ordered sample makes"
    f" the boundaries reproducible AND oracle-checkable. Sample is"
    f" bounded ({_RSP_SAMPLE} rows) at any table size; assignment is a"
    " broadcast array lookup — one wide agg total.",
)
def q_range_split_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    sample = (
        orders.select(
            F.col("o_orderdate").alias("v"),
            F.expr(_RSP_H_SPARK).alias("h"),
            "o_orderkey",
        )
        .orderBy("h", "o_orderkey")
        .limit(_RSP_SAMPLE)
    )
    ranked = sample.select(
        "v", F.row_number().over(Window.orderBy("v")).alias("rn")
    )
    ks = [(k * _RSP_SAMPLE) // _RSP_PARTS for k in range(1, _RSP_PARTS)]
    cuts = (
        ranked.filter(F.col("rn").isin(ks))
        .agg(F.sort_array(F.collect_list("v")).alias("cuts"))
    )
    assigned = orders.crossJoin(F.broadcast(cuts)).select(
        F.expr("size(filter(cuts, c -> c < o_orderdate))").alias("part_id"),
        "o_orderdate",
    )
    total = orders.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        assigned.groupBy("part_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("o_orderdate").alias("min_key"),
            F.max("o_orderdate").alias("max_key"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            F.col("part_id").cast("int").alias("part_id"),
            "n_rows",
            "min_key",
            "max_key",
            (
                (F.col("n_rows") * _RSP_PARTS).cast("double") / F.col("n")
            ).alias("balance_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Erasure (right-to-be-forgotten) audit: affected rows + rewrite cost
# ---------------------------------------------------------------------------

_ERASE_MOD = 97  # deterministic stand-in for the deletion-request list


@register(
    "q_erasure_audit",
    oracle=f"""
        WITH marked AS (
            SELECT event_type, date_trunc('day', ts) AS d,
                   CAST(user_id % {_ERASE_MOD} = 0 AS INTEGER) AS hit,
                   user_id
            FROM events
        ),
        per_type AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(hit) AS BIGINT) AS n_rows_affected,
                   CAST(count(DISTINCT CASE WHEN hit = 1 THEN user_id END)
                        AS BIGINT) AS n_users_affected,
                   CAST(count(DISTINCT d) AS BIGINT) AS n_days,
                   CAST(count(DISTINCT CASE WHEN hit = 1 THEN d END)
                        AS BIGINT) AS n_days_touched
            FROM marked GROUP BY event_type
        )
        SELECT event_type, n_rows, n_rows_affected, n_users_affected,
               CAST(n_rows_affected * 10000 // n_rows AS BIGINT)
                   AS row_share_bp,
               n_days, n_days_touched,
               CAST(n_days_touched * 10000 // n_days AS BIGINT)
                   AS rewrite_share_bp
        FROM per_type
    """,
    doc="Right-to-be-forgotten (GDPR erasure) COST audit: for a"
    f" deletion-request list (user_id %% {_ERASE_MOD} == 0 as the"
    " deterministic stand-in), per event type — affected rows/users,"
    " and the copy-on-write bill: how many DAY PARTITIONS contain at"
    " least one affected row and therefore must be rewritten"
    " (rewrite_share_bp). The punchline every lakehouse learns: a"
    " 0.3% row deletion can touch 100% of partitions, which is why"
    " erasure pipelines batch requests and why user-id bucketing"
    " (confining each user to one file family) beats time-only"
    " layouts for deletion-heavy tables. One scan, two partial aggs;"
    " the anti-join that EXECUTES the deletion is pipeline/"
    "incremental.py's MERGE-delete, tested separately.",
)
def q_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    marked = ev.select(
        "event_type",
        F.date_trunc("day", "ts").alias("d"),
        (F.col("user_id") % _ERASE_MOD == 0).cast("int").alias("hit"),
        "user_id",
    )
    per_type = marked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("hit").cast("bigint").alias("n_rows_affected"),
        F.countDistinct(
            F.when(F.col("hit") == 1, F.col("user_id"))
        ).cast("bigint").alias("n_users_affected"),
        F.countDistinct("d").cast("bigint").alias("n_days"),
        F.countDistinct(F.when(F.col("hit") == 1, F.col("d")))
        .cast("bigint")
        .alias("n_days_touched"),
    )
    return per_type.select(
        "event_type",
        "n_rows",
        "n_rows_affected",
        "n_users_affected",
        F.expr("CAST(n_rows_affected * 10000 div n_rows AS BIGINT)").alias(
            "row_share_bp"
        ),
        "n_days",
        "n_days_touched",
        F.expr(
            "CAST(n_days_touched * 10000 div n_days AS BIGINT)"
        ).alias("rewrite_share_bp"),
    )


# ---------------------------------------------------------------------------
# Small-file compaction plan (the OPTIMIZE / coalesce-partitions decision)
# ---------------------------------------------------------------------------

# Target rows per compacted output file (row count is the scale-free
# proxy the fixture supports; a deployment uses bytes identically).
_COMPACT_TARGET = 1_500


@register(
    "q_compaction_plan",
    oracle=f"""
        WITH per_day AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM events GROUP BY 1
        ),
        cum AS (
            SELECT day, n_rows,
                   CAST(coalesce(sum(n_rows) OVER (
                       ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
            FROM per_day
        ),
        assign AS (
            SELECT day, n_rows,
                   CAST(cum_before // {_COMPACT_TARGET} AS BIGINT)
                       AS bin_id
            FROM cum
        )
        SELECT bin_id,
               CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(n_rows) AS BIGINT) AS total_rows,
               strftime(min(day), '%Y-%m-%d') AS first_day,
               strftime(max(day), '%Y-%m-%d') AS last_day
        FROM assign GROUP BY bin_id
    """,
    doc="Small-file compaction plan over the date-partitioned event"
    " landing (the classic many-tiny-daily-files problem): walk the"
    " day partitions in order, running-sum their row counts, and cut a"
    f" compaction bin every {_COMPACT_TARGET} rows (bin = exclusive"
    " running sum div target — exactly the deterministic form of"
    " Spark AQE's coalesceShufflePartitions / Delta OPTIMIZE's"
    " bin-packing walk). Output: per output file, the input-file count,"
    " row total and day span — the table a maintenance job turns into"
    " rewrite jobs. The running window orders the per-DAY aggregate"
    " (calendar-bounded, one row per day — the whitelisted"
    " unpartitioned-window shape), never the raw events.",
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    per_day = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    # calendar-bounded window (one row per day) — whitelisted shape
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    assign = (
        per_day.withColumn(
            "cum_before", F.coalesce(F.sum("n_rows").over(w), F.lit(0))
        )
        .withColumn(
            "bin_id",
            F.expr(f"CAST(cum_before div {_COMPACT_TARGET} AS BIGINT)"),
        )
        .drop("cum_before")
    )
    return (
        assign.groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("n_rows").cast("bigint").alias("total_rows"),
            F.date_format(F.min("day"), "yyyy-MM-dd").alias(
                "first_day"
            ),
            F.date_format(F.max("day"), "yyyy-MM-dd").alias("last_day"),
        )
        .select("bin_id", "n_files", "total_rows", "first_day", "last_day")
    )


# ---------------------------------------------------------------------------
# Partition retention / expiration plan
# ---------------------------------------------------------------------------

_RETAIN_DAYS = 5


@register(
    "q_retention_plan",
    oracle=f"""
        WITH per_day AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY 1
        ),
        hw AS (SELECT max(day) AS horizon FROM per_day)
        SELECT strftime(day, '%Y-%m-%d') AS day, n_rows, n_users,
               CAST(datediff('day', day, horizon) AS BIGINT) AS age_days,
               datediff('day', day, horizon) >= {_RETAIN_DAYS} AS expire
        FROM per_day, hw
    """,
    doc=f"Partition retention plan: per day partition of the event"
    " landing, row/user counts, age against the corpus high-water day,"
    f" and the expire flag at a {_RETAIN_DAYS}-day retention horizon —"
    " the decision table a lifecycle job (Delta VACUUM / retention"
    " enforcement / GDPR storage-limitation audit) executes, and the"
    " companion to q_erasure_audit (which prices row-level deletes"
    " where this prices partition drops — the cheap path when age, not"
    " identity, drives deletion). Aging against the DATA's high-water"
    " mark, not wall clock, keeps the plan reproducible (and is how a"
    " backfilled table should age anyway). One partial-agg pass + a"
    " 1-row broadcast horizon join.",
)
def q_retention_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_day = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )
    hw = per_day.agg(F.max("day").alias("horizon"))
    return per_day.crossJoin(F.broadcast(hw)).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_rows",
        "n_users",
        F.datediff(F.col("horizon"), F.col("day"))
        .cast("bigint")
        .alias("age_days"),
        (
            F.datediff(F.col("horizon"), F.col("day")) >= _RETAIN_DAYS
        ).alias("expire"),
    )


# ---------------------------------------------------------------------------
# Differentially-private count release (discrete Laplace, exact dyadics)
# ---------------------------------------------------------------------------

# Geometric(1/2) inverse-CDF thresholds: G(h) >= k iff
# h >= 2^60 - 2^(60-k), k = 1..16 (magnitude capped at 16). X = G1 - G2
# is two-sided-geometric / discrete-Laplace noise with alpha = 1/2,
# i.e. epsilon = ln 2 at sensitivity 1 — and because every threshold is
# a dyadic integer, the draw is pure int64 comparisons: bit-identical
# across engines, no libm anywhere.
_GEOM_T = (
    576460752303423488,
    864691128455135232,
    1008806316530991104,
    1080863910568919040,
    1116892707587883008,
    1134907106097364992,
    1143914305352105984,
    1148417904979476480,
    1150669704793161728,
    1151795604700004352,
    1152358554653425664,
    1152640029630136320,
    1152780767118491648,
    1152851135862669312,
    1152886320234758144,
    1152903912420802560,
)

_DP_HA_SPARK = (
    "cast(conv(substr(md5(concat('dpa_', event_type)), 1, 15), 16, 10)"
    " as bigint)"
)
_DP_HB_SPARK = (
    "cast(conv(substr(md5(concat('dpb_', event_type)), 1, 15), 16, 10)"
    " as bigint)"
)
_DP_HA_DUCK = (
    "CAST(('0x' || substr(md5('dpa_' || event_type), 1, 15)) AS BIGINT)"
)
_DP_HB_DUCK = (
    "CAST(('0x' || substr(md5('dpb_' || event_type), 1, 15)) AS BIGINT)"
)


def _geom_sum(h_expr: str) -> str:
    return " + ".join(
        f"(CASE WHEN ({h_expr}) >= {t} THEN 1 ELSE 0 END)"
        for t in _GEOM_T
    )


@register(
    "q_dp_counts",
    oracle=f"""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(({_geom_sum(_DP_HA_DUCK)})
                    - ({_geom_sum(_DP_HB_DUCK)}) AS BIGINT) AS noise,
               CAST(count(*) + ({_geom_sum(_DP_HA_DUCK)})
                    - ({_geom_sum(_DP_HB_DUCK)}) AS BIGINT) AS noisy_n
        FROM events GROUP BY event_type
    """,
    doc="Differentially-private count release: per-type event counts"
    " plus discrete-Laplace noise X = G1 - G2 (two iid Geometric(1/2)"
    " draws), giving epsilon = ln 2 at sensitivity 1 (EVENT-level"
    " adjacency: one event changes one count by 1; user-level DP"
    " would scale noise by each user's contribution bound). The"
    " geometric inverse-CDF thresholds are dyadic integers, so the"
    " noise is pure int64 comparisons on 60-bit md5 draws — the"
    " mechanism is reproducible and engine-exact, which is exactly"
    " what a privacy AUDIT needs (the production release would key the"
    " hash by a secret per-release seed; the mechanism is unchanged)."
    " Output keeps the true n beside noisy_n because this is the"
    " audit view proving the mechanism; the release ships noisy_n"
    " only. One partial-agg scan; noise is a per-GROUP scalar.",
)
def q_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    noise = (
        f"CAST(({_geom_sum(_DP_HA_SPARK)})"
        f" - ({_geom_sum(_DP_HB_SPARK)}) AS BIGINT)"
    )
    return (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            "event_type",
            "n",
            F.expr(noise).alias("noise"),
            (F.col("n") + F.expr(noise)).cast("bigint").alias("noisy_n"),
        )
    )


# ---------------------------------------------------------------------------
# Columnar encoding advisor (storage layout profiling)
# ---------------------------------------------------------------------------

_ENC_PAGE_ROWS = 8192       # simulated parquet page / row-group unit
_ENC_DICT_MAX_CARD = 10     # NDV <= n/10 -> dictionary wins
_ENC_RLE_MIN_RUN_FX = 4000  # avg run >= 4.0 (x1000 fx) -> RLE wins


def _enc_profile_duck(col_expr: str, name: str) -> str:
    return f"""
        SELECT '{name}' AS col_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
               CAST(sum(is_run_start) AS BIGINT) AS n_runs,
               CAST((count(*) * 1000) // nullif(sum(is_run_start), 0)
                    AS BIGINT) AS avg_run_len_fx,
               CASE
                 WHEN count(DISTINCT v) * {_ENC_DICT_MAX_CARD}
                      <= count(*) THEN 'DICT'
                 WHEN (count(*) * 1000) // nullif(sum(is_run_start), 0)
                      >= {_ENC_RLE_MIN_RUN_FX} THEN 'RLE'
                 ELSE 'PLAIN'
               END AS advice
        FROM (
            SELECT v,
                   CASE WHEN lag(v) OVER (
                            PARTITION BY pg ORDER BY event_id
                        ) IS DISTINCT FROM v THEN 1 ELSE 0 END
                       AS is_run_start
            FROM (
                SELECT event_id, event_id // {_ENC_PAGE_ROWS} AS pg,
                       CAST({col_expr} AS VARCHAR) AS v
                FROM events
            )
        )
    """


@register(
    "q_encoding_advisor",
    oracle=" UNION ALL ".join(
        _enc_profile_duck(c, n)
        for n, c in [
            ("event_type", "event_type"),
            ("user_id", "user_id"),
            ("props", "props"),
            ("day", "CAST(ts AS DATE)"),
        ]
    ),
    doc="Columnar ENCODING ADVISOR — the storage-layout profiling pass"
    " behind parquet writer tuning and Z-order decisions: per column,"
    " row count, NDV, value-run count within simulated"
    f" {_ENC_PAGE_ROWS}-row pages (runs are a per-page property, which"
    " also keeps every window PARTITIONED — no global sort), average"
    " run length in x1000 fixed point, and the encoding verdict"
    " (DICT when NDV <= n/10, RLE when avg run >= 4, else PLAIN)."
    " Complements q_zone_map / q_zorder_prune: those measure skipping"
    " under a layout, this measures the encoding the layout earns."
    " One window + one agg per profiled column over a narrow"
    " projection; columns profile independently (a real deployment"
    " fans them out in one pass with conditional aggs).",
)
def q_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cols = [
        ("event_type", F.col("event_type").cast("string")),
        ("user_id", F.col("user_id").cast("string")),
        ("props", F.col("props").cast("string")),
        ("day", F.col("ts").cast("date").cast("string")),
    ]
    out = None
    for name, expr in cols:
        base = ev.select(
            "event_id",
            F.expr(f"event_id div {_ENC_PAGE_ROWS}").alias("pg"),
            expr.alias("v"),
        )
        runs = base.select(
            "v",
            F.expr(
                "CASE WHEN lag(v) OVER ("
                " PARTITION BY pg ORDER BY event_id)"
                " IS DISTINCT FROM v THEN 1 ELSE 0 END"
            ).alias("is_run_start"),
        )
        prof = runs.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("v").cast("bigint").alias("n_distinct"),
            F.sum("is_run_start").cast("bigint").alias("n_runs"),
        ).select(
            F.lit(name).alias("col_name"),
            "n_rows",
            "n_distinct",
            "n_runs",
            F.expr(
                "cast((n_rows * 1000) div nullif(n_runs, 0) as bigint)"
            ).alias("avg_run_len_fx"),
            F.expr(
                f"CASE WHEN n_distinct * {_ENC_DICT_MAX_CARD} <= n_rows"
                " THEN 'DICT'"
                " WHEN (n_rows * 1000) div nullif(n_runs, 0)"
                f" >= {_ENC_RLE_MIN_RUN_FX} THEN 'RLE'"
                " ELSE 'PLAIN' END"
            ).alias("advice"),
        )
        out = prof if out is None else out.unionByName(prof)
    return out


# ---------------------------------------------------------------------------
# Column concentration profile: exact Gini impurity / Simpson index
# (round 9 — the entropy-style profiler without the banned ln())
# ---------------------------------------------------------------------------

_IMP_COLS_DUCK = (
    ("event_type", "event_type"),
    ("user_bucket", "CAST(user_id % 100 AS VARCHAR)"),
    ("value_decile",
     "CAST(least(CAST(floor(value * 10) AS BIGINT), 9) AS VARCHAR)"),
    ("weekday", "CAST(dayofweek(CAST(ts AS DATE)) AS VARCHAR)"),
)
_IMP_COLS_SPARK = (
    ("event_type", "event_type"),
    ("user_bucket", "cast(user_id % 100 as string)"),
    ("value_decile",
     "cast(least(CAST(floor(value * 10) AS BIGINT), 9) as string)"),
    ("weekday", "cast(dayofweek(cast(ts as date)) as string)"),
)


@register(
    "q_column_impurity",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{name}' AS col_name,
               CAST(count(DISTINCT {expr}) AS BIGINT) AS n_distinct,
               CAST(count({expr}) AS BIGINT) AS n_rows,
               CAST(1e0 - (SELECT CAST(sum(CAST(c AS HUGEINT) * c)
                                       AS DOUBLE)
                           FROM (SELECT count(*) AS c FROM events
                                 WHERE {expr} IS NOT NULL
                                 GROUP BY {expr}))
                    / (CAST(count({expr}) AS DOUBLE)
                       * CAST(count({expr}) AS DOUBLE))
                    AS DOUBLE) AS gini_impurity
        FROM events
        """
        for name, expr in _IMP_COLS_DUCK
    ),
    doc="Column concentration profile for the events stream: per"
    " derived column (type, user bucket, value decile, weekday) the"
    " exact Gini impurity / Simpson diversity 1 - sum(c_i^2)/n^2 plus"
    " distinct and non-null counts — the skew-at-a-glance profiler"
    " that ranks join keys and partition candidates (impurity ~ 0"
    " means one dominant value: broadcast or salt it; ~ (k-1)/k means"
    " uniform). Shannon entropy is the textbook choice but its ln()"
    " is banned engine-wide (per-libm rounding — the q_kn_bigram"
    " precedent); the Simpson form is an exact rational from ONE"
    " integer-moment aggregation per column, same ranking power. Each"
    " column costs one partial-agg shuffle over its value counts.",
)
def q_column_impurity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = None
    for name, expr in _IMP_COLS_SPARK:
        vals = ev.select(F.expr(expr).alias("v"))
        counts = (
            vals.filter(F.col("v").isNotNull())
            .groupBy("v")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
        row = counts.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            # coalesce: empty corpus sums to NULL, the oracle's
            # count(expr) to 0
            F.coalesce(F.sum("c"), F.lit(0))
            .cast("bigint")
            .alias("n_rows"),
            F.expr(
                "cast(sum(cast(c as decimal(38,0)) * c) as double)"
            ).alias("ss"),
        ).select(
            F.lit(name).alias("col_name"),
            "n_distinct",
            "n_rows",
            F.expr(
                "cast(1e0 - ss / nullif(cast(n_rows as double)"
                " * cast(n_rows as double), 0e0) as double)"
            ).alias("gini_impurity"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# round 10: referential-integrity audit + snapshot schema drift
# ---------------------------------------------------------------------------

# (child_table, fk_column, parent_table, parent_key) for every FK edge
# of the star schema. The audit is the data-quality twin of the
# round-10 NULL-join-key battery: NULL FKs and dangling FKs both drop
# silently from inner joins, so a pipeline only finds out via exactly
# this kind of explicit orphan count.
_FK_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def _fk_oracle() -> str:
    parts = []
    for child, fk, parent, key in _FK_EDGES:
        parts.append(f"""
        SELECT '{child}.{fk}->{parent}' AS relation,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN c.{fk} IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null_fk,
               CAST(sum(CASE WHEN c.{fk} IS NOT NULL
                              AND p.{key} IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_orphans
        FROM {child} c
        LEFT JOIN (SELECT DISTINCT {key} FROM {parent}) p
               ON c.{fk} = p.{key}""")
    return " UNION ALL ".join(parts)


@register(
    "q_referential_integrity",
    oracle=_fk_oracle(),
    doc="Referential-integrity audit over every FK edge of the star"
    " schema: per relation, total child rows, NULL foreign keys, and"
    " ORPHANS (non-NULL FK with no parent — the dangling-reference"
    " class that silently vanishes from every inner join). Each edge"
    " is one left join against the DISTINCT parent key set plus a"
    " count aggregate; the seven 1-row results union into one plan,"
    " so Catalyst runs the whole audit in a single job. At 100 TB"
    " each edge shuffles on its own key (or broadcasts the small"
    " dimension key sets) — there is no cross-edge dependency, so"
    " the audit parallelizes edge-by-edge.",
)
def q_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for child, fk, parent, key in _FK_EDGES:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent).select(key).distinct()
        joined = c.join(p, c[fk] == p[key], "left")
        row = joined.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(
                F.when(F.col(fk).isNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_null_fk"),
            F.sum(
                F.when(
                    F.col(fk).isNotNull() & F.col(key).isNull(), 1
                ).otherwise(0)
            ).cast("bigint").alias("n_orphans"),
        ).select(
            F.lit(f"{child}.{fk}->{parent}").alias("relation"),
            "n_rows",
            "n_null_fk",
            "n_orphans",
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "q_schema_drift",
    oracle="""
        WITH halves AS (
            SELECT CASE WHEN event_id % 2 = 0 THEN 'base'
                        ELSE 'current' END AS snapshot,
                   user_id, event_type, value, props
            FROM events
        ),
        wide AS (
            SELECT snapshot,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS d_user,
                   CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0
                            END) AS BIGINT) AS z_user,
                   CAST(count(DISTINCT event_type) AS BIGINT) AS d_type,
                   CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0
                            END) AS BIGINT) AS z_type,
                   CAST(count(DISTINCT value) AS BIGINT) AS d_value,
                   CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0
                            END) AS BIGINT) AS z_value,
                   CAST(count(DISTINCT props) AS BIGINT) AS d_props,
                   CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0
                            END) AS BIGINT) AS z_props
            FROM halves GROUP BY snapshot
        )
        SELECT snapshot, col, n_rows, n_distinct, n_null
        FROM (
            SELECT snapshot, 'user_id' AS col, n_rows,
                   d_user AS n_distinct, z_user AS n_null FROM wide
            UNION ALL
            SELECT snapshot, 'event_type', n_rows, d_type, z_type
            FROM wide
            UNION ALL
            SELECT snapshot, 'value', n_rows, d_value, z_value
            FROM wide
            UNION ALL
            SELECT snapshot, 'props', n_rows, d_props, z_props
            FROM wide
        )
    """,
    doc="Snapshot schema-drift profile: per column of the events"
    " table, row count, exact distinct count, and NULL count for two"
    " deterministic snapshot halves (even/odd event_id stand in for"
    " consecutive ingest snapshots) — the table a contract monitor"
    " diffs to catch null-rate spikes and cardinality collapses"
    " before they poison downstream joins. ONE scan: all eight"
    " distinct/null aggregates compute in a single groupBy (Spark"
    " plans multi-distinct via one Expand), then the wide row"
    " unpivots into the long (snapshot, column) shape with zero"
    " further shuffles. Counts are exact integers on both engines.",
)
def q_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.withColumn(
            "snapshot",
            F.when(F.pmod("event_id", F.lit(2)) == 0, "base").otherwise(
                "current"
            ),
        )
        .groupBy("snapshot")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("user_id").cast("bigint").alias("d_user"),
            F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0))
            .cast("bigint").alias("z_user"),
            F.countDistinct("event_type").cast("bigint").alias("d_type"),
            F.sum(F.when(F.col("event_type").isNull(), 1).otherwise(0))
            .cast("bigint").alias("z_type"),
            F.countDistinct("value").cast("bigint").alias("d_value"),
            F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
            .cast("bigint").alias("z_value"),
            F.countDistinct("props").cast("bigint").alias("d_props"),
            F.sum(F.when(F.col("props").isNull(), 1).otherwise(0))
            .cast("bigint").alias("z_props"),
        )
    )
    return wide.select(
        "snapshot",
        F.expr(
            "stack(4,"
            " 'user_id', d_user, z_user,"
            " 'event_type', d_type, z_type,"
            " 'value', d_value, z_value,"
            " 'props', d_props, z_props)"
        ).alias("col", "n_distinct", "n_null"),
        "n_rows",
    ).select("snapshot", "col", "n_rows", "n_distinct", "n_null")
