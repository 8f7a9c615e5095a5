"""One-pass sufficient-statistics correlation matrix.

Feature correlation over a 100 TB fact table must be a SINGLE scan: the
classic distributed pattern reduces each (x, y) pair to six exact sums
(n, Sx, Sy, Sxx, Syy, Sxy) with map-side partial aggregation — one
shuffle of a dozen numbers — and evaluates Pearson r from the moments.
Naive ``corr()`` aggregates accumulate doubles in partition order and
are nondeterministic across layouts/engines; here every input is scaled
to an exact integer (money has 2 decimals, quantity is integral), the
sums run in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — overflow-proof
and bit-exact — and only the final Pearson formula touches doubles,
where IEEE int->double conversion and arithmetic are identical
everywhere. The raw-moment form can cancel catastrophically for |r|~1
with huge means; acceptable here because both engines compute the
IDENTICAL expression, and the fixture's correlations are moderate.

The reference computes no statistics at all; this is the
profile-your-features stage a training pipeline runs before mixing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table

# exact integer scaling: quantity is integral, money has 2 decimals
_COLS = {
    "quantity": "CAST(round(l_quantity) AS BIGINT)",
    "price": "CAST(round(l_extendedprice * 100) AS BIGINT)",
    "discount": "CAST(round(l_discount * 100) AS BIGINT)",
}
_PAIRS = [("quantity", "price"), ("quantity", "discount"), ("price", "discount")]


def _spark_sums() -> list:
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for a in _COLS:
        aggs.append(
            F.sum(F.expr(f"CAST(i_{a} AS DECIMAL(38,0))")).alias(f"s_{a}")
        )
    done = set()
    for a in _COLS:
        for b in _COLS:
            key = tuple(sorted((a, b)))
            if key in done:
                continue
            done.add(key)
            aggs.append(
                F.sum(
                    F.expr(f"CAST(i_{key[0]} * i_{key[1]} AS DECIMAL(38,0))")
                ).alias(f"s_{key[0]}_{key[1]}")
            )
    return aggs


_HI = 1 << 60
_LO = 1 << 30


def _dec2dbl(s: str, duck: bool) -> str:
    """Exact-integer sum -> double with DETERMINISTIC rounding on both
    engines. A direct CAST(decimal AS DOUBLE) is engine-dependent once
    the value exceeds 2^53 (observed: Spark's Java-BigDecimal path and
    DuckDB's HUGEINT path disagree by an ulp on 65-bit sums, the sf0.1
    q_corr_matrix mismatch). Split the nonnegative integer as
    hi*2^60 + mid*2^30 + lo: each part is < 2^53 (exact in double),
    the power-of-two scalings are exact, and the two additions round
    identically under IEEE on every engine. Valid for sums < 2^113
    (~1e34 — beyond any 100 TB moment)."""
    dv = "//" if duck else "div"
    return (
        f"(CAST(({s}) {dv} {_HI} AS DOUBLE) * {float(_HI)!r}"
        f" + CAST((({s}) % {_HI}) {dv} {_LO} AS DOUBLE) * {float(_LO)!r}"
        f" + CAST(({s}) % {_LO} AS DOUBLE))"
    )


def _r_expr(x: str, y: str, duck: bool = False) -> str:
    """Pearson r from the exact moment sums, evaluated in double with
    an expression tree mirrored verbatim in the oracle (int->double via
    the deterministic split, see _dec2dbl)."""
    kx, ky = sorted((x, y))
    sxy = _dec2dbl(f"s_{kx}_{ky}", duck)
    sxx = _dec2dbl(f"s_{x}_{x}", duck)
    syy = _dec2dbl(f"s_{y}_{y}", duck)
    sx, sy = _dec2dbl(f"s_{x}", duck), _dec2dbl(f"s_{y}", duck)
    # nullif: a zero-variance column (constant values, or n = 1) has
    # undefined r — DuckDB's x/0.0 yields NULL while Spark's ANSI
    # division throws; nullif makes BOTH engines emit NULL
    return (
        f"((n * {sxy}) - ({sx} * {sy}))"
        f" / nullif(sqrt((n * {sxx}) - ({sx} * {sx}))"
        f" * sqrt((n * {syy}) - ({sy} * {sy})), 0e0)"
    )


@register(
    "q_corr_matrix",
    oracle=f"""
        WITH i AS (
            SELECT {', '.join(f'{e} AS i_{a}' for a, e in _COLS.items())}
            FROM lineitem
        ),
        m AS (
            SELECT CAST(count(*) AS DOUBLE) AS n,
                   {', '.join(f'sum(i_{a}) AS s_{a}' for a in _COLS)},
                   {', '.join(
                       f'sum(i_{a} * i_{b}) AS s_{a}_{b}'
                       for a, b in [
                           ('discount', 'discount'), ('discount', 'price'),
                           ('discount', 'quantity'), ('price', 'price'),
                           ('price', 'quantity'), ('quantity', 'quantity'),
                       ]
                   )}
            FROM i
        )
        SELECT x_name, y_name, r FROM (
            {' UNION ALL '.join(
                f"SELECT '{x}' AS x_name, '{y}' AS y_name,"
                f" {_r_expr(x, y, duck=True)} AS r FROM m"
                for x, y in _PAIRS
            )}
        )
    """,
    doc="Pearson correlation matrix of lineitem features in ONE scan:"
    " exact integer sufficient statistics (DECIMAL/HUGEINT sums — "
    " order-independent, overflow-proof), Pearson evaluated from the"
    " moments in a mirrored double expression. The scale pattern for"
    " any pairwise statistic over a 100 TB fact table: map-side"
    " partials reduce the shuffle to a dozen numbers.",
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ints = li.select(
        *[F.expr(e).alias(f"i_{a}") for a, e in _COLS.items()]
    )
    m = ints.agg(*_spark_sums())
    m.createOrReplaceTempView("corr_moments")
    rows = [
        f"SELECT '{x}' AS x_name, '{y}' AS y_name,"
        f" {_r_expr(x, y)} AS r FROM corr_moments"
        for x, y in _PAIRS
    ]
    return spark.sql(" UNION ALL ".join(rows))


@register(
    "q_chi2_independence",
    oracle="""
        WITH cells AS (
            SELECT lang, source, CAST(count(*) AS BIGINT) AS o
            FROM documents GROUP BY lang, source
        ),
        margins AS (
            SELECT lang, source, o,
                   sum(o) OVER (PARTITION BY lang) AS row_tot,
                   sum(o) OVER (PARTITION BY source) AS col_tot,
                   sum(o) OVER () AS n
            FROM cells
        )
        SELECT lang, source, o,
               CAST(row_tot AS BIGINT) AS row_tot,
               CAST(col_tot AS BIGINT) AS col_tot,
               CAST(CAST(o * n - row_tot * col_tot AS BIGINT) AS DOUBLE)
                   * CAST(CAST(o * n - row_tot * col_tot AS BIGINT)
                          AS DOUBLE)
                   / CAST(CAST(n * row_tot * col_tot AS BIGINT) AS DOUBLE)
                   AS chi2_term
        FROM margins
    """,
    doc="Chi-square independence audit between two categorical columns"
    " (lang x source): per-cell observed count, margins, and the"
    " chi-square contribution in the division-free-until-the-end form"
    " (o*N - rt*ct)^2 / (N*rt*ct) — all integer until ONE"
    " correctly-rounded IEEE square+divide, so rows hash-match with no"
    " fixed-point machinery. The feature-dependence screen a curation"
    " pipeline runs before stratifying on one column of a correlated"
    " pair. One groupBy produces the contingency table (|langs| x"
    " |sources| cells — alphabet-sized); the margin windows run over"
    " that tiny frame, never the corpus. Integer headroom: o*N <= N^2"
    " and N*rt*ct <= N^3 stay exact in int64/double for N well past"
    " any per-partition fixture; at true 100 TB cell counts the same"
    " query runs with the margins in DECIMAL(38,0).",
)
def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    # contingency-table-sized frames (|langs| x |sources| rows)
    margins = cells.select(
        "lang",
        "source",
        "o",
        F.sum("o").over(Window.partitionBy("lang")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("source")).alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    num = (F.col("o") * F.col("n") - F.col("row_tot") * F.col("col_tot")).cast(
        "bigint"
    ).cast("double")
    den = (F.col("n") * F.col("row_tot") * F.col("col_tot")).cast(
        "bigint"
    ).cast("double")
    return margins.select(
        "lang",
        "source",
        "o",
        F.col("row_tot").cast("bigint").alias("row_tot"),
        F.col("col_tot").cast("bigint").alias("col_tot"),
        (num * num / den).alias("chi2_term"),
    )


# --- Simpson's-paradox detector --------------------------------------

_SP_URGENT = "1-URGENT"


@register(
    "q_simpson_flip",
    oracle=f"""
        WITH cell AS (
            SELECT c.c_mktsegment AS seg, c.c_nationkey AS nation,
                   count(*) AS n,
                   sum(CASE WHEN o.o_orderpriority = '{_SP_URGENT}'
                            THEN 1 ELSE 0 END) AS u
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        ),
        pooled AS (
            SELECT seg, sum(n) AS n, sum(u) AS u FROM cell GROUP BY seg
        ),
        segpair AS (
            SELECT a.seg AS seg_a, b.seg AS seg_b,
                   CASE WHEN a.u * b.n > b.u * a.n THEN 1
                        WHEN a.u * b.n < b.u * a.n THEN -1
                        ELSE 0 END AS pooled_sign
            FROM pooled a JOIN pooled b ON a.seg < b.seg
        ),
        natpair AS (
            SELECT a.seg AS seg_a, b.seg AS seg_b,
                   CASE WHEN a.u * b.n > b.u * a.n THEN 1
                        WHEN a.u * b.n < b.u * a.n THEN -1
                        ELSE 0 END AS nat_sign
            FROM cell a
            JOIN cell b ON a.nation = b.nation AND a.seg < b.seg
        )
        SELECT p.seg_a, p.seg_b,
               CAST(p.pooled_sign AS INT) AS pooled_sign,
               CAST(count(*) AS BIGINT) AS n_nations,
               CAST(sum(CASE WHEN n.nat_sign = -p.pooled_sign
                             AND p.pooled_sign != 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_flipped,
               p.pooled_sign != 0
                   AND sum(CASE WHEN n.nat_sign = -p.pooled_sign
                                THEN 1 ELSE 0 END) = count(*) AS simpson
        FROM segpair p
        JOIN natpair n ON n.seg_a = p.seg_a AND n.seg_b = p.seg_b
        GROUP BY p.seg_a, p.seg_b, p.pooled_sign
    """,
    doc="Simpson's-paradox detector over urgent-order rates: for every"
    " market-segment pair, compare the POOLED rate ordering against"
    " the ordering inside each nation (stratum) — `simpson` fires when"
    " the pooled winner loses in EVERY stratum where both segments"
    " appear, the aggregation-reversal trap every metrics dashboard"
    " eventually steps into. All comparisons are integer"
    " CROSS-MULTIPLICATIONS (u1*n2 vs u2*n1) — no rate division, no"
    " float boundary, so both engines agree exactly, including ties."
    " Shape: one join + one (segment x nation) partial agg; segment"
    " pair tables are dimension-bounded (tens of rows), so the paradox"
    " scan itself is a broadcast-sized self-join however large the"
    " fact table.",
)
def q_simpson_flip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cell = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment", "c_nationkey")),
            orders["o_custkey"] == cust["c_custkey"],
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("c_nationkey").alias("nation"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("o_orderpriority") == _SP_URGENT, 1).otherwise(0)
            ).alias("u"),
        )
    )
    pooled = cell.groupBy("seg").agg(
        F.sum("n").alias("n"), F.sum("u").alias("u")
    )

    def _sign(ua, na, ub, nb):
        d = ua * nb - ub * na
        return (
            F.when(d > 0, 1).when(d < 0, -1).otherwise(0).cast("int")
        )

    pa = pooled.select(
        F.col("seg").alias("seg_a"), F.col("n").alias("na"), F.col("u").alias("ua")
    )
    pb = pooled.select(
        F.col("seg").alias("seg_b"), F.col("n").alias("nb"), F.col("u").alias("ub")
    )
    segpair = (
        pa.join(pb, pa["seg_a"] < pb["seg_b"])
        .select(
            "seg_a",
            "seg_b",
            _sign(F.col("ua"), F.col("na"), F.col("ub"), F.col("nb")).alias(
                "pooled_sign"
            ),
        )
    )
    ca = cell.select(
        F.col("seg").alias("seg_a"), "nation",
        F.col("n").alias("na"), F.col("u").alias("ua"),
    )
    cb = cell.select(
        F.col("seg").alias("seg_b"), F.col("nation").alias("nation_b"),
        F.col("n").alias("nb"), F.col("u").alias("ub"),
    )
    natpair = (
        ca.join(
            cb,
            (ca["nation"] == cb["nation_b"]) & (ca["seg_a"] < cb["seg_b"]),
        )
        .select(
            "seg_a",
            "seg_b",
            _sign(F.col("ua"), F.col("na"), F.col("ub"), F.col("nb")).alias(
                "nat_sign"
            ),
        )
    )
    return (
        segpair.join(natpair, ["seg_a", "seg_b"])
        .groupBy("seg_a", "seg_b", "pooled_sign")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nations"),
            F.sum(
                F.when(
                    (F.col("nat_sign") == -F.col("pooled_sign"))
                    & (F.col("pooled_sign") != 0),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_flipped"),
            (
                (F.first("pooled_sign") != 0)
                & (
                    F.sum(
                        F.when(
                            F.col("nat_sign") == -F.col("pooled_sign"), 1
                        ).otherwise(0)
                    )
                    == F.count(F.lit(1))
                )
            ).alias("simpson"),
        )
        .select(
            "seg_a", "seg_b", "pooled_sign",
            "n_nations", "n_flipped", "simpson",
        )
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap confidence intervals (distributed bootstrap)
# ---------------------------------------------------------------------------

# Resample count: with B = 40 the empirical 2.5%/97.5% quantiles of the
# resample means ARE the min/max order statistics (floor(0.025*40) = 1st,
# ceil(0.975*40) = 40th), so the CI needs no engine-dependent quantile
# interpolation — exact min/max of exact integers.
_BOOT_B = 40
# Poisson(1) CDF as 28-bit integer thresholds (floor(CDF(k) * 16^7),
# k = 0..8, weight capped at 9): the per-(row, b) weight is the number
# of thresholds at or below the row's 28-bit md5 draw — pure integer
# comparisons, no float anywhere, so both engines derive the IDENTICAL
# resample weights. 28 bits quantizes the CDF at 2^-28 — statistically
# irrelevant for a bootstrap and exactly reproduced by both engines.
_POIS_T = (
    98751885,
    197503771,
    246879713,
    263338361,
    267453023,
    268275955,
    268413111,
    268432704,
    268435153,
)

# One md5 yields FOUR independent 28-bit draws (hex chars 1-7, 9-15,
# 17-23, 25-31 of the 128-bit digest): replicate b = (g-1)*4 + i + 1
# for group g in 1..B/4 and quarter i in 0..3. md5 over a short concat
# IS this query's unit cost — one hash per draw measured 8.8 s at
# sf0.1, four draws per hash ~2.5 s.
_BOOT_G = _BOOT_B // 4
_BOOT_M_SPARK = (
    "md5(concat('boot_', cast(g as string), '_',"
    " cast(event_id as string)))"
)
_BOOT_M_DUCK = (
    "md5('boot_' || CAST(g AS VARCHAR) || '_'"
    " || CAST(event_id AS VARCHAR))"
)


def _pois_w(h_expr: str) -> str:
    return " + ".join(
        f"(CASE WHEN ({h_expr}) >= {t} THEN 1 ELSE 0 END)" for t in _POIS_T
    )


@register(
    "q_bootstrap_ci",
    oracle=f"""
        WITH ev AS (
            SELECT event_id, event_type,
                   CAST(round(value * 100) AS BIGINT) AS r_fx
            FROM events
        ),
        bw AS (
            SELECT event_type, b, r_fx, {_pois_w('h')} AS w
            FROM (
                SELECT event_type, r_fx,
                       (g - 1) * 4 + i + 1 AS b,
                       CAST(('0x' || substr(m, 1 + i * 8, 7))
                            AS BIGINT) AS h
                FROM (
                    SELECT event_type, r_fx, g, {_BOOT_M_DUCK} AS m
                    FROM ev, generate_series(1, {_BOOT_G}) AS t(g)
                ), generate_series(0, 3) AS s(i)
            )
        ),
        means AS (
            SELECT event_type, b,
                   CASE WHEN sum(w) = 0 THEN NULL
                        ELSE CAST((sum(w * r_fx) * 10000) // sum(w)
                                  AS BIGINT) END AS bmean_fx
            FROM bw GROUP BY event_type, b
        ),
        base AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
                   CAST((sum(r_fx) * 10000) // count(*) AS BIGINT)
                       AS mean_fx
            FROM ev GROUP BY event_type
        )
        SELECT base.event_type, n_events, mean_fx,
               CAST(count(m.bmean_fx) AS BIGINT) AS n_boot,
               CAST(min(m.bmean_fx) AS BIGINT) AS ci_lo_fx,
               CAST(max(m.bmean_fx) AS BIGINT) AS ci_hi_fx
        FROM base JOIN means m USING (event_type)
        GROUP BY 1, 2, 3
    """,
    doc=f"Poisson bootstrap CI for the per-type mean value — THE"
    " distributed bootstrap (Chamandy et al., Google): classical"
    " resampling needs n draws WITH replacement per replicate (a"
    " global shuffle per replicate); weighting each row by an"
    f" independent Poisson(1) count instead is one narrow map pass"
    f" that emits {_BOOT_B} (replicate, weight) pairs per row into a"
    " partial-agg shuffle of |types| x B cells. Weights come from"
    " 60-bit md5 draws compared against integer Poisson-CDF"
    " thresholds, resample means are exact truncating integer"
    f" divisions (cents x 1e4), and with B = {_BOOT_B} the empirical"
    " 2.5/97.5% quantiles are the min/max order statistics — the whole"
    " CI is integer arithmetic, bit-identical in both engines. An"
    " all-zero-weight replicate (possible on tiny groups) is NULL and"
    " excluded by min/max/count on both sides.",
)
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("r_fx"),
    )
    # explode the replicate index FIRST, hash on the flat column:
    # md5/conv inside a transform() lambda is evaluated interpreted per
    # element (~50x slower, measured 75 s at sf0.1), while the flat
    # form runs inside whole-stage codegen (~3 s). The B-fold explode
    # is map-side only — partial aggregation reduces it to |types| x B
    # cells before the shuffle.
    bw = (
        ev.select(
            "event_type",
            "r_fx",
            "event_id",
            F.explode(F.expr(f"sequence(1, {_BOOT_G})")).alias("g"),
        )
        # hash ONCE per (row, g) into a column (inlining the hash into
        # _pois_w would compute 9 md5s per row), then split the digest
        # into its four 28-bit quarters
        .select(
            "event_type",
            "r_fx",
            "g",
            F.expr(_BOOT_M_SPARK).alias("m"),
        )
        .select(
            "event_type",
            "r_fx",
            "g",
            # plain array of substrings (codegen), conv on the FLAT
            # column after the explode — conv inside a transform
            # lambda is evaluated interpreted, per element
            F.posexplode(
                F.expr(
                    "array(substr(m, 1, 7), substr(m, 9, 7),"
                    " substr(m, 17, 7), substr(m, 25, 7))"
                )
            ).alias("i", "hs"),
        )
        .select(
            "event_type",
            "r_fx",
            F.expr("(g - 1) * 4 + i + 1").alias("b"),
            F.expr("cast(conv(hs, 16, 10) as bigint)").alias("h"),
        )
        .select(
            "event_type", "r_fx", "b", F.expr(_pois_w("h")).alias("w")
        )
    )
    means = (
        bw.groupBy("event_type", "b")
        .agg(
            F.sum("w").alias("sum_w"),
            F.sum(F.col("w") * F.col("r_fx")).alias("sum_wx"),
        )
        .select(
            "event_type",
            F.expr(
                "CASE WHEN sum_w = 0 THEN NULL"
                " ELSE CAST((sum_wx * 10000) div sum_w AS BIGINT) END"
            ).alias("bmean_fx"),
        )
    )
    base = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.expr("CAST((sum(r_fx) * 10000) div count(*) AS BIGINT)").alias(
            "mean_fx"
        ),
    )
    boot = means.groupBy("event_type").agg(
        F.count("bmean_fx").cast("bigint").alias("n_boot"),
        F.min("bmean_fx").cast("bigint").alias("ci_lo_fx"),
        F.max("bmean_fx").cast("bigint").alias("ci_hi_fx"),
    )
    return base.join(boot, "event_type").select(
        "event_type", "n_events", "mean_fx", "n_boot",
        "ci_lo_fx", "ci_hi_fx",
    )


# ---------------------------------------------------------------------------
# Calibration audit: reliability bins + fixed-point Brier decomposition
# ---------------------------------------------------------------------------

# synthetic perfectly-calibrated predictor: score p ~ md5-uniform per
# event, outcome y | p ~ Bernoulli(p) via a SECOND independent draw —
# both as 60-bit integer comparisons, so the audit mechanism (the part
# this query ships) is engine-exact end to end, and its output should
# show bin accuracy tracking bin mean score (the property a REAL
# model's scores are checked against by swapping in its score column).
_CAL_BINS = 10
_CAL_P_SPARK = (
    "cast(conv(substr(md5(concat('calp_', cast(event_id as string))),"
    " 1, 15), 16, 10) as bigint)"
)
_CAL_Y_SPARK = (
    "cast(conv(substr(md5(concat('caly_', cast(event_id as string))),"
    " 1, 15), 16, 10) as bigint)"
)
_CAL_P_DUCK = (
    "CAST(('0x' || substr(md5('calp_' || CAST(event_id AS VARCHAR)),"
    " 1, 15)) AS BIGINT)"
)
_CAL_Y_DUCK = (
    "CAST(('0x' || substr(md5('caly_' || CAST(event_id AS VARCHAR)),"
    " 1, 15)) AS BIGINT)"
)
# p_fx = h div (2^60 // 10^4): a multiply-first form (h * 10^4 //
# 2^60) overflows int64 on the Spark side (DuckDB silently promotes to
# HUGEINT); the divide-first form stays in int64 on both engines and
# both compute the IDENTICAL value. Range 0..10000 inclusive (the top
# edge can land an 11th bin with ~2^-60 mass — same on both engines).
_CAL_DIV = (1 << 60) // 10000


@register(
    "q_calibration_bins",
    oracle=f"""
        WITH scored AS (
            SELECT {_CAL_P_DUCK} // {_CAL_DIV} AS p_fx,
                   CASE WHEN {_CAL_Y_DUCK} < {_CAL_P_DUCK}
                        THEN 1 ELSE 0 END AS y
            FROM events
        ),
        binned AS (
            SELECT CAST(p_fx * {_CAL_BINS} // 10000 AS BIGINT) AS bin,
                   p_fx, y
            FROM scored
        )
        SELECT bin,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(p_fx) AS BIGINT) AS sum_p_fx,
               CAST(sum(y) AS BIGINT) AS n_pos,
               CAST(sum((p_fx - y * 10000) * (p_fx - y * 10000))
                    AS BIGINT) AS brier_fx2
        FROM binned GROUP BY bin
    """,
    doc=f"Model-calibration reliability table: scores bucket into"
    f" {_CAL_BINS} probability bins and each bin reports count, summed"
    " score, positives, and the fixed-point Brier numerator"
    " sum((p - y)^2 x 1e8) — the expected-calibration-error inputs"
    " every scoring pipeline (quality classifiers, dedup verifiers,"
    " LM judges) publishes beside its predictions. The demo predictor"
    " is synthetic-but-calibrated BY CONSTRUCTION (y | p ~"
    " Bernoulli(p) from two independent md5 draws as pure int64"
    " comparisons), so the mechanism is gate-verified bit-exactly and"
    " a real model swaps its score column into the same plan. One"
    " partial-agg scan; output is O(bins).",
)
def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    scored = ev.select(
        F.expr(
            f"{_CAL_P_SPARK} div {_CAL_DIV}"
        ).alias("p_fx"),
        F.expr(
            f"CASE WHEN {_CAL_Y_SPARK} < {_CAL_P_SPARK}"
            " THEN 1 ELSE 0 END"
        ).alias("y"),
    )
    return (
        scored.select(
            F.expr(f"CAST(p_fx * {_CAL_BINS} div 10000 AS BIGINT)").alias(
                "bin"
            ),
            "p_fx",
            "y",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("p_fx").cast("bigint").alias("sum_p_fx"),
            F.sum("y").cast("bigint").alias("n_pos"),
            F.sum(
                (F.col("p_fx") - F.col("y") * 10000)
                * (F.col("p_fx") - F.col("y") * 10000)
            )
            .cast("bigint")
            .alias("brier_fx2"),
        )
    )


# ---------------------------------------------------------------------------
# Isotonic calibration: PAVA over the reliability bins, in closed form
# ---------------------------------------------------------------------------

# The calibration map itself: the monotone step function closest (L2)
# to the per-bin empirical rates — what a production scorer ships
# beside q_calibration_bins' reliability table. Instead of the
# sequential pool-adjacent-violators loop (driver-side, order-
# dependent), both engines evaluate the MINIMAX characterization of
# the isotonic fit (Robertson-Wright-Dykstra):
#
#     fit_i = max_{j <= i} min_{k >= i} avg(y over bins j..k)
#
# which is a closed-form triangle join over the BIN table — bounded at
# |bins|^3 <= ~1.3k rows regardless of corpus size, so the whole fit
# is driver-scale after the one binning scan. Interval averages are
# ppm-floored integers (sums of y are non-negative, so trunc == floor
# in both engines), and max/min of exact integers are engine-exact;
# the monotonicity of the minimax holds for ANY value matrix (the
# j-set grows and the k-set shrinks with i), so the output is a valid
# isotonic map even under quantization.


@register(
    "q_isotonic_pava",
    oracle=f"""
        WITH scored AS (
            SELECT {_CAL_P_DUCK} // {_CAL_DIV} AS p_fx,
                   CASE WHEN {_CAL_Y_DUCK} < {_CAL_P_DUCK}
                        THEN 1 ELSE 0 END AS y
            FROM events
        ),
        bins AS (
            SELECT CAST(p_fx * {_CAL_BINS} // 10000 AS BIGINT) AS bin,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(y) AS BIGINT) AS sum_y
            FROM scored GROUP BY 1
        ),
        ivals AS (
            SELECT j.bin AS jb, k.bin AS kb,
                   (sum(m.sum_y) * 1000000) // sum(m.n) AS val
            FROM bins j
            JOIN bins k ON k.bin >= j.bin
            JOIN bins m ON m.bin BETWEEN j.bin AND k.bin
            GROUP BY j.bin, k.bin
        ),
        inner_min AS (
            SELECT i.bin, v.jb, min(v.val) AS mn
            FROM bins i
            JOIN ivals v ON v.jb <= i.bin AND v.kb >= i.bin
            GROUP BY i.bin, v.jb
        ),
        fit AS (
            SELECT bin, CAST(max(mn) AS BIGINT) AS iso_ppm
            FROM inner_min GROUP BY bin
        )
        SELECT b.bin, b.n, b.sum_y,
               CAST(b.sum_y * 1000000 // b.n AS BIGINT) AS rate_ppm,
               f.iso_ppm
        FROM bins b JOIN fit f USING (bin)
    """,
    doc="Isotonic (PAVA) calibration map over q_calibration_bins'"
    " reliability bins, evaluated via the closed-form minimax"
    " characterization fit_i = max_{j<=i} min_{k>=i} avg(bins j..k)"
    " instead of the sequential pooling loop — a |bins|^3-bounded"
    " triangle join that stays declarative and engine-exact"
    " (ppm-floored interval averages on non-negative integer sums)."
    " One binning scan over events; everything downstream is"
    " bin-table-scale. A real model swaps its score column into the"
    " same plan; the synthetic predictor is calibrated by"
    " construction, so the fitted map should track the diagonal.",
)
def q_isotonic_pava(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bins = (
        ev.select(
            F.expr(f"{_CAL_P_SPARK} div {_CAL_DIV}").alias("p_fx"),
            F.expr(
                f"CASE WHEN {_CAL_Y_SPARK} < {_CAL_P_SPARK}"
                " THEN 1 ELSE 0 END"
            ).alias("y"),
        )
        .select(
            F.expr(f"CAST(p_fx * {_CAL_BINS} div 10000 AS BIGINT)")
            .alias("bin"),
            "y",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("sum_y"),
        )
    )
    j = bins.select(
        F.col("bin").alias("jb"),
        F.col("n").alias("jn"),
        F.col("sum_y").alias("jy"),
    )
    k = bins.select(F.col("bin").alias("kb"))
    m = bins.select(
        F.col("bin").alias("mb"),
        F.col("n").alias("mn_n"),
        F.col("sum_y").alias("mn_y"),
    )
    ivals = (
        j.join(F.broadcast(k), F.col("kb") >= F.col("jb"))
        .join(
            F.broadcast(m),
            (F.col("mb") >= F.col("jb")) & (F.col("mb") <= F.col("kb")),
        )
        .groupBy("jb", "kb")
        .agg(
            F.expr("(sum(mn_y) * 1000000) div sum(mn_n)").alias("val")
        )
    )
    i = bins.select(F.col("bin").alias("ib"))
    inner_min = (
        i.join(
            F.broadcast(ivals),
            (F.col("jb") <= F.col("ib")) & (F.col("kb") >= F.col("ib")),
        )
        .groupBy("ib", "jb")
        .agg(F.min("val").alias("mn"))
    )
    fit = inner_min.groupBy("ib").agg(
        F.max("mn").cast("bigint").alias("iso_ppm")
    )
    return bins.join(
        F.broadcast(fit), bins.bin == fit.ib
    ).select(
        "bin",
        "n",
        "sum_y",
        F.expr("CAST(sum_y * 1000000 div n AS BIGINT)").alias(
            "rate_ppm"
        ),
        "iso_ppm",
    )
