"""Resampling / nonparametric inference operators (round-8 batch):
randomization test, delete-a-group jackknife, leave-one-source-out
data valuation, Mann-Kendall trend, Brown-Forsythe variance test.

All follow the repo's engine-exactness discipline: measurements are
quantized to exact integer fixed point at the scan, every aggregation
is an integer (or DECIMAL(38)/HUGEINT) sum — order-independent and
bit-identical across engines — and doubles appear only in final
projections whose expression trees the DuckDB oracles mirror verbatim.
Resampling never copies the data B times conceptually: the B-fold
explode is a NARROW map of (b, group-key, int measurement) rows that
partial-aggregates map-side before the one shuffle, the same shape
q_bootstrap_ci documents (a measured 50x win over per-row lambdas).

The reference computes no statistics at all (single-process Airflow
ETL, ``dags/gold.py``); these are the experiment-analysis and
data-valuation passes a training-data pipeline runs on corpus + event
telemetry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.operators.stats import _dec2dbl
from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table

# seeded 60-bit md5 hash -> bigint, both engines (ivm.py idiom)
def _h_spark(expr: str) -> str:
    return (
        f"cast(conv(substr(md5({expr}), 1, 15), 16, 10) as bigint)"
    )


def _h_duck(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


# ---------------------------------------------------------------------------
# Randomization (permutation) test
# ---------------------------------------------------------------------------

_PERM_B = 120  # one md5 word yields 60 label bits; 2 words per event


@register(
    "q_permutation_test",
    oracle=f"""
        WITH ev AS (
            SELECT user_id,
                   CAST(round(value * 100) AS BIGINT) AS fx,
                   {_h_duck("'permA' || CAST(event_id AS VARCHAR)")} AS h0,
                   {_h_duck("'permB' || CAST(event_id AS VARCHAR)")} AS h1
            FROM events
        ),
        lab AS (
            SELECT b.b, ev.fx,
                   CASE WHEN b.b = -1 THEN user_id % 2
                        ELSE ((CASE WHEN b.b < 60 THEN h0 ELSE h1 END)
                              >> (b.b % 60)) % 2
                   END AS grp
            FROM ev CROSS JOIN (
                SELECT generate_series AS b
                FROM generate_series(-1, {_PERM_B - 1})
            ) b
        ),
        stats AS (
            SELECT b,
                   CAST(sum(CASE WHEN grp = 0 THEN fx END) AS HUGEINT)
                       AS sa,
                   CAST(count(CASE WHEN grp = 0 THEN fx END) AS HUGEINT)
                       AS na,
                   CAST(sum(CASE WHEN grp = 1 THEN fx END) AS HUGEINT)
                       AS sb,
                   CAST(count(CASE WHEN grp = 1 THEN fx END) AS HUGEINT)
                       AS nb
            FROM lab GROUP BY b
        ),
        obs AS (SELECT * FROM stats WHERE b = -1)
        SELECT CAST(obs.na AS BIGINT) AS n_a,
               CAST(obs.nb AS BIGINT) AS n_b,
               CAST({_PERM_B} AS BIGINT) AS b_perms,
               CAST(sum(CASE WHEN abs(p.sa * p.nb - p.sb * p.na)
                                  * (obs.na * obs.nb)
                             >= abs(obs.sa * obs.nb - obs.sb * obs.na)
                                  * (p.na * p.nb)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
               CAST(CAST(1 + sum(CASE WHEN
                        abs(p.sa * p.nb - p.sb * p.na)
                            * (obs.na * obs.nb)
                        >= abs(obs.sa * obs.nb - obs.sb * obs.na)
                            * (p.na * p.nb)
                        THEN 1 ELSE 0 END) AS DOUBLE)
                    / CAST({_PERM_B + 1} AS DOUBLE) AS DOUBLE) AS p_value
        FROM stats p CROSS JOIN obs
        WHERE p.b >= 0
        GROUP BY obs.na, obs.nb
    """,
    doc="Randomization test for the mean-value difference between the"
    f" even/odd user cohorts: {_PERM_B} seeded label reassignments,"
    " two-sided p-value with the +1 correction. Labels are HARVESTED"
    " AS BITS: each event hashes TWICE (md5 -> 60-bit words) and"
    " permutation b reads bit b%60 of word b div 60 — md5 bits are"
    " independent, so this is B independent reassignments at 2 hashes"
    " per event instead of B (the naive per-(b,event) md5 measured"
    " 17.9 s at sf0.1; the bit harvest keeps identical statistical"
    " semantics and engine-exactness — variable-distance"
    " shiftright/>> are plain integer ops on both engines). The"
    " extremeness comparison |Sa*nb - Sb*na| cross-multiplied by the"
    " opposite denominators runs entirely in HUGEINT/DECIMAL(38) —"
    " mean differences compare as exact rationals, never floats."
    " Scale shape: one narrow B-fold explode that partial-aggregates"
    " map-side to B rows before the only shuffle (the q_bootstrap_ci"
    " shape). At 100 TB the B x groups grid is a few hundred rows of"
    " driver-free arithmetic.",
)
def q_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("cast(round(value * 100) as bigint)").alias("fx"),
        F.expr(
            _h_spark("concat('permA', cast(event_id as string))")
        ).alias("h0"),
        F.expr(
            _h_spark("concat('permB', cast(event_id as string))")
        ).alias("h1"),
    )
    lab = ev.select(
        "fx",
        "user_id",
        "h0",
        "h1",
        F.explode(F.expr(f"sequence(-1, {_PERM_B - 1})")).alias("b"),
    ).select(
        "b",
        "fx",
        F.expr(
            "CASE WHEN b = -1 THEN user_id % 2"
            " ELSE shiftright(CASE WHEN b < 60 THEN h0 ELSE h1 END,"
            " cast(b % 60 as int)) % 2 END"
        ).alias("grp"),
    )
    stats = lab.groupBy("b").agg(
        F.expr(
            "cast(sum(CASE WHEN grp = 0 THEN fx END) as decimal(38,0))"
        ).alias("sa"),
        F.expr(
            "cast(count(CASE WHEN grp = 0 THEN fx END) as decimal(38,0))"
        ).alias("na"),
        F.expr(
            "cast(sum(CASE WHEN grp = 1 THEN fx END) as decimal(38,0))"
        ).alias("sb"),
        F.expr(
            "cast(count(CASE WHEN grp = 1 THEN fx END) as decimal(38,0))"
        ).alias("nb"),
    )
    obs = (
        stats.filter(F.col("b") == -1)
        .select(
            F.col("sa").alias("osa"),
            F.col("na").alias("ona"),
            F.col("sb").alias("osb"),
            F.col("nb").alias("onb"),
        )
    )
    perms = stats.filter(F.col("b") >= 0)
    extreme = F.expr(
        "CASE WHEN abs(sa * nb - sb * na) * (ona * onb)"
        " >= abs(osa * onb - osb * ona) * (na * nb)"
        " THEN 1 ELSE 0 END"
    )
    return (
        perms.crossJoin(F.broadcast(obs))
        .groupBy("ona", "onb")
        .agg(
            F.sum(extreme).cast("bigint").alias("n_extreme"),
        )
        .select(
            F.col("ona").cast("bigint").alias("n_a"),
            F.col("onb").cast("bigint").alias("n_b"),
            F.lit(_PERM_B).cast("bigint").alias("b_perms"),
            "n_extreme",
            (
                (F.lit(1) + F.col("n_extreme")).cast("double")
                / F.lit(float(_PERM_B + 1))
            ).alias("p_value"),
        )
    )


# ---------------------------------------------------------------------------
# Delete-a-group jackknife for a ratio metric
# ---------------------------------------------------------------------------

_JK_GROUPS = 50
_JK_SCALE = 1_000_000  # ratio fixed point (value has 2 decimals)


@register(
    "q_jackknife_ratio",
    oracle=f"""
        WITH p AS (
            SELECT {_h_duck("'jk' || CAST(user_id AS VARCHAR)")}
                       % {_JK_GROUPS} AS g,
                   CAST(round(value * 100) AS BIGINT) AS fx
            FROM events WHERE event_type = 'purchase'
        ),
        per AS (
            SELECT g, CAST(sum(fx) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS n
            FROM p GROUP BY g
        ),
        tot AS (
            SELECT CAST(sum(s) AS BIGINT) AS st,
                   CAST(sum(n) AS BIGINT) AS nt,
                   CAST(count(*) AS BIGINT) AS j
            FROM per
        ),
        loo AS (
            SELECT ((tot.st - per.s) * {_JK_SCALE}) // (tot.nt - per.n)
                       AS rfx
            FROM per CROSS JOIN tot
        ),
        mu AS (
            SELECT CAST(sum(rfx) AS BIGINT) // CAST(count(*) AS BIGINT)
                       AS mu_fx
            FROM loo
        )
        SELECT tot.j AS j_groups, tot.nt AS n_rows,
               (tot.st * {_JK_SCALE}) // tot.nt AS r_hat_fx,
               CAST(sum(CAST((rfx - mu_fx) * (rfx - mu_fx)
                             AS HUGEINT)) AS BIGINT) AS ss_dev_fx2,
               CAST(CAST(tot.j - 1 AS DOUBLE) / CAST(tot.j AS DOUBLE)
                    * CAST(sum(CAST((rfx - mu_fx) * (rfx - mu_fx)
                                    AS HUGEINT)) AS BIGINT)
                    / ({_JK_SCALE}.0 * {_JK_SCALE}.0) AS DOUBLE)
                   AS var_jack
        FROM loo CROSS JOIN tot CROSS JOIN mu
        GROUP BY tot.j, tot.nt, tot.st
    """,
    doc=f"Delete-a-group jackknife ({_JK_GROUPS} md5 user buckets) for"
    " the mean-purchase-value RATIO estimator: leave-one-group-out"
    " replicates R_j = (S - S_j)/(N - N_j) carried in integer fixed"
    " point (floor division of nonnegative int64 — identical on both"
    " engines), squared deviations summed about the floored replicate"
    " mean, Quenouille variance (J-1)/J * sum(d^2) projected to double"
    " only at the end. The grouped jackknife is THE variance method"
    " for cluster-correlated data (users, not rows, are the i.i.d."
    " unit) and costs one partial-agg shuffle to"
    f" {_JK_GROUPS} rows + driver-free {_JK_GROUPS}-row arithmetic —"
    " at 100 TB identical shape, still one scan. Fixed-point bound:"
    " S*SCALE needs log2(S) + 20 bits < 63, fine through ~1e12 fx"
    " total; beyond that raise the decimal cast, not the design.",
)
def q_jackknife_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.expr(
                _h_spark("concat('jk', cast(user_id as string))")
                + f" % {_JK_GROUPS}"
            ).alias("g"),
            F.expr("cast(round(value * 100) as bigint)").alias("fx"),
        )
        .groupBy("g")
        .agg(
            F.sum("fx").cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    tot = per.agg(
        F.sum("s").cast("bigint").alias("st"),
        F.sum("n").cast("bigint").alias("nt"),
        F.count(F.lit(1)).cast("bigint").alias("j"),
    )
    loo = per.crossJoin(F.broadcast(tot)).select(
        "st",
        "nt",
        "j",
        # nullif: with a single populated bucket the leave-one-out
        # remainder is empty — NULL on both engines (DuckDB // 0 is
        # NULL, Spark ANSI div throws without the guard)
        F.expr(
            f"((st - s) * {_JK_SCALE}) div nullif(nt - n, 0)"
        ).alias("rfx"),
    )
    mu = loo.agg(
        F.expr("cast(sum(rfx) as bigint) div cast(count(*) as bigint)")
        .alias("mu_fx")
    )
    dev2 = F.expr(
        "cast(sum(cast((rfx - mu_fx) * (rfx - mu_fx)"
        " as decimal(38,0))) as bigint)"
    )
    return (
        loo.crossJoin(F.broadcast(mu))
        .groupBy("j", "nt", "st")
        .agg(dev2.alias("ss_dev_fx2"))
        .select(
            F.col("j").alias("j_groups"),
            F.col("nt").alias("n_rows"),
            F.expr(f"(st * {_JK_SCALE}) div nt").alias("r_hat_fx"),
            "ss_dev_fx2",
            (
                (F.col("j") - 1).cast("double")
                / F.col("j").cast("double")
                * F.col("ss_dev_fx2")
                / F.lit(float(_JK_SCALE) * float(_JK_SCALE))
            ).alias("var_jack"),
        )
    )


# ---------------------------------------------------------------------------
# Leave-one-source-out data valuation
# ---------------------------------------------------------------------------


@register(
    "q_loo_source_value",
    oracle="""
        WITH base AS (
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY source
        ),
        tot AS (
            SELECT CAST(sum(n_docs) AS BIGINT) AS nt,
                   CAST(sum(sum_chars) AS BIGINT) AS st
            FROM base
        ),
        tg AS (
            SELECT text, CAST(count(*) AS BIGINT) AS cnt
            FROM documents GROUP BY text
        ),
        dup_tot AS (
            SELECT CAST(sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END)
                        AS BIGINT) AS base_dup
            FROM tg
        ),
        ts AS (
            SELECT d.source, d.text, CAST(count(*) AS BIGINT) AS cnt_s,
                   any_value(tg.cnt) AS cnt
            FROM documents d JOIN tg ON d.text = tg.text
            GROUP BY d.source, d.text
        ),
        dup_delta AS (
            SELECT source,
                   CAST(sum(
                       (CASE WHEN cnt >= 2 THEN cnt ELSE 0 END)
                       - (CASE WHEN cnt - cnt_s >= 2
                               THEN cnt - cnt_s ELSE 0 END)
                   ) AS BIGINT) AS dup_removed
            FROM ts GROUP BY source
        )
        SELECT b.source, b.n_docs, b.sum_chars,
               CAST(CAST(t.st - b.sum_chars AS DOUBLE)
                    / CAST(t.nt - b.n_docs AS DOUBLE) AS DOUBLE)
                   AS loo_mean_chars,
               CAST(CAST(t.st AS DOUBLE) / CAST(t.nt AS DOUBLE)
                    AS DOUBLE) AS base_mean_chars,
               dt.base_dup,
               dd.dup_removed,
               dt.base_dup - dd.dup_removed AS loo_dup_docs
        FROM base b
        CROSS JOIN tot t
        CROSS JOIN dup_tot dt
        JOIN dup_delta dd ON dd.source = b.source
    """,
    doc="Leave-one-source-out DATA VALUATION over the corpus: for each"
    " source, the corpus mean-length metric recomputed without it"
    " (algebraic LOO — (S - S_s)/(N - N_s) from per-source sufficient"
    " statistics, no second scan) AND its marginal contribution to the"
    " exact-duplicate count: removing source s turns a text group of"
    " size c with c_s rows from max(c,2*[c>=2]) duplicated docs into"
    " f(c - c_s), so the delta folds from one (text, source) agg"
    " joined to text totals — never a per-source corpus rescan (the"
    " naive form is |sources| full passes; this is 2 passes total)."
    " This is the cheap end of the Shapley spectrum (marginal"
    " contribution to the full coalition) that data-curation loops"
    " use to price sources before an ablation run. All counts exact"
    " integers; the two mean projections are mirrored IEEE divisions.",
)
def q_loo_source_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )
    tot = base.agg(
        F.sum("n_docs").cast("bigint").alias("nt"),
        F.sum("sum_chars").cast("bigint").alias("st"),
    )
    tg = docs.groupBy("text").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    dup_tot = tg.agg(
        F.sum(F.expr("CASE WHEN cnt >= 2 THEN cnt ELSE 0 END"))
        .cast("bigint")
        .alias("base_dup")
    )
    ts = (
        docs.select("source", "text")
        .groupBy("source", "text")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt_s"))
        .join(tg, "text")
    )
    dup_delta = ts.groupBy("source").agg(
        F.sum(
            F.expr(
                "(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END)"
                " - (CASE WHEN cnt - cnt_s >= 2"
                "        THEN cnt - cnt_s ELSE 0 END)"
            )
        )
        .cast("bigint")
        .alias("dup_removed")
    )
    return (
        base.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(dup_tot))
        .join(dup_delta, "source")
        .select(
            "source",
            "n_docs",
            "sum_chars",
            # nullif: a source holding the WHOLE corpus (single-row /
            # single-source fixtures) has no leave-one-out remainder —
            # NULL on both engines (DuckDB 0/0 is NULL, Spark ANSI
            # throws without the guard)
            F.expr(
                "cast(st - sum_chars as double)"
                " / nullif(cast(nt - n_docs as double), 0e0)"
            ).alias("loo_mean_chars"),
            (
                F.col("st").cast("double") / F.col("nt").cast("double")
            ).alias("base_mean_chars"),
            "base_dup",
            "dup_removed",
            (F.col("base_dup") - F.col("dup_removed")).alias(
                "loo_dup_docs"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Mann-Kendall trend test per user
# ---------------------------------------------------------------------------


@register(
    "q_mann_kendall",
    oracle="""
        WITH daily AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        AS BIGINT) AS s_fx,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY user_id, CAST(ts AS DATE)
        ),
        pairs AS (
            SELECT a.user_id,
                   CASE WHEN b.s_fx * a.n > a.s_fx * b.n THEN 1
                        WHEN b.s_fx * a.n < a.s_fx * b.n THEN -1
                        ELSE 0 END AS sgn
            FROM daily a JOIN daily b
              ON a.user_id = b.user_id AND a.day < b.day
        ),
        nd AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_days
            FROM daily GROUP BY user_id
        )
        SELECT nd.user_id, nd.n_days,
               CAST(coalesce(sum(p.sgn), 0) AS BIGINT) AS s_stat,
               CAST(nd.n_days * (nd.n_days - 1) / 2 AS BIGINT)
                   AS n_pairs,
               CAST(CASE WHEN nd.n_days >= 2 THEN
                        CAST(coalesce(sum(p.sgn), 0) AS DOUBLE)
                        / CAST(nd.n_days * (nd.n_days - 1) / 2
                               AS DOUBLE)
                    END AS DOUBLE) AS tau
        FROM nd LEFT JOIN pairs p ON p.user_id = nd.user_id
        GROUP BY nd.user_id, nd.n_days
    """,
    doc="Mann-Kendall trend test of each user's DAILY MEAN value"
    " series: S = sum of sign(x_j - x_i) over ordered day pairs,"
    " tau-a = S / C(n,2). The mean comparison is exact — sign("
    " S_j/N_j - S_i/N_i) evaluated as the integer cross product"
    " sign(S_j*N_i - S_i*N_j), no float ever enters the statistic —"
    " and the pairwise stage is per-user bounded (<= 31 daily points"
    " => <= 465 pairs per user, a within-group self-join that grows"
    " LINEARLY in users; the corpus-wide all-pairs form never"
    " appears). The distribution-free trend screen for per-entity"
    " telemetry where OLS slopes (q_ols_trend) are outlier-fragile."
    " One daily partial agg + one user-keyed join shuffle.",
)
def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "user_id",
            F.col("ts").cast("date").alias("day"),
            F.expr("cast(round(value * 100) as bigint)").alias("fx"),
        )
        .groupBy("user_id", "day")
        .agg(
            F.sum("fx").cast("bigint").alias("s_fx"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    a = daily.select(
        "user_id",
        F.col("day").alias("day_a"),
        F.col("s_fx").alias("sa"),
        F.col("n").alias("na"),
    )
    b = daily.select(
        "user_id",
        F.col("day").alias("day_b"),
        F.col("s_fx").alias("sb"),
        F.col("n").alias("nb"),
    )
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("day_a") < F.col("day_b"))
        .select(
            "user_id",
            F.expr(
                "CASE WHEN sb * na > sa * nb THEN 1"
                " WHEN sb * na < sa * nb THEN -1 ELSE 0 END"
            ).alias("sgn"),
        )
    )
    nd = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    s = pairs.groupBy("user_id").agg(
        F.sum("sgn").cast("bigint").alias("s_stat")
    )
    return (
        nd.join(s, "user_id", "left")
        .select(
            "user_id",
            "n_days",
            F.coalesce(F.col("s_stat"), F.lit(0))
            .cast("bigint")
            .alias("s_stat"),
            F.expr("cast(n_days * (n_days - 1) / 2 as bigint)").alias(
                "n_pairs"
            ),
            F.expr(
                "cast(CASE WHEN n_days >= 2 THEN"
                " cast(coalesce(s_stat, 0) as double)"
                " / cast(cast(n_days * (n_days - 1) / 2 as bigint)"
                "        as double) END as double)"
            ).alias("tau"),
        )
    )


# ---------------------------------------------------------------------------
# Brown-Forsythe (median-based Levene) variance-homogeneity test
# ---------------------------------------------------------------------------


@register(
    "q_levene_bf",
    oracle="""
        WITH v AS (
            -- complete cases only: a NULL value would rank NULLS FIRST
            -- in Spark but NULLS LAST in DuckDB (shifting the median
            -- rank), and a NULL event_type would shift the sorted fold
            -- order of the between_part accumulation
            SELECT event_type, event_id,
                   CAST(round(value * 100) AS BIGINT) AS fx
            FROM events
            WHERE value IS NOT NULL AND event_type IS NOT NULL
        ),
        med AS (
            SELECT event_type, fx AS med_fx
            FROM (
                SELECT event_type, fx,
                       row_number() OVER (PARTITION BY event_type
                           ORDER BY fx, event_id) AS rn,
                       count(*) OVER (PARTITION BY event_type) AS n
                FROM v
            ) WHERE rn = (n + 1) // 2
        ),
        z AS (
            SELECT v.event_type, abs(v.fx - m.med_fx) AS z_fx
            FROM v JOIN med m ON v.event_type = m.event_type
        ),
        g AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_i,
                   CAST(sum(z_fx) AS BIGINT) AS s_i,
                   CAST(sum(CAST(z_fx * z_fx AS HUGEINT)) AS BIGINT)
                       AS ss_i
            FROM z GROUP BY event_type
        ),
        terms AS (
            -- per-group S_i^2/n_i as ONE mirrored IEEE division of the
            -- exact integer S_i^2 (power-of-two split) by n_i; the
            -- k-term float sum then folds in SORTED group order via an
            -- explicit list_reduce, so the addition sequence (and thus
            -- the rounded result) is identical on both engines — a
            -- bare sum(double) over groups is engine-order-dependent
            -- (caught by the pathological battery)
            SELECT event_type,
                   ({s2dbl} / CAST(n_i AS DOUBLE)) AS term
            FROM g
        ),
        tot AS (
            SELECT CAST(sum(g.n_i) AS BIGINT) AS n,
                   CAST(sum(g.s_i) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS k,
                   (SELECT list_reduce(
                        list(term ORDER BY event_type),
                        (a, b) -> a + b) FROM terms)
                       AS between_part
            FROM g
        )
        SELECT g.event_type, g.n_i, g.s_i, g.ss_i,
               CAST(
                 (CAST(t.n - t.k AS DOUBLE) / CAST(t.k - 1 AS DOUBLE))
                 * (t.between_part
                    - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE)
                      / CAST(t.n AS DOUBLE))
                 / nullif(CAST(sum(g2.ss_i) AS DOUBLE)
                          - t.between_part, 0e0)
                 AS DOUBLE) AS w_stat
        FROM g
        CROSS JOIN tot t
        CROSS JOIN g g2
        GROUP BY g.event_type, g.n_i, g.s_i, g.ss_i,
                 t.n, t.s, t.k, t.between_part
    """.format(
        s2dbl=_dec2dbl("CAST(s_i AS HUGEINT) * s_i", duck=True)
    ),
    doc="Brown-Forsythe variance-homogeneity test (median-based Levene"
    " — the robust default) of value across event types: per-group"
    " LOWER median via the exact order-statistic idiom (q_agg_median;"
    " no engine interpolation), absolute deviations as exact int fx,"
    " W from the one-way-ANOVA decomposition of the deviations using"
    " integer moments (n_i, S_i, SS_i) with the between-group part"
    " sum(S_i^2/n_i) accumulated per group — doubles only in the"
    " final mirrored projection. Emitted per group (n_i, S_i, SS_i)"
    " with the shared W repeated, so the scorecard shows WHICH group"
    " drives heteroscedasticity. Scale: one rank window + two"
    " partial-agg shuffles on event_type; the k-row finale is free.",
)
def q_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # complete cases, mirrored in the oracle: NULL value ranks
    # NULLS FIRST here but NULLS LAST in DuckDB (median-rank shift),
    # and a NULL event_type would shift the sorted fold order
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull() & F.col("event_type").isNotNull()
        )
        .select(
            "event_type",
            "event_id",
            F.expr("cast(round(value * 100) as bigint)").alias("fx"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("fx", "event_id")
    wn = Window.partitionBy("event_type")
    med = (
        ev.select(
            "event_type",
            "fx",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .filter(F.expr("rn = (n + 1) div 2"))
        .select("event_type", F.col("fx").alias("med_fx"))
    )
    z = ev.join(med, "event_type").select(
        "event_type", F.abs(F.col("fx") - F.col("med_fx")).alias("z_fx")
    )
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i"),
        F.sum("z_fx").cast("bigint").alias("s_i"),
        F.expr(
            "cast(sum(cast(z_fx * z_fx as decimal(38,0))) as bigint)"
        ).alias("ss_i"),
    )
    # between_part: per-group S_i^2/n_i as one mirrored IEEE division
    # (exact S_i^2 through the power-of-two split), folded in SORTED
    # group order with an explicit aggregate() lambda — identical
    # addition sequence on both engines; sum(double) over groups is
    # engine-order-dependent (caught by the pathological battery).
    # aggregate()'s 0.0 seed is exact: 0 + t == t in IEEE.
    s2dbl = _dec2dbl("cast(s_i as decimal(38,0)) * s_i", duck=False)
    tot = g.agg(
        F.sum("n_i").cast("bigint").alias("n"),
        F.sum("s_i").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(event_type,"
            f" ({s2dbl} / cast(n_i as double)) as term))),"
            " cast(0 as double), (a, x) -> a + x.term)"
        ).alias("between_part"),
        F.sum("ss_i").cast("bigint").alias("ss_all"),
    )
    return g.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_i",
        "s_i",
        "ss_i",
        # nullif on k-1: a single-group corpus has no between-group
        # variance to test — NULL on both engines
        F.expr(
            "cast((cast(n - k as double)"
            " / nullif(cast(k - 1 as double), 0e0))"
            " * (between_part"
            "    - cast(s as double) * cast(s as double)"
            "      / cast(n as double))"
            " / nullif(cast(ss_all as double) - between_part, 0e0)"
            " as double)"
        ).alias("w_stat"),
    )


# ---------------------------------------------------------------------------
# Two-feature OLS via exact normal equations (Cramer)
# ---------------------------------------------------------------------------


def _ols2_dets(duck: bool) -> dict[str, str]:
    """Cramer cofactor expansions of the 3x3 normal equations, with
    every moment lifted to DECIMAL(38,0)/HUGEINT FIRST: the cofactor
    products reach ~1e21 at sf0.1 (int64 overflows — observed) and
    ~1e24 at sf1, well inside 128-bit/38-digit range."""
    if duck:
        c = {k: f"CAST({k} AS HUGEINT)" for k in
             ("n", "s1", "s2", "s11", "s22", "s12", "sy", "s1y", "s2y")}
    else:
        c = {k: f"cast({k} as decimal(38,0))" for k in
             ("n", "s1", "s2", "s11", "s22", "s12", "sy", "s1y", "s2y")}
    n, s1, s2 = c["n"], c["s1"], c["s2"]
    s11, s22, s12 = c["s11"], c["s22"], c["s12"]
    sy, s1y, s2y = c["sy"], c["s1y"], c["s2y"]
    det = (
        f"({n} * ({s11} * {s22} - {s12} * {s12})"
        f" - {s1} * ({s1} * {s22} - {s12} * {s2})"
        f" + {s2} * ({s1} * {s12} - {s11} * {s2}))"
    )
    d0 = (
        f"({sy} * ({s11} * {s22} - {s12} * {s12})"
        f" - {s1} * ({s1y} * {s22} - {s12} * {s2y})"
        f" + {s2} * ({s1y} * {s12} - {s11} * {s2y}))"
    )
    d1 = (
        f"({n} * ({s1y} * {s22} - {s12} * {s2y})"
        f" - {sy} * ({s1} * {s22} - {s12} * {s2})"
        f" + {s2} * ({s1} * {s2y} - {s1y} * {s2}))"
    )
    d2 = (
        f"({n} * ({s11} * {s2y} - {s1y} * {s12})"
        f" - {s1} * ({s1} * {s2y} - {s1y} * {s2})"
        f" + {sy} * ({s1} * {s12} - {s11} * {s2}))"
    )
    return {"det": det, "d0": d0, "d1": d1, "d2": d2}


def _signed_dec2dbl(s: str, duck: bool) -> str:
    """Exact wide-integer -> double for SIGNED values: _dec2dbl's
    deterministic power-of-two split requires a nonnegative input, so
    split off the sign first (both branches evaluate the same split
    tree on |s|)."""
    pos = _dec2dbl(f"(CASE WHEN ({s}) < 0 THEN -({s}) ELSE ({s}) END)", duck)
    return f"(CASE WHEN ({s}) < 0 THEN -{pos} ELSE {pos} END)"


def _ols2_projection(duck: bool) -> str:
    d = _ols2_dets(duck)
    det_dbl = _signed_dec2dbl(d["det"], duck)
    parts = []
    for i in range(3):
        num_dbl = _signed_dec2dbl(d[f"d{i}"], duck)
        parts.append(
            f"CAST({num_dbl} / nullif({det_dbl}, 0e0) AS DOUBLE)"
            f" AS beta{i}_fx"
        )
    return ",\n               ".join(parts)


@register(
    "q_ols_2feat",
    oracle=f"""
        WITH rows_ AS (
            -- dayofweek: DuckDB is 0-based (Sun=0), Spark 1-based
            -- (Sun=1) -> +1 aligns them
            SELECT event_type,
                   CAST(hour(ts) AS BIGINT) AS x1,
                   CAST(dayofweek(ts) + 1 AS BIGINT) AS x2,
                   CAST(round(value * 100) AS BIGINT) AS y
            FROM events
        ),
        m AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x1) AS BIGINT) AS s1,
                   CAST(sum(x2) AS BIGINT) AS s2,
                   CAST(sum(x1 * x1) AS BIGINT) AS s11,
                   CAST(sum(x2 * x2) AS BIGINT) AS s22,
                   CAST(sum(x1 * x2) AS BIGINT) AS s12,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x1 * y) AS BIGINT) AS s1y,
                   CAST(sum(x2 * y) AS BIGINT) AS s2y
            FROM rows_ GROUP BY event_type
        )
        SELECT event_type, n,
               {_ols2_projection(duck=True)}
        FROM m
    """,
    doc="Multiple regression per group WITHOUT an ML library: value"
    " (fx) on hour-of-day and day-of-week via the 3x3 normal"
    " equations solved in closed form (Cramer cofactor expansion)."
    " The nine sufficient statistics are exact int64 sums reduced"
    " with map-side combine; the cofactor determinants evaluate in"
    " DECIMAL(38)/HUGEINT (they reach ~1e21 at sf0.1 — int64"
    " overflows, observed firsthand) and convert to double through"
    " the signed power-of-two split (_signed_dec2dbl), so the one"
    " final division is mirrored IEEE on both engines. The"
    " distributed-OLS pattern that generalizes: p features need"
    " p(p+3)/2 moments and an executor-sized solve — at 100 TB still"
    " ONE scan, one |groups|-row shuffle, no gradient passes."
    " Extends q_ols_trend (single regressor) to the multivariate"
    " case.",
)
def q_ols_2feat(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    rows = ev.select(
        "event_type",
        F.expr("cast(hour(ts) as bigint)").alias("x1"),
        F.expr("cast(dayofweek(ts) as bigint)").alias("x2"),
        F.expr("cast(round(value * 100) as bigint)").alias("y"),
    )
    m = rows.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").cast("bigint").alias("s1"),
        F.sum("x2").cast("bigint").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("bigint").alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).cast("bigint").alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).cast("bigint").alias("s12"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).cast("bigint").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("bigint").alias("s2y"),
    )
    return m.select(
        "event_type",
        "n",
        *[
            F.expr(e)
            for e in _ols2_projection(duck=False).split(",\n               ")
        ],
    )


# ---------------------------------------------------------------------------
# Group-sequential experiment monitoring (daily z-statistic ladder)
# ---------------------------------------------------------------------------

# Pocock-style constant boundary in milli-z units: |z| >= 2.413 flags
# (5 looks, alpha ~ 0.05). Integer comparison on the squared statistic
# avoids a float threshold crossing.
_GS_BOUND_MILLI = 2413


@register(
    "q_group_sequential",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, user_id % 2 AS arm,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        AS BIGINT) AS s,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)
                            * CAST(round(value * 100) AS BIGINT))
                        AS BIGINT) AS ss
            FROM events GROUP BY 1, 2
        ),
        cum AS (
            SELECT a.day,
                   CAST(sum(CASE WHEN b.arm = 0 THEN b.n END) AS BIGINT)
                       AS n0,
                   CAST(sum(CASE WHEN b.arm = 0 THEN b.s END) AS BIGINT)
                       AS s0,
                   CAST(sum(CASE WHEN b.arm = 0 THEN b.ss END) AS BIGINT)
                       AS ss0,
                   CAST(sum(CASE WHEN b.arm = 1 THEN b.n END) AS BIGINT)
                       AS n1,
                   CAST(sum(CASE WHEN b.arm = 1 THEN b.s END) AS BIGINT)
                       AS s1,
                   CAST(sum(CASE WHEN b.arm = 1 THEN b.ss END) AS BIGINT)
                       AS ss1
            FROM (SELECT DISTINCT day FROM daily) a
            JOIN daily b ON b.day <= a.day
            GROUP BY a.day
        )
        SELECT CAST(day AS VARCHAR) AS day, n0, n1,
               CAST((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                     - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) / 100.0
                    AS DOUBLE) AS mean_diff,
               CAST(
                 (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                  - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                 / nullif(sqrt(
                     (CAST(ss0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                      - (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                        * (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)))
                       / CAST(n0 AS DOUBLE)
                     + (CAST(ss1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                        - (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                          * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)))
                       / CAST(n1 AS DOUBLE)), 0e0)
                 AS DOUBLE) AS z_stat,
               CAST(abs(
                 (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                  - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                 / nullif(sqrt(
                     (CAST(ss0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                      - (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                        * (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)))
                       / CAST(n0 AS DOUBLE)
                     + (CAST(ss1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                        - (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                          * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)))
                       / CAST(n1 AS DOUBLE)), 0e0))
                 >= {_GS_BOUND_MILLI} / 1000.0 AS BOOLEAN)
                   AS boundary_crossed
        FROM cum WHERE n0 IS NOT NULL AND n1 IS NOT NULL
    """,
    doc="GROUP-SEQUENTIAL experiment monitor — the daily-peeking ladder"
    " real A/B systems run instead of one fixed-horizon test: per day,"
    " the CUMULATIVE Welch z-statistic for the even/odd-cohort mean"
    " difference from exact integer daily moments (n, S, SS per arm),"
    " cumulated via a bounded |days|x|days| triangle join over the"
    " DAILY AGGREGATES (never an unpartitioned window, never an"
    " events rescan), with a Pocock-style constant boundary |z| >="
    f" {_GS_BOUND_MILLI / 1000} flagged per look. sqrt is IEEE"
    " correctly-rounded on both engines, so the mirrored projection"
    " stays bit-exact; moments are int64. Complements q_welch_ttest"
    " (one look) and q_srm_check (assignment health). At 100 TB: one"
    " (day, arm) partial-agg shuffle, then calendar-sized arithmetic.",
)
def q_group_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.col("ts").cast("date").alias("day"),
            (F.col("user_id") % 2).alias("arm"),
            F.expr("cast(round(value * 100) as bigint)").alias("fx"),
        )
        .groupBy("day", "arm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("fx").cast("bigint").alias("s"),
            F.sum(F.col("fx") * F.col("fx")).cast("bigint").alias("ss"),
        )
    )
    days = daily.select("day").distinct().select(F.col("day").alias("d_a"))
    cum = (
        days.join(daily, F.col("day") <= F.col("d_a"))
        .groupBy("d_a")
        .agg(
            *[
                F.sum(F.expr(f"CASE WHEN arm = {a} THEN {c} END"))
                .cast("bigint")
                .alias(f"{c}{a}")
                for a in (0, 1)
                for c in ("n", "s", "ss")
            ]
        )
        .withColumnRenamed("d_a", "day")
    )
    mean_diff = (
        "(cast(s1 as double) / cast(n1 as double)"
        " - cast(s0 as double) / cast(n0 as double))"
    )
    se = (
        "sqrt((cast(ss0 as double) / cast(n0 as double)"
        " - (cast(s0 as double) / cast(n0 as double))"
        " * (cast(s0 as double) / cast(n0 as double)))"
        " / cast(n0 as double)"
        " + (cast(ss1 as double) / cast(n1 as double)"
        " - (cast(s1 as double) / cast(n1 as double))"
        " * (cast(s1 as double) / cast(n1 as double)))"
        " / cast(n1 as double))"
    )
    return cum.filter(
        F.col("n0").isNotNull() & F.col("n1").isNotNull()
    ).select(
        F.col("day").cast("string").alias("day"),
        "n0",
        "n1",
        F.expr(f"cast({mean_diff} / 100.0 as double)").alias("mean_diff"),
        F.expr(
            f"cast({mean_diff} / nullif({se}, 0e0) as double)"
        ).alias("z_stat"),
        F.expr(
            f"cast(abs({mean_diff} / nullif({se}, 0e0))"
            f" >= {_GS_BOUND_MILLI} / 1000.0 as boolean)"
        ).alias("boundary_crossed"),
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation with exact tie handling
# ---------------------------------------------------------------------------


@register(
    "q_spearman_corr",
    oracle="""
        WITH r AS (
            -- complete-case: NULL measures carry no rank information
            -- (and engines disagree on NULL ordering in rank windows)
            SELECT l_returnflag,
                   CAST(l_quantity AS BIGINT) AS x,
                   CAST(round(l_discount * 100) AS BIGINT) AS y
            FROM lineitem
            WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
        ),
        ranked AS (
            SELECT l_returnflag,
                   2 * rank() OVER (PARTITION BY l_returnflag ORDER BY x)
                     + count(*) OVER (PARTITION BY l_returnflag, x) - 1
                       AS rx2,
                   2 * rank() OVER (PARTITION BY l_returnflag ORDER BY y)
                     + count(*) OVER (PARTITION BY l_returnflag, y) - 1
                       AS ry2
            FROM r
        ),
        m AS (
            SELECT l_returnflag,
                   CAST(count(*) AS HUGEINT) AS n,
                   CAST(sum(CAST(rx2 AS HUGEINT)) AS HUGEINT) AS sx,
                   CAST(sum(CAST(ry2 AS HUGEINT)) AS HUGEINT) AS sy,
                   CAST(sum(CAST(rx2 AS HUGEINT) * rx2) AS HUGEINT)
                       AS sxx,
                   CAST(sum(CAST(ry2 AS HUGEINT) * ry2) AS HUGEINT)
                       AS syy,
                   CAST(sum(CAST(rx2 AS HUGEINT) * ry2) AS HUGEINT)
                       AS sxy
            FROM ranked GROUP BY l_returnflag
        )
        SELECT l_returnflag, CAST(n AS BIGINT) AS n,
               CAST(
                 {num} / nullif(sqrt({dxx}) * sqrt({dyy}), 0e0)
                 AS DOUBLE) AS spearman_rho
        FROM m
    """.format(
        num=_signed_dec2dbl("n * sxy - sx * sy", duck=True),
        dxx=_dec2dbl("(n * sxx - sx * sx)", duck=True),
        dyy=_dec2dbl("(n * syy - sy * sy)", duck=True),
    ),
    doc="Spearman rank correlation (quantity vs discount per return"
    " flag) with EXACT tie handling — the monotone-association screen"
    " Pearson r (q_corr_matrix) can't provide under outliers or"
    " nonlinearity. Average ranks are carried DOUBLED"
    " (2*minrank + ties - 1: kruskal's integer trick, no .5 floats);"
    " the Spark side never ranks the raw table — both measures are"
    " low-cardinality, so tie-corrected ranks fold from per-(group,"
    " value) COUNT MAPS: cnt_less via a cumulative window over the"
    " bounded distinct-value list (<= 50 rows per group), doubled"
    " ranks broadcast-join back to the scan, and rho comes from five"
    " HUGEINT/DECIMAL moments (doubled ranks square to ~1e21 at sf1)"
    " through the signed power-of-two split. For a near-unique"
    " measure the same decomposition buckets by coarse value band"
    " first (q_global_ordinal's pattern). The oracle is the naive"
    " window form, so the gate proves the map-based decomposition"
    " bit-identical to textbook ranking.",
)
def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = (
        load_table(spark, sf_dir, "lineitem")
        # complete-case, mirrored in the oracle: NULL measures carry no
        # rank information, and the equi-join/rank-window NULL
        # semantics differ across engines
        .filter(
            F.col("l_quantity").isNotNull()
            & F.col("l_discount").isNotNull()
        )
        .select(
            "l_returnflag",
            F.col("l_quantity").cast("bigint").alias("x"),
            F.expr("cast(round(l_discount * 100) as bigint)").alias("y"),
        )
    )

    def rank_map(df, col):
        counts = df.groupBy("l_returnflag", col).agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt")
        )
        w = (
            Window.partitionBy("l_returnflag")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return counts.select(
            F.col("l_returnflag").alias(f"g_{col}"),
            F.col(col).alias(f"v_{col}"),
            # doubled average rank: 2*(cnt_less + 1) + cnt - 1
            (
                2 * (F.coalesce(F.sum("cnt").over(w), F.lit(0)) + 1)
                + F.col("cnt")
                - 1
            ).alias(f"r{col}2"),
        )

    rx = rank_map(li, "x")
    ry = rank_map(li, "y")
    # NULL-SAFE on the group key: a NULL l_returnflag is a legitimate
    # group (the oracle's window PARTITION BY keeps it); a plain
    # equi-join would silently drop it (pathological-battery find)
    ranked = (
        li.join(
            F.broadcast(rx),
            F.col("l_returnflag").eqNullSafe(F.col("g_x"))
            & (F.col("x") == F.col("v_x")),
        )
        .join(
            F.broadcast(ry),
            F.col("l_returnflag").eqNullSafe(F.col("g_y"))
            & (F.col("y") == F.col("v_y")),
        )
    )
    dec = "decimal(38,0)"
    m = ranked.groupBy("l_returnflag").agg(
        F.expr(f"cast(count(*) as {dec})").alias("n"),
        F.expr(f"cast(sum(cast(rx2 as {dec})) as {dec})").alias("sx"),
        F.expr(f"cast(sum(cast(ry2 as {dec})) as {dec})").alias("sy"),
        F.expr(f"cast(sum(cast(rx2 as {dec}) * rx2) as {dec})").alias(
            "sxx"
        ),
        F.expr(f"cast(sum(cast(ry2 as {dec}) * ry2) as {dec})").alias(
            "syy"
        ),
        F.expr(f"cast(sum(cast(rx2 as {dec}) * ry2) as {dec})").alias(
            "sxy"
        ),
    )
    num = _signed_dec2dbl("n * sxy - sx * sy", duck=False)
    dxx = _dec2dbl("(n * sxx - sx * sx)", duck=False)
    dyy = _dec2dbl("(n * syy - sy * sy)", duck=False)
    return m.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        F.expr(
            f"cast({num} / nullif(sqrt({dxx}) * sqrt({dyy}), 0e0)"
            " as double)"
        ).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# One-way ANOVA F (round 9)
# ---------------------------------------------------------------------------


@register(
    "q_anova_f",
    oracle="""
        WITH v AS (
            -- complete cases (the q_levene_bf discipline): NULL value
            -- or NULL event_type would skew ranks/fold order between
            -- engines
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS fx
            FROM events
            WHERE value IS NOT NULL AND event_type IS NOT NULL
        ),
        g AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_i,
                   CAST(sum(fx) AS BIGINT) AS s_i,
                   CAST(sum(CAST(fx AS HUGEINT) * fx) AS BIGINT) AS ss_i
            FROM v GROUP BY event_type
        ),
        terms AS (
            SELECT event_type,
                   ({s2dbl} / CAST(n_i AS DOUBLE)) AS term
            FROM g
        ),
        tot AS (
            SELECT CAST(sum(g.n_i) AS BIGINT) AS n,
                   CAST(sum(g.s_i) AS BIGINT) AS s,
                   CAST(sum(g.ss_i) AS BIGINT) AS ss,
                   CAST(count(*) AS BIGINT) AS k,
                   (SELECT list_reduce(
                        list(term ORDER BY event_type),
                        (a, b) -> a + b) FROM terms) AS grp_part
            FROM g
        )
        SELECT k, n,
               (grp_part - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                           / CAST(n AS DOUBLE)) AS ss_between,
               (CAST(ss AS DOUBLE) - grp_part) AS ss_within,
               CAST(
                 ((grp_part - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                              / CAST(n AS DOUBLE))
                  / nullif(CAST(k - 1 AS DOUBLE), 0e0))
                 / nullif((CAST(ss AS DOUBLE) - grp_part)
                          / nullif(CAST(n - k AS DOUBLE), 0e0), 0e0)
                 AS DOUBLE) AS f_stat
        FROM tot
    """.format(
        s2dbl=_dec2dbl("CAST(s_i AS HUGEINT) * s_i", duck=True)
    ),
    doc="Classic one-way ANOVA F across event types on the fixed-point"
    " values: per-group integer moments (n_i, S_i, SS_i), the"
    " between-group part sum(S_i^2/n_i) folded in SORTED group order"
    " (exact S_i^2 through the 2^60/2^30 power-of-two split — the"
    " q_levene_bf discipline, so both engines add in the same"
    " sequence), and F = (SSB/(k-1)) / (SSW/(N-k)) as mirrored IEEE"
    " ops. Completes the location-test triptych: q_welch_ttest is the"
    " 2-sample parametric test, q_kruskal_wallis the k-sample rank"
    " test, this the k-sample parametric test. ONE partial-agg"
    " shuffle to k rows; the finale is k-row arithmetic.",
)
def q_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull() & F.col("event_type").isNotNull()
        )
        .select(
            "event_type",
            F.expr("cast(round(value * 100) as bigint)").alias("fx"),
        )
    )
    g = v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i"),
        F.sum("fx").cast("bigint").alias("s_i"),
        F.expr(
            "cast(sum(cast(fx as decimal(38,0)) * fx) as bigint)"
        ).alias("ss_i"),
    )
    s2dbl = _dec2dbl("cast(s_i as decimal(38,0)) * s_i", duck=False)
    tot = g.agg(
        F.sum("n_i").cast("bigint").alias("n"),
        F.sum("s_i").cast("bigint").alias("s"),
        F.sum("ss_i").cast("bigint").alias("ss"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        # sorted fold: identical addition sequence on both engines
        F.expr(
            "aggregate(array_sort(collect_list(struct(event_type,"
            f" ({s2dbl} / cast(n_i as double)) as term))),"
            " cast(0 as double), (a, x) -> a + x.term)"
        ).alias("grp_part"),
    )
    ssb = (
        "(grp_part - cast(s as double) * cast(s as double)"
        " / cast(n as double))"
    )
    ssw = "(cast(ss as double) - grp_part)"
    return tot.select(
        "k",
        "n",
        F.expr(ssb).alias("ss_between"),
        F.expr(ssw).alias("ss_within"),
        F.expr(
            f"cast(({ssb} / nullif(cast(k - 1 as double), 0e0))"
            f" / nullif({ssw} / nullif(cast(n - k as double), 0e0),"
            " 0e0) as double)"
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# 2x2 odds ratio with Haldane-Anscombe correction (round 9)
# ---------------------------------------------------------------------------


@register(
    "q_odds_ratio",
    oracle="""
        WITH b AS (
            SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid
            FROM events WHERE value IS NOT NULL
        ),
        v AS (
            -- complete cases: NULL value would shift the median rank
            -- (Spark NULLS FIRST vs DuckDB NULLS LAST)
            SELECT event_type, event_id,
                   CAST(round(value * 100) AS BIGINT) AS fx,
                   CAST(epoch_us(ts) < (SELECT mid FROM b) AS INTEGER)
                       AS is_old
            FROM events WHERE value IS NOT NULL
        ),
        med AS (
            -- per-TYPE lower median (Mood's median test): the rank
            -- window stays key-partitioned, never table-global
            SELECT event_type, fx AS med_fx FROM (
                SELECT event_type, fx,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY fx, event_id) AS rn,
                       count(*) OVER (PARTITION BY event_type) AS n
                FROM v
            ) WHERE rn = (n + 1) // 2
        ),
        cells AS (
            SELECT v.event_type,
                   CAST(sum(CASE WHEN is_old = 1 AND fx > m.med_fx
                            THEN 1 ELSE 0 END) AS BIGINT) AS a,
                   CAST(sum(CASE WHEN is_old = 1 AND fx <= m.med_fx
                            THEN 1 ELSE 0 END) AS BIGINT) AS bb,
                   CAST(sum(CASE WHEN is_old = 0 AND fx > m.med_fx
                            THEN 1 ELSE 0 END) AS BIGINT) AS c,
                   CAST(sum(CASE WHEN is_old = 0 AND fx <= m.med_fx
                            THEN 1 ELSE 0 END) AS BIGINT) AS d
            FROM v JOIN med m ON m.event_type = v.event_type
            GROUP BY v.event_type
        )
        SELECT event_type, a, bb AS b, c, d,
               ((CAST(a AS DOUBLE) + 0.5) * (CAST(d AS DOUBLE) + 0.5))
                   / ((CAST(bb AS DOUBLE) + 0.5)
                      * (CAST(c AS DOUBLE) + 0.5)) AS odds_ratio,
               sqrt(1e0 / (CAST(a AS DOUBLE) + 0.5)
                    + 1e0 / (CAST(bb AS DOUBLE) + 0.5)
                    + 1e0 / (CAST(c AS DOUBLE) + 0.5)
                    + 1e0 / (CAST(d AS DOUBLE) + 0.5)) AS se_log_or
        FROM cells
    """,
    doc="Mood's-median-test 2x2 odds ratio per event type: time half"
    " (old/new) x value above/below the TYPE's exact lower median"
    " (key-partitioned rank idiom, complete-case) — an OR away from 1"
    " means the type's location drifted between halves. Cells are exact integer conditional sums; the"
    " Haldane-Anscombe +0.5 correction keeps the ratio finite on"
    " zero cells, and the Wald log-OR standard error"
    " sqrt(sum 1/(cell+0.5)) ships alongside so callers build CIs in"
    " log space with their own z — both emitted columns are pure"
    " mirrored IEEE ops (division, sqrt), no ln/exp library-rounding"
    " risk inside the gate. One rank window + one conditional-agg"
    " shuffle; output is |types| rows.",
)
def q_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    us = "unix_micros(cast(ts as timestamp))"
    bounds = ev.agg(
        F.expr(f"(min({us}) + max({us})) div 2").alias("mid")
    )
    v = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        "event_id",
        F.expr("cast(round(value * 100) as bigint)").alias("fx"),
        F.expr(f"cast({us} < mid as int)").alias("is_old"),
    )
    w = Window.partitionBy("event_type").orderBy("fx", "event_id")
    wn = Window.partitionBy("event_type")
    med = (
        v.select(
            "event_type",
            "fx",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .filter(F.expr("rn = (n + 1) div 2"))
        .select("event_type", F.col("fx").alias("med_fx"))
    )
    cells = (
        v.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN is_old = 1 AND fx > med_fx"
                    " THEN 1 ELSE 0 END"
                )
            ).cast("bigint").alias("a"),
            F.sum(
                F.expr(
                    "CASE WHEN is_old = 1 AND fx <= med_fx"
                    " THEN 1 ELSE 0 END"
                )
            ).cast("bigint").alias("b"),
            F.sum(
                F.expr(
                    "CASE WHEN is_old = 0 AND fx > med_fx"
                    " THEN 1 ELSE 0 END"
                )
            ).cast("bigint").alias("c"),
            F.sum(
                F.expr(
                    "CASE WHEN is_old = 0 AND fx <= med_fx"
                    " THEN 1 ELSE 0 END"
                )
            ).cast("bigint").alias("d"),
        )
    )
    return cells.select(
        "event_type",
        "a",
        "b",
        "c",
        "d",
        F.expr(
            "((cast(a as double) + 0.5) * (cast(d as double) + 0.5))"
            " / ((cast(b as double) + 0.5)"
            " * (cast(c as double) + 0.5))"
        ).alias("odds_ratio"),
        F.expr(
            "sqrt(1e0 / (cast(a as double) + 0.5)"
            " + 1e0 / (cast(b as double) + 0.5)"
            " + 1e0 / (cast(c as double) + 0.5)"
            " + 1e0 / (cast(d as double) + 0.5))"
        ).alias("se_log_or"),
    )


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR over exact permutation p-values (round 9)
# ---------------------------------------------------------------------------

_BH_ALPHA_NUM, _BH_ALPHA_DEN = 1, 20  # alpha = 0.05 as an exact rational


@register(
    "q_fdr_bh",
    oracle=f"""
        WITH ev AS (
            SELECT event_type, user_id,
                   CAST(round(value * 100) AS BIGINT) AS fx,
                   {_h_duck("'permA' || CAST(event_id AS VARCHAR)")} AS h0,
                   {_h_duck("'permB' || CAST(event_id AS VARCHAR)")} AS h1
            FROM events
            WHERE value IS NOT NULL AND event_type IS NOT NULL
        ),
        lab AS (
            SELECT ev.event_type, b.b, ev.fx,
                   CASE WHEN b.b = -1 THEN user_id % 2
                        ELSE ((CASE WHEN b.b < 60 THEN h0 ELSE h1 END)
                              >> (b.b % 60)) % 2
                   END AS grp
            FROM ev CROSS JOIN (
                SELECT generate_series AS b
                FROM generate_series(-1, {_PERM_B - 1})
            ) b
        ),
        stats AS (
            SELECT event_type, b,
                   CAST(sum(CASE WHEN grp = 0 THEN fx END) AS HUGEINT)
                       AS sa,
                   CAST(count(CASE WHEN grp = 0 THEN fx END) AS HUGEINT)
                       AS na,
                   CAST(sum(CASE WHEN grp = 1 THEN fx END) AS HUGEINT)
                       AS sb,
                   CAST(count(CASE WHEN grp = 1 THEN fx END) AS HUGEINT)
                       AS nb
            FROM lab GROUP BY event_type, b
        ),
        obs AS (SELECT * FROM stats WHERE b = -1),
        pv AS (
            SELECT o.event_type,
                   CAST(1 + sum(CASE WHEN
                        abs(p.sa * p.nb - p.sb * p.na)
                            * (o.na * o.nb)
                        >= abs(o.sa * o.nb - o.sb * o.na)
                            * (p.na * p.nb)
                        THEN 1 ELSE 0 END) AS BIGINT) AS p_num
            FROM stats p JOIN obs o ON o.event_type = p.event_type
            WHERE p.b >= 0
            GROUP BY o.event_type
        ),
        ranked AS (
            SELECT event_type, p_num,
                   row_number() OVER (ORDER BY p_num, event_type)
                       AS rnk,
                   count(*) OVER () AS m
            FROM pv
        ),
        -- BH step-up, EXACT integers: p_i <= alpha*i/m  <=>
        -- p_num*m*alpha_den <= (B+1)*i*alpha_num
        passing AS (
            SELECT max(CASE WHEN p_num * m * {_BH_ALPHA_DEN}
                            <= {_PERM_B + 1} * rnk * {_BH_ALPHA_NUM}
                       THEN rnk ELSE 0 END) OVER () AS k_max,
                   event_type, p_num, rnk, m
            FROM ranked
        )
        SELECT event_type,
               CAST(p_num AS BIGINT) AS p_num,
               CAST(CAST(p_num AS DOUBLE)
                    / CAST({_PERM_B + 1} AS DOUBLE) AS DOUBLE) AS p_value,
               CAST(rnk AS BIGINT) AS rnk,
               CAST(m AS BIGINT) AS m,
               (rnk <= k_max) AS rejected
        FROM passing
    """,
    doc="Benjamini-Hochberg FDR control over the per-event-type"
    f" randomization tests: each type runs the {_PERM_B}-reassignment"
    " permutation test (q_permutation_test's md5 bit harvest, one"
    " B-fold narrow explode partial-aggregating to |types|*(B+1)"
    " rows), yielding p-values that are EXACT RATIONALS p_num/(B+1)."
    " The BH step-up then needs NO floats at all: p_i <= alpha*i/m"
    " cross-multiplies to p_num*m*20 <= (B+1)*i, so the rejection set"
    " is bit-exact by construction — the multiple-testing layer every"
    " per-segment drift scan needs before paging anyone. The final"
    " windows run on m = |types| rows (bounded); p_value is emitted"
    " as the one mirrored double division for readability.",
)
def q_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull() & F.col("event_type").isNotNull()
        )
        .select(
            "event_type",
            "user_id",
            F.expr("cast(round(value * 100) as bigint)").alias("fx"),
            F.expr(
                _h_spark("concat('permA', cast(event_id as string))")
            ).alias("h0"),
            F.expr(
                _h_spark("concat('permB', cast(event_id as string))")
            ).alias("h1"),
        )
    )
    lab = ev.select(
        "event_type",
        "fx",
        "user_id",
        "h0",
        "h1",
        F.explode(F.expr(f"sequence(-1, {_PERM_B - 1})")).alias("b"),
    ).select(
        "event_type",
        "b",
        "fx",
        F.expr(
            "CASE WHEN b = -1 THEN user_id % 2"
            " ELSE shiftright(CASE WHEN b < 60 THEN h0 ELSE h1 END,"
            " cast(b % 60 as int)) % 2 END"
        ).alias("grp"),
    )
    dec = "decimal(38,0)"
    stats = lab.groupBy("event_type", "b").agg(
        F.expr(
            f"cast(sum(CASE WHEN grp = 0 THEN fx END) as {dec})"
        ).alias("sa"),
        F.expr(
            f"cast(count(CASE WHEN grp = 0 THEN fx END) as {dec})"
        ).alias("na"),
        F.expr(
            f"cast(sum(CASE WHEN grp = 1 THEN fx END) as {dec})"
        ).alias("sb"),
        F.expr(
            f"cast(count(CASE WHEN grp = 1 THEN fx END) as {dec})"
        ).alias("nb"),
    )
    obs = stats.filter(F.col("b") == -1).select(
        "event_type",
        F.col("sa").alias("osa"),
        F.col("na").alias("ona"),
        F.col("sb").alias("osb"),
        F.col("nb").alias("onb"),
    )
    pv = (
        stats.filter(F.col("b") >= 0)
        .join(F.broadcast(obs), "event_type")
        .groupBy("event_type")
        .agg(
            F.expr(
                "cast(1 + sum(CASE WHEN"
                " abs(sa * nb - sb * na) * (ona * onb)"
                " >= abs(osa * onb - osb * ona) * (na * nb)"
                " THEN 1 ELSE 0 END) as bigint)"
            ).alias("p_num")
        )
    )
    # bounded windows: m = |event types| rows
    w_rank = Window.orderBy("p_num", "event_type")
    w_all = Window.partitionBy()
    ranked = pv.select(
        "event_type",
        "p_num",
        F.row_number().over(w_rank).alias("rnk"),
        F.count(F.lit(1)).over(w_all).alias("m"),
    )
    passing = ranked.select(
        "event_type",
        "p_num",
        "rnk",
        "m",
        F.max(
            F.expr(
                f"CASE WHEN p_num * m * {_BH_ALPHA_DEN}"
                f" <= {_PERM_B + 1} * rnk * {_BH_ALPHA_NUM}"
                " THEN rnk ELSE 0 END"
            )
        ).over(w_all).alias("k_max"),
    )
    return passing.select(
        "event_type",
        F.col("p_num").cast("bigint").alias("p_num"),
        (
            F.col("p_num").cast("double") / F.lit(float(_PERM_B + 1))
        ).alias("p_value"),
        F.col("rnk").cast("bigint").alias("rnk"),
        F.col("m").cast("bigint").alias("m"),
        (F.col("rnk") <= F.col("k_max")).alias("rejected"),
    )


# ---------------------------------------------------------------------------
# McNemar's paired test (round 9)
# ---------------------------------------------------------------------------


@register(
    "q_mcnemar",
    oracle="""
        WITH b AS (
            SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid
            FROM events
            WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        ),
        per_user AS (
            SELECT event_type, user_id,
                   max(CASE WHEN epoch_us(ts) < (SELECT mid FROM b)
                       THEN 1 ELSE 0 END) AS act_old,
                   max(CASE WHEN epoch_us(ts) >= (SELECT mid FROM b)
                       THEN 1 ELSE 0 END) AS act_new
            FROM events
            WHERE user_id IS NOT NULL AND event_type IS NOT NULL
            GROUP BY event_type, user_id
        )
        SELECT event_type,
               CAST(sum(CASE WHEN act_old = 1 AND act_new = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_lost,
               CAST(sum(CASE WHEN act_old = 0 AND act_new = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_gained,
               CAST(CAST(
                   (sum(CASE WHEN act_old = 1 AND act_new = 0
                        THEN 1 ELSE 0 END)
                    - sum(CASE WHEN act_old = 0 AND act_new = 1
                          THEN 1 ELSE 0 END))
                   * (sum(CASE WHEN act_old = 1 AND act_new = 0
                          THEN 1 ELSE 0 END)
                      - sum(CASE WHEN act_old = 0 AND act_new = 1
                            THEN 1 ELSE 0 END)) AS DOUBLE)
                   / nullif(CAST(
                       sum(CASE WHEN act_old = 1 AND act_new = 0
                           THEN 1 ELSE 0 END)
                       + sum(CASE WHEN act_old = 0 AND act_new = 1
                             THEN 1 ELSE 0 END) AS DOUBLE), 0e0)
                   AS DOUBLE) AS chi2
        FROM per_user
        GROUP BY event_type
    """,
    doc="McNemar's PAIRED test per event type: each user is their own"
    " control — discordant pairs (active old half only vs new half"
    " only) drive chi2 = (b-c)^2/(b+c), which detects churn/adoption"
    " shifts that the unpaired tests (q_welch_ttest, q_mannwhitney)"
    " wash out when heavy users dominate both halves. Per-user"
    " activity flags are one conditional-max partial agg; the"
    " statistic is exact-integer cross-multiplication with a single"
    " mirrored double division. Complete cases on user/type.",
)
def q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    us = "unix_micros(cast(ts as timestamp))"
    bounds = ev.agg(
        F.expr(f"(min({us}) + max({us})) div 2").alias("mid")
    )
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("event_type", "user_id")
        .agg(
            F.max(
                F.expr(f"CASE WHEN {us} < mid THEN 1 ELSE 0 END")
            ).alias("act_old"),
            F.max(
                F.expr(f"CASE WHEN {us} >= mid THEN 1 ELSE 0 END")
            ).alias("act_new"),
        )
    )
    agg = per_user.groupBy("event_type").agg(
        F.sum(
            F.expr("CASE WHEN act_old = 1 AND act_new = 0"
                   " THEN 1 ELSE 0 END")
        ).cast("bigint").alias("n_lost"),
        F.sum(
            F.expr("CASE WHEN act_old = 0 AND act_new = 1"
                   " THEN 1 ELSE 0 END")
        ).cast("bigint").alias("n_gained"),
    )
    return agg.select(
        "event_type",
        "n_lost",
        "n_gained",
        F.expr(
            "cast(cast((n_lost - n_gained) * (n_lost - n_gained)"
            " as double)"
            " / nullif(cast(n_lost + n_gained as double), 0e0)"
            " as double)"
        ).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test on the daily up/down sequence (round 9)
# ---------------------------------------------------------------------------


@register(
    "q_runs_test",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS d,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events
            WHERE ts IS NOT NULL AND event_type IS NOT NULL
            GROUP BY 1, 2
        ),
        diffs AS (
            SELECT event_type, d,
                   CASE WHEN cnt > lag(cnt) OVER w THEN 1
                        WHEN cnt < lag(cnt) OVER w THEN 0
                   END AS up
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY d)
        ),
        seq AS (
            -- ties (cnt equal) and the first day drop out, exactly as
            -- in the classical up/down runs test
            SELECT event_type, d, up,
                   lag(up) OVER (PARTITION BY event_type ORDER BY d)
                       AS prev_up
            FROM diffs WHERE up IS NOT NULL
        ),
        agg AS (
            SELECT event_type,
                   CAST(sum(CASE WHEN prev_up IS NULL
                                 OR up != prev_up
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_runs,
                   CAST(sum(up) AS BIGINT) AS n_up,
                   CAST(sum(1 - up) AS BIGINT) AS n_down
            FROM seq GROUP BY event_type
        )
        SELECT event_type, n_runs, n_up, n_down,
               CAST((CAST(n_runs AS DOUBLE)
                     - (2e0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                        / CAST(n_up + n_down AS DOUBLE) + 1e0))
                    / nullif(sqrt(
                        (2e0 * CAST(n_up AS DOUBLE)
                         * CAST(n_down AS DOUBLE)
                         * (2e0 * CAST(n_up AS DOUBLE)
                            * CAST(n_down AS DOUBLE)
                            - CAST(n_up + n_down AS DOUBLE)))
                        / (CAST(n_up + n_down AS DOUBLE)
                           * CAST(n_up + n_down AS DOUBLE)
                           * (CAST(n_up + n_down AS DOUBLE) - 1e0))),
                        0e0)
                    AS DOUBLE) AS z_score
        FROM agg
        WHERE n_up + n_down >= 2
    """,
    doc="Wald-Wolfowitz runs test for randomness of each type's daily"
    " up/down movement: a trending series makes FEW long runs, an"
    " oscillating one TOO MANY — the nonparametric sanity check"
    " behind q_mann_kendall (which measures trend direction; this"
    " measures departure-from-randomness in either direction). Run"
    " boundaries count via one lag window over the tiny per-type"
    " daily table; n_runs/n_up/n_down are exact integers and the"
    " normal-approximation z is mirrored IEEE. Ties and the first"
    " day drop per the classical definition.",
)
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("d")
    diffs = daily.select(
        "event_type",
        "d",
        F.expr(
            "CASE WHEN cnt > lag(cnt) OVER"
            " (PARTITION BY event_type ORDER BY d) THEN 1"
            " WHEN cnt < lag(cnt) OVER"
            " (PARTITION BY event_type ORDER BY d) THEN 0 END"
        ).alias("up"),
    ).filter(F.col("up").isNotNull())
    seq = diffs.select(
        "event_type",
        "up",
        F.lag("up").over(w).alias("prev_up"),
    )
    agg = seq.groupBy("event_type").agg(
        F.sum(
            F.expr(
                "CASE WHEN prev_up IS NULL OR up != prev_up"
                " THEN 1 ELSE 0 END"
            )
        ).cast("bigint").alias("n_runs"),
        F.sum("up").cast("bigint").alias("n_up"),
        F.sum(1 - F.col("up")).cast("bigint").alias("n_down"),
    )
    nd = "cast(n_up + n_down as double)"
    prod = "2e0 * cast(n_up as double) * cast(n_down as double)"
    return agg.filter(F.expr("n_up + n_down >= 2")).select(
        "event_type",
        "n_runs",
        "n_up",
        "n_down",
        F.expr(
            f"cast((cast(n_runs as double) - ({prod} / {nd} + 1e0))"
            f" / nullif(sqrt(({prod} * ({prod} - {nd}))"
            f" / ({nd} * {nd} * ({nd} - 1e0))), 0e0) as double)"
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Lincoln-Petersen / Chapman capture-recapture (round 9)
# ---------------------------------------------------------------------------


@register(
    "q_capture_recapture",
    oracle="""
        WITH b AS (
            SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid
            FROM events
            WHERE user_id IS NOT NULL
        ),
        per_user AS (
            SELECT user_id,
                   max(CASE WHEN epoch_us(ts) < (SELECT mid FROM b)
                       THEN 1 ELSE 0 END) AS in_old,
                   max(CASE WHEN epoch_us(ts) >= (SELECT mid FROM b)
                       THEN 1 ELSE 0 END) AS in_new
            FROM events
            WHERE user_id IS NOT NULL
            GROUP BY user_id
        )
        SELECT CAST(sum(in_old) AS BIGINT) AS n_first,
               CAST(sum(in_new) AS BIGINT) AS n_second,
               CAST(sum(in_old * in_new) AS BIGINT) AS n_both,
               CAST(count(*) AS BIGINT) AS n_observed,
               CAST(
                 (CAST(sum(in_old) AS DOUBLE) + 1e0)
                 * (CAST(sum(in_new) AS DOUBLE) + 1e0)
                 / (CAST(sum(in_old * in_new) AS DOUBLE) + 1e0) - 1e0
                 AS DOUBLE) AS chapman_estimate
        FROM per_user
    """,
    doc="Chapman-corrected Lincoln-Petersen capture-recapture over the"
    " stream's time halves: treat each half as a 'capture' of the"
    " user universe; the overlap estimates the TRUE population"
    " N ~ (n1+1)(n2+1)/(m+1) - 1, including users the telemetry never"
    " saw — the dark-traffic estimator data-quality reviews ask for"
    " (observed distinct counts only bound N from below). One"
    " conditional-max partial agg to per-user flags, one global sum;"
    " the estimate is a single mirrored IEEE expression. Pairs with"
    " q_hll_distinct (how many we SAW) by estimating what we MISSED.",
)
def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    us = "unix_micros(cast(ts as timestamp))"
    bounds = ev.agg(
        F.expr(f"(min({us}) + max({us})) div 2").alias("mid")
    )
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.max(
                F.expr(f"CASE WHEN {us} < mid THEN 1 ELSE 0 END")
            ).alias("in_old"),
            F.max(
                F.expr(f"CASE WHEN {us} >= mid THEN 1 ELSE 0 END")
            ).alias("in_new"),
        )
    )
    return per_user.agg(
        F.sum("in_old").cast("bigint").alias("n_first"),
        F.sum("in_new").cast("bigint").alias("n_second"),
        F.sum(F.col("in_old") * F.col("in_new"))
        .cast("bigint")
        .alias("n_both"),
        F.count(F.lit(1)).cast("bigint").alias("n_observed"),
    ).select(
        "n_first",
        "n_second",
        "n_both",
        "n_observed",
        F.expr(
            "cast((cast(n_first as double) + 1e0)"
            " * (cast(n_second as double) + 1e0)"
            " / (cast(n_both as double) + 1e0) - 1e0 as double)"
        ).alias("chapman_estimate"),
    )


# ---------------------------------------------------------------------------
# Split-conformal prediction interval, exact-integer form (round 9)
# ---------------------------------------------------------------------------

# user-hash split: 0-1 train, 2 calibration, 3 test
_CONF_SPLIT_MOD = 4
_CONF_ALPHA_NUM, _CONF_ALPHA_DEN = 1, 10  # alpha = 0.1


@register(
    "q_conformal_pi",
    oracle=f"""
        WITH ev AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS fx,
                   ({_h_duck("'conf' || CAST(user_id AS VARCHAR)")})
                       % {_CONF_SPLIT_MOD} AS fold
            FROM events
            WHERE value IS NOT NULL AND event_type IS NOT NULL
              AND user_id IS NOT NULL
        ),
        model AS (
            -- 'fit': per-type mean on the TRAIN folds, kept as the
            -- exact rational s/n (never a rounded float)
            SELECT event_type,
                   CAST(sum(fx) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS n
            FROM ev WHERE fold <= 1 GROUP BY event_type
        ),
        cal AS (
            -- calibration residuals scaled by n: |fx*n - s| is the
            -- exact integer form of n*|fx - mean|
            SELECT e.event_type,
                   abs(e.fx * m.n - m.s) AS r_scaled,
                   row_number() OVER (
                       PARTITION BY e.event_type
                       ORDER BY abs(e.fx * m.n - m.s), e.fx
                   ) AS rk,
                   count(*) OVER (PARTITION BY e.event_type) AS n_cal
            FROM ev e JOIN model m ON m.event_type = e.event_type
            WHERE e.fold = 2
        ),
        qhat AS (
            -- conformal quantile: the ceil((n+1)(1-alpha))-th order
            -- statistic, index arithmetic exact via integer ceiling
            SELECT event_type, n_cal,
                   min(CASE WHEN rk = least(
                       ((n_cal + 1) * ({_CONF_ALPHA_DEN} -
                        {_CONF_ALPHA_NUM}) + {_CONF_ALPHA_DEN} - 1)
                       // {_CONF_ALPHA_DEN}, n_cal)
                       THEN r_scaled END) AS q_scaled
            FROM cal GROUP BY event_type, n_cal
        ),
        test AS (
            SELECT e.event_type,
                   CAST(count(*) AS BIGINT) AS n_test,
                   CAST(sum(CASE WHEN abs(e.fx * m.n - m.s)
                                 <= q.q_scaled
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
            FROM ev e
            JOIN model m ON m.event_type = e.event_type
            JOIN qhat q ON q.event_type = e.event_type
            WHERE e.fold = 3
            GROUP BY e.event_type
        )
        SELECT t.event_type, q.n_cal, t.n_test, t.n_covered,
               CAST(CAST(t.n_covered AS DOUBLE)
                    / CAST(t.n_test AS DOUBLE) AS DOUBLE) AS coverage,
               CAST(2e0 * CAST(q.q_scaled AS DOUBLE)
                    / CAST(m.n AS DOUBLE) / 100e0 AS DOUBLE)
                   AS interval_width
        FROM test t
        JOIN qhat q ON q.event_type = t.event_type
        JOIN model m ON m.event_type = t.event_type
    """,
    doc="Split-conformal prediction interval per event type, fully"
    " EXACT: train folds fit the per-type mean kept as the rational"
    " s/n, calibration residuals compare as the exact integers"
    " |fx*n - s| (n*|fx - mean| — no float residuals anywhere), the"
    " conformal quantile is the ceil((n_cal+1)(1-alpha))-th order"
    " statistic by integer index arithmetic, and test-fold coverage"
    " is an integer count — the distribution-free ML-eval guarantee"
    " (coverage >= 1-alpha in expectation) computed without a single"
    " intermediate rounding. Seeded md5 user folds; one rank window"
    " per type on the calibration fold only. Coverage and width"
    " divide once each at the end, mirrored.",
)
def q_conformal_pi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("user_id").isNotNull()
        )
        .select(
            "event_type",
            F.expr("cast(round(value * 100) as bigint)").alias("fx"),
            F.expr(
                _h_spark("concat('conf', cast(user_id as string))")
                + f" % {_CONF_SPLIT_MOD}"
            ).alias("fold"),
        )
    )
    model = (
        ev.filter(F.col("fold") <= 1)
        .groupBy("event_type")
        .agg(
            F.sum("fx").cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    w = Window.partitionBy("event_type").orderBy(
        F.expr("abs(fx * n - s)"), "fx"
    )
    wn = Window.partitionBy("event_type")
    cal = (
        ev.filter(F.col("fold") == 2)
        .join(F.broadcast(model), "event_type")
        .select(
            "event_type",
            F.expr("abs(fx * n - s)").alias("r_scaled"),
            F.row_number().over(w).alias("rk"),
            F.count(F.lit(1)).over(wn).alias("n_cal"),
        )
    )
    k = (
        f"least(((n_cal + 1) * ({_CONF_ALPHA_DEN} - {_CONF_ALPHA_NUM})"
        f" + {_CONF_ALPHA_DEN} - 1) div {_CONF_ALPHA_DEN}, n_cal)"
    )
    qhat = (
        cal.groupBy("event_type", "n_cal")
        .agg(
            F.min(
                F.expr(f"CASE WHEN rk = {k} THEN r_scaled END")
            ).alias("q_scaled")
        )
    )
    test = (
        ev.filter(F.col("fold") == 3)
        .join(F.broadcast(model), "event_type")
        .join(F.broadcast(qhat), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(
                F.expr(
                    "CASE WHEN abs(fx * n - s) <= q_scaled"
                    " THEN 1 ELSE 0 END"
                )
            ).cast("bigint").alias("n_covered"),
        )
    )
    return (
        test.join(F.broadcast(qhat), "event_type")
        .join(F.broadcast(model), "event_type")
        .select(
            "event_type",
            "n_cal",
            "n_test",
            "n_covered",
            F.expr(
                "cast(cast(n_covered as double)"
                " / cast(n_test as double) as double)"
            ).alias("coverage"),
            F.expr(
                "cast(2e0 * cast(q_scaled as double)"
                " / cast(n as double) / 100e0 as double)"
            ).alias("interval_width"),
        )
    )


# ---------------------------------------------------------------------------
# A/B sample-size / power analysis from pilot variance (round 9)
# ---------------------------------------------------------------------------

# two-sided alpha=0.05 and power=0.80 z-quantiles as DOUBLE LITERALS:
# constants, not computed — no normal-CDF inverse exists portably
_Z_ALPHA = 1.959963984540054
_Z_BETA = 0.8416212335729143
# minimum detectable effect as a fraction of the pilot mean
_MDE_NUM, _MDE_DEN = 5, 100  # 5%


@register(
    "q_ab_power",
    oracle=f"""
        WITH g AS (
            -- pilot moments per event type (complete cases)
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        AS BIGINT) AS s,
                   CAST(sum(CAST(round(value * 100) AS HUGEINT)
                            * CAST(round(value * 100) AS BIGINT))
                        AS BIGINT) AS ss
            FROM events
            WHERE value IS NOT NULL AND event_type IS NOT NULL
            GROUP BY event_type
        )
        SELECT event_type, n,
               CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100e0 AS mean,
               (CAST(ss AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                  / CAST(n AS DOUBLE))
                   / nullif(CAST(n - 1 AS DOUBLE), 0e0) / 10000e0
                   AS variance,
               CAST(ceil(
                   2e0 * ({_Z_ALPHA!r} + {_Z_BETA!r})
                       * ({_Z_ALPHA!r} + {_Z_BETA!r})
                   * ((CAST(ss AS DOUBLE)
                       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                         / CAST(n AS DOUBLE))
                      / nullif(CAST(n - 1 AS DOUBLE), 0e0) / 10000e0)
                   / nullif(
                       (CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100e0
                        * {_MDE_NUM}e0 / {_MDE_DEN}e0)
                       * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100e0
                          * {_MDE_NUM}e0 / {_MDE_DEN}e0), 0e0)
               ) AS BIGINT) AS n_per_arm
        FROM g
        WHERE n >= 2
    """,
    doc="A/B sample-size calculation from pilot data per event type:"
    " n_per_arm = 2(z_a+z_b)^2 sigma^2 / delta^2 for a 5%-of-mean"
    " minimum detectable effect at alpha=0.05 two-sided, power 0.80 —"
    " the experiment-DESIGN step preceding q_welch_ttest /"
    " q_group_sequential (which analyze; this sizes). Pilot variance"
    " comes from exact integer moments (n, S, SS); the z-quantiles"
    " are double literals (no portable normal-CDF inverse exists, and"
    " constants round identically); every float op is mirrored IEEE."
    " One partial-agg shuffle to |types| rows.",
)
def q_ab_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull() & F.col("event_type").isNotNull()
        )
        .select(
            "event_type",
            F.expr("cast(round(value * 100) as bigint)").alias("fx"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("fx").cast("bigint").alias("s"),
            F.expr(
                "cast(sum(cast(fx as decimal(38,0)) * fx) as bigint)"
            ).alias("ss"),
        )
    )
    mean = "cast(s as double) / cast(n as double) / 100e0"
    var = (
        "(cast(ss as double) - cast(s as double) * cast(s as double)"
        " / cast(n as double))"
        " / nullif(cast(n - 1 as double), 0e0) / 10000e0"
    )
    delta = f"({mean} * {_MDE_NUM}e0 / {_MDE_DEN}e0)"
    return g.filter(F.col("n") >= 2).select(
        "event_type",
        "n",
        F.expr(f"{mean}").alias("mean"),
        F.expr(f"{var}").alias("variance"),
        F.expr(
            f"cast(ceil(2e0 * ({_Z_ALPHA!r} + {_Z_BETA!r})"
            f" * ({_Z_ALPHA!r} + {_Z_BETA!r}) * ({var})"
            f" / nullif({delta} * {delta}, 0e0)) as bigint)"
        ).alias("n_per_arm"),
    )


# ---------------------------------------------------------------------------
# Value-at-Risk / expected shortfall (round 9)
# ---------------------------------------------------------------------------

_ES_P_NUM, _ES_P_DEN = 5, 100  # tail level: worst 5%


@register(
    "q_expected_shortfall",
    oracle=f"""
        WITH v AS (
            SELECT event_type, event_id,
                   CAST(round(value * 100) AS BIGINT) AS fx
            FROM events
            WHERE value IS NOT NULL AND event_type IS NOT NULL
        ),
        ranked AS (
            SELECT event_type, fx,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY fx, event_id) AS rk,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM v
        ),
        tail AS (
            -- the worst ceil(n*p) observations (low values = the loss
            -- tail of the distribution)
            SELECT event_type, n,
                   (n * {_ES_P_NUM} + {_ES_P_DEN} - 1) // {_ES_P_DEN}
                       AS k,
                   CAST(sum(CASE WHEN rk <= (n * {_ES_P_NUM}
                                 + {_ES_P_DEN} - 1) // {_ES_P_DEN}
                            THEN fx END) AS BIGINT) AS tail_fx,
                   CAST(min(CASE WHEN rk = (n * {_ES_P_NUM}
                                 + {_ES_P_DEN} - 1) // {_ES_P_DEN}
                            THEN fx END) AS BIGINT) AS var_fx
            FROM ranked GROUP BY event_type, n
        )
        SELECT event_type, n, CAST(k AS BIGINT) AS k,
               CAST(var_fx AS DOUBLE) / 100e0 AS value_at_risk,
               CAST(tail_fx AS DOUBLE) / CAST(k AS DOUBLE) / 100e0
                   AS expected_shortfall
        FROM tail
    """,
    doc="Value-at-Risk and expected shortfall per event type at the 5%"
    " tail: VaR is the exact ceil(n*p)-th order statistic of the"
    " fixed-point values (integer index arithmetic — no interpolated"
    " percentile), ES the exact integer mean of the k tail"
    " observations — the coherent tail-risk pair (ES is subadditive"
    " where VaR alone is not) that turns q_outlier_mad's anomaly"
    " flags into a monitored risk number. One key-partitioned rank"
    " window + one conditional agg; two mirrored divisions at the"
    " end.",
)
def q_expected_shortfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    v = (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull() & F.col("event_type").isNotNull()
        )
        .select(
            "event_type",
            "event_id",
            F.expr("cast(round(value * 100) as bigint)").alias("fx"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("fx", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = v.select(
        "event_type",
        "fx",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    k = f"(n * {_ES_P_NUM} + {_ES_P_DEN} - 1) div {_ES_P_DEN}"
    tail = ranked.groupBy("event_type", "n").agg(
        F.expr(
            f"cast(sum(CASE WHEN rk <= {k} THEN fx END) as bigint)"
        ).alias("tail_fx"),
        F.expr(
            f"cast(min(CASE WHEN rk = {k} THEN fx END) as bigint)"
        ).alias("var_fx"),
    )
    return tail.select(
        "event_type",
        "n",
        F.expr(f"cast({k} as bigint)").alias("k"),
        F.expr("cast(var_fx as double) / 100e0").alias("value_at_risk"),
        F.expr(
            "cast(tail_fx as double)"
            f" / cast({k} as double) / 100e0"
        ).alias("expected_shortfall"),
    )


@register(
    "q_kendall_tau",
    oracle="""
        WITH daily AS (
            -- complete case (NULLS.md tier 1): day buckets are an
            -- ordering by event time
            SELECT event_type, date_trunc('day', ts) AS d,
                   CAST(count(*) AS BIGINT) AS cnt,
                   CAST(sum(CAST(round(value * 10000) AS BIGINT))
                        AS BIGINT) AS sfx
            FROM events WHERE ts IS NOT NULL
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT a.event_type,
                   CASE WHEN (a.cnt - b.cnt) * (a.sfx - b.sfx) > 0
                        THEN 1 ELSE 0 END AS conc,
                   CASE WHEN (a.cnt - b.cnt) * (a.sfx - b.sfx) < 0
                        THEN 1 ELSE 0 END AS disc,
                   CASE WHEN a.cnt = b.cnt THEN 1 ELSE 0 END AS tie_x,
                   CASE WHEN a.sfx = b.sfx THEN 1 ELSE 0 END AS tie_y
            FROM daily a JOIN daily b
              ON a.event_type = b.event_type AND a.d < b.d
        )
        SELECT event_type,
               CAST(sum(conc) AS BIGINT) AS n_concordant,
               CAST(sum(disc) AS BIGINT) AS n_discordant,
               CAST(sum(conc) - sum(disc) AS DOUBLE)
                   / sqrt(CAST(count(*) - sum(tie_x) AS DOUBLE)
                          * CAST(count(*) - sum(tie_y) AS DOUBLE))
                   AS tau_b
        FROM pairs
        GROUP BY event_type
        HAVING count(*) - sum(tie_x) > 0
           AND count(*) - sum(tie_y) > 0
    """,
    doc="Kendall tau-b rank correlation between each event type's"
    " daily count and daily fixed-point value total — the"
    " tie-corrected, outlier-immune monotone-association test"
    " (q_spearman_corr's robust sibling; tau has a direct"
    " probabilistic reading: P(concordant) - P(discordant))."
    " Concordant/discordant/tie classification is exact integer"
    " sign arithmetic over all day PAIRS — quadratic only in the"
    " CALENDAR-bounded day series (the raw table reduces first via"
    " one partial-agg shuffle), so the self-join is |types| x"
    " |days|^2 rows no matter the corpus size; tau-b's denominator"
    " is one sqrt of exact-int products. Complete case on ts"
    " (NULLS.md tier 1).",
)
def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_weather_spark.sources.tables import load_table

    # complete case (NULLS.md tier 1): day buckets order by ts
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    )
    fx = F.round(F.col("value") * 10000, 0).cast("bigint")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum(fx).cast("bigint").alias("sfx"),
    )
    a = daily.alias("a")
    b = daily.alias("b")
    prod = (F.col("a.cnt") - F.col("b.cnt")) * (
        F.col("a.sfx") - F.col("b.sfx")
    )
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.when(prod > 0, 1).otherwise(0).alias("conc"),
        F.when(prod < 0, 1).otherwise(0).alias("disc"),
        F.when(F.col("a.cnt") == F.col("b.cnt"), 1)
        .otherwise(0).alias("tie_x"),
        F.when(F.col("a.sfx") == F.col("b.sfx"), 1)
        .otherwise(0).alias("tie_y"),
    )
    agg = pairs.groupBy("event_type").agg(
        F.sum("conc").cast("bigint").alias("n_concordant"),
        F.sum("disc").cast("bigint").alias("n_discordant"),
        (F.count(F.lit(1)) - F.sum("tie_x")).alias("nx"),
        (F.count(F.lit(1)) - F.sum("tie_y")).alias("ny"),
    )
    return agg.filter((F.col("nx") > 0) & (F.col("ny") > 0)).select(
        "event_type",
        "n_concordant",
        "n_discordant",
        (
            (F.col("n_concordant") - F.col("n_discordant")).cast("double")
            / F.sqrt(
                F.col("nx").cast("double") * F.col("ny").cast("double")
            )
        ).alias("tau_b"),
    )


@register(
    "q_hodges_lehmann",
    oracle="""
        WITH daily AS (
            -- complete case (NULLS.md tier 1): day buckets order by
            -- ts, and the Walsh-pair ranking is an ordering by the
            -- daily total — a day with no non-NULL value has no
            -- total (HAVING drops it on both engines; unfiltered,
            -- its NULL pair sums would rank FIRST in Spark and LAST
            -- here, shifting the median rank)
            SELECT event_type, date_trunc('day', ts) AS d,
                   CAST(sum(CAST(round(value * 10000) AS BIGINT))
                        AS BIGINT) AS y
            FROM events WHERE ts IS NOT NULL
            GROUP BY 1, 2
            HAVING y IS NOT NULL
        ),
        walsh AS (
            SELECT a.event_type, a.y + b.y AS w
            FROM daily a JOIN daily b
              ON a.event_type = b.event_type AND a.d <= b.d
        ),
        ranked AS (
            SELECT event_type, w,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY w) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS m
            FROM walsh
        )
        SELECT event_type,
               CAST(max(m) AS BIGINT) AS n_pairs,
               CAST(min(CASE WHEN rn = greatest(1, (m * 50) // 100)
                             THEN w END) AS DOUBLE) / 20000
                   AS hl_estimate
        FROM ranked GROUP BY event_type
    """,
    doc="Hodges-Lehmann location estimator of each event type's daily"
    " value total: the median of all Walsh averages (y_i + y_j)/2,"
    " i <= j — the robust 'typical day' with a 29% breakdown point"
    " and far better efficiency than the plain median under"
    " near-normal data (the estimator behind the Wilcoxon CI). The"
    " pairwise expansion is quadratic ONLY in the calendar-bounded"
    " day series (one partial-agg shuffle reduces the raw table"
    " first), pair sums stay int64, and the median is the exact"
    " rank-selection idiom (q_agg_quantiles) — no interpolation, so"
    " it is engine-portable bit-for-bit; halving happens once in the"
    " final double division. Complete case on ts (NULLS.md tier 1).",
)
def q_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from lakehouse_weather_spark.sources.tables import load_table

    # complete case (NULLS.md tier 1): day buckets order by ts
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    )
    fx = F.round(F.col("value") * 10000, 0).cast("bigint")
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("d"))
        .agg(F.sum(fx).cast("bigint").alias("y"))
        # complete case: an all-NULL-value day has no total (see oracle)
        .filter(F.col("y").isNotNull())
    )
    a, b = daily.alias("a"), daily.alias("b")
    walsh = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.d") <= F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (F.col("a.y") + F.col("b.y")).alias("w"),
    )
    win = Window.partitionBy("event_type").orderBy("w")
    ranked = walsh.select(
        "event_type",
        "w",
        F.row_number().over(win).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy("event_type")
        ).alias("m"),
    )
    med_rank = F.greatest(
        F.lit(1), F.expr("div(m * 50, 100)")
    )
    return ranked.groupBy("event_type").agg(
        F.max("m").cast("bigint").alias("n_pairs"),
        (
            F.min(F.when(F.col("rn") == med_rank, F.col("w")))
            .cast("double") / 20000
        ).alias("hl_estimate"),
    )


@register(
    "q_cohens_kappa",
    oracle="""
        WITH pts AS (
            -- complete case (NULLS.md tier 1): identity matters and
            -- the agreement cell is a (user, hour) bucket of ts
            SELECT user_id, event_type, event_id,
                   date_trunc('hour', ts) AS h
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
        ),
        grid AS (
            SELECT CAST(count(DISTINCT user_id) AS BIGINT)
                   * CAST(count(DISTINCT h) AS BIGINT) AS n
            FROM pts
        ),
        flags AS (
            SELECT event_type, user_id, h,
                   max(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
                       AS x,
                   max(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)
                       AS y
            FROM pts GROUP BY 1, 2, 3
        ),
        cells AS (
            SELECT f.event_type,
                   CAST(sum(f.x * f.y) AS BIGINT) AS a,
                   CAST(sum(f.x * (1 - f.y)) AS BIGINT) AS b,
                   CAST(sum((1 - f.x) * f.y) AS BIGINT) AS c,
                   (SELECT n FROM grid) AS n
            FROM flags f GROUP BY 1
        ),
        k AS (
            SELECT event_type, n, a, b, c, n - a - b - c AS d,
                   n * (a + (n - a - b - c))
                   - ((a + b) * (a + c)
                      + (c + (n - a - b - c))
                        * (b + (n - a - b - c))) AS num,
                   n * n
                   - ((a + b) * (a + c)
                      + (c + (n - a - b - c))
                        * (b + (n - a - b - c))) AS den
            FROM cells
        )
        SELECT event_type, CAST(n AS BIGINT) AS n_cells, a, b, c,
               CAST(d AS BIGINT) AS d,
               CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS kappa
        FROM k WHERE den <> 0
    """,
    doc="Cohen's kappa per event type between two deterministic"
    " 'raters' at the (user, hour) cell grain: did the even-id"
    " snapshot half see activity in that cell vs the odd-id half —"
    " chance-corrected snapshot agreement, the stability diagnostic"
    " raw overlap overstates when base rates are extreme (user-level"
    " flags are degenerate on a dense corpus: every user is active"
    " in both halves, kappa undefined — hourly cells keep the 2x2"
    " populated). Flags reduce per (type, user, hour) in one"
    " partial-agg shuffle; absent-absent is derived as n - a - b - c"
    " against the |users| x |hours| grid (two exact distinct counts,"
    " no materialized grid); every product stays int64 and kappa is"
    " one division of correctly-rounded casts — bit-stable"
    " cross-engine. Complete case on user_id/ts (NULLS.md tier 1).",
)
def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_weather_spark.sources.tables import load_table

    # complete case (NULLS.md tier 1): identity + hour bucket of ts
    pts = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.date_trunc("hour", "ts").alias("h"),
        )
    )
    grid = pts.agg(
        (
            F.countDistinct("user_id").cast("bigint")
            * F.countDistinct("h").cast("bigint")
        ).alias("n")
    )
    flags = pts.groupBy("event_type", "user_id", "h").agg(
        F.max(
            F.when(F.pmod("event_id", F.lit(2)) == 0, 1).otherwise(0)
        ).alias("x"),
        F.max(
            F.when(F.pmod("event_id", F.lit(2)) == 1, 1).otherwise(0)
        ).alias("y"),
    )
    cells = flags.groupBy("event_type").agg(
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("a"),
        F.sum(F.col("x") * (1 - F.col("y"))).cast("bigint").alias("b"),
        F.sum((1 - F.col("x")) * F.col("y")).cast("bigint").alias("c"),
    ).crossJoin(F.broadcast(grid))
    d = F.col("n") - F.col("a") - F.col("b") - F.col("c")
    pe_num = (F.col("a") + F.col("b")) * (F.col("a") + F.col("c")) + (
        F.col("c") + d
    ) * (F.col("b") + d)
    num = F.col("n") * (F.col("a") + d) - pe_num
    den = F.col("n") * F.col("n") - pe_num
    return cells.filter(den != 0).select(
        "event_type",
        F.col("n").cast("bigint").alias("n_cells"),
        "a",
        "b",
        "c",
        d.cast("bigint").alias("d"),
        (num.cast("double") / den.cast("double")).alias("kappa"),
    )


@register(
    "q_poisson_dispersion",
    oracle="""
        WITH daily AS (
            -- complete case (NULLS.md tier 1): day buckets order by ts
            SELECT event_type, date_trunc('day', ts) AS d,
                   CAST(count(*) AS BIGINT) AS c
            FROM events WHERE ts IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(c) AS DOUBLE) / count(*) AS mean_per_day,
               CAST(count(*) * sum(c * c) - sum(c) * sum(c) AS DOUBLE)
                   / (count(*) - 1) / sum(c) AS dispersion_index,
               CAST(count(*) * sum(c * c) - sum(c) * sum(c) AS DOUBLE)
                   / sum(c) AS chi2_stat
        FROM daily
        WHERE c IS NOT NULL
        GROUP BY event_type
        HAVING count(*) > 1 AND sum(c) > 0
    """,
    doc="Index-of-dispersion (variance-to-mean ratio) of each type's"
    " daily count series plus the classic chi2 dispersion statistic"
    " ((n-1)*s^2/mean): =1 under Poisson arrivals, >1 flags bursty /"
    " overdispersed traffic, <1 suspiciously regular (bot cadence) —"
    " the quick triage before q_burstiness / q_interarrival_hist."
    " Both statistics are single IEEE divisions of exact int64"
    " moments (n*Q - S^2 with Q = sum of squared day counts), so"
    " bit-portable; one partial-agg shuffle to the calendar-bounded"
    " day series. Complete case on ts (NULLS.md tier 1).",
)
def q_poisson_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_weather_spark.sources.tables import load_table

    # complete case (NULLS.md tier 1): day buckets order by ts
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    )
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    agg = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    )
    spread = agg.filter((F.col("n_days") > 1) & (F.col("s") > 0))
    num = F.col("n_days") * F.col("q") - F.col("s") * F.col("s")
    return spread.select(
        "event_type",
        "n_days",
        (F.col("s").cast("double") / F.col("n_days"))
        .alias("mean_per_day"),
        (
            num.cast("double") / (F.col("n_days") - 1) / F.col("s")
        ).alias("dispersion_index"),
        (num.cast("double") / F.col("s")).alias("chi2_stat"),
    )


@register(
    "q_cramers_v",
    oracle="""
        WITH pts AS (
            -- complete case (NULLS.md tier 1): the contingency cell
            -- is (category, weekday-of-ts); rows without either have
            -- no cell. Weekday is computed engine-free from the epoch
            -- day number (1970-01-01 = Thursday = 4) so no engine's
            -- dayofweek() origin convention is in the gate.
            SELECT event_type,
                   (epoch_ns(ts) // 1000000000 // 86400 + 4) % 7
                       AS dow
            FROM events
            WHERE ts IS NOT NULL AND event_type IS NOT NULL
        ),
        cells AS (
            SELECT event_type, dow,
                   CAST(count(*) AS BIGINT) AS o
            FROM pts GROUP BY 1, 2
        ),
        margins AS (
            SELECT c.event_type, c.dow, c.o,
                   sum(c.o) OVER (PARTITION BY c.event_type) AS r,
                   sum(c.o) OVER (PARTITION BY c.dow) AS col,
                   sum(c.o) OVER () AS n
            FROM cells c
        ),
        terms AS (
            SELECT event_type, dow,
                   (CAST(o AS DOUBLE)
                    - CAST(r AS DOUBLE) * CAST(col AS DOUBLE)
                      / CAST(n AS DOUBLE))
                   * (CAST(o AS DOUBLE)
                      - CAST(r AS DOUBLE) * CAST(col AS DOUBLE)
                        / CAST(n AS DOUBLE))
                   / (CAST(r AS DOUBLE) * CAST(col AS DOUBLE)
                      / CAST(n AS DOUBLE)) AS term
            FROM margins
        ),
        dims AS (
            SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS nr,
                   CAST(count(DISTINCT dow) AS BIGINT) AS nc,
                   CAST(max(n) AS BIGINT) AS n,
                   (SELECT list_reduce(
                        list(term ORDER BY event_type, dow),
                        (a, b) -> a + b) FROM terms) AS chi2
            FROM margins
        )
        SELECT n, nr AS n_rows_dim, nc AS n_cols_dim, chi2,
               sqrt(chi2 / (CAST(n AS DOUBLE)
                            * least(nr - 1, nc - 1))) AS cramers_v
        FROM dims
        WHERE least(nr - 1, nc - 1) > 0
    """,
    doc="Cramer's V association between event type and weekday — the"
    " normalized chi2 that answers 'does traffic mix shift by day of"
    " week' on a 0..1 scale regardless of table size. Cell terms"
    " (O-E)^2/E are correctly-rounded IEEE ops on exact int64"
    " marginals, folded in SORTED cell order with the explicit"
    " aggregate() lambda (the q_anova_f / q_levene_bf discipline —"
    " engine-order sum(double) is the divergence the pathological"
    " battery catches); weekday comes from epoch-day arithmetic"
    " ((days + 4) % 7), not any engine's dayofweek() origin. The"
    " contingency table is |types| x 7 — the only windows run over"
    " those bounded cells. Complete case on ts/event_type (NULLS.md"
    " tier 1: a row without a category or a time has no cell).",
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from lakehouse_weather_spark.sources.tables import load_table

    # complete case (NULLS.md tier 1): see oracle comment
    pts = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .select(
            "event_type",
            F.expr(
                "pmod(div(cast(cast(ts as timestamp) as long),"
                " 86400) + 4, 7)"
            ).cast("bigint").alias("dow"),
        )
    )
    cells = pts.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    margins = cells.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("r"),
        F.sum("o").over(Window.partitionBy("dow")).alias("col"),
        F.sum("o").over(
            Window.partitionBy(F.lit(1))
        ).alias("n"),
    )
    e = (
        F.col("r").cast("double")
        * F.col("col").cast("double")
        / F.col("n").cast("double")
    )
    terms = margins.select(
        "event_type",
        "dow",
        "o",
        "n",
        (
            (F.col("o").cast("double") - e)
            * (F.col("o").cast("double") - e)
            / e
        ).alias("term"),
    )
    dims = terms.agg(
        F.countDistinct("event_type").cast("bigint").alias("nr"),
        F.countDistinct("dow").cast("bigint").alias("nc"),
        F.max("n").cast("bigint").alias("n"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(event_type,"
            " dow, term))), cast(0 as double),"
            " (a, x) -> a + x.term)"
        ).alias("chi2"),
    )
    return dims.filter(
        F.least(F.col("nr") - 1, F.col("nc") - 1) > 0
    ).select(
        "n",
        F.col("nr").alias("n_rows_dim"),
        F.col("nc").alias("n_cols_dim"),
        "chi2",
        F.sqrt(
            F.col("chi2")
            / (
                F.col("n").cast("double")
                * F.least(F.col("nr") - 1, F.col("nc") - 1)
            )
        ).alias("cramers_v"),
    )
