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

_PERM_B = 200


@register(
    "q_permutation_test",
    oracle=f"""
        WITH ev AS (
            SELECT event_id, user_id,
                   CAST(round(value * 100) AS BIGINT) AS fx
            FROM events
        ),
        lab AS (
            SELECT b.b, ev.fx,
                   CASE WHEN b.b = -1 THEN user_id % 2
                        ELSE {_h_duck(
                            "'perm' || CAST(b.b AS VARCHAR) || '_'"
                            " || CAST(event_id AS VARCHAR)"
                        )} % 2
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
    f" even/odd user cohorts: {_PERM_B} seeded label reassignments"
    " (md5(perm_b, event_id) — deterministic, cluster-order-free),"
    " two-sided p-value with the +1 correction. The extremeness"
    " comparison |Sa*nb - Sb*na| cross-multiplied by the opposite"
    " denominators runs entirely in HUGEINT/DECIMAL(38) — mean"
    " differences are compared as exact rationals, never as floats, so"
    " the count of extreme permutations is bit-certain on both"
    " engines. Scale shape: one narrow B-fold explode of (b, fx) that"
    " partial-aggregates map-side to B rows before the only shuffle —"
    " the q_bootstrap_ci shape; the permutation table is never"
    " materialized per-copy. At 100 TB the B x groups grid is a few"
    " hundred rows of driver-free arithmetic.",
)
def q_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr("cast(round(value * 100) as bigint)").alias("fx"),
    )
    lab = ev.select(
        "fx",
        F.explode(F.expr(f"sequence(-1, {_PERM_B - 1})")).alias("b"),
        "user_id",
        "event_id",
    ).select(
        "b",
        "fx",
        F.expr(
            "CASE WHEN b = -1 THEN user_id % 2 ELSE "
            + _h_spark(
                "concat('perm', cast(b as string), '_',"
                " cast(event_id as string))"
            )
            + " % 2 END"
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
            SELECT event_type, event_id,
                   CAST(round(value * 100) AS BIGINT) AS fx
            FROM events
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
        tot AS (
            SELECT CAST(sum(n_i) AS BIGINT) AS n,
                   CAST(sum(s_i) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS k,
                   CAST(sum(CAST(s_i * s_i AS HUGEINT) / n_i)
                        AS DOUBLE) AS between_part
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
    """,
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

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.expr("cast(round(value * 100) as bigint)").alias("fx"),
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
    tot = g.agg(
        F.sum("n_i").cast("bigint").alias("n"),
        F.sum("s_i").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.expr(
            "cast(sum(cast(s_i * s_i as decimal(38,0)) / n_i)"
            " as double)"
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
