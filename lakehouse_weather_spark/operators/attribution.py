"""Conversion attribution and change-point detection over the event
stream — the product-analytics closure next to the funnel/retention
family (streaming/events.py).

- q_attribution: multi-touch credit assignment. Every ``purchase`` is
  a conversion; the touchpoints are the user's non-purchase events
  since their previous purchase. Three standard models at once —
  first-touch, last-touch, and linear — with all credit in integer
  basis points so 10000 bp per conversion is conserved EXACTLY (the
  linear remainder goes to the last touch), making the whole
  attribution table integer arithmetic end to end.
- q_changepoint: single change-point per event type over the daily
  count series (binary-segmentation step 1): the split day that
  maximizes the between-segments sum-of-squares gain. The gain is
  evaluated in fixed point with floor division, so the argmax is a
  deterministic integer comparison in both engines.

Scale notes (100 TB framing):
- q_attribution: two windows per user (a running purchase counter,
  then rank/count inside each (user, conversion) group) — both on the
  user-id shard key, never global — and one final partial agg to
  |event_types| rows.
- q_changepoint: aggregates to |types| x |days| BEFORE any window
  (same discipline as q_volume_anomaly); the candidate-split scan is a
  prefix-sum window over that tiny series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table

# Conversion event + credit budget per conversion (basis points).
_CONV = "purchase"
_BP = 10_000
# Fixed-point scale for change-point gains.
_CP_S = 10_000


@register(
    "q_attribution",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, event_id, event_type,
                   sum(CASE WHEN event_type = '{_CONV}' THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS conv_idx,
                   count(CASE WHEN event_type = '{_CONV}' THEN 1 END)
                       OVER (PARTITION BY user_id) AS n_conv,
                   ts
            FROM events
        ),
        touches AS (
            SELECT user_id, event_type, conv_idx,
                   row_number() OVER (PARTITION BY user_id, conv_idx
                                      ORDER BY ts, event_id) AS rn,
                   count(*) OVER (PARTITION BY user_id, conv_idx) AS n
            FROM seq
            WHERE event_type <> '{_CONV}' AND conv_idx < n_conv
        ),
        credited AS (
            SELECT event_type,
                   CASE WHEN rn = 1 THEN {_BP} ELSE 0 END AS first_bp,
                   CASE WHEN rn = n THEN {_BP} ELSE 0 END AS last_bp,
                   CASE WHEN rn = n
                        THEN {_BP} - (n - 1) * ({_BP} // n)
                        ELSE {_BP} // n END AS linear_bp
            FROM touches
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_touches,
               CAST(sum(first_bp) AS BIGINT) AS first_touch_bp,
               CAST(sum(last_bp) AS BIGINT) AS last_touch_bp,
               CAST(sum(linear_bp) AS BIGINT) AS linear_bp
        FROM credited GROUP BY event_type
    """,
    doc="Multi-touch conversion attribution: every purchase is a"
    " conversion, its touchpoints are the user's non-purchase events"
    " since the previous purchase (events after the final purchase"
    " attribute to nothing). First-touch, last-touch, and linear"
    " credit computed together, in integer basis points with the"
    " linear remainder assigned to the last touch — so every"
    " conversion distributes EXACTLY 10000 bp under each model and"
    " the per-channel totals are exact integers (sum(linear) =="
    " sum(first) == sum(last) == 10000 x conversions-with-touches)."
    " Two user-sharded windows + one partial agg; no window ever"
    " crosses users, so the plan scales with the user shard, the"
    " 100 TB-safe shape for clickstream attribution.",
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wseq = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wuser = Window.partitionBy("user_id")
    seq = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.sum(
            F.when(F.col("event_type") == _CONV, 1).otherwise(0)
        )
        .over(wseq)
        .alias("conv_idx"),
        F.count(
            F.when(F.col("event_type") == _CONV, F.lit(1))
        )
        .over(wuser)
        .alias("n_conv"),
    )
    wtouch = Window.partitionBy("user_id", "conv_idx").orderBy(
        "ts", "event_id"
    )
    wgrp = Window.partitionBy("user_id", "conv_idx")
    touches = (
        seq.filter(
            (F.col("event_type") != _CONV)
            & (F.col("conv_idx") < F.col("n_conv"))
        )
        .withColumn("rn", F.row_number().over(wtouch))
        .withColumn("n", F.count(F.lit(1)).over(wgrp))
    )
    credited = touches.select(
        "event_type",
        F.when(F.col("rn") == 1, _BP).otherwise(0).alias("first_bp"),
        F.when(F.col("rn") == F.col("n"), _BP).otherwise(0).alias("last_bp"),
        F.when(
            F.col("rn") == F.col("n"),
            F.lit(_BP) - (F.col("n") - 1) * F.expr(f"{_BP} div n"),
        )
        .otherwise(F.expr(f"{_BP} div n"))
        .alias("linear_bp"),
    )
    return credited.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.sum("first_bp").cast("bigint").alias("first_touch_bp"),
        F.sum("last_bp").cast("bigint").alias("last_touch_bp"),
        F.sum("linear_bp").cast("bigint").alias("linear_bp"),
    )


@register(
    "q_changepoint",
    oracle=f"""
        WITH daily AS (
            -- NULL ts would form a NULL day ordered NULLS LAST here
            -- but NULLS FIRST in Spark, shifting every prefix sum
            SELECT event_type, date_trunc('day', ts) AS d,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events
            WHERE ts IS NOT NULL
            GROUP BY 1, 2
        ),
        seq AS (
            SELECT event_type, d, cnt,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY d) AS k,
                   count(*) OVER (PARTITION BY event_type) AS n,
                   sum(cnt) OVER (PARTITION BY event_type ORDER BY d
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS pre,
                   sum(cnt) OVER (PARTITION BY event_type) AS tot
            FROM daily
        ),
        gains AS (
            SELECT event_type, d, k, n,
                   (pre * pre * {_CP_S}) // k
                   + ((tot - pre) * (tot - pre) * {_CP_S}) // (n - k)
                   - (tot * tot * {_CP_S}) // n AS gain_fx
            FROM seq WHERE k < n
        )
        SELECT event_type,
               CAST(n AS BIGINT) AS n_days,
               d AS split_day,
               CAST(gain_fx AS BIGINT) AS gain_fx
        FROM (
            SELECT *, row_number() OVER (PARTITION BY event_type
                ORDER BY gain_fx DESC, d ASC) AS rk
            FROM gains
        ) WHERE rk = 1
    """,
    doc="Single change-point per event type (the first step of binary"
    " segmentation / PELT): over the daily-count series, pick the"
    " split day maximizing the between-segments sum-of-squares gain"
    " sum_l^2/k + sum_r^2/(n-k) - sum^2/n. The gain is evaluated in"
    " fixed point with floor division on non-negative int64 (prefix"
    " sums come from one cumulative window over the tiny per-type"
    " daily aggregate), so the argmax — tie-broken to the earliest"
    " day — is a deterministic integer comparison that DuckDB replays"
    " exactly. The raw event table is touched by ONE partial agg;"
    " every window runs on |types| x |days| rows.",
)
def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL ts excluded (mirrored in the oracle): a NULL day would
    # order NULLS FIRST here vs DuckDB's LAST, shifting prefix sums
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    )
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    word = Window.partitionBy("event_type").orderBy("d")
    wtype = Window.partitionBy("event_type")
    seq = daily.select(
        "event_type",
        "d",
        "cnt",
        F.row_number().over(word).alias("k"),
        F.count(F.lit(1)).over(wtype).alias("n"),
        F.sum("cnt")
        .over(word.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("pre"),
        F.sum("cnt").over(wtype).alias("tot"),
    )
    gains = seq.filter(F.col("k") < F.col("n")).select(
        "event_type",
        "d",
        "n",
        F.expr(
            f"(pre * pre * {_CP_S}) div k"
            f" + ((tot - pre) * (tot - pre) * {_CP_S}) div (n - k)"
            f" - (tot * tot * {_CP_S}) div n"
        ).alias("gain_fx"),
    )
    wbest = Window.partitionBy("event_type").orderBy(
        F.desc("gain_fx"), F.asc("d")
    )
    return (
        gains.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_days"),
            F.col("d").alias("split_day"),
            F.col("gain_fx").cast("bigint").alias("gain_fx"),
        )
    )


# --- difference-in-differences ---------------------------------------

_SCALE = 10_000


@register(
    "q_did",
    oracle=f"""
        WITH bounds AS (
            SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid_us
            FROM events
        ),
        cells AS (
            SELECT CAST(user_id % 2 AS BIGINT) AS treated,
                   CAST(epoch_us(ts) >= (SELECT mid_us FROM bounds)
                        AS BIGINT) AS post,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(round(value * {_SCALE}) AS BIGINT))
                        AS BIGINT) AS s
            FROM events GROUP BY 1, 2
        ),
        means AS (
            SELECT treated, post,
                   n, CAST(s AS DOUBLE) / n / {_SCALE} AS m
            FROM cells
        )
        SELECT
            CAST(sum(CASE WHEN treated = 1 AND post = 0 THEN n END)
                 AS BIGINT) AS n_treat_pre,
            CAST(sum(CASE WHEN treated = 1 AND post = 1 THEN n END)
                 AS BIGINT) AS n_treat_post,
            max(CASE WHEN treated = 0 AND post = 0 THEN m END)
                AS mean_ctrl_pre,
            max(CASE WHEN treated = 0 AND post = 1 THEN m END)
                AS mean_ctrl_post,
            max(CASE WHEN treated = 1 AND post = 0 THEN m END)
                AS mean_treat_pre,
            max(CASE WHEN treated = 1 AND post = 1 THEN m END)
                AS mean_treat_post,
            (max(CASE WHEN treated = 1 AND post = 1 THEN m END)
             - max(CASE WHEN treated = 1 AND post = 0 THEN m END))
            - (max(CASE WHEN treated = 0 AND post = 1 THEN m END)
               - max(CASE WHEN treated = 0 AND post = 0 THEN m END))
                AS did_estimate
        FROM means
    """,
    doc="Difference-in-differences estimator over the event stream:"
    " treatment = deterministic user parity (the stand-in for an"
    " experiment flag), periods = the stream's time halves; the"
    " estimate is (treat_post - treat_pre) - (ctrl_post - ctrl_pre),"
    " the workhorse causal design when randomization is impossible"
    " and both groups share a pre-trend. The four cell means come"
    " from exact integer (count, sum) pairs produced by ONE"
    " conditional-aggregation scan; the estimate is six mirrored IEEE"
    " ops, so DuckDB replays it bit-for-bit. Output is one row —"
    " at any scale the reduce tree carries eight integers.",
)
def q_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = "unix_micros(cast(ts as timestamp))"
    bounds = ev.agg(
        F.expr(f"(min({us}) + max({us})) div 2").alias("mid_us")
    )
    cells = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy(
            (F.col("user_id") % 2).cast("bigint").alias("treated"),
            F.expr(f"cast({us} >= mid_us as bigint)").alias("post"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round(F.col("value") * _SCALE, 0).cast("bigint"))
            .cast("bigint")
            .alias("s"),
        )
    )
    means = cells.select(
        "treated",
        "post",
        "n",
        F.expr(f"cast(s as double) / n / {_SCALE}").alias("m"),
    )

    def cell(t: int, p: int, col: str) -> F.Column:
        return F.max(
            F.when(
                (F.col("treated") == t) & (F.col("post") == p), F.col(col)
            )
        )

    return means.agg(
        F.sum(
            F.when((F.col("treated") == 1) & (F.col("post") == 0), F.col("n"))
        )
        .cast("bigint")
        .alias("n_treat_pre"),
        F.sum(
            F.when((F.col("treated") == 1) & (F.col("post") == 1), F.col("n"))
        )
        .cast("bigint")
        .alias("n_treat_post"),
        cell(0, 0, "m").alias("mean_ctrl_pre"),
        cell(0, 1, "m").alias("mean_ctrl_post"),
        cell(1, 0, "m").alias("mean_treat_pre"),
        cell(1, 1, "m").alias("mean_treat_post"),
        (
            (cell(1, 1, "m") - cell(1, 0, "m"))
            - (cell(0, 1, "m") - cell(0, 0, "m"))
        ).alias("did_estimate"),
    )


# --- sample-ratio-mismatch check -------------------------------------


@register(
    "q_srm_check",
    oracle="""
        WITH assign AS (
            SELECT DISTINCT user_id, user_id % 2 AS arm FROM events
        ),
        counts AS (
            SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_control,
                   CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_treat
            FROM assign
        )
        SELECT n_control, n_treat,
               CAST((n_control - n_treat) * (n_control - n_treat)
                    AS DOUBLE) / (n_control + n_treat) AS chi2,
               (CAST((n_control - n_treat) * (n_control - n_treat)
                     AS DOUBLE) / (n_control + n_treat)) > 3.841
                   AS srm_alarm
        FROM counts
    """,
    doc="Sample-ratio-mismatch (SRM) check for the 50/50 parity"
    " assignment the DiD/CUPED queries use: chi-square goodness-of-fit"
    " of observed arm sizes against the designed equal split, alarmed"
    " at the 95% critical value (3.841, df=1) — the FIRST validity"
    " gate any experiment readout must pass (a failed SRM means"
    " biased triggering, and every downstream effect estimate is"
    " suspect). Counts are per-USER (one distinct pass), the chi2 a"
    " pair of mirrored IEEE ops; the 3.841 threshold is a baked"
    " constant so the boolean alarm is bit-stable. One scan + one"
    " distinct + a 2-number reduce.",
)
def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    assign = ev.select(
        "user_id", (F.col("user_id") % 2).alias("arm")
    ).distinct()
    counts = assign.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_control"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_treat"),
    )
    chi2 = F.expr(
        "cast((n_control - n_treat) * (n_control - n_treat) as double)"
        " / (n_control + n_treat)"
    )
    return counts.select(
        "n_control",
        "n_treat",
        chi2.alias("chi2"),
        (chi2 > 3.841).alias("srm_alarm"),
    )


# --- sequential pattern support mining -------------------------------


@register(
    "q_seq_patterns",
    oracle="""
        WITH f1 AS (
            SELECT user_id, event_type AS t1, min(ts) AS ts1
            FROM events GROUP BY user_id, event_type
        ),
        f2 AS (
            SELECT e.user_id, f.t1, e.event_type AS t2, min(e.ts) AS ts2
            FROM events e JOIN f1 f ON e.user_id = f.user_id
            WHERE e.ts > f.ts1
            GROUP BY e.user_id, f.t1, e.event_type
        ),
        f3 AS (
            SELECT DISTINCT e.user_id, f.t1, f.t2, e.event_type AS t3
            FROM events e JOIN f2 f ON e.user_id = f.user_id
            WHERE e.ts > f.ts2
        ),
        tot AS (
            SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events
        )
        SELECT t1, t2, t3,
               CAST(count(*) AS BIGINT) AS support,
               CAST(count(*) * 10000 // (SELECT n_users FROM tot)
                    AS BIGINT) AS support_bp
        FROM f3 GROUP BY t1, t2, t3
    """,
    doc="Sequential-pattern support mining (the GSP/PrefixSpan"
    " existence layer for length-3 patterns): for every ordered"
    " event-type triple (t1, t2, t3), how many users exhibit it as a"
    " GAPPED subsequence — t1 strictly before some t2 strictly before"
    " some t3, other events freely interleaved (q_event_pattern's"
    " regex episodes are the contiguous cousin). Existence uses the"
    " earliest-chain argument (greedy min timestamps are sufficient"
    " for subsequence existence), so each hop is ONE user-keyed"
    " equi-join + partial min — the fan-out is bounded by the"
    " alphabet (|types|^2 intermediate keys per user), never by"
    " pattern enumeration. Integer supports + basis points; the"
    " DuckDB replay is exact.",
)
def q_seq_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    f1 = ev.groupBy(
        "user_id", F.col("event_type").alias("t1")
    ).agg(F.min("ts").alias("ts1"))
    f2 = (
        ev.join(f1, "user_id")
        .filter(F.col("ts") > F.col("ts1"))
        .groupBy("user_id", "t1", F.col("event_type").alias("t2"))
        .agg(F.min("ts").alias("ts2"))
    )
    f3 = (
        ev.join(f2, "user_id")
        .filter(F.col("ts") > F.col("ts2"))
        .select("user_id", "t1", "t2", F.col("event_type").alias("t3"))
        .distinct()
    )
    tot = ev.agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )
    return (
        f3.groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .crossJoin(F.broadcast(tot))
        .select(
            "t1",
            "t2",
            "t3",
            "support",
            F.expr("cast(support * 10000 div n_users as bigint)").alias(
                "support_bp"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Off-policy evaluation: IPS / SNIPS over the event log
# ---------------------------------------------------------------------------

_IPS_CTX_BUCKETS = 10


@register(
    "q_ips_offpolicy",
    oracle=f"""
        WITH log_ AS (
            SELECT user_id % {_IPS_CTX_BUCKETS} AS ctx,
                   event_type AS action,
                   CAST(round(value * 100) AS BIGINT) AS r_fx
            FROM events
        ),
        ctx_n AS (SELECT ctx, CAST(count(*) AS BIGINT) AS n_ctx
                  FROM log_ GROUP BY ctx),
        act_n AS (
            SELECT ctx, action, CAST(count(*) AS BIGINT) AS n_act,
                   CAST(sum(r_fx) AS BIGINT) AS sum_r_fx
            FROM log_ GROUP BY ctx, action
        ),
        target AS (
            SELECT ctx, action AS pi_action
            FROM (
                SELECT ctx, action,
                       -- DuckDB // TRUNCATES toward zero (verified:
                       -- -7 // 2 = -3), so emulate FLOOR division with
                       -- the pmod-subtract form to match the Spark
                       -- side's floor key when sum_r_fx < 0 — the same
                       -- _pi_fdiv_duck idiom mlfeat.py uses
                       row_number() OVER (
                           PARTITION BY ctx
                           ORDER BY (sum_r_fx * 1000000
                                     - ((sum_r_fx * 1000000 % n_act
                                         + n_act) % n_act))
                                    // n_act DESC, action
                       ) AS rk
                FROM act_n
            )
            WHERE rk = 1
        ),
        matched AS (
            SELECT a.ctx, a.action, a.n_act, a.sum_r_fx
            FROM act_n a JOIN target t
              ON a.ctx = t.ctx AND a.action = t.pi_action
        ),
        logged AS (
            SELECT ctx, CAST(sum(r_fx) AS BIGINT) AS sum_all_fx
            FROM log_ GROUP BY ctx
        )
        SELECT m.ctx, m.action AS pi_action,
               m.n_act AS n_matched, c.n_ctx,
               CAST(m.n_act AS DOUBLE) / c.n_ctx AS propensity,
               CAST(m.sum_r_fx AS DOUBLE) / (m.n_act * 100.0)
                   AS snips_value,
               CAST(l.sum_all_fx AS DOUBLE) / (c.n_ctx * 100.0)
                   AS logged_value
        FROM matched m
        JOIN ctx_n c USING (ctx)
        JOIN logged l USING (ctx)
    """,
    doc="Off-policy evaluation (IPS / self-normalized IPS) of a greedy"
    " target policy over the logged event stream: context = user-id"
    " bucket, logged action = event_type, reward = value; the logging"
    " propensity is the empirical action share per context and the"
    " target policy picks the empirically-best action (integer-scaled"
    " mean, deterministic action tie-break). IPS ="
    " mean(1{{a=pi(x)}} r / p(a|x)); with a deterministic target the"
    " per-context estimate collapses to closed form over three exact"
    " integer aggregates (rewards are cent-exact int64), so every"
    " float column is ONE final division — engine-exact, no float"
    " accumulation anywhere. Scale: two partial-agg passes over the"
    " log + a per-context argmax on the tiny (ctx, action) table;"
    " nothing driver-side.",
)
def q_ips_offpolicy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    log_ = ev.select(
        (F.col("user_id") % _IPS_CTX_BUCKETS).alias("ctx"),
        F.col("event_type").alias("action"),
        F.round(F.col("value") * 100).cast("bigint").alias("r_fx"),
    )
    ctx_n = log_.groupBy("ctx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ctx")
    )
    act_n = log_.groupBy("ctx", "action").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_act"),
        F.sum("r_fx").cast("bigint").alias("sum_r_fx"),
    )
    # floor-safe division (Spark div truncates toward zero, DuckDB //
    # floors): subtract the non-negative pmod first so both agree for
    # negative reward sums — same idiom as _pi_fdiv_duck / q_zorder_prune
    _mean_key = (
        "(sum_r_fx * 1000000"
        " - pmod(sum_r_fx * 1000000, n_act)) div n_act"
    )
    w = Window.partitionBy("ctx").orderBy(
        F.desc(F.expr(_mean_key)), F.asc("action")
    )
    target = (
        act_n.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("ctx", F.col("action").alias("pi_action"))
    )
    matched = act_n.join(
        target.withColumnRenamed("pi_action", "action"),
        ["ctx", "action"],
    ).select("ctx", "action", "n_act", "sum_r_fx")
    logged = log_.groupBy("ctx").agg(
        F.sum("r_fx").cast("bigint").alias("sum_all_fx")
    )
    return (
        matched.join(ctx_n, "ctx")
        .join(logged, "ctx")
        .select(
            "ctx",
            F.col("action").alias("pi_action"),
            F.col("n_act").alias("n_matched"),
            "n_ctx",
            (F.col("n_act").cast("double") / F.col("n_ctx")).alias("propensity"),
            # a separate ips_value column would be algebraically
            # IDENTICAL to snips_value here: with a deterministic
            # target policy the matched IPS weights sum to exactly
            # n_ctx, so the self-normalization cancels — one column
            # carries all the information
            (
                F.col("sum_r_fx").cast("double") / (F.col("n_act") * 100.0)
            ).alias("snips_value"),
            (
                F.col("sum_all_fx").cast("double") / (F.col("n_ctx") * 100.0)
            ).alias("logged_value"),
        )
    )


# --- Stratified observational effect: the propensity-adjustment table -


@register(
    "q_propensity_strata",
    oracle=f"""
        WITH bounds AS (
            SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid_us
            FROM events
        ),
        pre AS (
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS pre_n,
                   CAST(max(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) AS BIGINT) AS treated
            FROM events, bounds
            WHERE epoch_us(ts) < mid_us
            GROUP BY user_id
        ),
        post AS (
            SELECT user_id,
                   CAST(sum(CAST(round(value * {_BP}) AS BIGINT))
                        AS BIGINT)
                       // CAST(count(*) AS BIGINT) AS out_fx
            FROM events, bounds
            WHERE epoch_us(ts) >= mid_us
            GROUP BY user_id
        ),
        avgn AS (
            SELECT CAST(sum(pre_n) AS BIGINT)
                       // CAST(count(*) AS BIGINT) AS avg_n
            FROM pre
        ),
        units AS (
            SELECT CASE WHEN pre_n * 100 <= avg_n * 80 THEN 0
                        WHEN pre_n * 100 <= avg_n * 95 THEN 1
                        WHEN pre_n * 100 <= avg_n * 105 THEN 2
                        WHEN pre_n * 100 <= avg_n * 125 THEN 3
                        ELSE 4 END AS stratum,
                   treated, out_fx
            FROM pre JOIN post USING (user_id), avgn
        )
        SELECT stratum,
               CAST(sum(treated) AS BIGINT) AS n_treated,
               CAST(sum(1 - treated) AS BIGINT) AS n_control,
               CAST(sum(CASE WHEN treated = 1 THEN out_fx END)
                    AS BIGINT) AS sum_t_fx,
               CAST(sum(CASE WHEN treated = 0 THEN out_fx END)
                    AS BIGINT) AS sum_c_fx,
               (CAST(sum(CASE WHEN treated = 1 THEN out_fx END)
                     AS DOUBLE)
                    / nullif(sum(treated), 0)
                - CAST(sum(CASE WHEN treated = 0 THEN out_fx END)
                       AS DOUBLE)
                    / nullif(sum(1 - treated), 0)) / {_BP}
                   AS diff_means
        FROM units GROUP BY stratum
    """,
    doc="Stratified observational treatment-effect table — the"
    " propensity-adjustment mechanism (Rosenbaum-Rubin"
    " subclassification): treatment = any pre-period purchase,"
    " outcome = the user's post-period mean value (exact truncating"
    " fixed-point), strata = pre-period activity relative to the"
    " global mean (80/95/105/125% cutoffs via integer"
    " cross-multiplication — scale-invariant, so the same five"
    " strata survive a 1000x corpus; rank-based quintiles would swap"
    " in the sampled-cuts machinery). Activity is the confounder a"
    " naive diff-of-means ignores. One row per stratum"
    " with both arms' counts, exact fixed-point outcome sums, and the"
    " within-stratum difference of means as mirrored IEEE ops on"
    " exact integers — the analyst pools with the weighting of their"
    " estimand (ATT: n_treated; ATE: n). Two hash aggregates and a"
    " user-key join; no windows, no driver math.",
)
def q_propensity_strata(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = "unix_micros(cast(ts as timestamp))"
    bounds = ev.agg(
        F.expr(f"(min({us}) + max({us})) div 2").alias("mid_us")
    )
    evb = ev.crossJoin(F.broadcast(bounds))
    pre = (
        evb.filter(F.expr(f"{us} < mid_us"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("pre_n"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("treated"),
        )
    )
    post = (
        evb.filter(F.expr(f"{us} >= mid_us"))
        .groupBy("user_id")
        .agg(
            F.expr(
                f"CAST(sum(CAST(round(value * {_BP}) AS BIGINT))"
                " AS BIGINT) div CAST(count(*) AS BIGINT)"
            ).alias("out_fx")
        )
    )
    avgn = pre.agg(
        F.expr(
            "CAST(sum(pre_n) AS BIGINT) div CAST(count(*) AS BIGINT)"
        ).alias("avg_n")
    )
    units = (
        pre.join(post, "user_id")
        .crossJoin(F.broadcast(avgn))
        .select(
            F.expr(
                "CASE WHEN pre_n * 100 <= avg_n * 80 THEN 0"
                " WHEN pre_n * 100 <= avg_n * 95 THEN 1"
                " WHEN pre_n * 100 <= avg_n * 105 THEN 2"
                " WHEN pre_n * 100 <= avg_n * 125 THEN 3"
                " ELSE 4 END"
            ).alias("stratum"),
            "treated",
            "out_fx",
        )
    )
    return units.groupBy("stratum").agg(
        F.sum("treated").cast("bigint").alias("n_treated"),
        F.sum(1 - F.col("treated")).cast("bigint").alias("n_control"),
        F.sum(F.when(F.col("treated") == 1, F.col("out_fx")))
        .cast("bigint")
        .alias("sum_t_fx"),
        F.sum(F.when(F.col("treated") == 0, F.col("out_fx")))
        .cast("bigint")
        .alias("sum_c_fx"),
        F.expr(
            "(CAST(sum(CASE WHEN treated = 1 THEN out_fx END)"
            " AS DOUBLE) / nullif(sum(treated), 0)"
            " - CAST(sum(CASE WHEN treated = 0 THEN out_fx END)"
            " AS DOUBLE) / nullif(sum(1 - treated), 0))"
            f" / {_BP}"
        ).alias("diff_means"),
    )


# ---------------------------------------------------------------------------
# Qini uplift curve (policy-targeting evaluation)
# ---------------------------------------------------------------------------

_QINI_BUCKETS = 10


@register(
    "q_qini_uplift",
    oracle=f"""
        WITH u AS (
            SELECT user_id,
                   CAST(max(CASE WHEN event_type = 'signup'
                            THEN 1 ELSE 0 END) AS BIGINT) AS treated,
                   CAST(sum(CASE WHEN event_type = 'purchase'
                            THEN CAST(round(value * 100) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS y_fx,
                   CAST(('0x' || substr(md5('qini'
                        || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
                       % {_QINI_BUCKETS} AS decile
            FROM events GROUP BY user_id
        ),
        d AS (
            SELECT decile,
                   CAST(sum(treated) AS BIGINT) AS t_n,
                   CAST(sum(treated * y_fx) AS BIGINT) AS t_y,
                   CAST(sum(1 - treated) AS BIGINT) AS c_n,
                   CAST(sum((1 - treated) * y_fx) AS BIGINT) AS c_y
            FROM u GROUP BY decile
        ),
        cum AS (
            SELECT a.decile,
                   CAST(sum(b.t_n) AS BIGINT) AS cum_t_n,
                   CAST(sum(b.t_y) AS BIGINT) AS cum_t_y_fx,
                   CAST(sum(b.c_n) AS BIGINT) AS cum_c_n,
                   CAST(sum(b.c_y) AS BIGINT) AS cum_c_y_fx
            FROM d a JOIN d b ON b.decile <= a.decile
            GROUP BY a.decile
        )
        SELECT decile, cum_t_n, cum_t_y_fx, cum_c_n, cum_c_y_fx,
               CAST(CAST(cum_t_y_fx AS DOUBLE)
                    - CAST(cum_c_y_fx AS DOUBLE)
                      * CAST(cum_t_n AS DOUBLE)
                      / nullif(CAST(cum_c_n AS DOUBLE), 0e0)
                    AS DOUBLE) AS qini_fx
        FROM cum
    """,
    doc="Qini uplift curve — the targeting-policy evaluation the"
    " causal stack feeds (complements q_propensity_strata's effect"
    " estimate and q_ips_offpolicy's policy value): users bucketed by"
    " a deterministic hash-model score into deciles, treatment ="
    " organic signup exposure, outcome = purchase value fx; per"
    " cumulative decile the Qini coordinate cum_t_y - cum_c_y *"
    " cum_t_n / cum_c_n measures incremental outcome above the"
    " scaled control baseline. Cumulative sums run as a bounded"
    f" {_QINI_BUCKETS}x{_QINI_BUCKETS} triangle self-join over the"
    " decile AGGREGATES — never an unpartitioned window, never a"
    " rescan. All counts/outcomes exact int64; the one division is"
    " mirrored IEEE. At 100 TB: one user-grain agg shuffle + decile"
    " arithmetic that fits in a cache line.",
)
def q_qini_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.expr(
            "cast(max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)"
            " as bigint)"
        ).alias("treated"),
        F.expr(
            "cast(sum(CASE WHEN event_type = 'purchase'"
            " THEN cast(round(value * 100) as bigint) ELSE 0 END)"
            " as bigint)"
        ).alias("y_fx"),
    ).select(
        "treated",
        "y_fx",
        F.expr(
            "cast(conv(substr(md5(concat('qini',"
            " cast(user_id as string))), 1, 15), 16, 10) as bigint)"
            f" % {_QINI_BUCKETS}"
        ).alias("decile"),
    )
    d = u.groupBy("decile").agg(
        F.sum("treated").cast("bigint").alias("t_n"),
        F.sum(F.col("treated") * F.col("y_fx")).cast("bigint").alias("t_y"),
        F.sum(F.lit(1) - F.col("treated")).cast("bigint").alias("c_n"),
        F.sum((F.lit(1) - F.col("treated")) * F.col("y_fx"))
        .cast("bigint")
        .alias("c_y"),
    )
    a = d.select(F.col("decile").alias("d_a"))
    cum = (
        a.join(d, F.col("decile") <= F.col("d_a"))
        .groupBy("d_a")
        .agg(
            F.sum("t_n").cast("bigint").alias("cum_t_n"),
            F.sum("t_y").cast("bigint").alias("cum_t_y_fx"),
            F.sum("c_n").cast("bigint").alias("cum_c_n"),
            F.sum("c_y").cast("bigint").alias("cum_c_y_fx"),
        )
        .withColumnRenamed("d_a", "decile")
    )
    return cum.select(
        "decile",
        "cum_t_n",
        "cum_t_y_fx",
        "cum_c_n",
        "cum_c_y_fx",
        F.expr(
            "cast(cast(cum_t_y_fx as double)"
            " - cast(cum_c_y_fx as double) * cast(cum_t_n as double)"
            " / nullif(cast(cum_c_n as double), 0e0) as double)"
        ).alias("qini_fx"),
    )


# ---------------------------------------------------------------------------
# Lorenz-curve deciles of value concentration (round 9)
# ---------------------------------------------------------------------------


@register(
    "q_lorenz_deciles",
    oracle="""
        WITH per_user AS (
            SELECT event_type, user_id,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        AS BIGINT) AS v_fx
            FROM events
            WHERE user_id IS NOT NULL AND event_type IS NOT NULL
              AND value IS NOT NULL
            GROUP BY event_type, user_id
        ),
        binned AS (
            SELECT event_type, v_fx,
                   ntile(10) OVER (PARTITION BY event_type
                                   ORDER BY v_fx, user_id) AS decile
            FROM per_user
        ),
        dec AS (
            SELECT event_type, decile,
                   CAST(count(*) AS BIGINT) AS n_users,
                   CAST(sum(v_fx) AS BIGINT) AS dec_fx
            FROM binned GROUP BY event_type, decile
        )
        SELECT event_type, decile, n_users, dec_fx,
               CAST(CAST(sum(dec_fx) OVER (PARTITION BY event_type
                         ORDER BY decile
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS DOUBLE)
                    / nullif(CAST(sum(dec_fx) OVER (
                         PARTITION BY event_type) AS DOUBLE), 0e0)
                    AS DOUBLE) AS cum_share
        FROM dec
    """,
    doc="Lorenz-curve deciles per event type: users ranked by their"
    " total fixed-point value (deterministic (v, user) tiebreak),"
    " cut into equi-count deciles, cumulative value share per decile"
    " — the concentration CURVE whose summary scalar q_gini_activity"
    " and q_hhi_concentration already report (the curve says WHERE"
    " the concentration lives: a bottom-decile share near zero is a"
    " long free-rider tail, a top-decile share near one is"
    " whale-dependence). Exact integer sums; only the final shares"
    " divide. The ntile window is type-partitioned; at 100 TB the"
    " decile cut swaps to q_range_split_points' sampled cut points,"
    " same downstream shape (the cumulative window then runs on"
    " 10 rows per type).",
)
def q_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
    )
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.expr(
            "cast(sum(cast(round(value * 100) as bigint)) as bigint)"
        ).alias("v_fx")
    )
    w_nt = Window.partitionBy("event_type").orderBy("v_fx", "user_id")
    binned = per_user.select(
        "event_type",
        "v_fx",
        F.ntile(10).over(w_nt).alias("decile"),
    )
    dec = binned.groupBy("event_type", "decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("v_fx").cast("bigint").alias("dec_fx"),
    )
    return dec.select(
        "event_type",
        "decile",
        "n_users",
        "dec_fx",
        F.expr(
            "cast(cast(sum(dec_fx) OVER (PARTITION BY event_type"
            " ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND"
            " CURRENT ROW) as double)"
            " / nullif(cast(sum(dec_fx) OVER"
            " (PARTITION BY event_type) as double), 0e0) as double)"
        ).alias("cum_share"),
    )
