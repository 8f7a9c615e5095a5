"""Scale patterns: the join strategies a 100 TB deployment needs beyond
what Catalyst picks automatically.

- ``salted_join``: hot-key mitigation for shuffle joins. AQE's skew-join
  splitting handles most cases at runtime; explicit salting is for the
  pathological single-key hot spot (one key >> a partition) where even a
  split partition can't parallelize the *build* side. The left (big,
  skewed) side gets a random-ish deterministic salt; the right side is
  replicated across all salt values, so the hot key spreads over
  ``salt`` reducers.
- ``write_bucketed`` / co-located joins: pre-shuffle both fact tables
  into the same bucket layout once; every subsequent equi-join on the
  bucket key runs exchange-free. This is THE amortization lever for
  repeated 100 TB fact-fact joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = 16,
    auto: bool = False,
) -> DataFrame:
    """Equi-join with key salting: left gets salt = hash(all cols) % n,
    right is exploded to all n salt values. Result equals a plain join;
    the hot key's rows spread across ``salt`` reducers.

    ``auto=True`` measures first (``choose_join_plan``'s bounded
    statistics) and only pays the salt replication when the hottest key
    actually exceeds HOT_KEY_ROWS — broadcasting instead when the right
    side fits, plain SMJ otherwise. Callers who already KNOW the skew
    keep the default direct path.

    pmod, not abs(hash)%salt: hash() can return Int.MinValue, where
    abs() stays negative and a non-power-of-2 salt would yield a _salt
    outside 0..salt-1 that never matches the replicated right side —
    silently dropping the row from an inner join."""
    if auto:
        return auto_join(left, right, key, how=how, salt=salt)[0]
    salted_left = left.withColumn(
        "_salt", F.pmod(F.hash(*left.columns), F.lit(salt)).cast("int")
    )
    salted_right = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return (
        salted_left.join(salted_right, [key, "_salt"], how).drop("_salt")
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    n_buckets: int = 8,
) -> None:
    """Persist a table bucketed+sorted on the join key. Subsequent joins
    between tables bucketed identically on that key skip the exchange
    (and the sort, for sort-merge)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_key)
        .sortBy(bucket_key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two co-bucketed tables — plan should contain no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), key)


# ---------------------------------------------------------------------------
# Cost-based arm selection: turn the repo's pre-flight audits
# (q_skew_profile / q_selfjoin_fanout / q_entity_blocks — decide-
# before-you-shuffle statistics) into DECISIONS. The engine ships exact
# and scale arms side by side (plain vs salted join, exact all-pairs vs
# LSH dedup, global window vs sampled cut points); these selectors pick
# the arm from the same bounded statistics the audits report, so the
# choice is reproducible and oracle-checkable (operators/planner.py
# registers the decision tables as gate-verified queries).
# ---------------------------------------------------------------------------

# A dim side at or under this row count broadcasts (mirrors the spirit
# of spark.sql.autoBroadcastJoinThreshold, stated in rows so the
# decision is exact-integer and engine-portable).
BROADCAST_CAP_ROWS = 20_000
# A single join key carrying more rows than this is a hot key: even an
# AQE-split partition cannot parallelize one key's sort/build — salt it.
HOT_KEY_ROWS = 10_000
# Exact all-pairs matchers stop being the right arm past this many
# candidate pairs; blocked/LSH arms take over.
EXACT_PAIR_BUDGET = 10_000_000
# A global (no-partition) ranking window is acceptable below this row
# count; above it, use sampled cut points / the q_global_ordinal
# decomposition.
WINDOW_BUDGET_ROWS = 100_000


def choose_join_arm(n_dim: int, max_key_cnt: int) -> str:
    """'broadcast' | 'salted_smj' | 'smj' from two exact integers:
    the dim-side row count and the hottest fact-side key's row count."""
    if n_dim <= BROADCAST_CAP_ROWS:
        return "broadcast"
    if max_key_cnt > HOT_KEY_ROWS:
        return "salted_smj"
    return "smj"


def choose_dedup_arm(n_items: int) -> str:
    """'exact' (all-pairs, blocked kernel) | 'lsh' (banded MinHash /
    prefix-filtered) from the corpus size: n*(n-1)/2 candidate pairs
    against EXACT_PAIR_BUDGET."""
    if n_items * (n_items - 1) // 2 <= EXACT_PAIR_BUDGET:
        return "exact"
    return "lsh"


def choose_quantile_arm(n_rows: int) -> str:
    """'window' (global ntile/rank — one task) | 'sampled_cutpoints'
    (q_equidepth_hist / scale-safe q_rfm machinery)."""
    if n_rows <= WINDOW_BUDGET_ROWS:
        return "window"
    return "sampled_cutpoints"


def auto_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = 16,
) -> tuple[DataFrame, str, dict]:
    """The selector WIRED to a consumer: measure (choose_join_plan's
    bounded stats), pick the arm, build that join. Returns
    (result, arm, stats) so callers/tests can audit the decision.

    - 'broadcast': right fits BROADCAST_CAP_ROWS — hint it so the skew
      question never arises (broadcast joins don't shuffle the fact).
    - 'salted_smj': one fact key exceeds HOT_KEY_ROWS — even an
      AQE-split partition cannot parallelize ONE key's sort/build.
    - 'smj': plain shuffle join; AQE handles moderate skew at runtime.
    """
    arm, stats = choose_join_plan(left, key, right)
    if arm == "broadcast":
        return left.join(F.broadcast(right), key, how), arm, stats
    if arm == "salted_smj":
        return salted_join(left, right, key, how=how, salt=salt), arm, stats
    return left.join(right, key, how), arm, stats


def choose_join_plan(
    fact: DataFrame, key: str, dim: DataFrame
) -> tuple[str, dict]:
    """Compute the decide-before-you-shuffle statistics (one partial-agg
    groupBy on the fact key + two tiny counts) and return
    (arm, stats). The stats are the q_skew_profile inputs; nothing
    corpus-sized reaches the driver."""
    per_key = fact.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    row = per_key.agg(
        F.sum("cnt").cast("bigint").alias("n_fact"),
        F.max("cnt").cast("bigint").alias("max_key_cnt"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
    ).collect()[0]
    n_dim = dim.count()
    stats = {
        "n_fact": row.n_fact,
        "n_keys": row.n_keys,
        "max_key_cnt": row.max_key_cnt,
        "n_dim": n_dim,
    }
    return choose_join_arm(n_dim, row.max_key_cnt), stats


_QUANTILE_SAMPLE = 1009  # deterministic sample size for the cut points


def auto_quantiles(
    df: DataFrame,
    col: str,
    key: str,
    n_buckets: int = 16,
) -> tuple[DataFrame, str, dict]:
    """The quantile selector WIRED to a consumer (completing the
    choose_* family beside auto_join / near_dup_pairs_auto): measure
    the row count — the same bounded stat q_choose_quantile_plan's
    decision table consumes — pick the arm, and build it. Returns
    (df + an exact 0..n_buckets-1 ``bucket`` column, arm, stats).

    - 'window': exact global ntile. One task, but the measurement just
      proved the input is under WINDOW_BUDGET_ROWS, so the single
      partition is bounded BY CONSTRUCTION — the legitimate use of the
      otherwise-forbidden unpartitioned window.
    - 'sampled_cutpoints': the q_zorder_prune machinery — a
      deterministic md5-ordered sample's equi-depth cut points
      broadcast back, bucketing via a narrow array fold. Approximate
      bucket BOUNDARIES (sample-exact), every row still deterministic;
      scales to any input because nothing global ever sorts.

    ``key`` is a unique tiebreak column: it makes the window arm's
    ntile order (and the sample membership) deterministic, so the same
    input always yields the same buckets."""
    from pyspark.sql import Window

    n_rows = df.count()
    arm = choose_quantile_arm(n_rows)
    stats = {"n_rows": n_rows, "n_buckets": n_buckets}
    if arm == "window":
        w = Window.orderBy(F.col(col), F.col(key))
        out = df.withColumn(
            "bucket", F.ntile(n_buckets).over(w) - F.lit(1)
        )
        return out, arm, stats
    sample = (
        df.select(
            F.col(col).alias("_v"),
            F.md5(F.concat(F.lit("aq_"), F.col(key).cast("string"))).alias(
                "_h"
            ),
            F.col(key).alias("_k"),
        )
        .orderBy("_h", "_k")
        .limit(_QUANTILE_SAMPLE)
    )
    ranked = sample.select(
        "_v", F.row_number().over(Window.orderBy("_v", "_k")).alias("_rn")
    )
    ks = [
        (k * _QUANTILE_SAMPLE) // n_buckets for k in range(1, n_buckets)
    ]
    cuts = ranked.filter(F.col("_rn").isin(ks)).agg(
        F.sort_array(F.collect_list("_v")).alias("_cuts")
    )
    out = (
        df.crossJoin(F.broadcast(cuts))
        .withColumn(
            "bucket",
            F.expr(f"size(filter(_cuts, c -> c < {col}))"),
        )
        .drop("_cuts")
    )
    return out, arm, stats
