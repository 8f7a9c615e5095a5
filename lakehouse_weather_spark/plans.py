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
) -> DataFrame:
    """Equi-join with key salting: left gets salt = hash(all cols) % n,
    right is exploded to all n salt values. Result equals a plain join;
    the hot key's rows spread across ``salt`` reducers.

    pmod, not abs(hash)%salt: hash() can return Int.MinValue, where
    abs() stays negative and a non-power-of-2 salt would yield a _salt
    outside 0..salt-1 that never matches the replicated right side —
    silently dropping the row from an inner join."""
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
