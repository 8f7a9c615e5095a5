"""Bloom-filter membership, fully in SQL with shared md5 hashing.

Companion to the count-min sketch (cms.py): where CMS answers "how
often", a Bloom filter answers "possibly seen?" in O(M) bits with no
false negatives. Spark uses exactly this structure internally for
runtime join pruning (``spark.sql.optimizer.runtime.bloomFilter.enabled``
is pinned on in session.py); this module builds the same structure
*explicitly* so it can be persisted, shipped, and merged — the
visited-URL / already-ingested-key prefilter a 100 TB crawl dedup needs
(the reference's ``visited_urls`` set at ``dags/utils/crawl_web.py:103``
is a driver-local Python set; a Bloom bitset is its distributed,
constant-memory replacement).

Mergeability: the filter is the SET of occupied bit positions, so two
filters merge by plain ``union``/``DISTINCT`` (bitwise OR). The bit
table is at most M rows — always broadcastable, no matter how many keys
went in. K md5-derived hash rows per key, identical in both engines,
make membership answers bit-reproducible and oracle-checkable —
including which non-members collide into false positives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table

BLOOM_BITS = 1024  # M
BLOOM_HASHES = 4  # K
_THRESHOLD = 300.0  # member set: users with any event value above this


def _spark_bit(k_col: str, key_col: str) -> str:
    return (
        f"pmod(cast(conv(substr(md5(concat('bf', cast({k_col} as string),"
        f" '|', cast({key_col} as string))), 1, 15), 16, 10) as bigint),"
        f" {BLOOM_BITS})"
    )


def _duck_bit(k_col: str, key_col: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('bf' || CAST({k_col} AS VARCHAR)"
        f" || '|' || CAST({key_col} AS VARCHAR)), 1, 15)) AS BIGINT)"
        f" % {BLOOM_BITS}"
    )


def _ks() -> F.Column:
    return F.explode(
        F.array(*[F.lit(k) for k in range(BLOOM_HASHES)])
    ).alias("k")


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """Build the filter: DISTINCT occupied bit positions (<= M rows).

    Merge two filters with ``a.union(b).distinct()`` (bitwise OR).
    """
    return (
        keys.select(F.col(key_col).alias("key"), _ks())
        .select(F.expr(_spark_bit("k", "key")).alias("bit"))
        .distinct()
    )


def bloom_probe(bits: DataFrame, candidates: DataFrame, key_col: str) -> DataFrame:
    """Probe: a candidate is "maybe member" iff all K bits are set.

    The bit table broadcasts (<= M rows); the probe side stays narrow.
    """
    probe = candidates.select(F.col(key_col).alias("key"), _ks()).withColumn(
        "bit", F.expr(_spark_bit("k", "key"))
    )
    hit = probe.join(
        F.broadcast(bits.withColumn("_set", F.lit(1))), "bit", "left"
    )
    return (
        hit.groupBy("key")
        .agg(
            (F.sum(F.coalesce(F.col("_set"), F.lit(0))) == BLOOM_HASHES).alias(
                "bloom_maybe"
            )
        )
        .withColumnRenamed("key", key_col)
    )


@register(
    "q_bloom_filter",
    oracle=f"""
        WITH members AS (
            SELECT DISTINCT user_id FROM events WHERE value > {_THRESHOLD}
        ),
        ks AS (SELECT unnest(generate_series(0, {BLOOM_HASHES - 1})) AS k),
        bits AS (
            SELECT DISTINCT {_duck_bit('k', 'user_id')} AS bit
            FROM members CROSS JOIN ks
        ),
        cands AS (SELECT DISTINCT user_id FROM events),
        probe AS (
            SELECT user_id, k, {_duck_bit('k', 'user_id')} AS bit
            FROM cands CROSS JOIN ks
        ),
        verdicts AS (
            SELECT probe.user_id,
                   (count(bits.bit) = {BLOOM_HASHES}) AS bloom_maybe
            FROM probe LEFT JOIN bits USING (bit)
            GROUP BY probe.user_id
        )
        SELECT v.user_id, v.bloom_maybe,
               (m.user_id IS NOT NULL) AS exact_member
        FROM verdicts v LEFT JOIN members m USING (user_id)
    """,
    doc=f"Explicit Bloom-filter membership ({BLOOM_BITS} bits,"
    f" {BLOOM_HASHES} md5 hash rows): build the occupied-bit set from"
    " high-value users, probe every user, report bloom_maybe next to"
    " the exact answer. No false negatives ever (every exact member is"
    " bloom-maybe); false positives are the deterministic md5"
    " collisions — identical in both engines, so even the error side"
    " is oracle-checked. The bit table is <= M rows -> always a"
    " broadcast; merging two filters is union+distinct. This is the"
    " distributed replacement for the reference's driver-local"
    " visited_urls set (crawl_web.py:103).",
)
def q_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    members = (
        ev.filter(F.col("value") > _THRESHOLD).select("user_id").distinct()
    )
    bits = bloom_build(members, "user_id")
    cands = ev.select("user_id").distinct()
    verdicts = bloom_probe(bits, cands, "user_id")
    return verdicts.join(
        F.broadcast(members.withColumn("_m", F.lit(1))), "user_id", "left"
    ).select(
        "user_id",
        "bloom_maybe",
        F.col("_m").isNotNull().alias("exact_member"),
    )


# --- bloom semi-join pre-filter --------------------------------------

# Selective dim predicate: urgent orders in the top price decile.
_SJ_PRICE = 450_000.0


@register(
    "q_bloom_semijoin",
    oracle=f"""
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_items,
               (CAST(sum(CAST(round((l_extendedprice * (1 - l_discount))
                    * 10000) AS BIGINT)) AS DOUBLE) / 10000) AS revenue
        FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders
            WHERE o_orderpriority = '1-URGENT'
              AND o_totalprice > {_SJ_PRICE})
        GROUP BY l_returnflag
    """,
    doc="Bloom semi-join pre-filter — the canonical 100 TB shuffle"
    " reducer: the selective dim key set (urgent top-decile orders)"
    " folds into a <=1024-row bit table that BROADCASTS; the fact scan"
    " drops ~99% of rows against it BEFORE the exact semi-join, so the"
    " shuffle moves only survivors (Spark's runtime bloom pruning does"
    " this implicitly; here the filter is explicit, persistable, and"
    " mergeable across incremental loads). Bloom filters have no"
    " false NEGATIVES, and the exact semi-join re-verifies the"
    " survivors, so the result is IDENTICAL to the plain semi-join"
    " oracle — false positives cost only wasted shuffle rows, never"
    " wrong answers. Exact fixed-point revenue sum.",
)
def q_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_weather_spark.functions import dsum

    dim = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > _SJ_PRICE)
        )
        .select("o_orderkey")
    )
    bits = bloom_build(dim, "o_orderkey")
    li = load_table(spark, sf_dir, "lineitem")
    # inline probe on the fact side: keep rows whose K bit positions
    # are ALL in the broadcast bit table. size(array_intersect) == K is
    # the all-bits-set test without a per-key groupBy.
    bit_arr = bits.agg(F.collect_list("bit").alias("bloom_bits"))
    k_bits = F.array(
        *[
            F.expr(
                _spark_bit(str(k), "l_orderkey")
            )
            for k in range(BLOOM_HASHES)
        ]
    )
    pre = (
        li.crossJoin(F.broadcast(bit_arr))
        .withColumn("kb", k_bits)
        .filter(
            F.size(F.array_intersect(F.col("kb"), F.col("bloom_bits")))
            == F.size(F.array_distinct(F.col("kb")))
        )
        .drop("kb", "bloom_bits")
    )
    exact = pre.join(
        F.broadcast(dim.withColumnRenamed("o_orderkey", "l_orderkey")),
        "l_orderkey",
        "semi",
    )
    return exact.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ),
    )
