"""Pareto skyline (non-dominated frontier) — multi-objective selection.

Training-data curation constantly trades objectives off (quality vs
length vs dedup distance; price vs size here on the fixture's ``part``
table): the skyline is the set of rows no other row beats on EVERY
objective. The reference has no such operator; SQL engines express it
as a NOT EXISTS self-join — O(n^2) and unusable at 100 TB.

Scale shape — grid prefilter + exact verify:

1. One tiny aggregate finds the x-range; every row maps narrowly to a
   fixed-width x-bucket.
2. One small groupBy computes each bucket's best y; a 64-row window
   turns that into "best y over all STRICTLY-cheaper buckets"
   (bounded cardinality — the unpartitioned window is over 64 rows,
   not the table).
3. A broadcast join drops every row certainly dominated by that bound
   (a row in a strictly lower bucket has strictly smaller x, so the
   prune is sound — no skyline row is ever dropped).
4. The few survivors pairwise-verify via a broadcast self-join.

Cost: two scans, one 64-group shuffle, one broadcast — vs the naive
O(n^2). The DuckDB oracle runs the brute-force NOT EXISTS, so the gate
certifies the prefilter drops no frontier point on real data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table

N_BUCKETS = 64

# objectives on part: MINIMIZE p_retailprice, MAXIMIZE p_size
_DOMINATES = (
    "(q.price <= p.price AND q.size >= p.size"
    " AND (q.price < p.price OR q.size > p.size))"
)


@register(
    "q_skyline",
    oracle=f"""
        WITH pts AS (
            SELECT p_partkey AS part_id, p_retailprice AS price,
                   p_size AS size
            FROM part
        )
        SELECT part_id, price, size FROM pts p
        WHERE NOT EXISTS (
            SELECT 1 FROM pts q WHERE {_DOMINATES}
        )
    """,
    doc="Pareto skyline of part on (minimize p_retailprice, maximize"
    " p_size): grid prefilter (fixed-width price buckets -> per-bucket"
    " best size -> strictly-cheaper-bucket bound broadcast back) drops"
    " every certainly-dominated row in one narrow pass, then the few"
    " survivors exact-verify via broadcast self-join. Oracle is the"
    " brute-force NOT EXISTS, so a gate pass certifies the prune is"
    " lossless. The naive SQL is O(n^2); this is two scans + one"
    " 64-group shuffle at any scale.",
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("part_id"),
        F.col("p_retailprice").alias("price"),
        F.col("p_size").alias("size"),
    )
    return skyline_2d(pts)


def skyline_2d(pts: DataFrame) -> DataFrame:
    """Pareto frontier of ``pts`` (columns: part_id, price, size) under
    (minimize price, maximize size), via grid prefilter + exact verify.
    """
    # 1. price range (2 doubles) broadcast to every row
    rng = pts.agg(
        F.min("price").alias("lo"), F.max("price").alias("hi")
    )
    bucketed = pts.crossJoin(F.broadcast(rng)).withColumn(
        "b",
        F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
            F.least(
                F.lit(N_BUCKETS - 1),
                F.floor(
                    (F.col("price") - F.col("lo"))
                    / ((F.col("hi") - F.col("lo")) / N_BUCKETS)
                ).cast("int"),
            )
        ),
    )
    # 2. best size per bucket, then best over strictly-lower buckets
    # (window over <= N_BUCKETS rows — bounded, not a table-wide sort)
    from pyspark.sql import Window

    per_bucket = bucketed.groupBy("b").agg(F.max("size").alias("best_size"))
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    bounds = per_bucket.select(
        "b", F.max("best_size").over(w).alias("lower_best_size")
    )
    # 3. sound prune: a row in a strictly lower bucket has strictly
    # smaller price, so lower_best_size >= size => certainly dominated
    survivors = (
        bucketed.join(F.broadcast(bounds), "b")
        .filter(
            F.col("lower_best_size").isNull()
            | (F.col("size") > F.col("lower_best_size"))
        )
        .select("part_id", "price", "size")
    )
    # 4. exact dominance verify among the few survivors
    q = F.broadcast(
        survivors.select(
            F.col("part_id").alias("q_id"),
            F.col("price").alias("q_price"),
            F.col("size").alias("q_size"),
        )
    )
    dominated = (
        (F.col("q_price") <= F.col("price"))
        & (F.col("q_size") >= F.col("size"))
        & (
            (F.col("q_price") < F.col("price"))
            | (F.col("q_size") > F.col("size"))
        )
    )
    return survivors.join(q, dominated, "left_anti")
