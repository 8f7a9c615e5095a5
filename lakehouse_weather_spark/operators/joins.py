"""Join queries (SURVEY.md §2.3 — all DERIVED; the reference has no joins,
only in-memory set-membership lookups (``dags/utils/crawl_web.py:119,145``,
``dags/bronze.py:67``) which are semantically left-anti joins).

Scale notes: the fact side (lineitem/orders) shuffles on the join key;
dimensions (region/nation/supplier, and customer up to ~SF1k) are
broadcast so the fact table never shuffles for them. q_join_anti is the
visited-set pattern at scale — a shuffled left-anti, no driver-side set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.functions import dsum, sql_dsum
from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table


@register(
    "q_join_inner",
    oracle="""
        SELECT o.o_orderkey, c.c_name, o.o_totalprice
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    doc="Equi inner join orders×customer (chunk×document association the"
    " reference denormalizes via metadata.source, chunks_data.py:107-110).",
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return orders.join(
        customer, orders.o_custkey == customer.c_custkey, "inner"
    ).select("o_orderkey", "c_name", "o_totalprice")


@register(
    "q_join_left",
    oracle="""
        SELECT c.c_custkey, c.c_name, o.o_orderkey
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    """,
    doc="Left outer join: keep customers with no orders (null o_orderkey).",
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return customer.join(
        orders, orders.o_custkey == customer.c_custkey, "left"
    ).select("c_custkey", "c_name", "o_orderkey")


@register(
    "q_join_anti",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 100000)
    """,
    doc="Left-anti join: the reference's visited-URL/visited-hash dedup"
    " pattern (crawl_web.py:114-122, bronze.py:64-70) expressed as a"
    " distributed anti join instead of a driver-side Python set."
    " (Probe side filtered so the result is non-empty at every SF.)",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    big_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 100000
    )
    customer = load_table(spark, sf_dir, "customer")
    return customer.join(
        big_orders, big_orders.o_custkey == customer.c_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "q_join_broadcast",
    oracle=f"""
        SELECT n.n_name,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    doc="Broadcast dimension join: supplier and nation ship to every"
    " executor; the 100 TB lineitem scan never shuffles for the join"
    " (only the final small groupBy aggregates exchange).",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        li.join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "q_join_asof",
    oracle="""
        WITH errors AS (
            SELECT event_id AS err_id, user_id, ts AS err_ts
            FROM events WHERE event_type = 'error'
        ),
        views AS (
            SELECT event_id AS view_id, user_id, ts AS view_ts
            FROM events WHERE event_type = 'view'
        )
        SELECT e.err_id, e.user_id,
               CAST(e.err_ts AS TIMESTAMP) AS err_ts,
               v.view_id AS last_view_id
        FROM errors e
        ASOF LEFT JOIN views v
          ON e.user_id = v.user_id AND v.view_ts <= e.err_ts
    """,
    doc="As-of join: each error event matched to the user's most recent"
    " view at-or-before it (point-in-time correctness — the operator"
    " Spark lacks natively). Implemented as a single-pass union +"
    " last(ignorenulls) carry-forward window: one shuffle on user_id,"
    " no range-join explosion — the scalable shape for 100 TB"
    " time-series. Oracle uses DuckDB's native ASOF JOIN."
    " Ties (view at the exact error ts) match, per ASOF <= semantics;"
    " view_id tiebreak makes simultaneous views deterministic.",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    # union-tag the two sides; views sort before errors at equal ts so
    # a same-instant view is visible to the error (ASOF <= semantics)
    tagged = ev.filter(F.col("event_type").isin("error", "view")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "view", F.col("event_id")).alias("view_id"),
        (F.col("event_type") == "error").cast("int").alias("is_error"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_error", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged.withColumn(
        "last_view_id", F.last("view_id", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("is_error") == 1).select(
        F.col("event_id").alias("err_id"),
        "user_id",
        F.col("ts").alias("err_ts"),
        "last_view_id",
    )


@register(
    "q_join_range",
    oracle="""
        SELECT p.event_id AS probe_id, e.event_id
        FROM (SELECT * FROM events WHERE event_id % 997 = 0) p
        JOIN events e
          ON e.ts >= p.ts
         AND e.ts < CAST(p.ts AS TIMESTAMP) + INTERVAL 1 HOUR
    """,
    doc="Non-equi range (theta) join: all events within 1 hour after each"
    " probed event — executed as an EQUI-join on hour bands, the default"
    " because it is the only formulation that survives when BOTH sides"
    " are large: a 1-hour window spans at most 2 hour buckets, so each"
    " probe replicates to its band and the next one, the build side keys"
    " by its own band, and the planner gets a hash-join key instead of an"
    " O(|probe| x |events|) nested loop. The band refine keeps exactness;"
    " the plan gate asserts no BroadcastNestedLoop remains. The naive"
    " nested-loop twin is kept as q_join_range_naive for the didactic"
    " plan comparison.",
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    band = F.expr("unix_micros(cast(ts as timestamp)) div 3600000000")
    e = events.select("event_id", "ts", band.alias("band"))
    probe = events.filter(F.col("event_id") % 997 == 0).select(
        F.col("event_id").alias("probe_id"),
        F.col("ts").alias("probe_ts"),
        band.alias("pband"),
    )
    # a [t, t+1h) window intersects bands pband and pband+1 only
    probe_rep = probe.withColumn(
        "band", F.explode(F.array(F.col("pband"), F.col("pband") + 1))
    )
    return (
        probe_rep.join(e, "band")
        .filter(
            (F.col("ts") >= F.col("probe_ts"))
            & (F.col("ts") < F.col("probe_ts") + F.expr("INTERVAL 1 HOUR"))
        )
        .select("probe_id", "event_id")
    )


@register(
    "q_join_asof_tolerance",
    oracle="""
        WITH errors AS (
            SELECT event_id AS err_id, user_id, ts AS err_ts
            FROM events WHERE event_type = 'error'
        ),
        purchases AS (
            SELECT event_id AS p_id, user_id, ts AS p_ts
            FROM events WHERE event_type = 'purchase'
        )
        SELECT e.err_id, e.user_id,
               CAST(e.err_ts AS TIMESTAMP) AS err_ts,
               CASE WHEN p.p_ts <= CAST(e.err_ts AS TIMESTAMP)
                                   + INTERVAL 30 MINUTE
                    THEN p.p_id END AS next_purchase_id
        FROM errors e
        ASOF LEFT JOIN purchases p
          ON e.user_id = p.user_id AND p.p_ts >= e.err_ts
    """,
    doc="Forward as-of join with tolerance: each error matched to the"
    " user's NEXT purchase, but only within 30 minutes (did the error"
    " block conversion?). Same single-pass union + window shape as"
    " q_join_asof, mirrored forward: conditional struct carried by"
    " first(ignorenulls) over the following frame keeps (ts, id) from"
    " one source row atomically, then the tolerance bound nulls out"
    " matches beyond the horizon. One shuffle on user_id; the fixture"
    " has no (user_id, ts) duplicates, so nearest-match is unique."
    " Oracle: DuckDB ASOF JOIN with >= plus the same tolerance CASE.",
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("error", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("event_type") == "purchase", F.struct("ts", "event_id")
        ).alias("p"),
        (F.col("event_type") == "error").cast("int").alias("is_error"),
    )
    # errors sort before purchases at equal ts so a same-instant
    # purchase is inside the forward frame (ASOF >= semantics)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("is_error"), "event_id")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = tagged.withColumn("nxt", F.first("p", ignorenulls=True).over(w))
    horizon = F.col("ts") + F.expr("INTERVAL 30 MINUTES")
    return carried.filter(F.col("is_error") == 1).select(
        F.col("event_id").alias("err_id"),
        "user_id",
        F.col("ts").alias("err_ts"),
        F.when(F.col("nxt.ts") <= horizon, F.col("nxt.event_id")).alias(
            "next_purchase_id"
        ),
    )


@register(
    "q_join_salted",
    oracle="""
        SELECT o.o_orderkey, o.o_custkey, c.c_nationkey
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_totalprice > 100000
    """,
    doc="Hot-key salted shuffle join (plans.salted_join): the fact side"
    " carries salt = pmod(hash(row), 16), the dimension side replicates"
    " across all 16 salt values, so a pathological hot customer spreads"
    " over 16 reducers instead of melting one. Result provably equals"
    " the plain equi-join the oracle runs — salting changes the"
    " physical layout only. (AQE skew-split handles moderate skew"
    " automatically; explicit salting is for the single-key hot spot"
    " whose build side itself needs spreading.)",
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_weather_spark.plans import salted_join

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 100000
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    return salted_join(orders, cust, "o_custkey").select(
        "o_orderkey", "o_custkey", "c_nationkey"
    )


@register(
    "q_join_range_naive",
    oracle="""
        SELECT p.event_id AS probe_id, e.event_id
        FROM (SELECT * FROM events WHERE event_id % 997 = 0) p
        JOIN events e
          ON e.ts >= p.ts
         AND e.ts < CAST(p.ts AS TIMESTAMP) + INTERVAL 1 HOUR
    """,
    doc="The SAME 1-hour range join as q_join_range, written as a plain"
    " theta join: Spark broadcasts the tiny probe side and runs an"
    " O(|probe| x |events|) BroadcastNestedLoopJoin. Kept deliberately"
    " as the didactic twin of the banded default — fine when one side"
    " is guaranteed small, a scale-killer when both grow; the plan test"
    " asserts the pair's contrasting physical plans.",
)
def q_join_range_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    probe = events.filter(F.col("event_id") % 997 == 0).select(
        F.col("event_id").alias("probe_id"), F.col("ts").alias("probe_ts")
    )
    cond = (events.ts >= probe.probe_ts) & (
        events.ts < probe.probe_ts + F.expr("INTERVAL 1 HOUR")
    )
    return F.broadcast(probe).join(events, cond).select("probe_id", "event_id")


@register(
    "q_interval_overlap_join",
    oracle="""
        WITH a AS (
            SELECT event_id AS err_id, user_id,
                   epoch_us(ts) AS a_start,
                   epoch_us(ts) + 1800000000 AS a_end
            FROM events WHERE event_type = 'error'
        ),
        b AS (
            SELECT event_id AS p_id, user_id,
                   epoch_us(ts) AS b_start,
                   epoch_us(ts) + 3600000000 AS b_end
            FROM events WHERE event_type = 'purchase'
        )
        SELECT a.user_id,
               CAST(count(*) AS BIGINT) AS n_overlap_pairs,
               CAST(sum(least(a_end, b_end)
                        - greatest(a_start, b_start)) AS BIGINT)
                   AS total_overlap_us
        FROM a JOIN b
          ON a.user_id = b.user_id
         AND a.a_start < b.b_end AND b.b_start < a.a_end
        GROUP BY a.user_id
    """,
    doc="INTERVAL x INTERVAL overlap join (the temporal-join operator"
    " beyond point-in-range): 30-minute error-incident windows against"
    " 1-hour purchase-activity windows of the same user, overlapping"
    " when a_start < b_end AND b_start < a_end; emits per-user overlap"
    " pair count + total overlapped microseconds (integer-exact, no"
    " float time math). Executed as an EQUI-join: each interval"
    " replicates to every hour band it touches (bounded spans:"
    " <= 2 bands each), the join keys on (user_id, band), and a pair"
    " is kept only in the band where its OVERLAP STARTS —"
    " band = greatest(a_start_band, b_start_band) — so cross-band"
    " double-counting is eliminated WITHOUT a distinct shuffle. This"
    " is the only interval-join formulation that survives two large"
    " sides at 100 TB (hash join on band keys; the theta form is a"
    " nested loop); unbounded interval lengths would instead cap the"
    " band span by splitting long intervals, same replicate shape."
    " ref: the weather-obs time-window semantics the reference's DAG"
    " encodes implicitly via day-partitioned batches (dags/bronze.py).",
)
def q_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    _HOUR_US = 3_600_000_000
    ev = load_table(spark, sf_dir, "events")
    us = F.expr("unix_micros(cast(ts as timestamp))")
    a = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        "user_id",
        us.alias("a_start"),
        (us + F.lit(30 * 60 * 1_000_000)).alias("a_end"),
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        us.alias("b_start"),
        (us + F.lit(60 * 60 * 1_000_000)).alias("b_end"),
    )

    def banded(df: DataFrame, start: str, end: str) -> DataFrame:
        # half-open [start, end): the last touched band holds end-1
        return df.withColumn(
            "band",
            F.explode(
                F.sequence(
                    F.expr(f"{start} div {_HOUR_US}"),
                    F.expr(f"({end} - 1) div {_HOUR_US}"),
                )
            ),
        )

    pairs = (
        banded(a, "a_start", "a_end")
        .join(banded(b, "b_start", "b_end"), ["user_id", "band"])
        .filter(
            (F.col("a_start") < F.col("b_end"))
            & (F.col("b_start") < F.col("a_end"))
            # keep the pair only where the overlap starts: no cross-band
            # duplicates, no distinct
            & (
                F.col("band")
                == F.expr(
                    f"greatest(a_start div {_HOUR_US},"
                    f" b_start div {_HOUR_US})"
                )
            )
        )
    )
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_overlap_pairs"),
        F.sum(
            F.least("a_end", "b_end") - F.greatest("a_start", "b_start")
        )
        .cast("bigint")
        .alias("total_overlap_us"),
    )
