"""Spatial operators (round-8 batch): grid-blocked radius join and
multi-resolution cell rollup.

The corpus has no geo columns, so coordinates derive DETERMINISTICALLY
from user identity (seeded md5 -> micro-degrees inside a ~1 degree x
1 degree city box) — the standard fixture pattern here (cf. the Z-set
changelog split in ivm.py). Distance is planar integer micro-degree
math on the local tangent grid: exact in int64 on both engines, and a
faithful stand-in for haversine at city scale (production swaps ONE
expression; the blocking, which is what's being engineered, is
unchanged — libm trig would break bit-parity for no structural gain).

The radius join is the canonical all-pairs trap: the scalable form
blocks points into radius-sized grid cells and probes only the 3x3
neighborhood (cf. clustering.py's DBSCAN grid — same principle, here
as the standalone spatial-join operator over a second domain), so
candidate pairs stay proportional to local density, never |points|^2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table

# ~1 degree box in micro-degrees; cell edge = radius so 3x3 covers it
_BOX_UDEG = 1_000_000
_RADIUS_UDEG = 50_000          # ~5.5 km at the equator
_R2 = _RADIUS_UDEG * _RADIUS_UDEG
_FINE_UDEG = 100_000           # fine rollup cell (10x10 grid)
_COARSE_PER_FINE = 5           # coarse cell = 5x5 fine cells


def _lat_spark(col: str) -> str:
    return (
        f"cast(conv(substr(md5(concat('lat', cast({col} as string))),"
        f" 1, 15), 16, 10) as bigint) % {_BOX_UDEG}"
    )


def _lon_spark(col: str) -> str:
    return (
        f"cast(conv(substr(md5(concat('lon', cast({col} as string))),"
        f" 1, 15), 16, 10) as bigint) % {_BOX_UDEG}"
    )


def _lat_duck(col: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('lat' || CAST({col} AS VARCHAR)),"
        f" 1, 15)) AS BIGINT) % {_BOX_UDEG}"
    )


def _lon_duck(col: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('lon' || CAST({col} AS VARCHAR)),"
        f" 1, 15)) AS BIGINT) % {_BOX_UDEG}"
    )


@register(
    "q_geo_radius_join",
    oracle=f"""
        WITH pts AS (
            SELECT DISTINCT user_id,
                   {_lat_duck("user_id")} AS lat,
                   {_lon_duck("user_id")} AS lon
            FROM events
        ),
        pairs AS (
            SELECT a.user_id AS ua, b.user_id AS ub
            FROM pts a JOIN pts b
              ON a.user_id < b.user_id
             AND (a.lat - b.lat) * (a.lat - b.lat)
               + (a.lon - b.lon) * (a.lon - b.lon) <= {_R2}
        ),
        sym AS (
            SELECT ua AS user_id FROM pairs
            UNION ALL SELECT ub FROM pairs
        )
        SELECT p.user_id,
               CAST(count(s.user_id) AS BIGINT) AS n_neighbors
        FROM pts p LEFT JOIN sym s ON s.user_id = p.user_id
        GROUP BY p.user_id
    """,
    doc="Grid-blocked spatial RADIUS JOIN: users at seeded planar"
    f" coordinates, neighbors within {_RADIUS_UDEG} micro-degrees"
    " (integer squared-distance — exact). The Spark plan blocks each"
    " point into its radius-sized grid cell and equi-joins probe"
    " points against the 3x3 neighbor cells only (cell replication on"
    " the probe side, narrow build side), then verifies the exact"
    " circle — candidate pairs scale with local density, never"
    " |points|^2. The oracle is the brute-force quadratic self-join,"
    " certifying ZERO lost pairs from the blocking (a point within"
    " radius r of another is always within one cell of it when cell"
    " edge >= r). Per-user neighbor counts returned; at 100 TB this"
    " is geofence matching / store-visit attribution, cells bucket by"
    " geohash prefix and the shape is one equi-join shuffle.",
)
def q_geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select("user_id").distinct().select(
        "user_id",
        F.expr(_lat_spark("user_id")).alias("lat"),
        F.expr(_lon_spark("user_id")).alias("lon"),
    )
    cell = pts.select(
        "user_id",
        "lat",
        "lon",
        F.expr(f"lat div {_RADIUS_UDEG}").alias("cx"),
        F.expr(f"lon div {_RADIUS_UDEG}").alias("cy"),
    )
    # probe side replicates to the 3x3 neighborhood; build side keys
    # by its own cell -> plain equi-join on (cx, cy)
    probe = cell.select(
        F.col("user_id").alias("ua"),
        F.col("lat").alias("la"),
        F.col("lon").alias("lo"),
        F.explode(
            F.expr("sequence(cx - 1, cx + 1)")
        ).alias("cx"),
        F.col("cy").alias("cy0"),
    ).select(
        "ua", "la", "lo", "cx",
        F.explode(F.expr("sequence(cy0 - 1, cy0 + 1)")).alias("cy"),
    )
    cand = probe.join(cell, ["cx", "cy"]).filter(
        (F.col("ua") < F.col("user_id"))
        & (
            (F.col("la") - F.col("lat")) * (F.col("la") - F.col("lat"))
            + (F.col("lo") - F.col("lon"))
            * (F.col("lo") - F.col("lon"))
            <= F.lit(_R2)
        )
    )
    sym = cand.select(F.col("ua").alias("user_id")).unionByName(
        cand.select(F.col("user_id"))
    )
    deg = sym.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_neighbors")
    )
    return (
        pts.join(deg, "user_id", "left")
        .select(
            "user_id",
            F.coalesce("n_neighbors", F.lit(0))
            .cast("bigint")
            .alias("n_neighbors"),
        )
    )


@register(
    "q_geo_cell_rollup",
    oracle=f"""
        WITH pts AS (
            SELECT user_id,
                   {_lat_duck("user_id")} AS lat,
                   {_lon_duck("user_id")} AS lon,
                   CAST(round(value * 100) AS BIGINT) AS fx
            FROM events
        ),
        fine AS (
            SELECT lat // {_FINE_UDEG} AS fx_cell,
                   lon // {_FINE_UDEG} AS fy_cell,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(fx) AS BIGINT) AS sum_fx
            FROM pts GROUP BY 1, 2
        )
        SELECT fx_cell // {_COARSE_PER_FINE} AS cx,
               fy_cell // {_COARSE_PER_FINE} AS cy,
               CAST(count(*) AS BIGINT) AS n_fine_cells,
               CAST(sum(n) AS BIGINT) AS n_events,
               CAST(sum(sum_fx) AS BIGINT) AS sum_fx
        FROM fine GROUP BY 1, 2
    """,
    doc="Multi-resolution spatial rollup (the tile-pyramid aggregation"
    " every geo dashboard needs): events located at their user's"
    " seeded coordinates aggregate into fine grid cells, and COARSE"
    " cells aggregate FROM THE FINE AGGREGATES — a reaggregation of"
    " pre-aggregated partials (count/sum are decomposable), never a"
    " second scan of the events. At 100 TB the fine layer is the"
    " stored rollup and each zoom level derives from the previous in"
    " cells-not-rows time; the oracle recomputes the same pyramid,"
    " proving the partial-aggregate fold lossless. Integer cell ids"
    " via floor division of micro-degrees (exact both engines).",
)
def q_geo_cell_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        F.expr(_lat_spark("user_id")).alias("lat"),
        F.expr(_lon_spark("user_id")).alias("lon"),
        F.expr("cast(round(value * 100) as bigint)").alias("fx"),
    )
    fine = (
        pts.select(
            F.expr(f"lat div {_FINE_UDEG}").alias("fx_cell"),
            F.expr(f"lon div {_FINE_UDEG}").alias("fy_cell"),
            "fx",
        )
        .groupBy("fx_cell", "fy_cell")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("fx").cast("bigint").alias("sum_fx"),
        )
    )
    return (
        fine.groupBy(
            F.expr(f"fx_cell div {_COARSE_PER_FINE}").alias("cx"),
            F.expr(f"fy_cell div {_COARSE_PER_FINE}").alias("cy"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_fine_cells"),
            F.sum("n").cast("bigint").alias("n_events"),
            F.sum("sum_fx").cast("bigint").alias("sum_fx"),
        )
    )


# ---------------------------------------------------------------------------
# Per-user trajectory metrics (round 9)
# ---------------------------------------------------------------------------

# per-EVENT coordinates: each event is a visit at a seeded point in the
# city box (the per-user point above is home; this is movement)
def _elat_spark() -> str:
    return (
        "cast(conv(substr(md5(concat('elat',"
        f" cast(event_id as string))), 1, 15), 16, 10) as bigint)"
        f" % {_BOX_UDEG}"
    )


def _elon_spark() -> str:
    return (
        "cast(conv(substr(md5(concat('elon',"
        f" cast(event_id as string))), 1, 15), 16, 10) as bigint)"
        f" % {_BOX_UDEG}"
    )


def _elat_duck() -> str:
    return (
        "CAST(('0x' || substr(md5('elat' || CAST(event_id AS VARCHAR)),"
        f" 1, 15)) AS BIGINT) % {_BOX_UDEG}"
    )


def _elon_duck() -> str:
    return (
        "CAST(('0x' || substr(md5('elon' || CAST(event_id AS VARCHAR)),"
        f" 1, 15)) AS BIGINT) % {_BOX_UDEG}"
    )


@register(
    "q_geo_trajectory",
    oracle=f"""
        WITH pts AS (
            -- complete cases: NULL ts would desync the step order
            -- (NULLS FIRST here vs LAST there), NULL user the join
            SELECT user_id, ts, event_id,
                   {_elat_duck()} AS lat, {_elon_duck()} AS lon
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
        ),
        steps AS (
            SELECT user_id, ts, event_id,
                   sqrt(CAST(
                       (lat - lag(lat) OVER w) * (lat - lag(lat) OVER w)
                     + (lon - lag(lon) OVER w) * (lon - lag(lon) OVER w)
                     AS DOUBLE)) AS step
            FROM pts
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        marked AS (
            SELECT *,
                   row_number() OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM pts
        ),
        ends AS (
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_points,
                   min(CASE WHEN rn_a = 1 THEN lat END) AS lat0,
                   min(CASE WHEN rn_a = 1 THEN lon END) AS lon0,
                   min(CASE WHEN rn_d = 1 THEN lat END) AS lat1,
                   min(CASE WHEN rn_d = 1 THEN lon END) AS lon1
            FROM marked GROUP BY user_id
        ),
        path AS (
            -- float fold in STEP order: list_reduce's ((s1+s2)+s3)
            -- equals Spark's 0.0-seeded aggregate() because 0+s1 is
            -- exact — the q_levene_bf sorted-fold discipline
            SELECT user_id,
                   coalesce((SELECT list_reduce(
                       list(s.step ORDER BY s.ts, s.event_id),
                       (a, b) -> a + b)
                     FROM steps s
                     WHERE s.user_id = e.user_id
                       AND s.step IS NOT NULL), 0e0) AS path_len
            FROM ends e
        )
        SELECT e.user_id, e.n_points, p.path_len,
               sqrt(CAST((e.lat1 - e.lat0) * (e.lat1 - e.lat0)
                       + (e.lon1 - e.lon0) * (e.lon1 - e.lon0)
                    AS DOUBLE)) AS displacement,
               CAST(p.path_len / nullif(sqrt(CAST(
                        (e.lat1 - e.lat0) * (e.lat1 - e.lat0)
                      + (e.lon1 - e.lon0) * (e.lon1 - e.lon0)
                    AS DOUBLE)), 0e0) AS DOUBLE) AS tortuosity
        FROM ends e JOIN path p ON p.user_id = e.user_id
    """,
    doc="Per-user trajectory metrics over seeded per-event visit"
    " points: total path length (sum of consecutive-step planar"
    " distances — each step ONE correctly-rounded sqrt of an exact"
    " integer, the k-step float sum folded in step order on both"
    " engines via the sorted-fold discipline), net displacement"
    " (first->last point), and tortuosity = path/displacement (~1"
    " beelines, >>1 wandering — the trip-vs-dwell classifier). Trig"
    " haversine is banned (libm); planar micro-degrees are exact and"
    " city-scale faithful. Scale: the step window and the fold are"
    " both user-partitioned — per-key sequential by nature, fully"
    " parallel across users.",
)
def q_geo_trajectory(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    pts = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            "user_id",
            "ts",
            "event_id",
            F.expr(_elat_spark()).alias("lat"),
            F.expr(_elon_spark()).alias("lon"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_lat = F.lag("lat").over(w)
    lag_lon = F.lag("lon").over(w)
    steps = pts.select(
        "user_id",
        "ts",
        "event_id",
        "lat",
        "lon",
        F.sqrt(
            (
                (F.col("lat") - lag_lat) * (F.col("lat") - lag_lat)
                + (F.col("lon") - lag_lon) * (F.col("lon") - lag_lon)
            ).cast("double")
        ).alias("step"),
    )
    w_d = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    marked = steps.select(
        "*",
        F.row_number().over(w).alias("rn_a"),
        F.row_number().over(w_d).alias("rn_d"),
    )
    agg = marked.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.min(F.expr("CASE WHEN rn_a = 1 THEN lat END")).alias("lat0"),
        F.min(F.expr("CASE WHEN rn_a = 1 THEN lon END")).alias("lon0"),
        F.min(F.expr("CASE WHEN rn_d = 1 THEN lat END")).alias("lat1"),
        F.min(F.expr("CASE WHEN rn_d = 1 THEN lon END")).alias("lon1"),
        # sorted float fold: aggregate()'s 0.0 seed is exact (0+s1=s1),
        # so the addition sequence matches DuckDB's list_reduce
        F.expr(
            "coalesce(aggregate(array_sort(collect_list("
            " CASE WHEN step IS NOT NULL"
            " THEN struct(ts, event_id, step) END)),"
            " cast(0 as double), (a, x) -> a + x.step), 0e0)"
        ).alias("path_len"),
    )
    disp = (
        "sqrt(cast((lat1 - lat0) * (lat1 - lat0)"
        " + (lon1 - lon0) * (lon1 - lon0) as double))"
    )
    return agg.select(
        "user_id",
        "n_points",
        "path_len",
        F.expr(disp).alias("displacement"),
        F.expr(
            f"cast(path_len / nullif({disp}, 0e0) as double)"
        ).alias("tortuosity"),
    )
