"""Incremental view maintenance with RETRACTIONS (Z-set / differential
semantics).

The append-only delta rule in ``pipeline/incremental.py`` maintains
joins under pure inserts; real changelogs also DELETE (CDC upstreams,
GDPR erasure, late corrections). The Z-set formulation (weighted bags:
insert = +1, delete = -1, view = sum of weights — DBSP/differential
dataflow's core idea) turns maintenance of any linear aggregate into
plain weighted addition: new_view = old_view (+) delta_agg, groups
whose weight reaches zero vanish.

The reference pipeline recomputes its gold tables from scratch on
every run (``dags/gold.py``); this operator is the 100 TB alternative —
the snapshot never re-reads history, each maintenance tick aggregates
ONLY the changelog and folds it in with a tiny join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table

# Deterministic partitions of the fixture into snapshot / changelog:
# md5-even events form the base snapshot, md5-odd arrive as inserts,
# and base rows whose digest lands < _DEL_LT of _DEL_MOD are deleted.
_H = (
    "cast(conv(substr(md5(concat('zs_', cast(event_id as string))),"
    " 1, 15), 16, 10) as bigint)"
)
_H_DUCK = (
    "CAST(('0x' || substr(md5('zs_' || CAST(event_id AS VARCHAR)),"
    " 1, 15)) AS BIGINT)"
)
_DEL_MOD = 10
_DEL_LT = 2  # 20% of the snapshot gets retracted


@register(
    "q_zset_ivm",
    oracle=f"""
        WITH h AS (
            -- complete cases: an all-NULL-fx group sums to NULL here
            -- (vs Spark's coalesced 0), and pandas would coerce the
            -- whole bigint column to float64
            SELECT event_type, value, {_H_DUCK} AS hh FROM events
            WHERE value IS NOT NULL
        ),
        final AS (
            -- the state the incremental fold must land on: surviving
            -- base rows (even, not deleted) plus all inserts (odd)
            SELECT event_type,
                   CAST(round(value * 10000) AS BIGINT) AS fx
            FROM h
            WHERE (hh % 2 = 0 AND hh % {_DEL_MOD} >= {_DEL_LT})
               OR hh % 2 = 1
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(fx) AS BIGINT) AS total_fx
        FROM final GROUP BY event_type
    """,
    doc="Grouped-aggregate maintenance under inserts AND deletes via"
    " Z-set weights (DBSP/differential-dataflow semantics): the"
    " changelog carries +1 rows for inserts and -1 rows for"
    " retractions, the per-group delta is a plain weighted sum, and"
    " the new view is snapshot (+) delta through one group-sized"
    " outer join — groups whose weight hits zero disappear. The"
    " Spark plan genuinely maintains: it aggregates the SNAPSHOT and"
    " the CHANGELOG separately and folds, never re-aggregating"
    " history + changes together; the oracle recomputes the final"
    " state from scratch, so the gate proves the delta rule exact"
    " (count + fixed-point sum are linear, so weighted addition is"
    " lossless). At 100 TB the snapshot agg is a stored table and"
    " each tick costs one changelog-sized partial agg + a"
    " groups-sized broadcast fold.",
)
def q_zset_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    # complete cases (mirrored in the oracle): an all-NULL-fx group
    # would land on 0 here but NULL in the oracle's from-scratch sum
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr("cast(round(value * 10000, 0) as bigint)").alias("fx"),
            F.expr(_H).alias("hh"),
        )
    )
    base = ev.filter(F.col("hh") % 2 == 0)
    # changelog: retractions of a base subset (w = -1) + inserts (+1)
    changelog = base.filter(F.col("hh") % _DEL_MOD < _DEL_LT).select(
        "event_type", "fx", F.lit(-1).alias("w")
    ).unionByName(
        ev.filter(F.col("hh") % 2 == 1).select(
            "event_type", "fx", F.lit(1).alias("w")
        )
    )
    snap = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("fx").cast("bigint").alias("total_fx"),
    )
    delta = changelog.groupBy("event_type").agg(
        F.sum("w").cast("bigint").alias("dn"),
        F.sum(F.col("w") * F.col("fx")).cast("bigint").alias("dfx"),
    )
    # NULL-SAFE fold join: a NULL group key is a legitimate Z-set
    # group, and a plain equi-join would leave the snapshot's NULL row
    # and its retraction delta unjoined — the retraction would never
    # cancel (caught by the null-bearing pathological corpus)
    delta = delta.withColumnRenamed("event_type", "d_event_type")
    merged = snap.join(
        delta,
        F.col("event_type").eqNullSafe(F.col("d_event_type")),
        "full_outer",
    ).select(
        F.coalesce(F.col("event_type"), F.col("d_event_type")).alias(
            "event_type"
        ),
        (
            F.coalesce(F.col("n_rows"), F.lit(0))
            + F.coalesce(F.col("dn"), F.lit(0))
        ).alias("n_rows"),
        (
            F.coalesce(F.col("total_fx"), F.lit(0))
            + F.coalesce(F.col("dfx"), F.lit(0))
        ).alias("total_fx"),
    )
    return merged.filter(F.col("n_rows") > 0)


# CDC op per event type: the fixture's event stream read as a keyed
# changelog (entity = user). signup creates, error tombstones, the
# engagement types carry value updates.
_CDC_OP = (
    "CASE WHEN event_type = 'signup' THEN 'c'"
    " WHEN event_type = 'error' THEN 'd' ELSE 'u' END"
)


@register(
    "q_cdc_net_effect",
    oracle=f"""
        WITH log AS (
            SELECT user_id, ts, event_id, value,
                   {_CDC_OP} AS op,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn_a,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                   ) AS rn_d
            FROM events
        ),
        agg AS (
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_changes,
                   max(CASE WHEN rn_a = 1 THEN op END) AS first_op,
                   max(CASE WHEN rn_d = 1 THEN op END) AS last_op,
                   max(CASE WHEN rn_d = 1 THEN value END) AS last_value
            FROM log GROUP BY user_id
        )
        SELECT user_id, n_changes, first_op, last_op,
               CASE WHEN last_op = 'd' AND first_op = 'c' THEN 'noop'
                    WHEN last_op = 'd' THEN 'delete'
                    WHEN first_op = 'c' THEN 'insert'
                    ELSE 'update' END AS net_op,
               CASE WHEN last_op = 'd' THEN NULL
                    ELSE last_value END AS final_value
        FROM agg
    """,
    doc="CDC changelog COMPACTION (the Debezium/Kafka-log-squash"
    " semantics every lakehouse ingest needs): the event stream read"
    " as a keyed change log — signup=create, error=tombstone, the"
    " engagement types=value updates — squashed per entity into ONE"
    " net row: first/last op, net operation (create+delete inside the"
    " window cancels to noop; a trailing tombstone deletes; a leading"
    " create inserts; else update) and the final value (NULL when"
    " tombstoned). This is the read-side twin of q_zset_ivm's weighted"
    " fold: compaction bounds the MERGE input to one row per touched"
    " key no matter how hot the key, which is what keeps a 100 TB"
    " merge proportional to entities, not to events. One shuffle on"
    " user_id (two window passes share the partitioning); the"
    " changelog is never self-joined.",
)
def q_cdc_net_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value", F.expr(_CDC_OP).alias("op")
    )
    wa = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    marked = ev.select(
        "user_id", "op", "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    agg = marked.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_changes"),
        F.max(F.when(F.col("rn_a") == 1, F.col("op"))).alias("first_op"),
        F.max(F.when(F.col("rn_d") == 1, F.col("op"))).alias("last_op"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias(
            "last_value"
        ),
    )
    return agg.select(
        "user_id", "n_changes", "first_op", "last_op",
        F.when(
            (F.col("last_op") == "d") & (F.col("first_op") == "c"),
            F.lit("noop"),
        )
        .when(F.col("last_op") == "d", F.lit("delete"))
        .when(F.col("first_op") == "c", F.lit("insert"))
        .otherwise(F.lit("update"))
        .alias("net_op"),
        F.when(F.col("last_op") == "d", F.lit(None).cast("double"))
        .otherwise(F.col("last_value"))
        .alias("final_value"),
    )
