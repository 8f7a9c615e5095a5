"""Grouped-map UDF equivalence + file-inventory utility."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_weather_spark.inventory import file_inventory
from lakehouse_weather_spark.registry import load_all


def test_group_normalize_matches_window_zscore(spark, sf_dir):
    pandas_z = {
        r.event_id: r.value_z
        for r in load_all()["q_group_normalize"].fn(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id")
    sql_z = {
        r.event_id: r.z
        for r in ev.select(
            "event_id",
            (
                (F.col("value") - F.avg("value").over(w))
                / F.stddev_samp("value").over(w)
            ).alias("z"),
        ).collect()
    }
    assert set(pandas_z) == set(sql_z)
    # the kernel quantizes its moments (floor at 1e-4 on values, 1e-6
    # on squared deviations) to be bit-reproducible across engines and
    # partitionings; that bounded quantization shifts z by up to ~1e-5
    # vs the float window z-score, hence the tolerance
    assert all(abs(pandas_z[k] - sql_z[k]) < 1e-4 for k in sql_z)


def test_file_inventory(spark, sf_dir, tmp_path):
    out = str(tmp_path / "frag")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.repartition(4).write.parquet(out)
    inv = file_inventory(spark, out, key_col="o_orderkey").collect()
    assert len(inv) == 4
    assert sum(r.n_rows for r in inv) == orders.count()
    lo = orders.agg(F.min("o_orderkey")).first()[0]
    hi = orders.agg(F.max("o_orderkey")).first()[0]
    assert min(r.o_orderkey_min for r in inv) == lo
    assert max(r.o_orderkey_max for r in inv) == hi


def test_rotation_bookkeeping_is_consistent():
    """The gate-ordering sets must stay truthful: every name in the
    round-new sets is registered, the prior-verified set only contains
    registered names, and the ordering floats never-driver-sampled
    queries ahead of every query with a standing record."""
    from lakehouse_weather_spark import registry as R

    regs = R.load_all()
    assert set(R._ROUND10_NEW) <= set(regs)
    assert R._PRIOR_VERIFIED <= set(regs)
    # no overlap between buckets
    assert not (R._PRIOR_VERIFIED & R._ROUND10_NEW)
    order = list(regs)
    unsampled = [i for i, n in enumerate(order)
                 if n not in R._PRIOR_VERIFIED]
    if unsampled:
        first_prior = min(
            i for i, n in enumerate(order) if n in R._PRIOR_VERIFIED
        )
        assert max(unsampled) < first_prior
