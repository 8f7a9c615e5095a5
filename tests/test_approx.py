"""Approximate-aggregate sanity: the HLL/quantile-sketch path a 100 TB
deployment uses when exactness isn't required. Not oracle-checked
(sketches are engine-specific); bounded-error asserted against exact."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def test_approx_count_distinct_within_5pct(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = li.select(F.countDistinct("l_partkey")).first()[0]
    approx = li.select(F.approx_count_distinct("l_partkey", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.05, (exact, approx)


def test_approx_percentile_brackets_exact_median(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    approx = li.select(
        F.percentile_approx("l_quantity", 0.5, 10000)
    ).first()[0]
    lo, hi = li.selectExpr(
        "percentile(l_quantity, 0.45)", "percentile(l_quantity, 0.55)"
    ).first()
    assert lo <= approx <= hi, (lo, approx, hi)


def test_signature_artifacts_reusable(spark, sf_dir, tmp_path):
    """Dedup amortization: candidate pairs derived from the PERSISTED
    signature artifact equal the directly-computed q_minhash_neardup
    pairs — no re-shingling of the corpus on reuse."""
    from lakehouse_weather_spark.operators.dedup import (
        minhash_pairs_from_signatures,
        write_signature_artifacts,
    )
    from lakehouse_weather_spark.pipeline.atomic import read_current
    from lakehouse_weather_spark.registry import load_all

    table = str(tmp_path / "signatures")
    write_signature_artifacts(spark, sf_dir, table)
    stored = read_current(spark, table)
    from_artifact = {
        (r.doc_a, r.doc_b)
        for r in minhash_pairs_from_signatures(stored).collect()
    }
    direct = {
        (r.doc_a, r.doc_b)
        for r in load_all()["q_minhash_neardup"].fn(spark, sf_dir).collect()
    }
    assert from_artifact == direct and len(direct) > 0
