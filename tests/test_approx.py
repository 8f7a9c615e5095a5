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


def test_incremental_candidates_equal_full_run_restriction(spark, sf_dir):
    """Incremental dedup: candidates from band-joining a NEW batch's
    signatures against the stored artifact equal the full-corpus
    candidate pairs that touch a new doc."""
    from pyspark.sql import functions as F

    from lakehouse_weather_spark.operators.dedup import (
        incremental_neardup_candidates,
        minhash_signatures,
    )
    from lakehouse_weather_spark.registry import load_all

    sig = minhash_signatures(spark, sf_dir)
    new_sig = sig.filter(F.col("doc_id") % 5 == 0)
    base_sig = sig.filter(F.col("doc_id") % 5 != 0)

    got = {
        (r.doc_a, r.doc_b)
        for r in incremental_neardup_candidates(new_sig, base_sig).collect()
    }
    full = {
        (r.doc_a, r.doc_b)
        for r in load_all()["q_minhash_neardup"].fn(spark, sf_dir).collect()
    }
    want = {p for p in full if p[0] % 5 == 0 or p[1] % 5 == 0}
    assert got == want and len(want) > 0


def test_sketch_aggregates_within_error_bounds(spark, sf_dir):
    """The approximate aggregates a 100 TB pipeline leans on, checked
    against exact answers: HLL distinct counts within the standard
    error envelope, GK quantiles within the requested rank error."""
    from pyspark.sql import functions as F

    from lakehouse_weather_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select(F.countDistinct("l_orderkey")).first()[0]
    approx = li.select(F.approx_count_distinct("l_orderkey", rsd=0.02)).first()[0]
    assert abs(approx - exact) <= 0.1 * exact  # 5 sigma of rsd=2%

    qs = li.approxQuantile("l_extendedprice", [0.5], 0.01)[0]
    n = li.count()
    rank = li.filter(F.col("l_extendedprice") <= qs).count()
    assert abs(rank / n - 0.5) <= 0.011  # requested rank error + slack


def test_corr_matrix_matches_numpy(spark, sf_dir):
    """q_corr_matrix's moment-form Pearson agrees with numpy's
    two-pass corrcoef to float precision (engine parity alone would
    not catch a formula error present on both sides)."""
    import numpy as np

    from lakehouse_weather_spark.registry import load_all
    from lakehouse_weather_spark.sources.tables import load_table

    got = {
        (r.x_name, r.y_name): r.r
        for r in load_all()["q_corr_matrix"].fn(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_extendedprice", "l_discount"
    ).collect()
    cols = {
        "quantity": np.array([round(r.l_quantity) for r in li], dtype=np.float64),
        "price": np.array(
            [round(r.l_extendedprice * 100) for r in li], dtype=np.float64
        ),
        "discount": np.array(
            [round(r.l_discount * 100) for r in li], dtype=np.float64
        ),
    }
    for (x, y), r in got.items():
        want = np.corrcoef(cols[x], cols[y])[0, 1]
        assert abs(r - want) < 1e-9, (x, y, r, want)
    assert len(got) == 3


def test_equidepth_buckets_are_balanced(spark, sf_dir):
    """Sampled cut points really produce ~equal bucket depths (within
    sampling error), and the sample is a bounded TakeOrdered — not a
    table-wide sort."""
    from lakehouse_weather_spark.registry import load_all
    from lakehouse_weather_spark.operators.profiling import EQUI_BUCKETS

    df = load_all()["q_equidepth_hist"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = {r.bucket: r.n_rows for r in df.collect()}
    assert set(rows) == set(range(EQUI_BUCKETS))
    total = sum(rows.values())
    target = total / EQUI_BUCKETS
    for b, n in rows.items():
        assert 0.7 * target <= n <= 1.3 * target, (b, n, target)


def test_minhash_big_bucket_routing_exact(spark, sf_dir):
    """The 100 TB skew guard: routing over-cap LSH buckets through the
    streaming self-join (big_bucket_cap) yields EXACTLY the default
    one-pass array path's pair set — including a cap of 2, where every
    multi-doc bucket takes the join path."""
    from lakehouse_weather_spark.operators.dedup import (
        minhash_pairs_from_signatures,
        minhash_signatures,
    )

    sig = minhash_signatures(spark, sf_dir)
    base = {
        (r.doc_a, r.doc_b)
        for r in minhash_pairs_from_signatures(sig).collect()
    }
    assert len(base) > 0
    for cap in (2, 10_000):
        routed = {
            (r.doc_a, r.doc_b)
            for r in minhash_pairs_from_signatures(
                sig, big_bucket_cap=cap
            ).collect()
        }
        assert routed == base, cap


# --- isotonic calibration: minimax == sequential PAVA -----------------


def test_isotonic_pava_matches_sequential_pooling(spark, sf_dir):
    """q_isotonic_pava's closed-form minimax fit equals the classic
    sequential pool-adjacent-violators algorithm run with EXACT
    fractions on the query's own bins, floored to ppm (floor commutes
    with min/max, so minimax-of-floored-averages == floor-of-exact-
    PAVA), and the fitted map is monotone non-decreasing in the bin."""
    from fractions import Fraction

    from lakehouse_weather_spark.registry import load_all

    rows = sorted(
        load_all()["q_isotonic_pava"].fn(spark, sf_dir).collect(),
        key=lambda r: r["bin"],
    )
    assert rows
    # sequential PAVA on (n, sum_y) with exact rational block averages
    blocks: list[list] = []  # [sum_y, n]
    for r in rows:
        blocks.append([r["sum_y"], r["n"]])
        while len(blocks) > 1 and (
            Fraction(blocks[-2][0], blocks[-2][1])
            > Fraction(blocks[-1][0], blocks[-1][1])
        ):
            b = blocks.pop()
            blocks[-1][0] += b[0]
            blocks[-1][1] += b[1]
    fits = []
    for sy, n in blocks:
        fits.extend([Fraction(sy, n)] * n)
    # expand block fits back to bins (each bin contributes n rows of
    # identical fit inside its block) — walk blocks by bin counts
    bin_fit = []
    i = 0
    for sy, n in blocks:
        consumed = 0
        val = Fraction(sy, n)
        while consumed < n:
            bin_fit.append(val)
            consumed += rows[i]["n"]
            i += 1
    assert len(bin_fit) == len(rows)
    got = [r["iso_ppm"] for r in rows]
    expect = [int(f * 1_000_000) for f in bin_fit]  # floor for f >= 0
    assert got == expect, (got, expect)
    assert got == sorted(got)  # monotone
