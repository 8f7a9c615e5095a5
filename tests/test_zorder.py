"""Z-order clustering: Morton code correctness + file-skipping benefit
(per-file bounding boxes shrink on BOTH columns vs a single-column sort)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from lakehouse_weather_spark.zorder import morton_code, zorder_write


def test_morton_code_known_values(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (3, 5)], "a long, b long"
    )
    got = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", morton_code(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    # interleave(a even bits, b odd bits): z(1,0)=1, z(0,1)=2, z(1,1)=3
    # a=3(011),b=5(101): bits a0..=1,1,0 b0..=1,0,1 -> z=0b100111=39
    assert got == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3, (3, 5): 39}


def _avg_file_spans(files: list[str], col_a: str, col_b: str) -> tuple[float, float]:
    spans_a, spans_b = [], []
    for f in files:
        meta = pq.read_metadata(f)
        schema_names = meta.schema.names
        ia, ib = schema_names.index(col_a), schema_names.index(col_b)
        mins_a, maxs_a, mins_b, maxs_b = [], [], [], []
        for rg in range(meta.num_row_groups):
            sa = meta.row_group(rg).column(ia).statistics
            sb = meta.row_group(rg).column(ib).statistics
            mins_a.append(sa.min)
            maxs_a.append(sa.max)
            mins_b.append(sb.min)
            maxs_b.append(sb.max)
        spans_a.append(max(maxs_a) - min(mins_a))
        spans_b.append(max(maxs_b) - min(mins_b))
    return sum(spans_a) / len(spans_a), sum(spans_b) / len(spans_b)


def test_zorder_shrinks_file_spans_on_both_columns(spark, sf_dir, tmp_path):
    import glob

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plain_dir = str(tmp_path / "plain")
    z_dir = str(tmp_path / "zorder")

    # baseline: sorted by o_custkey only (helps custkey, not totalprice)
    (
        orders.repartitionByRange(8, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(plain_dir)
    )
    zorder_write(orders, z_dir, "o_custkey", "o_totalprice", n_files=8)

    plain_files = glob.glob(f"{plain_dir}/*.parquet")
    z_files = glob.glob(f"{z_dir}/*.parquet")
    _, plain_span_b = _avg_file_spans(plain_files, "o_custkey", "o_totalprice")
    z_span_a, z_span_b = _avg_file_spans(z_files, "o_custkey", "o_totalprice")

    full_a = orders.agg(
        (F.max("o_custkey") - F.min("o_custkey")).alias("s")
    ).first().s
    full_b = orders.agg(
        (F.max("o_totalprice") - F.min("o_totalprice")).alias("s")
    ).first().s

    # z-order: BOTH columns' per-file spans are a strict subset of the
    # full range; the single-column sort leaves totalprice unclustered
    assert z_span_a < 0.8 * full_a
    assert z_span_b < 0.8 * full_b
    assert plain_span_b > 0.9 * full_b  # baseline doesn't help col B
    # row preservation
    assert spark.read.parquet(z_dir).count() == orders.count()


# --- Hilbert kernel: unrolled arithmetic == textbook recursion --------


def _xy2d_textbook(n: int, x: int, y: int) -> int:
    """The canonical Wikipedia xy2d recursion, kept verbatim as the
    reference implementation the SQL unroll must match."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_unroll_matches_textbook_everywhere(spark):
    """q_hilbert_prune's per-level CASE/div/mod arithmetic computes the
    textbook Hilbert index for EVERY cell of the 16x16 grid (a
    bijection onto 0..255) — evaluated through Spark's own expression
    engine, not a Python reimplementation."""
    from lakehouse_weather_spark.zorder import _ZP_BITS, _hilbert_level_sql

    import pyspark.sql.functions as F

    n = 1 << _ZP_BITS
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("gx"), (F.col("id") / n).cast("int").alias("gy")
    )
    h = grid.select(
        "gx",
        "gy",
        F.col("gx").alias("hx"),
        F.col("gy").alias("hy"),
        F.lit(0).alias("hd"),
    )
    s = n // 2
    while s > 0:
        x, y, d = _hilbert_level_sql(s, n, "div")
        h = h.select(
            "gx",
            "gy",
            F.expr(x).alias("hx"),
            F.expr(y).alias("hy"),
            F.expr(d).alias("hd"),
        )
        s //= 2
    rows = h.select("gx", "gy", "hd").collect()
    assert len(rows) == n * n
    seen = set()
    for r in rows:
        expect = _xy2d_textbook(n, r["gx"], r["gy"])
        assert r["hd"] == expect, (r["gx"], r["gy"], r["hd"], expect)
        seen.add(r["hd"])
    assert seen == set(range(n * n))  # bijection
