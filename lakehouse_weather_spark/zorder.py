"""Z-order (Morton-code) multi-dimensional clustering — the engine's
equivalent of Delta's OPTIMIZE ZORDER BY.

Sorting a table by the bit-interleaved rank of several columns makes
every written file cover a small hyper-rectangle of the key space, so
min/max file statistics can skip files for predicates on ANY of the
z-ordered columns (a plain sort only helps the leading column). At
100 TB this is the difference between scanning 1% and 100% of files for
a selective 2-column predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 8 bits/dim = 256 quantile buckets per column, 65536 z-cells — plenty
# of resolution for file-level min/max skipping while keeping the
# boundary arrays small
_BITS = 8


def _quantile_cuts(
    df: DataFrame, cols: list[str], bits: int, relative_error: float = 0.001
) -> dict[str, list[float]]:
    """2^bits-quantile cut points per column via approxQuantile
    (Greenwald-Khanna sketch: one distributed pass, tiny driver
    result). Rank-based normalization handles skew; a global
    ``percent_rank`` window would funnel the whole table through ONE
    task — the opposite of this module's purpose."""
    n = 1 << bits
    probs = [i / n for i in range(1, n)]
    all_cuts = df.approxQuantile(cols, probs, relative_error)
    return dict(zip(cols, all_cuts))


def _bucket_by_cuts(col: str, cuts: list[float]) -> Column:
    """0..len(cuts) bucket index of ``col`` against sorted cut points:
    a narrow per-row fold over the boundary array literal (no shuffle,
    no window)."""
    arr = F.array(*[F.lit(float(c)) for c in cuts])
    return F.aggregate(
        arr,
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.when(F.col(col).cast("double") >= b, 1).otherwise(0).cast("long"),
    )


def morton_code(a: Column, b: Column, bits: int = _BITS) -> Column:
    """Interleave the low ``bits`` bits of two long columns (a even
    positions, b odd) into a single z-order rank."""
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(1), 2 * i))
        parts.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(1), 2 * i + 1))
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def zorder_write(
    df: DataFrame, out_dir: str, col_a: str, col_b: str, n_files: int = 8
) -> None:
    """Write ``df`` into ``n_files`` files clustered by the z-order of
    (col_a, col_b): quantile-bucket both columns (one sketch pass),
    interleave bits, and range-partition + sort by the Morton code."""
    cuts = _quantile_cuts(df, [col_a, col_b], _BITS)
    ranked = df.withColumn("_za", _bucket_by_cuts(col_a, cuts[col_a])).withColumn(
        "_zb", _bucket_by_cuts(col_b, cuts[col_b])
    )
    coded = ranked.withColumn("_z", morton_code(F.col("_za"), F.col("_zb")))
    (
        coded.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_za", "_zb", "_z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
