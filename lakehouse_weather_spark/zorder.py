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

_BITS = 16


def _rank_pct(col: str, bits: int) -> Column:
    """Map a column to its 0..2^bits-1 percent-rank bucket (rank-based
    normalization handles skew and any orderable type)."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col(col))
    return (F.percent_rank().over(w) * ((1 << bits) - 1)).cast("long")


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
    (col_a, col_b): rank-normalize both columns, interleave bits, and
    range-partition + sort by the Morton code."""
    ranked = df.withColumn("_za", _rank_pct(col_a, _BITS)).withColumn(
        "_zb", _rank_pct(col_b, _BITS)
    )
    coded = ranked.withColumn("_z", morton_code(F.col("_za"), F.col("_zb")))
    (
        coded.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_za", "_zb", "_z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
