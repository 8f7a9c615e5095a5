"""Shared column-expression helpers.

``dsum``/``davg`` implement *order-independent* double aggregation:
naive ``sum(double)`` depends on partition/merge order, which is
nondeterministic on a cluster (and differs from any oracle engine).
Casting each addend to ``DECIMAL(28,10)`` makes the sum exact and
associative — the same trick works in ANSI SQL, so oracle results are
bit-identical. Cost: decimal adds instead of double adds in the partial
aggregate — negligible against scan cost at 100 TB, and it buys run-to-
run reproducibility on real clusters.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 10 fractional digits captures every "money-like" double exactly and
# keeps precision headroom for ~1e17 rows of partial sums.
DEC = "decimal(28,10)"


def dsum(col: Column | str) -> Column:
    """Exact, order-independent sum of a double column -> double.

    The exact decimal sum is re-rounded to scale 4 before the double
    cast: a scale-4 mantissa stays below 2^53 for sums up to ~1e12, so
    decimal->double is a single correctly-rounded conversion in every
    engine (int128/1e10 division tricks differ at the last ulp).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)), 4).cast("double")


def davg(col: Column | str) -> Column:
    """Exact-sum average of a double column -> double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)), 4).cast("double") / F.count(c)


def sql_dsum(expr: str) -> str:
    """DuckDB-side equivalent of :func:`dsum` for oracle queries."""
    return f"CAST(round(sum(CAST({expr} AS DECIMAL(28,10))), 4) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB-side equivalent of :func:`davg` for oracle queries."""
    return (
        f"(CAST(round(sum(CAST({expr} AS DECIMAL(28,10))), 4) AS DOUBLE)"
        f" / count({expr}))"
    )
