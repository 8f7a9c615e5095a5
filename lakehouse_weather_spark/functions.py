"""Shared column-expression helpers.

``dsum``/``davg`` implement *order-independent* double aggregation:
naive ``sum(double)`` depends on partition/merge order, which is
nondeterministic on a cluster (and differs from any oracle engine).

Implementation: fixed-point accumulation. Each addend is scaled by 1e4
and rounded to a BIGINT (``round`` of the same IEEE product double is
identical in every engine — half-away-from-zero for both signs), summed
exactly as integers (associative, whole-stage-codegen fast — ~4.5x
faster than DECIMAL accumulation), and unscaled to double. The sum is
exact at 1e-4 resolution with int64 headroom to ~9e14 (fine for sums up
to ~1e12 money units); for higher magnitudes switch SCALE down or use
the DECIMAL(28,10) variant (see git history) at ~4x cost.

``FIXED_DOT``: the same trick at 1e-12 resolution for embedding dot
products (addends ~1e-4..1e0, 64-4096 dims).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# DETERMINISM NOTE: bare decimal literals (e.g. 1.96) type as
# DECIMAL in DuckDB but promote to DOUBLE in Spark expressions, so a
# folded constant like (1.96 * 1.96) / n can differ in the last ULP
# between engines. Any non-integer literal participating in float
# arithmetic inside an oracle MUST be written CAST(x AS DOUBLE) on the
# DuckDB side (see q_wilson_bounds for the canonical fix).
SCALE = 10_000  # 1e-4 resolution: matches the engine's money rounding


def _fx(c: Column) -> Column:
    return F.round(c * SCALE, 0).cast("bigint")


def dsum(col: Column | str) -> Column:
    """Exact, order-independent sum of a double column -> double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(_fx(c)).cast("double") / SCALE).alias("dsum")


def davg(col: Column | str) -> Column:
    """Exact-sum average of a double column -> double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(_fx(c)).cast("double") / SCALE / F.count(c)


def sql_dsum(expr: str) -> str:
    """DuckDB-side equivalent of :func:`dsum` for oracle queries."""
    return f"(CAST(sum(CAST(round(({expr}) * {SCALE}) AS BIGINT)) AS DOUBLE) / {SCALE})"


def sql_davg(expr: str) -> str:
    """DuckDB-side equivalent of :func:`davg` for oracle queries."""
    return (
        f"(CAST(sum(CAST(round(({expr}) * {SCALE}) AS BIGINT)) AS DOUBLE)"
        f" / {SCALE} / count({expr}))"
    )


# ---------------------------------------------------------------------------
# Fixed-point dot product over double/float arrays (1e-12 resolution;
# headroom: 4096 dims x |x*y|<=1 -> ~4e15, within int64 exactly and
# within 2^53 for the final double cast).
# ---------------------------------------------------------------------------

DOT_SCALE = 1_000_000_000_000


def spark_dot(a: str, b: str) -> str:
    """SQL expr: exact fixed-point dot product of two array columns."""
    return (
        f"(CAST(aggregate(zip_with({a}, {b}, (x, y) ->"
        f" CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * {DOT_SCALE}, 0) AS BIGINT)),"
        f" CAST(0 AS BIGINT), (acc, v) -> acc + v) AS DOUBLE) / {DOT_SCALE})"
    )


def duck_dot_sum(a_val: str, b_val: str) -> str:
    """DuckDB aggregate equivalent over unnested (pos, val) pairs."""
    return (
        f"(CAST(sum(CAST(round(CAST({a_val} AS DOUBLE) * CAST({b_val} AS DOUBLE)"
        f" * {DOT_SCALE}) AS BIGINT)) AS DOUBLE) / {DOT_SCALE})"
    )
