"""One-pass sufficient-statistics correlation matrix.

Feature correlation over a 100 TB fact table must be a SINGLE scan: the
classic distributed pattern reduces each (x, y) pair to six exact sums
(n, Sx, Sy, Sxx, Syy, Sxy) with map-side partial aggregation — one
shuffle of a dozen numbers — and evaluates Pearson r from the moments.
Naive ``corr()`` aggregates accumulate doubles in partition order and
are nondeterministic across layouts/engines; here every input is scaled
to an exact integer (money has 2 decimals, quantity is integral), the
sums run in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — overflow-proof
and bit-exact — and only the final Pearson formula touches doubles,
where IEEE int->double conversion and arithmetic are identical
everywhere. The raw-moment form can cancel catastrophically for |r|~1
with huge means; acceptable here because both engines compute the
IDENTICAL expression, and the fixture's correlations are moderate.

The reference computes no statistics at all; this is the
profile-your-features stage a training pipeline runs before mixing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table

# exact integer scaling: quantity is integral, money has 2 decimals
_COLS = {
    "quantity": "CAST(round(l_quantity) AS BIGINT)",
    "price": "CAST(round(l_extendedprice * 100) AS BIGINT)",
    "discount": "CAST(round(l_discount * 100) AS BIGINT)",
}
_PAIRS = [("quantity", "price"), ("quantity", "discount"), ("price", "discount")]


def _spark_sums() -> list:
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for a in _COLS:
        aggs.append(
            F.sum(F.expr(f"CAST(i_{a} AS DECIMAL(38,0))")).alias(f"s_{a}")
        )
    done = set()
    for a in _COLS:
        for b in _COLS:
            key = tuple(sorted((a, b)))
            if key in done:
                continue
            done.add(key)
            aggs.append(
                F.sum(
                    F.expr(f"CAST(i_{key[0]} * i_{key[1]} AS DECIMAL(38,0))")
                ).alias(f"s_{key[0]}_{key[1]}")
            )
    return aggs


def _r_expr(x: str, y: str) -> str:
    """Pearson r from the exact moment sums, evaluated in double with
    an expression tree mirrored verbatim in the oracle."""
    kx, ky = sorted((x, y))
    sxy = f"CAST(s_{kx}_{ky} AS DOUBLE)"
    sxx = f"CAST(s_{x}_{x} AS DOUBLE)"
    syy = f"CAST(s_{y}_{y} AS DOUBLE)"
    sx, sy = f"CAST(s_{x} AS DOUBLE)", f"CAST(s_{y} AS DOUBLE)"
    return (
        f"((n * {sxy}) - ({sx} * {sy}))"
        f" / (sqrt((n * {sxx}) - ({sx} * {sx}))"
        f" * sqrt((n * {syy}) - ({sy} * {sy})))"
    )


@register(
    "q_corr_matrix",
    oracle=f"""
        WITH i AS (
            SELECT {', '.join(f'{e} AS i_{a}' for a, e in _COLS.items())}
            FROM lineitem
        ),
        m AS (
            SELECT CAST(count(*) AS DOUBLE) AS n,
                   {', '.join(f'sum(i_{a}) AS s_{a}' for a in _COLS)},
                   {', '.join(
                       f'sum(i_{a} * i_{b}) AS s_{a}_{b}'
                       for a, b in [
                           ('discount', 'discount'), ('discount', 'price'),
                           ('discount', 'quantity'), ('price', 'price'),
                           ('price', 'quantity'), ('quantity', 'quantity'),
                       ]
                   )}
            FROM i
        )
        SELECT x_name, y_name, r FROM (
            {' UNION ALL '.join(
                f"SELECT '{x}' AS x_name, '{y}' AS y_name,"
                f" {_r_expr(x, y)} AS r FROM m"
                for x, y in _PAIRS
            )}
        )
    """,
    doc="Pearson correlation matrix of lineitem features in ONE scan:"
    " exact integer sufficient statistics (DECIMAL/HUGEINT sums — "
    " order-independent, overflow-proof), Pearson evaluated from the"
    " moments in a mirrored double expression. The scale pattern for"
    " any pairwise statistic over a 100 TB fact table: map-side"
    " partials reduce the shuffle to a dozen numbers.",
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ints = li.select(
        *[F.expr(e).alias(f"i_{a}") for a, e in _COLS.items()]
    )
    m = ints.agg(*_spark_sums())
    m.createOrReplaceTempView("corr_moments")
    rows = [
        f"SELECT '{x}' AS x_name, '{y}' AS y_name,"
        f" {_r_expr(x, y)} AS r FROM corr_moments"
        for x, y in _PAIRS
    ]
    return spark.sql(" UNION ALL ".join(rows))
