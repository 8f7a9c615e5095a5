"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``lakehouse_weather_spark.registry``: every operator
from SURVEY.md §2 registers a Spark implementation and (where
SQL-expressible) a DuckDB oracle there; this module just exposes the
registry in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lakehouse_weather_spark.registry import load_all

_FLAGSHIP = "q_tpch_q1"
_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    return load_all()[_FLAGSHIP].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted => rows-only)."""
    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
