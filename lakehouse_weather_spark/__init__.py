"""lakehouse_weather_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference lakehouse pipeline (``anhdobui/lakehouse-weather``): medallion
ETL (bronze crawl landing -> silver chunking -> gold clean/embed), the
relational/analytic query surface that pipeline implies, and the
large-scale training-data operators (dedup, similarity search,
multimodal columns, text analysis) needed to run the same workloads at
100 TB on a real cluster.

Design principles (see SURVEY.md §4.2):

- Declare logical plans with the DataFrame/SQL API; let Catalyst do
  pushdown, pruning, join selection, and AQE do runtime re-planning.
- Stay JVM-side: built-in ``pyspark.sql.functions`` everywhere; Python
  only via Arrow-batched ``pandas_udf`` / ``mapInPandas`` where Spark
  genuinely lacks the operator (PDF parse, LLM calls, image decode).
- Shuffle-aware: broadcast small dimensions, pre-aggregate before wide
  shuffles, AQE skew handling on by default (see ``session.py``).
"""

from lakehouse_weather_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
