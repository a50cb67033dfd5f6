"""Query registry: named Spark queries + matching DuckDB oracle SQL.

This is the engine's public correctness surface (driver contract in
``__spark_entry__.py``). Every operator from SURVEY.md §2 (reference
surface + §2.9 growth plan) registers here as:

- ``QUERIES[name]``: ``(spark, sf_dir) -> DataFrame``
- ``ORACLES[name]``: equivalent ANSI SQL for DuckDB over the same
  parquet fixtures (omitted only for genuinely non-SQL-expressible
  ops; the driver then records a weaker rows-only check).

Cross-engine determinism rules used throughout (FIXTURES.md §C):

- Alias every computed column identically on both sides (the driver
  sorts columns by name before hashing).
- Sums of doubles are order-dependent; both sides cast terms to
  ``DECIMAL(18,6)`` first so the sum is exact, then cast the result to
  double. (A binary double can never be an exact decimal midpoint, so
  the two engines' double->decimal roundings always agree.)
- Division by zero must yield NULL on both sides (ANSI off in Spark).
- LIMIT/top-k always carries a total tiebreak order.
- Raw event timestamps are returned as epoch seconds or truncated
  units, never as raw ns-precision timestamps.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pyspark_spark.functions.compat import pround, sql_pround
from etl_pyspark_spark.operators.baskets import MAX_BASKET
from etl_pyspark_spark.operators.blocking import MAX_BLOCK
from etl_pyspark_spark.operators.pipeline import events_pipeline
from etl_pyspark_spark.sources.io import read_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable plus oracle SQL.

    Duplicate registration fails LOUDLY: a second ``@query("x")`` used
    to overwrite the first silently (the only symptom was the registry
    count dropping — caught twice by hand-grepping in rounds 4/7)."""

    def deco(fn):
        assert name not in QUERIES, f"duplicate query registration: {name}"
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def dec_sum(col, alias: str):
    """Order-insensitive exact sum of a double expression (see module doc)."""
    return F.sum(col.cast("decimal(18,6)")).cast("double").alias(alias)


def _dec_sum_sql(expr: str, alias: str) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


