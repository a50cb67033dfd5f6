"""Physical-plan introspection helpers.

The reference delegates all planning to Catalyst and never inspects a
plan (SURVEY.md §4); at 100 TB the plan *is* the product, so the
engine treats plan shape as a testable property: shuffle counts,
broadcast decisions, pushdown reach. Used by tests/test_plans.py and
handy interactively:

    >>> from etl_pyspark_spark.plans import shuffle_count
    >>> shuffle_count(df)   # number of non-broadcast exchanges
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_of(df: DataFrame) -> str:
    """Full ``explain("formatted")`` text (tree + per-operator detail)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def tree_of(df: DataFrame) -> str:
    """Just the operator tree. The formatted detail section repeats
    every operator name, which would double any ``count()``."""
    return plan_of(df).split("\n\n", 1)[0]


def shuffle_count(df: DataFrame) -> int:
    """Number of data shuffles (exchanges that are not broadcasts)."""
    tree = tree_of(df)
    return tree.count("Exchange") - tree.count("BroadcastExchange")


def broadcast_exchange_count(df: DataFrame) -> int:
    return tree_of(df).count("BroadcastExchange")
