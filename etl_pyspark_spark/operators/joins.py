"""Join operators (SURVEY.md §2.9 "Joins" row).

The reference has no joins; this module provides the full join surface
a user of a query engine expects, each expressed so Catalyst picks the
right physical strategy at any scale:

- equi joins: plain ``df.join`` — Spark chooses broadcast-hash vs
  shuffled-hash vs sort-merge from statistics + AQE; small dimension
  tables get an explicit ``F.broadcast`` hint so a 100 TB fact scan
  never shuffles for a kilobyte dimension.
- non-equi range joins: expressed as a join condition (not a cross
  join + filter) so Spark can use broadcast-nested-loop only when one
  side is genuinely small.
- as-of join (the time-series staple Spark lacks as a builtin):
  implemented with a union + window trick — O(n log n) with a single
  shuffle on (key, time), no per-row Python, no merge_asof on the
  driver — scales to arbitrarily large both-sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def broadcast_join(
    fact: DataFrame, dim: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Equi join with an explicit broadcast hint on the dimension side.

    At 100 TB the win is that the fact table never shuffles: each task
    hash-joins against an executor-local copy of the dimension.
    """
    return fact.join(F.broadcast(dim), on, how)


def range_join(
    left: DataFrame, right: DataFrame, condition: Column, how: str = "inner"
) -> DataFrame:
    """Non-equi (theta/band) join. Keep one equi conjunct in
    ``condition`` whenever the data allows — Catalyst then uses it as
    the hash key and evaluates the range residually, avoiding a
    nested-loop plan."""
    return left.join(right, condition, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` (direction='backward') for the same key.

    Strategy (scales where pandas ``merge_asof`` cannot): tag both
    sides, union by a common schema, then a single window sorted by
    (key, ts, side) carries the most recent right-side values forward
    with ``last(..., ignorenulls=True)``. One shuffle total, no
    collect, no UDF; skew on ``key`` is handled by AQE.
    """
    if direction not in ("backward",):
        raise ValueError("only direction='backward' is implemented")

    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None)
        .cast(l_tagged.schema["_lrow"].dataType)
        .alias("_lrow"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows (side=0) sort before left rows at equal ts => "<=" semantics
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in right_cols
        ],
    ).where(F.col("_side") == 1)
    return filled.select(
        F.col("_lrow.*"),
        *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in right_cols],
    )
