"""Skew-mitigation operators: salting for hot aggregation keys.

When a group-by key has a handful of dominant values (lineitem's
``l_returnflag`` has 3), all rows of a hot key land on one reducer and
the stage runs at the speed of that one task. Salting splits each hot
key into ``buckets`` sub-keys for a partial aggregate, then merges the
partials — two small shuffles instead of one skewed one.

The salt must be *deterministic* (content-derived, never
``rand()``/``monotonically_increasing_id``) so re-runs, retries, and
the DuckDB oracle all agree; any value that distributes rows works
because the partial aggregate is merged exactly.

AQE's skew-join splitting handles skewed *joins* automatically
(session.py turns it on); explicit salting remains the tool for skewed
*aggregations* with algebraic (mergeable) aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    salt_cols: list[str],
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    buckets: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``partial_aggs`` aggregate within (keys + salt); ``merge_aggs``
    combine the partials per key. The caller supplies both stages
    because only algebraic aggregates decompose (sum->sum, count->sum,
    min->min, max->max, avg->(sum,count)/...).
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in salt_cols]), F.lit(buckets)).alias(
        "_salt"
    )
    partial = df.select("*", salt).groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)
