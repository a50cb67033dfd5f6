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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_from: str,
    buckets: int = 8,
) -> DataFrame:
    """Skew-salted equi join for hot keys too big to broadcast away.

    A plain shuffle join on a skewed key sends every hot-key row to ONE
    reducer; salting splits each key across ``buckets`` reducers: the
    fact side gets a deterministic salt derived from ``salt_from``
    (content-derived — a random salt would break retries and
    cross-engine checks), the dim side is replicated once per bucket
    (an ``explode`` of a literal range, dim_rows x buckets — cheap when
    the dim is small relative to the fact), and the join key becomes
    (key, salt). AQE's skew-join split handles *sort-merge* skew
    post-hoc; explicit salting is still the tool when the skew is
    extreme or the join must hash-partition for a downstream stage.
    """
    fact_s = fact.withColumn(
        "_salt", F.pmod(F.col(salt_from), F.lit(buckets)).cast("int")
    )
    dim_s = dim.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i).cast("int") for i in range(buckets)])),
    )
    return fact_s.join(dim_s, [key, "_salt"]).drop("_salt")
