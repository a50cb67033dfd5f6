"""Temporal / history-table operators: sessionization, SCD2, upsert.

Three shapes every event- and dimension-pipeline needs that the
reference (a stateless per-chunk taxi transform, nyc_taxi_etl.py:50-103)
has no equivalent for — part of the SURVEY §2.9 growth surface:

- **Sessionization** (gaps-and-islands): group each user's event
  stream into sessions split at inactivity gaps. One window (lag +
  running sum of new-session flags) + one groupBy — two shuffles on
  ``user_id``, and Spark reuses the first shuffle's partitioning for
  the second (no extra Exchange), so the cost at 100 TB is one
  partition-by-user pass.
- **SCD2 intervals** (slowly-changing dimension, type 2): turn a
  change log into validity intervals ``[valid_from, valid_to)`` with
  ``lead()`` over each key's history; the open interval marks the
  current row. Single window shuffle on the dimension key.
- **Merge/upsert** (CDC apply): updates win over base on key match,
  inserts flow through — a full outer join + ``coalesce``. The base
  side shuffles on the key once; with bucketed base tables
  (sources/bucketed.py) even that exchange disappears. This is the
  batch equivalent of ``MERGE INTO`` in lakehouse engines.

All three are deterministic (integer-microsecond gap arithmetic,
explicit tiebreakers in every window ORDER BY) so they hash-match
DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """One row per (user, session): session_seq numbers a user's
    sessions 1..k in time order; a session ends after ``gap_seconds``
    of inactivity.

    Gap arithmetic is integer microseconds (``unix_micros``) — a
    double-seconds subtraction can round across the threshold and
    split/merge sessions differently per engine.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    us = F.unix_micros(F.col(ts_col))
    gap = us - F.lag(us).over(w)
    new_sess = F.when(
        gap.isNull() | (gap > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    with_sess = events.withColumn(
        "session_seq",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return with_sess.groupBy(user_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def scd2_intervals(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Validity intervals from a change log: each row becomes
    ``[valid_from, valid_to)`` where ``valid_to`` is the next change's
    timestamp for the same key (NULL = current). ``is_current`` flags
    the open interval."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    nxt = F.lead(F.col(ts_col)).over(w)
    return changes.select(
        "*",
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def merge_upsert(
    base: DataFrame, updates: DataFrame, key_col: str
) -> DataFrame:
    """CDC apply: rows from ``updates`` replace base rows with the same
    key; unmatched update rows are inserts; unmatched base rows pass
    through. Schemas must match. Returns the merged table."""
    cols = base.columns
    b = base.select([F.col(c).alias(f"b_{c}") for c in cols])
    u = updates.select([F.col(c).alias(f"u_{c}") for c in cols])
    joined = b.join(
        u, F.col(f"b_{key_col}") == F.col(f"u_{key_col}"), "full_outer"
    )
    return joined.select(
        [F.coalesce(F.col(f"u_{c}"), F.col(f"b_{c}")).alias(c) for c in cols]
    )
