"""Query family: flagship (mechanically split from registry.py — see core)."""

from __future__ import annotations

from etl_pyspark_spark.queries.core import (
    DataFrame,
    F,
    SparkSession,
    events_pipeline,
    pround,
    query,
    read_table,
)

# ---------------------------------------------------------------------------
# Reference surface: the flagship pipeline (SURVEY.md §2.8)
# ---------------------------------------------------------------------------


@query(
    "reference_pipeline",
    oracle="""
    SELECT
      event_id,
      user_id,
      event_type,
      floor(value * 1000000.0 + 0.5) / 1000000.0 AS value,
      CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
      CAST(hour(ts) AS INT) AS event_hour,
      (user_id IN (1, 2, 3)) AS is_key_user,
      (hour(ts) BETWEEN 7 AND 9 OR hour(ts) BETWEEN 17 AND 19) AS is_peak_hour,
      floor((CASE WHEN minute(ts) <> 0
                  THEN value / CAST(minute(ts) AS DOUBLE) END)
            * 1000000.0 + 0.5) / 1000000.0 AS value_per_minute,
      concat_ws(' ', 'Event', CAST(event_id AS VARCHAR), 'by user',
                CAST(user_id AS VARCHAR), 'type', event_type, 'value',
                CAST(round(value, 2) AS VARCHAR)) AS event_summary
    FROM events
    WHERE event_id IS NOT NULL AND ts IS NOT NULL AND user_id IS NOT NULL
      AND event_type IS NOT NULL AND value IS NOT NULL AND props IS NOT NULL
    """,
)
def q_reference_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole ETL as one Spark query (SURVEY §2.8);
    scan -> null-drop -> derive -> flags -> summary, zero shuffles."""
    return events_pipeline(read_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Relational core: filters / projections (SURVEY §2.2 grown per §2.9)
# ---------------------------------------------------------------------------


@query(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5)
             / 1000000.0 AS disc_price,
           floor(l_quantity * 100.0 + 0.5) / 100.0 AS qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection; filters and the 4-column ReadSchema both
    push into the parquet scan (verified in tests/test_plans.py)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).select(
        "l_orderkey",
        "l_linenumber",
        pround(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
            "disc_price"
        ),
        pround(F.col("l_quantity"), 2).alias("qty"),
    )


