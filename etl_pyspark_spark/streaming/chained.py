"""Chained stateful streaming: windowed aggregate over a windowed
aggregate (Spark >= 3.4 multiple-stateful-operators support).

The streaming version of the hypertable rollup
(registry.time_rollup_multigrain): hourly windows aggregate raw
events; daily windows re-aggregate the *hourly results* — both live in
the same always-on query, each with its own state store, connected by
event-time watermark propagation (the daily operator's watermark is
derived from the hourly operator's output watermark, so late data is
handled consistently end to end).

Chaining REQUIRES append output mode: a window emits exactly once,
when the watermark passes its end — so downstream state sees each
upstream window as an immutable event. Consequence on a bounded
replay: windows the final watermark (max event time - delay) has not
passed are withheld. That boundary is deterministic for a fixed
fixture, so the registry oracle applies the same cutoff to the batch
equivalent.

Re-aggregation exactness: hourly sums pass through DECIMAL(18,6)
(same rule as everywhere); daily sums re-sum those exact doubles
through decimals again, so hour->day introduces no float drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pyspark_spark.streaming.windows import (
    run_to_memory_table,
    stream_events,
)


def hourly_then_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day_start_s, event_type, n_events, sum_value) from a chained
    hourly->daily streaming aggregation, append mode."""
    sdf = stream_events(spark, sf_dir)
    hourly = (
        sdf.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    daily = (
        hourly.groupBy(F.window(F.col("window"), "1 day"), "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum(F.col("sum_value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    out = daily.select(
        F.unix_timestamp(F.col("window.start")).alias("day_start_s"),
        "event_type",
        "n_events",
        "sum_value",
    )
    return run_to_memory_table(out, spark, mode="append")
