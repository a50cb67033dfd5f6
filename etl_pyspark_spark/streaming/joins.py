"""Stream-stream joins with watermark-bounded state.

The click->purchase attribution shape: two live event streams joined
on user within a bounded event-time window. Structured Streaming
requires (a) a watermark on both sides and (b) a time-range conjunct
in the join condition — together they let the engine expire buffered
rows once the watermark passes ``c_ts + window``, so state is bounded
by (event rate x window) instead of growing forever. Without the
range conjunct Spark would buffer both streams in full — the
unbounded-state trap this module exists to demonstrate avoiding.

AvailableNow replay over the bounded fixture makes the result equal
the batch join, which is what the registry oracle computes.

Reference has no streaming of any kind (SURVEY.md TL;DR); §2.9
growth surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pyspark_spark.streaming.windows import (
    run_to_memory_table,
    stream_events,
)


def click_purchase_attribution(
    spark: SparkSession, sf_dir: str, window: str = "30 minutes"
) -> DataFrame:
    """Inner stream-stream join: each click pairs with every purchase
    by the same user in [click_ts, click_ts + window]."""
    sdf = stream_events(spark, sf_dir)
    clicks = (
        sdf.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        sdf.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {window}")),
        "inner",
    )
    out = joined.select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        # integer µs math — double seconds would round near boundaries
        F.expr("(unix_micros(p_ts) - unix_micros(c_ts)) div 1000000").alias(
            "delay_s"
        ),
    )
    # INNER stream-stream join: matches emit on arrival; eviction only
    # drops buffered state — the no-data flush batch emits zero rows
    return run_to_memory_table(out, spark, mode="append", final_flush=False)


def click_purchase_left_outer(
    spark: SparkSession, sf_dir: str, window: str = "30 minutes"
) -> DataFrame:
    """LEFT OUTER stream-stream join: every click emits — paired rows
    as matches arrive, and a null-purchase row once the watermark
    passes ``c_ts + window`` and proves no match can still come.

    The outer side is the genuinely stateful part: a click's null row
    CANNOT be emitted eagerly (a matching purchase may still arrive),
    so the engine buffers it until eviction time. Consequence under
    bounded replay: clicks younger than (max event time - watermark
    delay - window) are still buffered when input ends and never emit
    their null row — the registry oracle applies the same event-time
    cutoff to its unmatched-rows branch (a no-data micro-batch at the
    end flushes everything older). At 100 TB the same cutoff is why
    outer-join results trail the stream by exactly
    watermark + window."""
    sdf = stream_events(spark, sf_dir)
    clicks = (
        sdf.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        sdf.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {window}")),
        "leftOuter",
    )
    out = joined.select(
        "click_id",
        F.col("c_user").alias("user_id"),
        "purchase_id",
        F.expr(
            "CASE WHEN p_ts IS NOT NULL THEN"
            " (unix_micros(p_ts) - unix_micros(c_ts)) div 1000000 END"
        ).alias("delay_s"),
    )
    return run_to_memory_table(out, spark, mode="append")


def click_purchase_full_outer(
    spark: SparkSession, sf_dir: str, window: str = "30 minutes"
) -> DataFrame:
    """FULL OUTER stream-stream join — both unmatched sides emit.

    The eviction asymmetry is the interesting part: an unmatched
    CLICK's null row waits until the watermark passes ``c_ts +
    window`` (a matching purchase may arrive that long after it), but
    an unmatched PURCHASE only waits until the watermark passes
    ``p_ts`` itself — matching clicks satisfy ``c_ts <= p_ts``, so
    once the click-side watermark moves beyond ``p_ts`` none can
    still arrive. Under bounded replay that means the purchase side
    flushes EARLIER than the click side; the registry oracle encodes
    both cutoffs (strictly below the final watermark = ms-floored max
    event time minus the 1h delay). State cost at 100 TB is the sum
    of both sides' buffers over their own horizons — rate_c x
    (delay + window) + rate_p x delay.
    """
    sdf = stream_events(spark, sf_dir)
    clicks = (
        sdf.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        sdf.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {window}")),
        "fullOuter",
    )
    out = joined.select(
        "click_id",
        F.coalesce(F.col("c_user"), F.col("p_user")).alias("user_id"),
        "purchase_id",
        F.expr(
            "CASE WHEN p_ts IS NOT NULL AND c_ts IS NOT NULL THEN"
            " (unix_micros(p_ts) - unix_micros(c_ts)) div 1000000 END"
        ).alias("delay_s"),
    )
    return run_to_memory_table(out, spark, mode="append")
