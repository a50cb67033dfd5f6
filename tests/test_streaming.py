"""Invariants for streaming operators whose exact output is
batching-dependent (no SQL oracle possible)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pyspark_spark.registry import QUERIES
from etl_pyspark_spark.sources.io import read_table


def test_dedup_within_watermark_bounds(spark, oracle_sf_dir):
    out = QUERIES["stream_dedup_within_watermark"](spark, oracle_sf_dir)
    got = out.count()
    ev = read_table(spark, oracle_sf_dir, "events")
    n_distinct = ev.select("user_id", "event_type").distinct().count()
    n_total = ev.count()
    # bounded-state dedup can keep a re-arriving key, never lose one
    assert n_distinct <= got <= n_total
    # every emitted key exists in the input
    extra = out.distinct().join(
        ev.select("user_id", "event_type").distinct(),
        ["user_id", "event_type"],
        "left_anti",
    )
    assert extra.count() == 0


def test_streaming_tumbling_equals_batch(spark, oracle_sf_dir):
    """Replay-to-completion == batch aggregation, computed in-engine
    (the DuckDB oracle checks the same thing cross-engine)."""
    stream = QUERIES["stream_tumbling_agg"](spark, oracle_sf_dir)
    ev = read_table(spark, oracle_sf_dir, "events")
    batch = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start_s"),
            "event_type",
            "n_events",
        )
    )
    assert (
        stream.select("window_start_s", "event_type", "n_events")
        .exceptAll(batch)
        .count()
        == 0
    )
    assert batch.exceptAll(
        stream.select("window_start_s", "event_type", "n_events")
    ).count() == 0


def test_transform_with_state_gated(spark, oracle_sf_dir):
    """Spark 4 Arbitrary State API v2: runs (and equals the batch
    GROUP BY) where google.protobuf exists; cleanly gated where not."""
    import pytest

    from etl_pyspark_spark.streaming.stateful import (
        per_user_type_counts,
        v2_state_available,
    )

    if not v2_state_available():
        pytest.skip("google.protobuf not installed: v2 state API unavailable")
    out = per_user_type_counts(spark, oracle_sf_dir)
    batch = (
        spark.read.parquet(f"{oracle_sf_dir}/events.parquet")
        .groupBy("user_id", "event_type")
        .count()
    )
    assert out.count() == batch.count()
