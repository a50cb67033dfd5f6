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


def test_checkpoint_restart_exactly_once(spark, oracle_sf_dir, tmp_path):
    """Kill-and-restart recovery: a checkpointed file-source -> parquet
    sink stream processes batch 1, stops, new input arrives, the SAME
    checkpoint restarts — and the sink holds exactly the full input
    (no loss, no duplicates). This is the end-to-end exactly-once
    contract that makes foreachBatch/file sinks production-safe."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    ev = spark.read.parquet(f"{oracle_sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type"
    )
    part1 = ev.where(F.col("event_id") % 2 == 0)
    part2 = ev.where(F.col("event_id") % 2 == 1)
    part1.write.mode("overwrite").parquet(src)

    def run_once():
        sdf = spark.readStream.schema(ev.schema).parquet(src)
        q = (
            sdf.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n1 = spark.read.parquet(sink).count()
    assert n1 == part1.count()

    # new files arrive while the stream is down; restart from checkpoint
    part2.write.mode("append").parquet(src)
    run_once()

    got = spark.read.parquet(sink)
    assert got.count() == ev.count()  # nothing lost, nothing doubled
    assert got.select("event_id").distinct().count() == ev.count()


def test_python_datasource_stream_drains_exactly(spark, tmp_path):
    """Custom Python streaming source (sources/pyds.py): the docgen
    feed consumed through a checkpointed parquet sink across REPEATED
    availableNow runs must drain the feed exactly once — the committed
    offset persists in the checkpoint, each restart resumes where the
    last run stopped, and no doc is lost or doubled."""
    from etl_pyspark_spark.sources.pyds import register_docgen

    assert register_docgen(spark)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        sdf = (
            spark.readStream.format("docgen")
            .option("n", 1000)
            .option("batchrows", 250)
            .load()
        )
        q = (
            sdf.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    seen = 0
    for _ in range(10):
        run_once()
        now = spark.read.parquet(sink).count()
        if now == seen:  # offset stopped advancing: feed drained
            break
        assert now > seen  # each run makes progress, none regresses
        seen = now
    got = spark.read.parquet(sink)
    batch = spark.read.format("docgen").option("n", 1000).load()
    assert got.count() == 1000
    assert got.select("doc_id").distinct().count() == 1000
    assert got.exceptAll(batch).count() == 0
