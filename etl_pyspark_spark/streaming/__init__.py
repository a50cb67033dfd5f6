"""Structured Streaming operators (SURVEY.md §2.9 growth surface).

The reference has no streaming at all (its "incremental" processing is
file chunking, reference parquet_slicer.py:53-58); this package adds
the standard event-time toolkit: watermarked tumbling / sliding /
session windows and stateful streaming dedup, each verified against a
batch-equivalent DuckDB oracle.
"""

from etl_pyspark_spark.streaming.windows import (
    run_to_memory_table,
    sliding_counts,
    session_windows,
    stream_events,
    streaming_dedup,
    tumbling_counts,
)

__all__ = [
    "run_to_memory_table",
    "sliding_counts",
    "session_windows",
    "stream_events",
    "streaming_dedup",
    "tumbling_counts",
]
