"""Query family: streaming_multimodal (mechanically split from registry.py — see core)."""

from __future__ import annotations

from etl_pyspark_spark.queries.core import (
    DataFrame,
    F,
    SparkSession,
    pround,
    query,
    read_table,
    sql_pround,
)

# ---------------------------------------------------------------------------
# Structured Streaming (streaming/windows.py): watermarked event-time
# windows + stateful dedup, replayed to completion over the bounded
# fixture so each equals a batch aggregation — which is what the DuckDB
# oracle computes.
# ---------------------------------------------------------------------------


@query(
    "stream_tumbling_agg",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start_s,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming 1-hour tumbling windows per event_type (watermarked
    event-time aggregation, AvailableNow replay == batch result)."""
    from etl_pyspark_spark.streaming.windows import tumbling_counts

    return tumbling_counts(spark, sf_dir)


@query(
    "stream_sliding_agg",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 1800) * 1800 - o.off AS BIGINT)
             AS window_start_s,
           count(*) AS n_events
    FROM events, UNNEST([0, 1800]) AS o(off)
    GROUP BY 1
    """,
)
def q_stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming 1h/30m sliding windows; the oracle materializes the
    two windows each event belongs to."""
    from etl_pyspark_spark.streaming.windows import sliding_counts

    return sliding_counts(spark, sf_dir)


@query(
    "stream_session_window",
    oracle="""
    WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
    lagd AS (
      SELECT user_id, tus,
             CASE WHEN lag(tus) OVER w IS NULL
                    OR tus - lag(tus) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
    sess AS (
      SELECT user_id, tus,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY tus
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM lagd)
    SELECT user_id, min(tus) AS session_start_us, count(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def q_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (30-min gap) per user; the oracle
    rebuilds sessions with the classic lag/cumsum assignment."""
    from etl_pyspark_spark.streaming.windows import session_windows

    return session_windows(spark, sf_dir)


@query(
    "stream_stream_join",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS delay_s
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join (click->purchase
    attribution within 30 min per user); the time-range conjunct
    bounds both sides' state (streaming/joins.py)."""
    from etl_pyspark_spark.streaming.joins import click_purchase_attribution

    return click_purchase_attribution(spark, sf_dir)


@query(
    "stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup on (user_id, event_type) — append mode
    emits each key's first sighting only."""
    from etl_pyspark_spark.streaming.windows import streaming_dedup

    return streaming_dedup(spark, sf_dir)


# ---------------------------------------------------------------------------
# Multimodal binary columns (multimodal/assets.py): metadata JVM-side,
# byte "decode"/frame-sample via Arrow mapInPandas. Payloads are the
# UTF-8 bytes of documents.text (pure ASCII fixture), so the DuckDB
# oracles can replay the byte math with ord(substr(...)).
# ---------------------------------------------------------------------------


@query(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           CAST(strlen(text) AS INT) AS n_bytes,
           md5(text) AS checksum
    FROM documents
    """,
)
def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads (size + md5 checksum
    + media type), all JVM expressions on the binary column."""
    from etl_pyspark_spark.multimodal.assets import with_payload

    docs = read_table(spark, sf_dir, "documents")
    return with_payload(docs).select(
        "doc_id", "media_type", "n_bytes", "checksum"
    )


@query(
    "multimodal_byte_features",
    oracle=f"""
    WITH bytes AS (
      SELECT doc_id, unicode(substr(text, i, 1)) AS b
      FROM documents, UNNEST(generate_series(1, strlen(text))) AS g(i))
    SELECT doc_id,
           CAST(count(*) AS INT) AS n_bytes,
           {sql_pround('CAST(sum(b) AS DOUBLE) / count(*)', 6)} AS mean_byte,
           CAST(min(b) AS INT) AS min_byte,
           CAST(max(b) AS INT) AS max_byte
    FROM bytes GROUP BY doc_id
    """,
)
def q_multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction from binary payloads through Arrow-batched
    mapInPandas (numpy byte stats standing in for image decode — the
    stub point is multimodal.assets.decode_media_stub)."""
    from etl_pyspark_spark.multimodal.assets import byte_features, with_payload

    docs = read_table(spark, sf_dir, "documents")
    feats = byte_features(with_payload(docs))
    return feats.select(
        "doc_id",
        "n_bytes",
        pround(F.col("mean_byte"), 6).alias("mean_byte"),
        "min_byte",
        "max_byte",
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH sampled AS (
      SELECT doc_id, unicode(substr(text, i, 1)) AS b
      FROM documents,
           UNNEST(generate_series(1, strlen(text), 64)) AS g(i))
    SELECT doc_id, CAST(count(*) AS INT) AS n_frames,
           CAST(sum(b) AS BIGINT) AS frame_byte_sum
    FROM sampled GROUP BY doc_id
    """,
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-stride frame sampling from binary payloads (every 64th
    byte ~ every k-th video frame) via mapInPandas; compared on frame
    count + sampled-byte sum."""
    from etl_pyspark_spark.multimodal.assets import frame_sample, with_payload

    docs = read_table(spark, sf_dir, "documents")
    frames = frame_sample(with_payload(docs), stride=64)
    return frames.select(
        "doc_id",
        "n_frames",
        F.aggregate(
            "frame_bytes", F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("frame_byte_sum"),
    )


