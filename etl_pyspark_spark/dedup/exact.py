"""Exact deduplication.

Hash-groupBy on a normalized-text fingerprint: one shuffle keyed by a
60-bit hash, partial aggregation map-side. At 100 TB this is the only
viable exact-dedup shape — no sort, no driver state; the fingerprint
(8 bytes) shuffles instead of the document text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pyspark_spark.functions.text import doc_fingerprint


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Return ``df`` with exactly one row per normalized-text value —
    the one with the smallest ``id_col`` (deterministic winner)."""
    fp = doc_fingerprint(F.col(text_col)).alias("_fp")
    winners = (
        df.select(fp, F.col(id_col))
        .groupBy("_fp")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(winners, on=id_col, how="left_semi")
