"""Multimodal (image/audio/video) column handling.

Opaque ``binary`` payloads + typed metadata, with decode /
feature-extract / frame-sample as Arrow-batched ``mapInPandas``
operators. The real media codecs are not available in this
environment, so decoding is STUBBED (see assets.decode_media_stub);
the Spark-side plumbing — binary schema, Arrow batch shape, UDF
signatures, partition behavior — is real and oracle-tested via a
deterministic byte-statistics "decoder".
"""

from etl_pyspark_spark.multimodal.assets import (
    byte_features,
    decode_media_stub,
    frame_sample,
    with_payload,
)

__all__ = [
    "byte_features",
    "decode_media_stub",
    "frame_sample",
    "with_payload",
]
