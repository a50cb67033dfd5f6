"""Multimodal plumbing unit tests (beyond the registry oracles)."""

from __future__ import annotations

import pytest

from etl_pyspark_spark.multimodal.assets import (
    decode_media_stub,
    frame_sample,
    with_payload,
)
from etl_pyspark_spark.sources.io import read_table


def test_decode_stub_is_explicitly_unimplemented():
    with pytest.raises(NotImplementedError, match="media decoding"):
        decode_media_stub(b"\x89PNG", "image/png")


def test_payload_schema(spark, oracle_sf_dir):
    assets = with_payload(read_table(spark, oracle_sf_dir, "documents"))
    types = dict(assets.dtypes)
    assert types["payload"] == "binary"
    assert types["checksum"] == "string"
    assert types["n_bytes"] == "int"


def test_frame_sample_stride(spark, oracle_sf_dir):
    assets = with_payload(read_table(spark, oracle_sf_dir, "documents"))
    row = frame_sample(assets, stride=64).orderBy("doc_id").first()
    src = (
        read_table(spark, oracle_sf_dir, "documents").orderBy("doc_id").first()
    )
    expected = list(src.text.encode("utf-8")[::64])
    assert row.frame_bytes == expected
    assert row.n_frames == len(expected)
