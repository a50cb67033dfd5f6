"""Binary-asset operators for multimodal training-data pipelines.

The documents fixture has no real media, so :func:`with_payload`
derives a deterministic binary payload per row (the UTF-8 bytes of
``text``) plus typed metadata — the same shape a real pipeline gets
from ``spark.read.format("binaryFile")`` or a (path, bytes) parquet
lake: one opaque ``binary`` column + metadata columns.

Design rules for 100 TB of media:

- Metadata (size, checksum, media_type) is computed JVM-side
  (``length``/``md5`` on binary) — never ship bytes to Python for
  what an expression can do.
- Python touches bytes only inside ``mapInPandas``: Arrow moves each
  partition as a stream of record batches, one Python worker per
  task, zero driver involvement. Batch size is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory
  is safe regardless of payload skew.
- Real decoders (PIL/ffmpeg/soundfile) are absent here; the
  feature extractors below compute deterministic byte statistics
  instead, so correctness of the *plumbing* is oracle-checkable.
  :func:`decode_media_stub` marks where a real codec plugs in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: media type assigned round-robin so every type appears in fixtures
_MEDIA_TYPES = ["image/png", "audio/wav", "video/mp4"]


def with_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """documents -> (doc_id, media_type, payload binary, n_bytes,
    checksum) — the canonical multimodal asset table shape."""
    payload = F.encode(F.col(text_col), "UTF-8")
    media = F.element_at(
        F.array(*[F.lit(m) for m in _MEDIA_TYPES]),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col),
        media.alias("media_type"),
        payload.alias("payload"),
        F.length(payload).alias("n_bytes"),
        F.md5(payload).alias("checksum"),
    )


def decode_media_stub(payload: bytes, media_type: str):
    """Where a real decoder plugs in (PIL.Image.open / soundfile.read /
    av.open). NOT IMPLEMENTED in this environment — the container has
    no media libraries; callers use the deterministic byte-statistics
    extractors below instead.
    """
    raise NotImplementedError(
        "media decoding requires PIL/soundfile/av, which are not "
        f"available in this environment (media_type={media_type!r}, "
        f"{len(payload)} bytes)"
    )


_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("min_byte", T.IntegerType()),
        T.StructField("max_byte", T.IntegerType()),
    ]
)


def byte_features(assets: DataFrame) -> DataFrame:
    """Per-asset byte statistics via ``mapInPandas`` (the stand-in for
    image feature extraction). Arithmetic is done in int64/float64 and
    rounded portably downstream."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            arrs = [np.frombuffer(b, dtype=np.uint8) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": [len(a) for a in arrs],
                    "mean_byte": [
                        float(a.sum()) / len(a) if len(a) else 0.0 for a in arrs
                    ],
                    "min_byte": [int(a.min()) if len(a) else 0 for a in arrs],
                    "max_byte": [int(a.max()) if len(a) else 0 for a in arrs],
                }
            )

    return assets.select("doc_id", "payload").mapInPandas(
        extract, schema=_FEATURES_SCHEMA
    )


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame_bytes", T.ArrayType(T.IntegerType())),
    ]
)


def frame_sample(assets: DataFrame, stride: int = 64) -> DataFrame:
    """Every ``stride``-th byte of each payload — the plumbing shape of
    video frame sampling (fixed-stride record extraction from an
    opaque payload) with a byte standing in for a frame."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            arrs = [
                np.frombuffer(b, dtype=np.uint8)[::stride] for b in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_frames": [len(a) for a in arrs],
                    "frame_bytes": [[int(x) for x in a] for a in arrs],
                }
            )

    return assets.select("doc_id", "payload").mapInPandas(
        sample, schema=_FRAME_SCHEMA
    )


def write_binary_files(assets: DataFrame, out_dir: str) -> None:
    """Materialize the payload column as one binary file per asset
    (``<doc_id>.bin``) — the on-disk layout ``spark.read.format
    ("binaryFile")`` ingests. Files are written task-side via
    ``foreachPartition`` (each executor writes its own partition's
    assets; nothing flows through the driver). On a cluster ``out_dir``
    would be shared/object storage; locally it's a directory."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    rows = assets.select("doc_id", "payload")

    def write_partition(it):
        for row in it:
            # atomic-ish per file: temp then rename, so a re-run or
            # speculative duplicate task never leaves torn files
            final = os.path.join(out_dir, f"{row['doc_id']}.bin")
            tmp = final + ".tmp"
            with open(tmp, "wb") as f:
                f.write(bytes(row["payload"]))
            os.replace(tmp, final)

    rows.foreachPartition(write_partition)


def read_binary_assets(spark, in_dir: str) -> DataFrame:
    """``binaryFile`` source scan: (doc_id from filename, n_bytes,
    checksum). Metadata is computed JVM-side from the content column;
    ``pathGlobFilter`` prunes non-asset files at the listing, and the
    scan parallelizes per file."""
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(in_dir)
    )
    return bf.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.length(F.col("content")).alias("n_bytes"),
        F.md5(F.col("content")).alias("checksum"),
    )


def perceptual_hash_bands(assets: DataFrame) -> DataFrame:
    """64-bit average-hash (aHash) per binary payload, packed as four
    16-bit band keys — the perceptual-dedup primitive for media: real
    image pipelines decode + grayscale + downsample to an 8x8 tile
    first, then take exactly this bits-vs-mean fingerprint; with
    codecs stubbed in this container, the tile is a 64-bucket byte
    partition of the raw payload, which keeps every downstream stage
    (banding, Hamming verify, pair semantics) production-shaped.

    Bit b is 1 iff bucket b's byte mean exceeds the payload mean,
    compared by exact integer cross-multiplication
    (``sum_b * n_total > sum_total * cnt_b``) so the oracle replays
    it bit-for-bit. Arrow-batched; one numpy pass per payload."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("k0", T.IntegerType()),
            T.StructField("k1", T.IntegerType()),
            T.StructField("k2", T.IntegerType()),
            T.StructField("k3", T.IntegerType()),
        ]
    )

    def hash_batches(batches):
        for pdf in batches:
            out = {"doc_id": [], "k0": [], "k1": [], "k2": [], "k3": []}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                n = len(b)
                if n == 0:
                    bits = np.zeros(64, dtype=np.int64)
                else:
                    idx = (np.arange(n) * 64) // n
                    sums = np.bincount(idx, weights=b, minlength=64).astype(
                        np.int64
                    )
                    cnts = np.bincount(idx, minlength=64).astype(np.int64)
                    total, cnt_all = int(b.sum()), n
                    # exact integer compare, no float means
                    bits = (sums * cnt_all > total * cnts).astype(np.int64)
                keys = [
                    int((bits[j * 16 : (j + 1) * 16] << np.arange(16)).sum())
                    for j in range(4)
                ]
                out["doc_id"].append(int(did))
                for j in range(4):
                    out[f"k{j}"].append(keys[j])
            yield pd.DataFrame(out)

    return assets.select("doc_id", "payload").mapInPandas(
        hash_batches, schema=schema
    )
