"""Multimodal columns: opaque binary payloads with typed metadata.

Pattern for 100 TB pipelines: media rides as a ``binary`` column next
to typed metadata columns; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` stages so bytes never round-trip through
Python row objects. The codec libraries (PIL/ffmpeg/...) are NOT in
this container, so the decode kernels are deterministic stubs behind
the same signatures -- the Spark-side plumbing (schemas, batch
iteration, partitioning) is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("byte_len", IntegerType(), True),
        StructField("content_md5", StringType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("feature_hash", StringType(), True),
    ]
)


def attach_binary_metadata(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Typed metadata for an opaque binary column -- pure Column ops
    (byte length + content hash), no decode needed."""
    p = F.col(payload_col)
    return df.withColumn("byte_len", F.octet_length(p)).withColumn(
        "content_md5", F.md5(p)
    )


def _decode_image_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB decode: the real implementation would use PIL/libvips.

    Deterministic fake derived from the payload bytes so tests can
    assert plumbing end-to-end. Raises for empty payloads exactly like
    a real decoder would raise on truncated files.
    """
    if payload is None or len(payload) == 0:
        raise ValueError("empty payload")  # poison-row path
    h = sum(payload[:64])
    return (64 + h % 512, 64 + (h // 7) % 512, 3)


def extract_image_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each pandas chunk holds many payloads; decode
    failures divert to the rejects pattern (width/height null) instead
    of failing the task (the reference's panic-isolation analog, V9).
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_id": pdf["media_id"],
                "width": [],
                "height": [],
                "n_channels": [],
                "feature_hash": [],
            }
            for payload in pdf["payload"]:
                try:
                    w, h, c = _decode_image_stub(
                        bytes(payload) if payload is not None else b""
                    )
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_channels"].append(c)
                    out["feature_hash"].append(
                        hashlib.md5(bytes(payload)[:256]).hexdigest()
                    )
                except ValueError:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["n_channels"].append(None)
                    out["feature_hash"].append(None)
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(
        batches, IMAGE_FEATURES_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("resized", BinaryType(), True),
    ]
)


def resize_images(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """mapInPandas resize to a fixed (width, height) -- the standard
    pre-embedding normalization step. Decode/re-encode is STUBBED
    (no PIL in this container): the output bytes are a deterministic
    function of (payload, target size) with the right shape and
    nullability, so partitioning, batch iteration, and schema are
    exercised for real; swap ``_resize_stub`` for PIL at deploy.
    Poison rows (empty payload) yield null bytes, not task failure.
    """
    import hashlib

    def _resize_stub(payload: bytes) -> bytes:
        if payload is None or len(payload) == 0:
            raise ValueError("empty payload")
        seed = hashlib.md5(payload[:256] + f"|{width}x{height}".encode()).digest()
        # deterministic fake pixel buffer, truncated (real output would
        # be width*height*3; keep test payloads small)
        return (seed * ((width * height * 3) // len(seed) + 1))[:4096]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = []
            for payload in pdf["payload"]:
                try:
                    resized.append(
                        _resize_stub(bytes(payload) if payload is not None else b"")
                    )
                except ValueError:
                    resized.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "resized": resized,
                }
            )

    return df.select("media_id", "payload").mapInPandas(batches, RESIZED_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    index (decode stubbed; the explode/partition shape is the real
    part -- downstream stages see (media_id, frame_no) rows)."""
    n_frames = (F.octet_length("payload") % 900) + F.lit(1)  # stub frame count
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_no"),
    )
