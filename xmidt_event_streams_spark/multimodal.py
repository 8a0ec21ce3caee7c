"""Multimodal columns: opaque binary payloads with typed metadata.

Pattern for 100 TB pipelines: media rides as a ``binary`` column next
to typed metadata columns; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` stages so bytes never round-trip through
Python row objects.

Decode kernels are CODEC-PLUGGABLE: ``codec="auto"`` (the default)
attempts a real decoder import (PIL) INSIDE the Arrow worker --
executors, not the driver, must have the library -- and falls back to
the deterministic byte-arithmetic stub when absent (this container
ships no codec libs, so the stub is what CI exercises; a deployment
with Pillow on the executors gets real JPEG/PNG decode through the
identical plan/schema/batch shape). ``codec="stub"`` pins the
deterministic kernel -- the catalog's oracle-checked query uses it so
DuckDB parity is environment-independent; ``codec="pil"`` requires
the real decoder and surfaces the ImportError.
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
    """STUB decode: deterministic fake derived from the payload bytes
    so tests (and the DuckDB oracle) can assert plumbing end-to-end.
    Raises for empty payloads exactly like a real decoder would raise
    on truncated files.
    """
    if payload is None or len(payload) == 0:
        raise ValueError("empty payload")  # poison-row path
    h = sum(payload[:64])
    return (64 + h % 512, 64 + (h // 7) % 512, 3)


def _resolve_image_decoder(codec: str):
    """Pick the decode kernel INSIDE the worker process (executors own
    their imports, the driver's environment is irrelevant). Returns
    ``(payload) -> (width, height, n_channels)``; raises ValueError on
    undecodable payloads in both implementations."""
    if codec not in ("auto", "stub", "pil"):
        raise ValueError(f"codec must be auto|stub|pil, got {codec!r}")
    if codec == "stub":
        return _decode_image_stub
    try:
        import io

        from PIL import Image

        def _decode_pil(payload: bytes) -> tuple[int, int, int]:
            if payload is None or len(payload) == 0:
                raise ValueError("empty payload")
            try:
                img = Image.open(io.BytesIO(payload))
                w, h = img.size
                return (w, h, len(img.getbands()))
            except Exception as exc:  # truncated/non-image -> poison row
                raise ValueError(f"undecodable payload: {exc}") from exc

        return _decode_pil
    except ImportError:
        if codec == "pil":
            raise
        return _decode_image_stub  # auto: container has no codec libs


def extract_image_features(df: DataFrame, codec: str = "auto") -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each pandas chunk holds many payloads; decode
    failures divert to the rejects pattern (width/height null) instead
    of failing the task (the reference's panic-isolation analog, V9).
    ``codec``: see module docstring -- "auto" uses PIL when the
    executor has it, else the deterministic stub.
    """
    import hashlib

    _resolve_image_decoder(codec)  # fail fast on bad codec names

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _resolve_image_decoder(codec)  # worker-side import
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
                    w, h, c = decode(
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


def _resolve_image_resizer(codec: str, width: int, height: int):
    """Worker-side resize kernel: ``(payload) -> bytes``. The stub
    output is a deterministic function of (payload, target size) with
    the right shape and nullability; the PIL path decodes, converts to
    RGB and emits the raw width*height*3 pixel buffer (the standard
    pre-embedding normalization)."""
    import hashlib

    if codec not in ("auto", "stub", "pil"):
        raise ValueError(f"codec must be auto|stub|pil, got {codec!r}")

    def _resize_stub(payload: bytes) -> bytes:
        if payload is None or len(payload) == 0:
            raise ValueError("empty payload")
        seed = hashlib.md5(payload[:256] + f"|{width}x{height}".encode()).digest()
        # deterministic fake pixel buffer, truncated (real output would
        # be width*height*3; keep test payloads small)
        return (seed * ((width * height * 3) // len(seed) + 1))[:4096]

    if codec == "stub":
        return _resize_stub
    try:
        import io

        from PIL import Image

        def _resize_pil(payload: bytes) -> bytes:
            if payload is None or len(payload) == 0:
                raise ValueError("empty payload")
            try:
                img = Image.open(io.BytesIO(payload)).convert("RGB")
                return img.resize((width, height)).tobytes()
            except Exception as exc:
                raise ValueError(f"undecodable payload: {exc}") from exc

        return _resize_pil
    except ImportError:
        if codec == "pil":
            raise
        return _resize_stub


def resize_images(
    df: DataFrame, width: int = 224, height: int = 224, codec: str = "auto"
) -> DataFrame:
    """mapInPandas resize to a fixed (width, height) -- the standard
    pre-embedding normalization step. ``codec``: see module docstring
    ("auto" = real PIL decode when the executor has it, else the
    deterministic stub; "stub" pins oracle-reproducible bytes).
    Poison rows (empty payload) yield null bytes, not task failure.
    """
    _resolve_image_resizer(codec, width, height)  # fail fast

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        resize = _resolve_image_resizer(codec, width, height)
        for pdf in it:
            resized = []
            for payload in pdf["payload"]:
                try:
                    resized.append(
                        resize(bytes(payload) if payload is not None else b"")
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


# ---------------------------------------------------------------------
# perceptual image dedup: dHash + banded Hamming candidate pairs


def _pixels_stub(payload: bytes, w: int, h: int):
    """Deterministic pseudo-pixel grid from payload bytes (stub-world
    pixels: byte-similar payloads -> pixel-similar grids, so the
    Hamming-distance math downstream is real even though the decode
    is fake -- same posture as _decode_image_stub)."""
    import numpy as np

    raw = np.frombuffer(payload, dtype=np.uint8)
    reps = -(-(w * h) // len(raw))  # ceil
    return np.tile(raw, reps)[: w * h].reshape(h, w).astype(np.float64)


def image_phash(
    df: DataFrame,
    codec: str = "auto",
    payload_col: str = "payload",
    id_col: str = "media_id",
    hash_size: int = 8,
) -> DataFrame:
    """Difference-hash (dHash) per image: decode to a grayscale
    (hash_size+1 x hash_size) thumbnail, emit one bit per horizontal
    neighbor comparison -> a hash_size^2-bit hex string. Byte-exact
    dedup misses re-encoded/resized copies; dHash survives them (the
    standard perceptual-dedup tier for image corpora). ``codec`` as in
    extract_image_features: PIL thumbnails when the executor has it,
    else the deterministic stub pixels. Undecodable payloads -> null
    phash (poison containment, V9)."""
    if hash_size < 2 or hash_size > 16:
        raise ValueError("hash_size must be in [2, 16]")
    _resolve_image_decoder(codec)  # fail fast on bad codec names
    n_hex = (hash_size * hash_size + 3) // 4

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        use_pil = codec == "pil"
        if codec == "auto":
            try:
                import PIL  # noqa: F401

                use_pil = True
            except ImportError:
                use_pil = False

        def one(payload):
            if payload is None or len(payload) == 0:
                return None
            try:
                if use_pil:
                    import io

                    from PIL import Image

                    img = Image.open(io.BytesIO(payload)).convert("L")
                    img = img.resize((hash_size + 1, hash_size))
                    grid = np.asarray(img, dtype=np.float64)
                else:
                    grid = _pixels_stub(payload, hash_size + 1, hash_size)
            except Exception:
                return None
            bits = (grid[:, 1:] > grid[:, :-1]).flatten()
            val = 0
            for b in bits:
                val = (val << 1) | int(b)
            return format(val, f"0{n_hex}x")

        for pdf in it:
            yield pd.DataFrame(
                {id_col: pdf[id_col], "phash": pdf[payload_col].map(one)}
            )

    out_schema = f"{df.select(id_col).schema[0].simpleString()}, phash string"
    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)


def image_near_dups(
    hashes: DataFrame,
    max_hamming: int = 6,
    id_col: str = "media_id",
    phash_col: str = "phash",
    n_bands: int = 8,
) -> DataFrame:
    """Near-duplicate image pairs by perceptual-hash Hamming distance.

    Banded, like MinHash LSH: the 64-bit hash splits into ``n_bands``
    substrings; two hashes within Hamming distance d MUST share a band
    when d < n_bands (pigeonhole), so the candidate join is an
    equi-join on (band_idx, band_value) -- no all-pairs shape. The
    exact distance then verifies candidates via xor + bit_count on
    the two 32-bit halves (JVM-side; conv() of a full 64-bit hex
    would overflow signed long). Recall is EXACT for
    ``max_hamming < n_bands`` and partial beyond (documented, like
    ngram_jaccard's cap ledger). Output: id_a < id_b, hamming."""
    if max_hamming >= n_bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs n_bands > max_hamming "
            f"(pigeonhole recall guarantee); got n_bands={n_bands}"
        )
    h = hashes.filter(F.col(phash_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.col(phash_col).alias("_ph")
    )
    hex_len = 16  # 64-bit hashes (hash_size=8)
    band_w = hex_len // n_bands
    bands = h.select(
        "_id",
        "_ph",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("b"),
                        F.substring("_ph", 1 + i * band_w, band_w).alias("v"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bv"),
    ).select("_id", "_ph", "bv.b", "bv.v")
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.b") == F.col("y.b"))
            & (F.col("x.v") == F.col("y.v"))
            & (F.col("x._id") < F.col("y._id")),
        )
        .select(
            F.col("x._id").alias("id_a"),
            F.col("x._ph").alias("ph_a"),
            F.col("y._id").alias("id_b"),
            F.col("y._ph").alias("ph_b"),
        )
        .distinct()
    )

    def _half(col, lo):  # 8-hex half -> long
        return F.conv(F.substring(col, lo, 8), 16, 10).cast("long")

    hamming = (
        F.bit_count(_half("ph_a", 1).bitwiseXOR(_half("ph_b", 1)))
        + F.bit_count(_half("ph_a", 9).bitwiseXOR(_half("ph_b", 9)))
    ).alias("hamming")
    return cand.select("id_a", "id_b", hamming).filter(
        F.col("hamming") <= max_hamming
    )
