"""Multimodal plumbing: binary columns, Arrow-batched feature
extraction, poison-row containment."""

import pytest
from pyspark.sql import Row

from xmidt_event_streams_spark.multimodal import (
    MEDIA_SCHEMA,
    attach_binary_metadata,
    extract_image_features,
    frame_sample_plan,
)


def _media_df(spark):
    rows = [
        ("img-1", "image", bytes(range(100)), None, None),
        ("img-2", "image", b"\xff\xd8\xff" + b"x" * 500, None, None),
        ("img-bad", "image", b"", None, None),  # poison row
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_binary_metadata(spark):
    out = {r["media_id"]: r for r in attach_binary_metadata(_media_df(spark)).collect()}
    assert out["img-1"]["byte_len"] == 100
    assert len(out["img-1"]["content_md5"]) == 32
    assert out["img-bad"]["byte_len"] == 0


def test_feature_extraction_and_poison_containment(spark):
    out = {r["media_id"]: r for r in extract_image_features(_media_df(spark)).collect()}
    assert out["img-1"]["width"] is not None and out["img-1"]["n_channels"] == 3
    assert len(out["img-1"]["feature_hash"]) == 32
    # decode failure -> nulls, task survives (V9 panic-isolation analog)
    assert out["img-bad"]["width"] is None


def test_deterministic_features(spark):
    a = extract_image_features(_media_df(spark)).collect()
    b = extract_image_features(_media_df(spark)).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_frame_sampling_shape(spark):
    df = spark.createDataFrame(
        [Row(media_id="v1", payload=b"x" * 95)]  # 95 % 900 + 1 = 96 frames
    )
    frames = frame_sample_plan(df, every_n=30).collect()
    assert [r["frame_no"] for r in frames] == [0, 30, 60, 90]


def test_resize_shape_and_poison(spark):
    from xmidt_event_streams_spark.multimodal import resize_images

    out = {r["media_id"]: r for r in resize_images(_media_df(spark), 32, 16).collect()}
    assert out["img-1"]["width"] == 32 and out["img-1"]["height"] == 16
    assert out["img-1"]["resized"] is not None
    assert out["img-bad"]["resized"] is None  # poison contained, task alive
    # deterministic: same payload + size -> same bytes
    again = {r["media_id"]: r for r in resize_images(_media_df(spark), 32, 16).collect()}
    assert bytes(again["img-1"]["resized"]) == bytes(out["img-1"]["resized"])


def _media(spark):
    rows = [
        ("m1", bytearray(b"\x89PNG-ish not really " * 10)),
        ("m2", bytearray(b"")),  # poison
        ("m3", bytearray(bytes(range(200)))),
    ]
    return spark.createDataFrame(rows, "media_id: string, payload: binary")


def test_codec_auto_falls_back_to_stub_without_pil(spark):
    """In an executor environment with no codec libs (this container),
    codec='auto' must produce byte-identical results to codec='stub'
    -- the fallback is exercised inside the Arrow worker."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed here; fallback branch not reachable")
    except ImportError:
        pass
    from xmidt_event_streams_spark.multimodal import (
        extract_image_features,
        resize_images,
    )

    df = _media(spark)
    norm = lambda d: sorted(map(tuple, d.collect()))
    assert norm(extract_image_features(df, codec="auto")) == norm(
        extract_image_features(df, codec="stub")
    )
    assert norm(resize_images(df, 32, 32, codec="auto")) == norm(
        resize_images(df, 32, 32, codec="stub")
    )


def test_codec_pil_requires_library(spark):
    """codec='pil' must surface the missing decoder, never silently
    fall back (that would make real-decode deployments unverifiable).
    When PIL IS available, it must decode a real PNG correctly."""
    from xmidt_event_streams_spark.multimodal import (
        extract_image_features,
        resize_images,
    )

    try:
        import io

        from PIL import Image
    except ImportError:
        df = _media(spark)
        with pytest.raises(Exception, match="(?i)pil|pillow|no module"):
            extract_image_features(df, codec="pil").collect()
        with pytest.raises(Exception, match="(?i)pil|pillow|no module"):
            resize_images(df, 32, 32, codec="pil").collect()
        return

    # real-codec branch (runs only where Pillow is installed)
    buf = io.BytesIO()
    Image.new("RGB", (40, 30)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [("img1", bytearray(buf.getvalue())), ("bad", bytearray(b"notanimage"))],
        "media_id: string, payload: binary",
    )
    rows = {r["media_id"]: r for r in extract_image_features(df, codec="pil").collect()}
    assert (rows["img1"]["width"], rows["img1"]["height"], rows["img1"]["n_channels"]) == (40, 30, 3)
    assert rows["bad"]["width"] is None  # undecodable -> poison row
    resized = {r["media_id"]: r for r in resize_images(df, 8, 8, codec="pil").collect()}
    assert len(bytes(resized["img1"]["resized"])) == 8 * 8 * 3
    assert resized["bad"]["resized"] is None


def test_codec_rejects_unknown_name(spark):
    from xmidt_event_streams_spark.multimodal import extract_image_features

    with pytest.raises(ValueError, match="codec must be"):
        extract_image_features(_media(spark), codec="ffmpeg")


class TestPerceptualDedup:
    """image_phash + image_near_dups: perceptual near-dup pairs via
    banded Hamming join (no all-pairs shape)."""

    def _media(self, spark):
        base = bytes(range(200)) * 4
        close = bytearray(base)
        close[3] ^= 0xFF  # few pixel cells differ -> small hamming
        far = bytes(reversed(base))
        rows = [
            (1, base),
            (2, bytes(close)),
            (3, far),
            (4, base),          # identical -> hamming 0
            (5, None),          # poison
            (6, b""),           # poison
        ]
        return spark.createDataFrame(rows, "media_id long, payload binary")

    def test_phash_shape_and_poison(self, spark):
        from xmidt_event_streams_spark.multimodal import image_phash

        got = {
            r["media_id"]: r["phash"]
            for r in image_phash(self._media(spark), codec="stub").collect()
        }
        assert got[5] is None and got[6] is None
        assert got[1] == got[4] and len(got[1]) == 16
        assert all(
            c in "0123456789abcdef" for v in got.values() if v for c in v
        )

    def test_near_dups_banded_join(self, spark):
        from xmidt_event_streams_spark.multimodal import (
            image_near_dups,
            image_phash,
        )

        hashes = image_phash(self._media(spark), codec="stub")
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in image_near_dups(hashes, max_hamming=6).collect()
        }
        assert pairs[(1, 4)] == 0
        assert (1, 2) in pairs and 0 < pairs[(1, 2)] <= 6
        assert (2, 4) in pairs  # transitively byte-close
        assert not any(3 in p for p in pairs)  # reversed bytes: far
        assert not any(5 in p or 6 in p for p in pairs)

    def test_exact_recall_vs_brute_force(self, spark):
        """Within the pigeonhole guarantee (hamming < n_bands) the
        banded join finds EVERY pair the brute-force distance does."""
        import itertools

        from xmidt_event_streams_spark.multimodal import (
            image_near_dups,
            image_phash,
        )

        import random

        rng = random.Random(7)
        base = bytes(rng.randrange(256) for _ in range(128))
        rows = []
        for i in range(12):
            b = bytearray(base)
            for _ in range(rng.randrange(0, 4)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            rows.append((i, bytes(b)))
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        hashes = image_phash(df, codec="stub")
        hv = {r["media_id"]: int(r["phash"], 16) for r in hashes.collect()}
        want = {
            (a, b)
            for a, b in itertools.combinations(sorted(hv), 2)
            if bin(hv[a] ^ hv[b]).count("1") <= 5
        }
        got = {
            (r["id_a"], r["id_b"])
            for r in image_near_dups(hashes, max_hamming=5).collect()
        }
        assert got == want and want  # non-trivial and exact

    def test_guards(self, spark):
        import pytest

        from xmidt_event_streams_spark.multimodal import (
            image_near_dups,
            image_phash,
        )

        with pytest.raises(ValueError, match="pigeonhole"):
            image_near_dups(
                image_phash(self._media(spark), codec="stub"), max_hamming=8
            )
        with pytest.raises(ValueError, match="hash_size"):
            image_phash(self._media(spark), hash_size=1)


def test_validate_embeddings_gate(spark):
    """The ANN ingest gate: every poison class lands in the rejects
    ledger with its reason; the valid side is exactly the well-formed
    rows."""
    from xmidt_event_streams_spark.functions.vectors import validate_embeddings

    rows = [
        (1, [1.0, 2.0, 3.0]),
        (2, None),
        (3, [1.0, 2.0]),
        (4, [1.0, float("nan"), 3.0]),
        (5, [0.0, 0.0, 0.0]),
        (6, [float("inf"), 1.0, 2.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    valid, rejects = validate_embeddings(df, dim=3)
    assert [r["vec_id"] for r in valid.collect()] == [1]
    got = {r["vec_id"]: r["reject_reason"] for r in rejects.collect()}
    assert got == {2: "null", 3: "wrong_dim", 4: "non_finite",
                   5: "zero", 6: "non_finite"}
    # ledger sums to input
    assert valid.count() + rejects.count() == len(rows)
    # allow_zero admits the zero vector (dot-product spaces)
    valid2, _ = validate_embeddings(df, dim=3, allow_zero=True)
    assert sorted(r["vec_id"] for r in valid2.collect()) == [1, 5]
