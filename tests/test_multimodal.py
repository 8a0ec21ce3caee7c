"""Multimodal plumbing: binary columns, Arrow-batched feature
extraction, poison-row containment."""

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
