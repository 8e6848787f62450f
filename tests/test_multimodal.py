"""Multimodal binary-column plumbing (decode stubbed, Spark shapes real)."""

import pytest

from page_rank_hadoop_spark.multimodal.binary_ops import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    extract_features,
    frame_sample,
    media_stats,
)


def _media(spark):
    rows = [
        (1, "image", bytes(range(256)) * 8, (64, 32, None, "raw")),
        (2, "audio", b"\x01\x02" * 4096, (None, None, 16000, "pcm")),
        (3, "video", b"\xff" * 4096, (640, 480, None, "h264")),
        (4, "image", None, (None, None, None, None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_feature_extraction_shapes(spark):
    out = extract_features(_media(spark)).collect()
    assert len(out) == 4
    by_id = {r["media_id"]: r for r in out}
    assert all(len(r["features"]) == FEATURE_DIM for r in out)
    assert by_id[1]["n_bytes"] == 2048
    assert by_id[4]["n_bytes"] == 0 and by_id[4]["features"] == [0.0] * FEATURE_DIM
    # deterministic: same payload → same features
    again = {r["media_id"]: r["features"] for r in extract_features(_media(spark)).collect()}
    assert again[1] == by_id[1]["features"]


def test_decode_stub_off_raises(spark):
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        extract_features(_media(spark), decode_stub=False).collect()


def test_frame_sample(spark):
    out = frame_sample(_media(spark).filter("media_id = 2"), every_n_bytes=1024, frame_len=64)
    rows = out.collect()
    assert len(rows) == 8  # 8192 bytes / 1024
    assert all(len(r["frame"]) == 64 for r in rows)
    assert [r["frame_no"] for r in rows] == list(range(8))


def test_media_stats(spark):
    out = {r["media_type"]: r["n"] for r in media_stats(_media(spark)).collect()}
    assert out == {"image": 2, "audio": 1, "video": 1}


def test_resize_media_byte_stride(spark):
    from page_rank_hadoop_spark.multimodal.binary_ops import resize_media

    media = spark.createDataFrame(
        [(1, "image", bytearray(b"abcdefgh")), (2, "audio", None)],
        "media_id LONG, media_type STRING, payload BINARY",
    )
    out = {r["media_id"]: r["payload"] for r in resize_media(media, factor=3).collect()}
    assert bytes(out[1]) == b"adg"  # every 3rd byte
    assert out[2] is None           # null payload passes through


def test_resize_media_real_decode_is_marked(spark):
    import pytest

    from page_rank_hadoop_spark.multimodal.binary_ops import resize_media

    media = spark.createDataFrame(
        [(1, "image", bytearray(b"abc"))], "media_id LONG, media_type STRING, payload BINARY"
    )
    with pytest.raises(Exception, match="codec"):
        resize_media(media, decode_stub=False).collect()
