"""Multimodal plumbing tests: schemas, Arrow batch flow, 1→N frame
fan-out — with the deterministic fake codec (the real codecs are
stubbed, see multimodal/binary_ops.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from us_flight_delay_data_pipeline_spark.multimodal.binary_ops import (
    MEDIA_SCHEMA, attach_media_metadata, decode_image_batch,
    extract_image_features, sample_video_frames)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", "image/jpeg", b"\xff\xd8" + b"a" * 100, None, None),
        (2, "image", "image/png", b"\x89PNG" + b"b" * 37, None, None),
        (3, "video", "video/mp4", bytes(range(256)), None, None),
        (4, "image", "image/jpeg", None, None, None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_metadata_native(media):
    m = attach_media_metadata(media)
    got = {r["media_id"]: r for r in m.collect()}
    assert got[1]["n_bytes"] == 102
    assert got[4]["n_bytes"] is None
    assert len(got[2]["sha_hex"]) == 64


def test_decode_stub_raises_without_fake(media):
    with pytest.raises(Exception) as ei:
        decode_image_batch(media).collect()
    assert "NotImplementedError" in str(ei.value) or "stubbed" in str(ei.value)


def test_decode_fake_dimensions(media):
    out = decode_image_batch(media.filter("kind = 'image' AND content IS NOT NULL"),
                             fake_decode=True)
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["width"] == 102 % 640 + 1
    assert rows[2]["height"] == 41 % 480 + 1
    assert out.schema["width"].dataType.simpleString() == "int"


def test_features_normalized(media):
    out = extract_image_features(media.filter("content IS NOT NULL"),
                                 dim=8, fake_decode=True)
    rows = out.collect()
    assert all(len(r["feature"]) == 8 for r in rows)
    assert all(abs(sum(r["feature"]) - 1.0) < 1e-5 for r in rows)


def test_video_frame_fanout(media):
    out = sample_video_frames(media.filter("kind = 'video'"),
                              every_n=2, fake_decode=True)
    rows = out.orderBy("frame_idx").collect()
    # 256 bytes → 16 chunks of 16 → every 2nd → 8 frames
    assert len(rows) == 8
    assert [r["frame_idx"] for r in rows] == list(range(8))
    assert rows[0]["frame"] == bytes(range(16))


def test_resize_stub_raises_without_fake(media):
    from us_flight_delay_data_pipeline_spark.multimodal.binary_ops import \
        resize_image_batch
    with pytest.raises(Exception) as exc:
        resize_image_batch(media, fake_decode=False).collect()
    assert "NotImplementedError" in str(exc.value) or \
        isinstance(exc.value, NotImplementedError)


def test_resize_nearest_neighbor_exact(media):
    """The fake resample is a pure nearest-neighbor gather over a
    16-wide byte raster — pin it against a direct Python reference,
    including the short-payload (empty) and NULL cases."""
    from us_flight_delay_data_pipeline_spark.multimodal.binary_ops import \
        resize_image_batch
    out = {r["media_id"]: r for r in
           resize_image_batch(media, target_w=8, target_h=4,
                              fake_decode=True).collect()}

    def ref(blob, tw=8, th=4, sw=16):
        blob = blob or b""
        h = len(blob) // sw
        if h == 0:
            return b""
        return bytes(blob[(r * h // th) * sw + (c * sw // tw)]
                     for r in range(th) for c in range(tw))

    src = {1: b"\xff\xd8" + b"a" * 100,
           2: b"\x89PNG" + b"b" * 37,
           3: bytes(range(256)),
           4: None}
    for mid, blob in src.items():
        assert out[mid]["content"] == ref(blob), mid
        assert (out[mid]["width"], out[mid]["height"]) == (8, 4)
    # fixed output size regardless of input size (when >= one row)
    assert len(out[1]["content"]) == len(out[3]["content"]) == 32
