"""Multimodal plumbing: schemas, batch shapes, geometry — decode stubbed."""

import pytest

from rdf_to_text_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image,
    extract_features,
    frame_sample_plan,
    resize_images,
)


def _media(spark):
    rows = [
        (0, "image", b"\x01\x02\x03\x04" * 300, ("image/jpeg", 640, 480, None)),
        (1, "image", b"\xff" * 64, ("image/png", 100, 50, None)),
        (2, "video", b"\x00" * 2048, ("video/mp4", 1920, 1080, 3500)),
        (3, "audio", b"\x07" * 128, ("audio/wav", None, None, 2000)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_stub_raises_loudly():
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image(b"\xff\xd8\xff")


def test_extract_features_shape_and_determinism(spark):
    media = _media(spark)
    f1 = {r.media_id: (list(r.feature), r.n_bytes) for r in extract_features(media).collect()}
    f2 = {r.media_id: (list(r.feature), r.n_bytes) for r in extract_features(media).collect()}
    assert f1 == f2  # deterministic fake kernel
    assert set(f1) == {0, 1, 2, 3}
    for feat, n in f1.values():
        assert len(feat) == 8
        assert abs(sum(feat) - 1.0) < 1e-6  # normalized histogram
        assert n > 0


def test_frame_sample_plan_is_metadata_only(spark):
    media = _media(spark)
    rows = frame_sample_plan(media, every_ms=1000).collect()
    # only the video row, frames at 0/1000/2000/3000 within 3500 ms
    assert {r.media_id for r in rows} == {2}
    assert sorted(r.frame_ts_ms for r in rows) == [0, 1000, 2000, 3000]


def test_resize_geometry_and_payload_scaling(spark):
    media = _media(spark)
    got = {r.media_id: r for r in resize_images(media, max_side=256).collect()}
    assert set(got) == {0, 1}  # images only
    r0 = got[0]  # 640x480 -> clamp longest side to 256, keep aspect
    assert (r0.target_w, r0.target_h) == (256, 192)
    assert r0.n_bytes < 1200  # payload shrank ~ area ratio (0.16)
    assert r0.n_bytes == len(r0.payload) > 0
    r1 = got[1]  # 100x50 already small -> no upscale
    assert (r1.target_w, r1.target_h) == (100, 50)
    assert r1.n_bytes == 64
