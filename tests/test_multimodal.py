"""Multimodal plumbing + the REAL BMP decode path (pure numpy, no Pillow)."""

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


def test_decode_unsupported_format_without_pillow_raises_loudly():
    # JPEG now has a real pure-numpy decoder (operators/jpeg.py), so the
    # Pillow fallback only triggers for formats we don't decode natively
    # (GIF, WebP, progressive JPEG reaches it via ValueError first).
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow present: fallback path is real here")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image(b"GIF89a" + b"\x00" * 16)


def test_decode_truncated_jpeg_raises_value_error():
    # A JPEG magic routes to the real decoder, which rejects garbage
    # loudly rather than falling through to the Pillow stub.
    with pytest.raises(ValueError):
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


# ------------------------------------------------- real BMP codec path
def test_bmp_roundtrip_all_padding_widths():
    import numpy as np

    from rdf_to_text_spark.operators.multimodal import decode_bmp, encode_bmp

    rng = np.random.RandomState(7)
    for w in (1, 2, 3, 4, 5, 8):  # row padding 1/2/3/0 bytes all hit
        for h in (1, 2, 4):
            a = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
            assert (decode_bmp(encode_bmp(a)) == a).all(), (w, h)


def test_bmp_layout_pinned_against_spec():
    """Byte-level check vs the BMP spec, independent of the encoder:
    bottom-up rows, BGR order, 4-byte row padding, 54-byte headers."""
    import numpy as np

    from rdf_to_text_spark.operators.multimodal import decode_bmp

    # 2x1 image (two rows, one column): top pixel BGR=(1,2,3),
    # bottom=(4,5,6). File stores BOTTOM row first, 3 bytes + 1 pad.
    pix = bytes([4, 5, 6, 0, 1, 2, 3, 0])
    hdr = (
        b"BM" + (54 + len(pix)).to_bytes(4, "little") + b"\x00" * 4 + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + (1).to_bytes(4, "little", signed=True)
        + (2).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(pix).to_bytes(4, "little") + b"\x00" * 16
    )
    img = decode_bmp(hdr + pix)
    assert img.shape == (2, 1, 3)
    assert img[0, 0].tolist() == [1, 2, 3]  # row 0 = TOP
    assert img[1, 0].tolist() == [4, 5, 6]


def test_decode_image_routes_bmp_without_pillow():
    import numpy as np

    from rdf_to_text_spark.operators.multimodal import encode_bmp

    a = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert (decode_image(encode_bmp(a)) == a).all()


def test_image_stats_weighted_sums(spark):
    """image_stats over real encoded BMPs matches a directly-computed
    weighted sum — and the weights catch geometry bugs (a row flip on
    the same pixels changes the result)."""
    import numpy as np

    from rdf_to_text_spark.operators.multimodal import encode_bmp, image_stats

    rng = np.random.RandomState(3)
    imgs = {i: rng.randint(0, 256, size=(1 + i % 3, 1 + i % 4, 3)).astype(np.uint8) for i in range(6)}
    media = spark.createDataFrame(
        [(i, "image", bytearray(encode_bmp(a)), ("image/bmp", a.shape[1], a.shape[0], None))
         for i, a in imgs.items()],
        MEDIA_SCHEMA,
    )
    got = {r.media_id: r for r in image_stats(media).collect()}
    flip_differs = 0
    for i, a in imgs.items():
        h, w, _ = a.shape
        wgt = 1 + np.arange(w)[None, :] + 7 * np.arange(h)[:, None]
        want = (a.astype(np.int64) * wgt[:, :, None]).sum(axis=(0, 1))
        assert (got[i].wsum_b, got[i].wsum_g, got[i].wsum_r) == tuple(int(v) for v in want)
        assert (got[i].width, got[i].height) == (w, h)
        flipped = (a[::-1].astype(np.int64) * wgt[:, :, None]).sum(axis=(0, 1))
        flip_differs += int(tuple(flipped) != tuple(want))
    assert flip_differs >= 4  # the statistic is geometry-sensitive
