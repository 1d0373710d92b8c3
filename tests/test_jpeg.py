"""Baseline JPEG codec (operators/jpeg.py).

The driver query (`multimodal_decode_jpeg`) hash-gates the DC-exact
envelope across all three structural modes; this module pins what the
arithmetic oracle can't reach: Huffman table validity, the nonzero-
chroma color path (replayed in pure python), lossy AC round-trip
bounds, restart resync, and the loud failures outside the documented
baseline scope. No Pillow exists in this container, so the independent
anchors are (a) the exactness envelope's closed-form pixels and (b)
entropy-coding bijectivity — a random-content round trip whose only
error is DCT rounding proves every coefficient survived the Huffman
layer exactly.
"""

from __future__ import annotations

import numpy as np
import pytest

from rdf_to_text_spark.operators.jpeg import (
    AC_CHROMA_BITS,
    AC_CHROMA_VALS,
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_CHROMA_BITS,
    DC_CHROMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    STD_QT_LUMA,
    _canonical_codes,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _tile_image(rng, h, w):
    tiles = rng.randint(0, 256, size=((h + 7) // 8, (w + 7) // 8))
    return np.repeat(np.repeat(tiles, 8, 0), 8, 1)[:h, :w].astype(np.uint8)


@pytest.mark.parametrize("hw", [(5, 6), (15, 18), (8, 8), (17, 23)])
def test_gray_tile_constant_exact(hw):
    h, w = hw
    img = _tile_image(np.random.RandomState(h * 31 + w), h, w)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (h, w, 1)
    assert np.array_equal(out[:, :, 0], img)


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
def test_color_neutral_chroma_exact(sub):
    img = _tile_image(np.random.RandomState(3), 15, 18)
    rgb = np.stack([img, img, img], axis=2)
    out = decode_jpeg(encode_jpeg(rgb, subsampling=sub))
    assert np.array_equal(out, rgb)


def test_restart_markers_resync_exact():
    img = _tile_image(np.random.RandomState(5), 24, 32)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(img, restart_interval=2))[:, :, 0], img
    )
    rgb = np.stack([img, img, img], axis=2)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(rgb, subsampling="4:2:0", restart_interval=1)),
        rgb,
    )


def test_huffman_tables_canonical_valid():
    """Every table builds prefix-free in-range canonical codes: codes
    fit their bit length, and no code is a prefix of a longer one."""
    for bits, vals in (
        (DC_LUMA_BITS, DC_LUMA_VALS),
        (DC_CHROMA_BITS, DC_CHROMA_VALS),
        (AC_LUMA_BITS, AC_LUMA_VALS),
        (AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        codes = _canonical_codes(bits, vals)
        assert len(codes) == len(vals)  # no duplicate symbols
        for code, length in codes.values():
            assert 0 <= code < (1 << length)
        items = sorted(codes.values(), key=lambda cl: cl[1])
        for i, (c1, l1) in enumerate(items):
            for c2, l2 in items[i + 1 :]:
                assert c2 >> (l2 - l1) != c1, "prefix collision"


def test_solid_color_matches_pure_python_replay():
    """Nonzero chroma: a solid color is DC-only in all three planes, so
    the decode is exactly encoder-rounded YCbCr pushed back through the
    decoder's YCbCr→RGB rounding — replayed here independently."""
    for color in [(200, 60, 90), (10, 250, 128), (77, 77, 200)]:
        rgb = np.zeros((10, 13, 3), np.uint8)
        rgb[:] = color
        r, g, b = (float(c) for c in color)
        y = np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)
        cb = np.floor(128 - 0.168736 * r - 0.331264 * g + 0.5 * b + 0.5)
        cr = np.floor(128 + 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5)
        want = np.clip(
            np.floor(
                np.array(
                    [
                        y + 1.402 * (cr - 128),
                        y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
                        y + 1.772 * (cb - 128),
                    ]
                )
                + 0.5
            ),
            0,
            255,
        ).astype(np.uint8)
        for sub in ("4:4:4", "4:2:0"):
            out = decode_jpeg(encode_jpeg(rgb, subsampling=sub))
            assert out.shape == (10, 13, 3)
            assert np.array_equal(out[0, 0], want), (color, sub, out[0, 0], want)
            assert (out == out[0, 0]).all()


def test_ac_content_roundtrip_bounds():
    """Real AC coefficients: flat table loses only DCT rounding (≤1/px
    gray, ≤3 through the color transform); the Annex-K table is lossy
    but bounded on smooth content."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(24, 31)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))[:, :, 0]
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1
    rgb = rng.randint(0, 256, size=(16, 21, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(rgb, subsampling="4:4:4"))
    # double rounding (RGB→YCbCr→RGB) plus per-plane DCT rounding
    # amplified by the 1.772/1.402 transform gains: 4 measured
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 4
    xx, yy = np.meshgrid(np.arange(32), np.arange(24))
    smooth = ((xx * 3 + yy * 2) % 200 + 20).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(smooth, qt_luma=STD_QT_LUMA))[:, :, 0]
    assert np.abs(out.astype(int) - smooth.astype(int)).max() <= 4


def test_out_of_scope_raises_loudly():
    img = _tile_image(np.random.RandomState(1), 8, 8)
    data = bytearray(encode_jpeg(img))
    # SOF0 -> SOF3 (lossless): explicit refusal, not garbage output
    sof = data.find(b"\xff\xc0")
    assert sof > 0
    data[sof + 1] = 0xC3
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(data))
    # SOF0 relabeled SOF2: the baseline SOS (Ss=0, Se=63) is an illegal
    # progressive DC band — loud refusal, not a silent misdecode
    data[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG not a jpeg")
    # truncated scan: clean error, not silent partial decode
    full = encode_jpeg(_tile_image(np.random.RandomState(2), 24, 24))
    with pytest.raises(ValueError):
        decode_jpeg(full[: len(full) - len(full) // 4])


def test_decode_image_routes_jpeg_bgr():
    """multimodal.decode_image: FFD8 magic → jpeg codec, gray
    replicated to 3 channels, RGB flipped to BGR like the BMP path."""
    from rdf_to_text_spark.operators.multimodal import decode_image

    img = _tile_image(np.random.RandomState(9), 8, 16)
    out = decode_image(encode_jpeg(img))
    assert out.shape == (8, 16, 3)
    assert np.array_equal(out[:, :, 0], img) and (out[:, :, 0] == out[:, :, 2]).all()
    rgb = np.zeros((8, 8, 3), np.uint8)
    rgb[:] = (200, 60, 90)
    bgr = decode_image(encode_jpeg(rgb))
    rt = decode_jpeg(encode_jpeg(rgb))
    assert np.array_equal(bgr, rt[:, :, ::-1])


def test_progressive_roundtrip_matches_baseline_decode():
    # Progressive is a reordering of the SAME quantized coefficients, so
    # decode(progressive(px)) must be pixel-identical to
    # decode(baseline(px)) — both scan scripts (spectral-only al=0 and
    # successive-approximation al=1), gray + RGB, 4:4:4 + 4:2:0,
    # non-multiple-of-8/16 dims (non-interleaved grid ≠ padded grid).
    rng = np.random.default_rng(7)
    cases = [
        rng.integers(0, 256, size=(13, 21), dtype=np.uint8),
        rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8),
    ]
    gy, gx = np.mgrid[0:24, 0:40]
    cases.append(((gy * 3 + gx * 2) % 256).astype(np.uint8))
    for px in cases:
        subs = ["4:4:4"] + (["4:2:0"] if px.ndim == 3 else [])
        for sub in subs:
            base = decode_jpeg(encode_jpeg(px, subsampling=sub))
            for al in (0, 1):
                prog = decode_jpeg(
                    encode_jpeg_progressive(px, subsampling=sub, al=al)
                )
                assert np.array_equal(base, prog), (px.shape, sub, al)


def test_progressive_stream_is_sof2_multiscan():
    px = np.full((16, 16, 3), 77, dtype=np.uint8)
    data = encode_jpeg_progressive(px)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data
    # scan script: DC first + 2 AC bands × 3 comps + DC refine + 3 AC refine
    assert data.count(b"\xff\xda") == 1 + 6 + 1 + 3


def test_progressive_rejects_bad_al():
    import pytest as _p

    with _p.raises(ValueError, match="al"):
        encode_jpeg_progressive(np.zeros((8, 8), np.uint8), al=2)
