"""Pure-stdlib PNG codec (operators/png.py).

Round-trips, all five scanline filters (hand-built compressed streams
— the encoder only emits filter 0), container cross-check vs the BMP
codec, and scope guards.
"""

import struct
import zlib

import numpy as np
import pytest

from rdf_to_text_spark.operators.png import _SIG, _chunk, decode_png, encode_png


def _rand(shape, seed):
    return np.random.RandomState(seed).randint(0, 256, size=shape, dtype=np.int64).astype(np.uint8)


@pytest.mark.parametrize(
    "shape", [(5, 7, 3), (1, 1, 3), (4, 4, 4), (3, 9), (2, 2, 4)]
)
def test_roundtrip(shape):
    px = _rand(shape, sum(shape))
    got = decode_png(encode_png(px))
    want = px[:, :, None] if px.ndim == 2 else px
    assert got.shape == want.shape
    assert np.array_equal(got, want)


def _png_with_filters(px, filters):
    """Build a PNG whose scanlines use the GIVEN filter types, computing
    each filtered line independently of the decoder under test."""
    h, w, ch = px.shape
    prev = np.zeros(w * ch, dtype=np.uint8)
    lines = []
    for y in range(h):
        recon = px[y].reshape(w * ch)
        f = filters[y]
        if f == 0:
            filt = recon.copy()
        elif f == 1:  # Sub: raw[x] = recon[x] - recon[x-ch]
            shifted = np.concatenate([np.zeros(ch, np.uint8), recon[:-ch]])
            filt = recon - shifted
        elif f == 2:  # Up
            filt = recon - prev
        elif f == 3:  # Average
            filt = np.empty_like(recon)
            for x in range(w):
                left = recon[(x - 1) * ch : x * ch] if x else np.zeros(ch, np.uint8)
                up = prev[x * ch : (x + 1) * ch]
                avg = (left.astype(np.int16) + up.astype(np.int16)) // 2
                filt[x * ch : (x + 1) * ch] = recon[x * ch : (x + 1) * ch] - avg.astype(np.uint8)
        elif f == 4:  # Paeth
            filt = np.empty_like(recon)
            for x in range(w):
                left = recon[(x - 1) * ch : x * ch] if x else np.zeros(ch, np.uint8)
                up = prev[x * ch : (x + 1) * ch]
                ul = prev[(x - 1) * ch : x * ch] if x else np.zeros(ch, np.uint8)
                a, b, c = (v.astype(np.int16) for v in (left, up, ul))
                p = a + b - c
                pred = np.where(
                    (np.abs(p - a) <= np.abs(p - b)) & (np.abs(p - a) <= np.abs(p - c)),
                    left,
                    np.where(np.abs(p - b) <= np.abs(p - c), up, ul),
                ).astype(np.uint8)
                filt[x * ch : (x + 1) * ch] = recon[x * ch : (x + 1) * ch] - pred
        lines.append(bytes([f]) + filt.tobytes())
        prev = recon
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def test_all_five_filters_decode():
    px = _rand((5, 6, 3), 99)
    data = _png_with_filters(px, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(data), px)


def test_filter_fuzz_random_assignment():
    rng = np.random.RandomState(5)
    for _ in range(20):
        h, w, ch = rng.randint(1, 8), rng.randint(1, 8), int(rng.choice([1, 3, 4]))
        px = _rand((h, w, ch), int(rng.randint(0, 1 << 31)))
        filters = [int(f) for f in rng.randint(0, 5, size=h)]
        assert np.array_equal(decode_png(_png_with_filters(px, filters)), px), filters


def test_gray_roundtrip_channel_dim():
    px = _rand((6, 4), 3)
    out = decode_png(encode_png(px))
    assert out.shape == (6, 4, 1)
    assert np.array_equal(out[:, :, 0], px)


def test_multiple_idat_chunks():
    px = _rand((3, 3, 3), 7)
    data = encode_png(px)
    # split the single IDAT payload into two chunks
    ihdr_end = 8 + 12 + 13
    (ln,) = struct.unpack(">I", data[ihdr_end : ihdr_end + 4])
    payload = data[ihdr_end + 8 : ihdr_end + 8 + ln]
    rebuilt = (
        data[:ihdr_end]
        + _chunk(b"IDAT", payload[:5])
        + _chunk(b"IDAT", payload[5:])
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(rebuilt), px)


def test_cross_container_bmp_png_agree():
    from rdf_to_text_spark.operators.multimodal import decode_bmp, encode_bmp

    px = _rand((5, 4, 3), 21)
    assert np.array_equal(decode_png(encode_png(px)), decode_bmp(encode_bmp(px)))


def test_scope_guards():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    px = _rand((2, 2, 3), 1)
    data = bytearray(encode_png(px))
    data[8 + 8 + 8] = 16  # IHDR bit depth byte -> 16
    with pytest.raises(ValueError):
        decode_png(bytes(data))


@pytest.mark.parametrize("ft", [0, 1, 2])
@pytest.mark.parametrize("shape", [(4, 5, 3), (1, 3, 4), (6, 1), (3, 3, 3)])
def test_roundtrip_encoder_filters(ft, shape):
    px = _rand(shape, ft * 100 + sum(shape))
    got = decode_png(encode_png(px, filter_type=ft))
    want = px[:, :, None] if px.ndim == 2 else px
    assert np.array_equal(got, want)


def test_encoder_rejects_unsupported_filter():
    with pytest.raises(ValueError):
        encode_png(_rand((2, 2, 3), 0), filter_type=4)
