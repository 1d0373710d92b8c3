"""Pure-stdlib PNG codec (numpy + zlib — no Pillow).

Closes the remaining real-image-decode gap next to the BMP codec in
operators/multimodal.py: PNG is the second container a user's corpus
actually contains, and its whole stack — chunk framing, zlib inflate,
scanline unfiltering — is expressible with the stdlib `zlib` plus
numpy, so the engine can decode REAL files in this container without
any optional dependency.

Scope (stated plainly): 8-bit depth, color types 0 (grayscale),
2 (RGB) and 6 (RGBA); no interlace (Adam7 raises), no palette, no
16-bit. All five scanline filters are decoded: None/Up are fully
vectorized per row, Sub is a per-channel modular cumsum, Average and
Paeth walk pixels within the row (they have an intra-row left
dependency) with numpy math across channels — fine for the thumbnail/
tile sizes a feature-extract stage sees; whole-image work stays inside
one Arrow batch in the mapInPandas kernels of multimodal.py.

The encoder always emits filter 0 (None) scanlines — it exists to
CONSTRUCT deterministic fixtures and sinks, not to compress well.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W) uint8 gray, or (H, W, 3|4) uint8 RGB/RGBA → PNG bytes
    (8-bit, one IDAT). ``filter_type`` picks the scanline filter for
    EVERY row: 0 None (default), 1 Sub, 2 Up — the three filters with a
    vectorized forward form; fixtures use them to force the decoder
    through its unfiltering paths (Average/Paeth are covered by the
    hand-built streams in tests)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        color_type, ch = 0, 1
        px = px[:, :, None]
    elif px.ndim == 3 and px.shape[2] == 3:
        color_type, ch = 2, 3
    elif px.ndim == 3 and px.shape[2] == 4:
        color_type, ch = 6, 4
    else:
        raise ValueError(f"unsupported pixel shape {px.shape}")
    if filter_type not in (0, 1, 2):
        raise ValueError("encoder supports filter types 0 (None), 1 (Sub), 2 (Up)")
    h, w = px.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    flat = px.reshape(h, w * ch)
    raw = np.empty((h, 1 + w * ch), dtype=np.uint8)
    raw[:, 0] = filter_type
    if filter_type == 0:
        raw[:, 1:] = flat
    elif filter_type == 1:  # Sub: raw[x] = recon[x] - recon[x-bpp] (mod 256)
        raw[:, 1 : 1 + ch] = flat[:, :ch]
        raw[:, 1 + ch :] = flat[:, ch:] - flat[:, :-ch]
    else:  # Up: raw = recon - prev_row (mod 256); first row vs zeros
        raw[0, 1:] = flat[0]
        raw[1:, 1:] = flat[1:] - flat[:-1]
    idat = zlib.compress(raw.tobytes(), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, elementwise over int16+ arrays."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W, C) uint8 (C = 1 gray / 3 RGB / 4 RGBA).

    Real decoder: walks chunks, inflates the concatenated IDAT stream,
    reverses the per-scanline filter. Raises ValueError on anything
    outside the documented scope rather than guessing.
    """
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + payload + crc
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth} (8 only)")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type} (0/2/6)")
            if interlace != 0:
                raise ValueError("Adam7 interlace not supported")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    ch = _CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = 1 + width * ch
    if raw.size != height * stride:
        raise ValueError(
            f"decompressed size {raw.size} != {height}x{stride} scanlines"
        )
    raw = raw.reshape(height, stride)
    filters = raw[:, 0]
    out = np.zeros((height, width * ch), dtype=np.uint8)
    prev = np.zeros(width * ch, dtype=np.uint8)
    for y in range(height):
        f = int(filters[y])
        line = raw[y, 1:].copy()
        if f == 0:  # None
            recon = line
        elif f == 1:  # Sub: per-channel modular cumsum along the row
            recon = (
                np.cumsum(line.reshape(width, ch).astype(np.uint64), axis=0) % 256
            ).astype(np.uint8).reshape(width * ch)
        elif f == 2:  # Up — fully vectorized
            recon = line + prev  # uint8 wraps mod 256
        elif f == 3:  # Average: left/2 + up/2 floor — intra-row dependency
            recon = np.empty_like(line)
            for x in range(width):
                left = recon[(x - 1) * ch : x * ch] if x else np.zeros(ch, np.uint8)
                up = prev[x * ch : (x + 1) * ch]
                avg = (left.astype(np.int16) + up.astype(np.int16)) // 2
                recon[x * ch : (x + 1) * ch] = (
                    line[x * ch : (x + 1) * ch] + avg.astype(np.uint8)
                )
        elif f == 4:  # Paeth — intra-row dependency
            recon = np.empty_like(line)
            zero = np.zeros(ch, np.uint8)
            for x in range(width):
                left = recon[(x - 1) * ch : x * ch] if x else zero
                up = prev[x * ch : (x + 1) * ch]
                ul = prev[(x - 1) * ch : x * ch] if x else zero
                recon[x * ch : (x + 1) * ch] = line[
                    x * ch : (x + 1) * ch
                ] + _paeth(left, up, ul)
        else:
            raise ValueError(f"bad filter byte {f} on scanline {y}")
        out[y] = recon
        prev = recon
    return out.reshape(height, width, ch)
