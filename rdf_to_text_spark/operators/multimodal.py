"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
UDFs over ``mapInPandas``. The decode kernels themselves are STUBBED
(no image/audio libraries in this container — clearly marked below);
the Spark-side plumbing (schema, batch shape, partition sizing) is
real and tested with a deterministic fake decoder.

Scale notes: binary payloads dominate row size, so
``spark.sql.files.maxPartitionBytes`` (128 MB) — not row count — sizes
the tasks; the metadata struct lets filters prune before any decode.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("n_bytes", IntegerType()),
    ]
)


def decode_image(payload: bytes) -> "np.ndarray":
    """Decode an image payload to an (h, w, 3) uint8 array, BGR order.

    Real kernels, guarded by format: uncompressed 24-bit BMP decodes in
    pure numpy (:func:`decode_bmp` — no codec library needed, exercised
    end-to-end by the `multimodal_decode_bmp` driver query) and PNG
    decodes through the pure-stdlib zlib + unfilter codec
    (operators/png.py — all five scanline filters; gray replicated to
    3 channels, alpha dropped, RGB flipped to BGR here so every format
    lands in one layout); baseline-sequential JPEG — the dominant real
    web-corpus format — decodes through the pure-numpy Huffman + IDCT
    codec (operators/jpeg.py, exercised end-to-end by the
    `multimodal_decode_jpeg` query); any other format (progressive
    JPEG, WebP, GIF, …) routes through Pillow when importable. Without
    Pillow such a payload still raises loudly — nobody should mistake
    a stub for a decoder.
    """
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from .png import decode_png

        px = decode_png(payload)
        if px.shape[2] == 1:
            px = np.repeat(px, 3, axis=2)
        return px[:, :, 2::-1].copy()  # RGB(A) → BGR, alpha dropped
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        px = decode_jpeg(payload)
        if px.shape[2] == 1:
            px = np.repeat(px, 3, axis=2)
        return px[:, :, ::-1].copy()  # RGB → BGR, matching decode_bmp
    try:
        from io import BytesIO

        from PIL import Image  # optional: absent in this container
    except ImportError as exc:
        raise NotImplementedError(
            "non-BMP/PNG/baseline-JPEG image decode requires Pillow "
            "(not in this container)"
        ) from exc
    rgb = np.asarray(Image.open(BytesIO(payload)).convert("RGB"), dtype=np.uint8)
    return rgb[:, :, ::-1].copy()  # RGB → BGR, matching decode_bmp


def _fake_feature(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a decoded-media embedding: byte
    histogram folded to `dim` — keeps the plumbing testable."""
    arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype("float64")
    total = hist.sum() or 1.0
    return (hist / total).astype("float32")


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """media(media_id, kind, payload, meta) → per-item feature vectors.

    Arrow batches in/out; the kernel is `_fake_feature` until a real
    decoder is plugged in (same signature, same batch shape).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_feature(p, dim).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("target_w", IntegerType()),
        StructField("target_h", IntegerType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", IntegerType()),
    ]
)


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize plumbing: aspect-preserving clamp of the longest
    side to `max_side`, never upscaling.

    The TARGET GEOMETRY is computed engine-side (codegen, prunable
    before any payload is touched — e.g. filter out rows already small
    enough); only the byte kernel runs in Python. That kernel is a
    deterministic STUB (a strided byte subsample at the same area ratio
    a real resampler would produce) until Pillow exists in the runtime —
    same signature, same Arrow batch shape, loudly marked like
    :func:`decode_image`.
    """
    w, h = F.col("meta.width"), F.col("meta.height")
    longest = F.greatest(w, h)
    scale = F.when(longest > max_side, F.lit(max_side) / longest).otherwise(F.lit(1.0))
    planned = media.filter(F.col("kind") == "image").select(
        "media_id",
        w.alias("width"),
        h.alias("height"),
        F.greatest(F.floor(w * scale), F.lit(1)).cast("int").alias("target_w"),
        F.greatest(F.floor(h * scale), F.lit(1)).cast("int").alias("target_h"),
        "payload",
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads, out_bytes = [], []
            for p, ww, hh, tw, th in zip(
                pdf["payload"], pdf["width"], pdf["height"], pdf["target_w"], pdf["target_h"]
            ):
                p = p or b""
                area_ratio = (tw * th) / max(ww * hh, 1)
                n_out = max(int(len(p) * area_ratio), 1) if p else 0
                # STUB kernel: strided byte subsample (deterministic);
                # a real build replaces this one expression with
                # Pillow's resize over decode_image(p)
                step = max(len(p) // n_out, 1) if n_out else 1
                q = p[::step][:n_out]
                out_payloads.append(q)
                out_bytes.append(len(q))
            pdf = pdf.copy()
            pdf["payload"] = out_payloads
            pdf["n_bytes"] = out_bytes
            yield pdf

    return planned.mapInPandas(run, RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms).

    Pure engine arithmetic over metadata (no decode): downstream
    decoders consume the plan; filters on meta prune before any
    payload is touched.
    """
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


# ======================================================== real BMP codec
# A REAL decoder the container can run: uncompressed 24-bit BMP
# (BITMAPFILEHEADER + BITMAPINFOHEADER, BI_RGB) in pure numpy. This is
# the one raster format whose decode is arithmetic, not a codec library
# — so the decode path stops being a stub without Pillow. JPEG/PNG still
# route through Pillow when present (see decode_image).


def encode_bmp(arr: "np.ndarray") -> bytes:
    """Encode an (h, w, 3) uint8 array (BGR channel order, row 0 = top)
    as an uncompressed 24-bit BMP: bottom-up pixel rows, each padded to
    a 4-byte boundary."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3), got {a.shape}")
    h, w, _ = a.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up storage
        rows.append(a[y].tobytes() + b"\x00" * pad)
    pixel_data = b"".join(rows)
    offset = 14 + 40
    size = offset + len(pixel_data)
    file_header = b"BM" + size.to_bytes(4, "little") + b"\x00" * 4 + offset.to_bytes(4, "little")
    info_header = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)  # positive = bottom-up
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB (uncompressed)
        + len(pixel_data).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return file_header + info_header + pixel_data


def decode_bmp(payload: bytes) -> "np.ndarray":
    """Decode an uncompressed 24-bit BMP to (h, w, 3) uint8, BGR order,
    row 0 = top. Pure numpy — no codec library. Handles 4-byte row
    padding and both bottom-up (height > 0) and top-down (height < 0)
    storage."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={compression})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    data = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=offset)
    rows = data.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    return rows[::-1].copy() if bottom_up else rows.copy()


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("wsum_b", LongType()),
        StructField("wsum_g", LongType()),
        StructField("wsum_r", LongType()),
        StructField("n_bytes", IntegerType()),
    ]
)


def image_stats(media: DataFrame) -> DataFrame:
    """Per-image position-weighted channel sums from REAL payload decode:
    wsum_c = Σ_{x,y} (1 + x + 7y) * channel_c(x, y), integers.

    The weights make the statistic sensitive to pixel POSITION, not just
    the value multiset — a decoder that flipped rows (bottom-up
    mishandling), ignored row padding, or swapped channels produces a
    different sum, so an arithmetic oracle over the constructed pixels
    pins the geometry of the decode, not merely its histogram. One
    Arrow-batched mapInPandas; metadata-only filters prune before any
    payload is touched (same scale shape as extract_features).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                img = decode_image(bytes(p)).astype(np.int64)
                h, w, _ = img.shape
                wgt = 1 + np.arange(w)[None, :] + 7 * np.arange(h)[:, None]
                sums = (img * wgt[:, :, None]).sum(axis=(0, 1))
                rows.append(
                    (int(mid), w, h, int(sums[0]), int(sums[1]), int(sums[2]), len(p))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height",
                    "wsum_b", "wsum_g", "wsum_r", "n_bytes",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(run, IMAGE_STATS_SCHEMA)
