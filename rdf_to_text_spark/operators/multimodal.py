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
    """STUB: real pipelines plug Pillow/libjpeg here.

    Raises so nobody mistakes the fake path for a real decoder.
    """
    raise NotImplementedError("image decode requires Pillow/libjpeg (not in this container)")


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
