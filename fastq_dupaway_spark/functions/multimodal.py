"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side mechanics (schema, partition sizing, Arrow batch shape,
UDF signatures) are real and tested; the actual codec work is stubbed —
this container has no image/audio libraries — behind `_decode_stub`,
which is deterministic so tests can assert end-to-end. Swap `_decode_stub`
for a PIL/ffmpeg call on a real cluster; nothing else changes.

Design notes for 100 TB:
- binary payloads dominate row size -> keep them OUT of shuffles: all
  feature extraction is a narrow mapInPandas directly over the scan, and
  only the (small) feature columns continue into joins/aggregations;
- `spark.sql.files.maxPartitionBytes` (not row count) governs task sizing
  when payloads are MBs; callers should also set a low
  `arrow.maxRecordsPerBatch` so one Arrow batch of images fits in memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 16


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for decode + embed: folds the payload digest
    into FEATURE_DIM floats in [0,1). Replace with a real decoder
    (PIL.Image.open / soundfile / pyav frame sampling) in production —
    raise NotImplementedError here if accidental prod use must be loud."""
    digest = hashlib.sha256(kind.encode() + payload).digest()
    arr = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16)
    return (arr / 65536.0).astype(np.float32)


def extract_features(media: DataFrame, batch_rows: int = 64) -> DataFrame:
    """Narrow mapInPandas: payload -> (content_hash, feature vector).
    No shuffle; payload bytes never leave the scan stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p if p is not None else b"", k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content_hash": [
                        hashlib.sha256(p or b"").hexdigest() for p in pdf["payload"]
                    ],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def exact_media_dedup(media: DataFrame) -> DataFrame:
    """(media_id, rep_media_id) by payload content hash — the binary-column
    twin of the transcript exact detector."""
    from pyspark.sql import Window

    hashed = media.select(
        "media_id", F.sha2(F.col("payload"), 256).alias("h")
    )
    w = Window.partitionBy("h")
    return hashed.select(
        "media_id", F.min("media_id").over(w).alias("rep_media_id")
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per planned frame
    (media_id, frame_idx, offset_ms). The decode itself is the stubbed
    stage; the plan explode is pure column math and shuffles nothing."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        (F.col("duration_ms") / every_ms).cast("int") - 1,
                        F.lit(0),
                    ),
                )
            ).alias("frame_idx"),
        )
        .withColumn("offset_ms", F.col("frame_idx") * every_ms)
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _resize_stub(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Deterministic stand-in for the pixel resample: out_w*out_h bytes
    tiled from the payload digest. Replace with PIL.Image.thumbnail /
    cv2.resize in production — the surrounding plumbing (dimension math,
    Arrow batch shape, narrow plan) is the tested part."""
    n = out_w * out_h
    digest = hashlib.sha256(payload).digest()
    return (digest * (n // len(digest) + 1))[:n]


def resize_images(
    media: DataFrame, max_w: int = 256, max_h: int = 256
) -> DataFrame:
    """Aspect-fit image resize plumbing: target dimensions are exact JVM
    column math (scale = min(max_w/w, max_h/h, 1) — never upscale, floor
    to >= 1 px); the resample itself runs in a narrow mapInPandas over
    the scan (payload bytes never shuffle) via the stubbed codec stage."""
    imgs = (
        media.where(
            (F.col("kind") == "image")
            # > 0, not just NOT NULL: this session runs ANSI mode, where a
            # zero dimension would raise DIVIDE_BY_ZERO in the scale expr
            # and fail the stage; corrupt-metadata rows are skipped instead
            & (F.col("width") > 0)
            & (F.col("height") > 0)
        )
        .withColumn(
            "scale",
            F.least(
                F.lit(max_w) / F.col("width"),
                F.lit(max_h) / F.col("height"),
                F.lit(1.0),
            ),
        )
        .select(
            "media_id",
            "width",
            "height",
            F.greatest(
                F.floor(F.col("width") * F.col("scale")).cast("int"), F.lit(1)
            ).alias("out_width"),
            F.greatest(
                F.floor(F.col("height") * F.col("scale")).cast("int"),
                F.lit(1),
            ).alias("out_height"),
            "payload",
        )
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                _resize_stub(p or b"", w, h)
                for p, w, h in zip(
                    pdf["payload"], pdf["out_width"], pdf["out_height"]
                )
            ]
            yield pdf

    return imgs.mapInPandas(run, RESIZE_SCHEMA)


def synthetic_media(spark, n: int = 24) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media{i // 2}".encode()).digest() * 8
        rows.append(
            (
                f"m{i:04d}",
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                bytearray(payload),
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                5000 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
