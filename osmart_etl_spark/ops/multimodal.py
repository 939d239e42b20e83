"""Multimodal column plumbing (BASELINE.json extension surface).

Design: image/audio/video payloads are opaque ``binary`` columns with
typed metadata alongside (media_type, width/height/duration, codec).
The Spark-side contract — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested.

Two tiers of codec honesty:

- RAW formats are implemented FOR REAL in pure numpy: ``raw-image``
  payloads (row-major uint8 H×W×C) decode, nearest-neighbor resize,
  and featurize; ``raw-video`` (concatenated raw frames) frame-samples
  — see ``decode_raw_image`` / ``resize_nearest`` / ``sample_frames``
  and the ``resize_raw_images`` operator.
- COMPRESSED formats (jpeg/png/mp3/h264…) need PIL/libsndfile/ffmpeg,
  absent from this container — those paths are stubbed behind
  ``DECODERS`` (each stub either raises NotImplementedError or
  produces a deterministic fake, clearly marked).

Scale notes: decode/resize/feature-extract run as ``mapInPandas`` —
Arrow-batched, one Python worker per partition, no shuffle; the binary
column never passes through a groupBy. Frame sampling and resizing
change only batch WIDTH, so ``spark.sql.execution.arrow.
maxRecordsPerBatch`` bounds worker memory against large payloads.
Payload skew (one 4 GB video among thumbnails) is handled upstream by
size-bucketed repartitioning on ``n_bytes``.
"""

from __future__ import annotations

from collections.abc import Iterator

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
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("meta_width", IntegerType(), True),
        StructField("meta_height", IntegerType(), True),
        StructField("meta_duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("feature", ArrayType(FloatType()), True),
        StructField("decode_status", StringType(), False),
    ]
)


def decode_raw_image(
    payload: bytes, width: int, height: int, channels: int = 1
) -> np.ndarray:
    """REAL decode for the raw uint8 format: row-major H×W×C bytes
    (the layout of PPM/PGM sans header, or any framebuffer dump)."""
    expected = width * height * channels
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size < expected:
        raise ValueError(
            f"raw image payload too short: {arr.size} < {expected} "
            f"({height}x{width}x{channels})"
        )
    return arr[:expected].reshape(height, width, channels)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """REAL nearest-neighbor resize via index gather — pure numpy, no
    interpolation library needed; deterministic (floor sampling grid)."""
    h, w = img.shape[0], img.shape[1]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return img[rows][:, cols]


def sample_frames(
    payload: bytes, frame_bytes: int, every_k: int
) -> list[bytes]:
    """REAL frame sampling for raw video = concatenated raw frames:
    every k-th complete frame, trailing partial bytes dropped."""
    n = len(payload) // frame_bytes
    return [
        payload[i * frame_bytes : (i + 1) * frame_bytes]
        for i in range(0, n, every_k)
    ]


def _decode_raw_image_feature(payload: bytes, meta: dict) -> np.ndarray:
    """REAL featurizer for raw images: per-quadrant means (2×2 grid
    pooled over a nearest-resized 8×8), normalized to [0,1]."""
    img = decode_raw_image(
        payload, meta["width"], meta["height"], meta.get("channels", 1)
    )
    small = resize_nearest(img, 8, 8).astype(np.float64).mean(axis=2)
    quads = [
        small[:4, :4].mean(), small[:4, 4:].mean(),
        small[4:, :4].mean(), small[4:, 4:].mean(),
    ]
    return np.array(quads, dtype=np.float32) / 255.0


def _fake_decode_image(payload: bytes) -> np.ndarray:
    """STUB — deterministic fake decoder: a real implementation calls
    PIL/opencv here. The fake derives an 8-dim feature from payload
    bytes so the plumbing (batching, schema, determinism) is testable."""
    arr = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8).astype(np.float32)
    return arr.reshape(8, 8).mean(axis=1) / 255.0


def _fake_decode_audio(payload: bytes) -> np.ndarray:
    """STUB — a real implementation calls soundfile/librosa here."""
    arr = np.frombuffer(payload[:32].ljust(32, b"\0"), dtype=np.uint8).astype(np.float32)
    return arr.reshape(4, 8).std(axis=1) / 255.0


def _decode_video(payload: bytes) -> np.ndarray:
    """STUB — video decode requires ffmpeg bindings, absent here."""
    raise NotImplementedError("video decode requires ffmpeg (not in container)")


DECODERS = {
    "image": _fake_decode_image,
    "audio": _fake_decode_audio,
    "video": _decode_video,
}


def resize_raw_images(media: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """REAL resize operator over ``mapInPandas``: raw-image payloads are
    decoded (uint8 H×W×C), nearest-neighbor resized, and re-emitted as
    raw payloads with updated metadata; every other media_type passes
    through untouched with status 'passthrough'. Arrow-batched, one
    Python worker pass per partition, no shuffle; undecodable rows are
    captured into ``resize_status`` instead of failing the job."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("media_type", StringType(), False),
            StructField("payload", BinaryType(), True),
            StructField("n_bytes", LongType(), True),
            StructField("meta_width", IntegerType(), True),
            StructField("meta_height", IntegerType(), True),
            StructField("resize_status", StringType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "media_type", "payload", "n_bytes",
                    "meta_width", "meta_height", "resize_status")}
            for _, row in pdf.iterrows():
                out["media_id"].append(row["media_id"])
                out["media_type"].append(row["media_type"])
                if row["media_type"] != "raw-image" or row["payload"] is None:
                    out["payload"].append(row["payload"])
                    out["n_bytes"].append(row["n_bytes"])
                    out["meta_width"].append(row["meta_width"])
                    out["meta_height"].append(row["meta_height"])
                    out["resize_status"].append("passthrough")
                    continue
                try:
                    img = decode_raw_image(
                        bytes(row["payload"]),
                        int(row["meta_width"]),
                        int(row["meta_height"]),
                    )
                    resized = resize_nearest(img, out_h, out_w)
                    pay = resized.tobytes()
                    out["payload"].append(pay)
                    out["n_bytes"].append(len(pay))
                    out["meta_width"].append(out_w)
                    out["meta_height"].append(out_h)
                    out["resize_status"].append("ok")
                except ValueError:
                    out["payload"].append(None)
                    out["n_bytes"].append(None)
                    out["meta_width"].append(row["meta_width"])
                    out["meta_height"].append(row["meta_height"])
                    out["resize_status"].append("decode_error")
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=out_schema)


def make_synthetic_raw_media(spark, n: int = 24) -> DataFrame:
    """Raw-format synthetic media: raw-image rows carry genuine
    row-major uint8 payloads (16×12 deterministic gradients), raw-video
    rows concatenate 10 raw 4×4 frames. Decodable FOR REAL by the
    numpy raw codecs above — no stub in this path."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            w, h = 16, 12
            img = np.add.outer(
                np.arange(h, dtype=np.uint16) * 3 + i,
                np.arange(w, dtype=np.uint16) * 5,
            ) % 256
            payload = img.astype(np.uint8).tobytes()
            rows.append((i, "raw-image", payload, len(payload), w, h, None))
        else:
            frame = bytes(((i * 11 + j) % 256 for j in range(16)))
            payload = frame * 10
            rows.append((i, "raw-video", payload, len(payload), 4, 4, 400))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(media: DataFrame, batch_size_hint: int = 64) -> DataFrame:
    """Decode + feature-extract over ``mapInPandas``.

    Per-row failures (unsupported type, stub NotImplementedError) are
    captured into ``decode_status`` instead of failing the job — media
    corpora always contain undecodable items, and a 100 TB job must not
    die at row 3 billion."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, statuses = [], []
            for _, row in pdf.iterrows():
                # REAL path: raw images featurize via the numpy codec
                if (
                    row["media_type"] == "raw-image"
                    and row["payload"] is not None
                    and row["meta_width"] is not None
                ):
                    try:
                        f = _decode_raw_image_feature(
                            bytes(row["payload"]),
                            {
                                "width": int(row["meta_width"]),
                                "height": int(row["meta_height"]),
                            },
                        )
                        feats.append([float(x) for x in f])
                        statuses.append("ok")
                    except ValueError:
                        feats.append(None)
                        statuses.append("decode_error")
                    continue
                decoder = DECODERS.get(row["media_type"])
                if decoder is None or row["payload"] is None:
                    feats.append(None)
                    statuses.append("no_decoder")
                    continue
                try:
                    feats.append([float(x) for x in decoder(bytes(row["payload"]))])
                    statuses.append("ok")
                except NotImplementedError:
                    feats.append(None)
                    statuses.append("stub_not_implemented")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                    "decode_status": statuses,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata analytics stay JVM-side — no decode needed: the
    binary column is never touched, so column pruning keeps payload
    bytes out of the scan entirely."""
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )


def make_synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests (payload = seeded
    bytes). Kept in the engine so tests and demos share one generator."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes((i * 7 + j) % 256 for j in range(128))
        rows.append((i, kind, payload, len(payload), 8 if kind == "image" else None,
                     8 if kind == "image" else None,
                     1000 if kind != "image" else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
