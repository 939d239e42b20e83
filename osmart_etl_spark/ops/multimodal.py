"""Multimodal column plumbing (BASELINE.json extension surface).

Design: image/audio/video payloads are opaque ``binary`` columns with
typed metadata alongside (media_type, width/height/duration, codec).
The Spark-side contract — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested; the actual codec work is stubbed
behind ``DECODERS`` because media libraries aren't available in this
container (each stub either raises NotImplementedError or produces a
deterministic fake, clearly marked).

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
