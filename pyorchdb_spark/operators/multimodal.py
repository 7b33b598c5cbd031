"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata structs; the
Spark-side plumbing — schema, partitioning, ``mapInPandas`` batch shape,
feature-vector output — is real and tested. The actual codec step is
STUBBED (no image/audio libraries in this container): ``decode_media``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic hash-derived feature vector stands in for decoded features
so the distributed pipeline around it can be exercised end-to-end.

Schema convention:

    media(media_id long, kind string, meta struct<width:int, height:int,
          sample_rate:int, duration_ms:int>, payload binary)

Scale notes: payloads ride Arrow in bounded batches
(``spark.sql.execution.arrow.maxRecordsPerBatch``); feature extraction is
embarrassingly parallel (``mapInPandas`` — no shuffle); downstream joins
use ``media_id`` only, so Catalyst prunes the heavy payload column out of
any plan that doesn't touch it.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA_DDL = (
    "media_id long, kind string, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>, "
    "payload binary"
)

FEATURE_SCHEMA_DDL = "media_id long, kind string, n_bytes long, features array<float>"

FEATURE_DIM = 16


def synth_media(spark: SparkSession, n: int = 64, num_partitions: int | None = None) -> DataFrame:
    """Deterministic fake media table (payload = seeded pseudo-bytes)."""
    parts = num_partitions or spark.sparkContext.defaultParallelism
    kinds = F.element_at(
        F.lit(["image", "audio", "video"]),
        (F.pmod(F.xxhash64("id", F.lit("kind")), F.lit(3)) + 1).cast("int"),
    )
    payload = F.unbase64(
        F.substring(F.base64(F.sha2(F.col("id").cast("string"), 512).cast("binary")), 1, 88)
    )
    return spark.range(0, n, 1, parts).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        F.struct(
            (F.pmod(F.xxhash64("id", F.lit("w")), F.lit(1920)) + 1).cast("int").alias("width"),
            (F.pmod(F.xxhash64("id", F.lit("h")), F.lit(1080)) + 1).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.pmod(F.xxhash64("id", F.lit("d")), F.lit(60000)) + 1).cast("int").alias("duration_ms"),
        ).alias("meta"),
        payload.alias("payload"),
    )


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: sha256 → 16 floats."""
    d = hashlib.sha256(payload).digest()
    return (np.frombuffer(d[:FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32) / 65535.0)


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """payload → feature vector via ``mapInPandas`` (Arrow batch iterator).

    The real decode path requires codec libraries (PIL/ffmpeg/torchaudio)
    that are NOT available here — it raises ``NotImplementedError``.
    ``fake=True`` substitutes the deterministic hash features, keeping the
    batch shape, schema, and partitioning identical to the real path.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs unavailable in this environment; "
                    "use fake=True for the deterministic stand-in"
                )
            feats = [
                _fake_features(p).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                    "features": feats,
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA_DDL)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per planned frame timestamp.

    The decode itself is stubbed; the plan (explode of a sequence per
    video — a generator expression, no Python) is the real Spark surface.
    """
    vids = media.filter(F.col("kind") == "video")
    stamps = F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
    return vids.select("media_id", F.explode(stamps).alias("frame_ms"))
