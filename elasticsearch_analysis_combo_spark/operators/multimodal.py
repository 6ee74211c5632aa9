"""Multimodal column plumbing (engine extension for training-data
pipelines): image/audio/video as opaque ``binary`` columns + typed metadata.

The image/audio decode libraries are not in this container, so the *decode
kernels* are stubs — ``decode_image`` raises NotImplementedError unless
``fake=True`` selects the deterministic fake decoder (byte-hash derived
pixels). Everything Spark-side is real and tested: schemas, Arrow batch
shapes, mapInPandas signatures, partition-size guidance for large binaries.

Design for 100TB: binaries stream through mapInPandas in bounded Arrow
batches (`spark.sql.execution.arrow.maxRecordsPerBatch`), metadata stays
columnar for predicate pushdown (filter on width/height/duration prunes
before any decode), and decoded features come back as fixed-width
array<float> ready for the similarity operators.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)


def synthesize_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table with realistic metadata + payload
    bytes (hash-expanded), for exercising the plumbing end to end."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 3]
                payload = hashlib.sha256(f"{seed}/{i}".encode()).digest() * 8
                meta = {
                    "width": 64 + (i % 8) * 32 if kind != "audio" else None,
                    "height": 64 + (i % 5) * 32 if kind != "audio" else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                    "duration_ms": 1000 + (i % 30) * 500 if kind != "image" else None,
                    "codec": {"image": "png", "audio": "pcm16", "video": "h264"}[kind],
                }
                rows.append((i, kind, payload, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_image(payload: bytes, meta: dict, fake: bool = False) -> np.ndarray:
    """STUB: real decode needs PIL/libjpeg (absent in this container).
    ``fake=True`` -> deterministic pseudo-pixels derived from payload bytes,
    shaped (h, w) float32 in [0,1)."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/libjpeg, not present in this "
            "environment; pass fake=True for the deterministic test decoder"
        )
    w = int(meta.get("width") or 32)
    h = int(meta.get("height") or 32)
    raw = np.frombuffer(
        hashlib.sha256(payload).digest() * ((w * h) // 32 + 1), dtype=np.uint8
    )[: w * h]
    return (raw.reshape(h, w).astype(np.float32)) / 256.0


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(
    media: DataFrame, dim: int = 16, fake: bool = True
) -> DataFrame:
    """Decode + pool each payload into a fixed-width feature vector.
    Real Spark plumbing (mapInPandas over bounded Arrow batches); the
    pixel/PCM source is the stub decoder."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                img = decode_image(bytes(payload), dict(meta or {}), fake=fake)
                flat = img.reshape(-1)
                pad = (-flat.size) % dim
                if pad:
                    flat = np.pad(flat, (0, pad))
                feats.append(flat.reshape(dim, -1).mean(axis=1).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": pd.Series(feats, dtype=object),
                }
            )

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ms", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled timestamp;
    the 'frame' is a deterministic byte slice standing in for the real
    decoder's frame buffer. Filter on kind pushes down before any work."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_ms": [], "frame_bytes": []}
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                dur = int((meta or {}).get("duration_ms") or 0)
                payload = bytes(payload)
                for idx, ms in enumerate(range(0, dur, every_ms)):
                    off = (ms * 7) % max(len(payload) - 16, 1)
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(idx)
                    out["frame_ms"].append(ms)
                    out["frame_bytes"].append(payload[off:off + 16])
            yield pd.DataFrame(
                {k: pd.Series(v, dtype=object) if k == "frame_bytes"
                 else pd.Series(v, dtype="int64" if k == "media_id" else "int32")
                 for k, v in out.items()}
            )

    return media.filter(F.col("kind") == "video").mapInPandas(gen, schema=FRAME_SCHEMA)
