"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features / NotImplementedError for real codecs) — but
the Spark-side plumbing is real and tested: schemas, mapInPandas batch
shapes, partition-friendly layout (binary payloads never shuffled unless
the operator needs them), and metadata extraction that stays columnar.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, width int, height int,"
    " duration_ms int"
)


def binary_meta(df: DataFrame, id_col="doc_id", bin_col="payload") -> DataFrame:
    """Cheap columnar metadata over a binary column — JVM-side only:
    (doc_id, n_bytes, sha256). The pattern for manifest/stats passes that
    must not deserialize payloads."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.length(F.col(bin_col)).cast("long").alias("n_bytes"),
        F.sha2(F.col(bin_col), 256).alias("sha256"),
    )


def decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB — real pipelines plug PIL/cv2 here. Deterministic fake decode:
    a 4x4 float32 'image' seeded from the payload digest, so downstream
    plumbing (batching, feature shape, determinism tests) is exercised
    honestly without the codec."""
    h = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer(h[:16], dtype=np.uint8).astype(np.float32)
    return arr.reshape(4, 4) / 255.0


def extract_features(
    df: DataFrame, id_col="doc_id", bin_col="payload", feat_dim: int = 16
) -> DataFrame:
    """mapInPandas feature extraction: binary → array<float>. The Arrow
    batch shape (whole-column numpy ops after the per-payload decode) is
    the production pattern; only `decode_image_stub` is fake."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = np.stack(
                [decode_image_stub(bytes(p) if p is not None else b"").reshape(-1)
                 for p in pdf[bin_col]]
            )
            # vectorized post-decode normalization (the real work pattern)
            norm = np.linalg.norm(feats, axis=1, keepdims=True)
            feats = feats / np.maximum(norm, 1e-12)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(np.int64),
                    "features": list(feats.astype(float)),
                }
            )

    return df.mapInPandas(_extract, "doc_id long, features array<double>")


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000, id_col="doc_id"
) -> DataFrame:
    """Video frame-sampling *plan* (doc_id, frame_ts_ms) — pure JVM
    sequence expansion from duration metadata; the decode of each frame is
    the stubbed step. Shows the explode-then-process layout that keeps
    per-task memory bounded by frames-per-task, not videos-per-task."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.expr(f"sequence(0, greatest(duration_ms - 1, 0), {every_ms})")
        ).alias("frame_ts_ms"),
    )
