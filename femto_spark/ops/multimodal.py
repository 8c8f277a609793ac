"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

AUDIO decode is REAL: PCM WAV decodes with the stdlib `wave` module
(decode_wav / audio_features — no external codec needed), with a
deterministic WAV synthesizer (synth_wav) standing in for external data.
The container has no IMAGE/VIDEO codecs, so those decode steps are
stubbed (deterministic fake features; swap in PIL/ffmpeg where they
exist) — but the Spark-side plumbing is real and tested: schemas,
mapInPandas batch shapes, partition-friendly layout (binary payloads
never shuffled unless the operator needs them), and metadata extraction
that stays columnar.
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


def synth_wav(
    seed: int, sample_rate: int = 8000, n_samples: int | None = None
) -> bytes:
    """Deterministic 16-bit mono PCM WAV payload (stdlib wave writer):
    a sine whose frequency and length derive from `seed`. The test/driver
    corpus generator for the REAL audio-decode path below — no external
    data, bit-stable across runs."""
    import io
    import wave as _wave

    if n_samples is None:
        n_samples = 800 + (seed % 5) * 160
    freq = 110.0 + (seed % 7) * 55.0
    t = np.arange(n_samples, dtype=np.float64) / sample_rate
    x = np.round(np.sin(2.0 * np.pi * freq * t) * 12000.0).astype("<i2")
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """REAL audio decode — PCM WAV via the stdlib `wave` module (the one
    media format this container can decode without external codecs).
    Returns (sample_rate, mono float32 samples in [-1, 1])."""
    import io
    import wave as _wave

    with _wave.open(io.BytesIO(payload)) as w:
        sr = w.getframerate()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    dtype = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}[sw]
    x = np.frombuffer(raw, dtype=dtype).astype(np.float32)
    if sw == 1:
        x = (x - 128.0) / 128.0
    else:
        x = x / float(2 ** (8 * sw - 1))
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return sr, x


def audio_features(
    df: DataFrame, id_col="doc_id", bin_col="payload"
) -> DataFrame:
    """mapInPandas over WAV binaries → (doc_id, sample_rate, n_samples,
    duration_ms, rms, n_zero_crossings). The decode is decode_wav — a
    REAL decode, not a stub: the integer columns round-trip the encoded
    stream exactly (driver-oracle-checkable), the float features are the
    standard energy/zero-crossing audio stats. Same Arrow batch shape as
    extract_features: per-payload decode, vectorized numpy feature math."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf[bin_col]):
                sr, x = decode_wav(bytes(p))
                rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
                zc = (
                    int(
                        np.count_nonzero(
                            np.signbit(x[1:]) != np.signbit(x[:-1])
                        )
                    )
                    if x.size > 1
                    else 0
                )
                rows.append(
                    (
                        int(i),
                        int(sr),
                        int(x.size),
                        int(x.size * 1000 // sr),
                        rms,
                        zc,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_samples", "duration_ms",
                    "rms", "n_zero_crossings",
                ],
            )

    return df.mapInPandas(
        _extract,
        "doc_id long, sample_rate int, n_samples long, duration_ms long,"
        " rms double, n_zero_crossings long",
    )


def synth_audio_corpus(df: DataFrame, id_col="doc_id") -> DataFrame:
    """(doc_id, payload binary): deterministic WAV payload per row —
    mapInPandas so the synth runs distributed, seeded by doc_id only."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(np.int64),
                    "payload": [
                        synth_wav(int(i)) for i in pdf[id_col]
                    ],
                }
            )

    return df.select(id_col).mapInPandas(
        _gen, "doc_id long, payload binary"
    )


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
