"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The decode step itself is STUBBED (no image/audio libraries in this
container): ``decode_image``/``extract_audio_features`` raise
NotImplementedError unless ``fake=True``, in which case a deterministic fake
decoder (seeded from the content hash) produces stable feature vectors so the
Spark-side plumbing — schema, Arrow batch shape, partitioning — is fully
real and testable.

Pattern: mapInPandas over an iterator of batches, so one task streams many
Arrow batches without materializing the whole partition (right shape for
100 MB+ binary payloads); select the binary column LAST and keep batches
small via spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode(payload: bytes, dim: int = 8) -> dict:
    """Deterministic stand-in for a real decoder: all outputs derive from the
    md5 of the payload, so tests are stable across runs and parallelism."""
    h = hashlib.md5(payload or b"").digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    return {
        "width": 16 + h[0] % 64,
        "height": 16 + h[1] % 64,
        "n_channels": 3,
        "feature": rng.standard_normal(dim).astype(np.float32).tolist(),
    }


def decode_images(
    df: DataFrame, binary_col: str = "image", key: str = "doc_id",
    fake: bool = False, dim: int = 8,
) -> DataFrame:
    """binary column → (width, height, channels, feature vector).

    Real implementation would Pillow/With libjpeg per Arrow batch; this
    container lacks the codecs, so only fake=True is runnable — the plumbing
    (mapInPandas iterator, schema, column pruning) is the production shape.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "use fake=True for the deterministic test decoder"
        )

    def _decode(batches):
        for pdf in batches:
            out = {
                "doc_id": pdf[key],
                "width": [], "height": [], "n_channels": [], "feature": [],
            }
            for payload in pdf[binary_col]:
                meta = _fake_decode(bytes(payload) if payload is not None else b"", dim)
                out["width"].append(meta["width"])
                out["height"].append(meta["height"])
                out["n_channels"].append(meta["n_channels"])
                out["feature"].append(meta["feature"])
            yield pd.DataFrame(out)

    return df.select(key, binary_col).mapInPandas(_decode, IMAGE_META_SCHEMA)


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("mfcc", T.ArrayType(T.FloatType()), True),
    ]
)


def extract_audio_features(
    df: DataFrame, binary_col: str = "audio", key: str = "doc_id",
    sample_rate: int = 16_000, n_mfcc: int = 13, fake: bool = False,
) -> DataFrame:
    """binary audio column → (n_samples, duration, MFCC-like feature vector).

    A real implementation would decode PCM/Opus per Arrow batch (librosa /
    torchaudio); this container lacks audio codecs, so only fake=True is
    runnable — n_samples derives from the payload length (2 bytes/sample
    PCM16 assumption) and the feature vector from the content hash, keeping
    the Spark-side schema, batch shape and determinism production-real."""
    if not fake:
        raise NotImplementedError(
            "audio codecs are not available in this environment; "
            "use fake=True for the deterministic test extractor"
        )

    def _extract(batches):
        for pdf in batches:
            out = {"doc_id": pdf[key], "n_samples": [], "duration_s": [], "mfcc": []}
            for payload in pdf[binary_col]:
                raw = bytes(payload) if payload is not None else b""
                n = len(raw) // 2
                h = hashlib.md5(raw).digest()
                rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
                out["n_samples"].append(n)
                out["duration_s"].append(n / float(sample_rate))
                out["mfcc"].append(
                    rng.standard_normal(n_mfcc).astype(np.float32).tolist()
                )
            yield pd.DataFrame(out)

    return df.select(key, binary_col).mapInPandas(_extract, AUDIO_META_SCHEMA)


def resize_images(
    df: DataFrame, target_w: int, target_h: int,
    binary_col: str = "image", key: str = "doc_id", fake: bool = False,
) -> DataFrame:
    """binary image column → resized binary + new dimensions.

    Only the deterministic fake path is runnable in-container (the 'resized'
    payload is an md5-keyed byte stream of the right conceptual shape); the
    schema and the iterator-of-batches streaming pattern — never holding a
    partition of images in memory at once — are the production shape."""
    if not fake:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "use fake=True for the deterministic test resizer"
        )
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("resized", T.BinaryType(), True),
        ]
    )

    def _resize(batches):
        for pdf in batches:
            out = {"doc_id": pdf[key], "width": [], "height": [], "resized": []}
            for payload in pdf[binary_col]:
                raw = bytes(payload) if payload is not None else b""
                h = hashlib.md5(raw + b"|resize").digest()
                # deterministic stand-in payload sized ∝ target area
                reps = (target_w * target_h * 3) // len(h) + 1
                out["width"].append(target_w)
                out["height"].append(target_h)
                out["resized"].append((h * reps)[: target_w * target_h * 3])
            yield pd.DataFrame(out)

    return df.select(key, binary_col).mapInPandas(_resize, out_schema)


def frame_sample_plan(df: DataFrame, key: str = "doc_id",
                      duration_col: str = "duration_s", fps: float = 0.5) -> DataFrame:
    """Video frame-sampling plan: one row per (video, timestamp) to decode —
    pure JVM explode, the decode itself happens downstream per partition."""
    n_frames = F.greatest(F.floor(F.col(duration_col) * fps).cast("int"), F.lit(1))
    return df.select(
        key,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1),
                lambda i: i.cast("double") / fps,
            )
        ).alias("sample_ts"),
    )
