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
