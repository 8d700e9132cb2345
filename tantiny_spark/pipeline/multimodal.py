"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

Decoders come in three tiers:

- REAL, in-container: uncompressed container formats are decoded with
  numpy + the stdlib alone — PPM (P6) / PGM (P5) and uncompressed 24/32-bit
  BMP images, and RIFF PCM WAV audio (stdlib ``wave``), with a real numpy
  MFCC (framed Hamming window → rfft power spectrum → HTK mel filterbank →
  log → orthonormal DCT-II). No image/audio libraries required.
- GATED: compressed codecs (JPEG/PNG/Opus/...) need libraries this
  container doesn't ship; those payloads raise NotImplementedError with the
  format named, unless ``fake=True``.
- FAKE: ``fake=True`` short-circuits everything with a deterministic
  decoder seeded from the content hash, so plumbing tests are stable for
  arbitrary payloads.

Pattern: mapInPandas over an iterator of batches, so one task streams many
Arrow batches without materializing the whole partition (right shape for
100 MB+ binary payloads); select the binary column LAST and keep batches
small via spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import hashlib
import io
import re
import wave

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


# --- real image codecs (pure numpy; uncompressed formats) -------------------

_PNM_HEADER = re.compile(
    rb"^(P[56])\s(?:\s*#[^\n]*\n)*\s*(\d+)\s(?:\s*#[^\n]*\n)*\s*(\d+)"
    rb"\s(?:\s*#[^\n]*\n)*\s*(\d+)\s"
)


def decode_image_array(payload: bytes) -> np.ndarray:
    """bytes → HxWxC uint8 array for the formats decodable without codec
    libraries: PPM/PGM (binary P6/P5) and uncompressed 24/32-bit BMP.
    Raises NotImplementedError for compressed formats (JPEG/PNG/GIF/WebP)."""
    if payload[:2] in (b"P6", b"P5"):
        m = _PNM_HEADER.match(payload)
        if not m:
            raise ValueError("malformed PNM header")
        kind, w, h, maxval = m.group(1), *map(int, m.groups()[1:])
        if maxval > 255:
            raise NotImplementedError("16-bit PNM not supported")
        ch = 3 if kind == b"P6" else 1
        data = np.frombuffer(payload, np.uint8, count=w * h * ch, offset=m.end())
        return data.reshape(h, w, ch)
    if payload[:2] == b"BM":
        off = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        comp = int.from_bytes(payload[30:34], "little")
        if comp != 0 or bpp not in (24, 32):
            raise NotImplementedError(f"BMP compression={comp} bpp={bpp}")
        ch = bpp // 8
        stride = (w * ch + 3) & ~3  # rows padded to 4 bytes
        rows = np.frombuffer(
            payload, np.uint8, count=stride * abs(h), offset=off
        ).reshape(abs(h), stride)[:, : w * ch].reshape(abs(h), w, ch)
        if h > 0:  # positive height = bottom-up storage
            rows = rows[::-1]
        return rows[..., [2, 1, 0] if ch == 3 else [2, 1, 0, 3]]  # BGR(A)→RGB(A)
    for magic, name in (
        (b"\xff\xd8", "JPEG"), (b"\x89PN", "PNG"), (b"GIF", "GIF"),
        (b"RIFF", "WebP/RIFF"),
    ):
        if payload[: len(magic)] == magic:
            raise NotImplementedError(
                f"{name} decode needs a codec library not present in this "
                "environment (use fake=True for plumbing tests)"
            )
    raise NotImplementedError("unrecognized image format")


def encode_ppm(img: np.ndarray) -> bytes:
    """HxWx{1,3,4} uint8 array → binary PPM (P6) bytes (alpha dropped,
    grayscale broadcast to RGB) — the lib-free interchange encoding."""
    if img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)
    img = img[..., :3]
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def _image_feature(img: np.ndarray, dim: int) -> list:
    """Real content feature: dim-bin normalized grayscale histogram."""
    gray = img[..., :3].mean(axis=2) if img.shape[2] >= 3 else img[..., 0]
    hist, _ = np.histogram(gray, bins=dim, range=(0.0, 255.0))
    total = max(int(hist.sum()), 1)
    return (hist / total).astype(np.float32).tolist()


def _fake_decode(payload: bytes, dim: int = 8) -> dict:
    """Deterministic stand-in for payloads with no in-container codec: all
    outputs derive from the md5 of the payload, so tests are stable across
    runs and parallelism."""
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

    PPM/PGM/uncompressed-BMP payloads are REALLY decoded (pure numpy) and
    the feature is a real grayscale histogram; compressed formats raise
    NotImplementedError naming the codec, unless fake=True (deterministic
    hash-seeded stand-in for plumbing tests)."""

    def _decode(batches):
        for pdf in batches:
            out = {
                "doc_id": pdf[key],
                "width": [], "height": [], "n_channels": [], "feature": [],
            }
            for payload in pdf[binary_col]:
                raw = bytes(payload) if payload is not None else b""
                if fake:
                    meta = _fake_decode(raw, dim)
                elif not raw:
                    # missing payloads are routine at crawl scale: emit a
                    # null-metadata row instead of failing the whole job
                    meta = {
                        "width": None, "height": None,
                        "n_channels": None, "feature": None,
                    }
                else:
                    img = decode_image_array(raw)
                    meta = {
                        "width": img.shape[1],
                        "height": img.shape[0],
                        "n_channels": img.shape[2],
                        "feature": _image_feature(img, dim),
                    }
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


# --- real audio decode + MFCC (stdlib wave + numpy) -------------------------

def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF PCM WAV bytes → (mono float64 signal in [-1, 1], sample rate).
    Stdlib ``wave`` handles the RIFF parsing; 8/16/32-bit PCM supported."""
    with wave.open(io.BytesIO(payload)) as f:
        sr = f.getframerate()
        n_ch = f.getnchannels()
        width = f.getsampwidth()
        raw = f.readframes(f.getnframes())
    if width == 2:
        sig = np.frombuffer(raw, np.int16).astype(np.float64) / 32768.0
    elif width == 4:
        sig = np.frombuffer(raw, np.int32).astype(np.float64) / 2147483648.0
    elif width == 1:  # 8-bit WAV is unsigned
        sig = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{width * 8}-bit PCM not supported")
    if n_ch > 1:
        sig = sig.reshape(-1, n_ch).mean(axis=1)
    return sig, sr


def _hz_to_mel(hz):
    return 2595.0 * np.log10(1.0 + np.asarray(hz, dtype=np.float64) / 700.0)


def _mel_to_hz(mel):
    return 700.0 * (10.0 ** (np.asarray(mel, dtype=np.float64) / 2595.0) - 1.0)


def mfcc(
    signal: np.ndarray, sr: int, n_mfcc: int = 13,
    n_fft: int = 512, hop: int = 256, n_mels: int = 26,
) -> np.ndarray:
    """Real MFCC, numpy only: Hamming-windowed frames → rfft power spectrum
    → triangular HTK mel filterbank → log → orthonormal DCT-II, averaged
    over frames. Deterministic for a given signal."""
    if signal.size < n_fft:
        signal = np.pad(signal, (0, n_fft - signal.size))
    n_frames = 1 + (signal.size - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = signal[idx] * np.hamming(n_fft)
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2 / n_fft

    mel_pts = _mel_to_hz(np.linspace(0.0, _hz_to_mel(sr / 2.0), n_mels + 2))
    bins = np.floor((n_fft + 1) * mel_pts / sr).astype(int)
    fbank = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(1, n_mels + 1):
        left, center, right = bins[m - 1], bins[m], bins[m + 1]
        if center > left:
            fbank[m - 1, left:center] = (
                np.arange(left, center) - left) / (center - left)
        if right > center:
            fbank[m - 1, center:right] = (
                right - np.arange(center, right)) / (right - center)
    logmel = np.log(power @ fbank.T + 1e-10)  # (frames, n_mels)

    # orthonormal DCT-II over the mel axis
    k = np.arange(n_mels)
    basis = np.cos(np.pi * (k[:, None] + 0.5) * k[None, :n_mfcc] / n_mels)
    scale = np.full(n_mfcc, np.sqrt(2.0 / n_mels))
    scale[0] = np.sqrt(1.0 / n_mels)
    return (logmel @ basis * scale).mean(axis=0)


def extract_audio_features(
    df: DataFrame, binary_col: str = "audio", key: str = "doc_id",
    sample_rate: int = 16_000, n_mfcc: int = 13, fake: bool = False,
) -> DataFrame:
    """binary audio column → (n_samples, duration, MFCC feature vector).

    RIFF PCM WAV payloads are REALLY decoded (stdlib wave) and featurized
    with a real numpy MFCC; compressed codecs (Opus/MP3/...) raise
    NotImplementedError unless fake=True (hash-seeded stand-in; n_samples
    then assumes 2-byte PCM16 over the raw payload)."""

    def _extract(batches):
        for pdf in batches:
            out = {"doc_id": pdf[key], "n_samples": [], "duration_s": [], "mfcc": []}
            for payload in pdf[binary_col]:
                raw = bytes(payload) if payload is not None else b""
                if fake:
                    n = len(raw) // 2
                    h = hashlib.md5(raw).digest()
                    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
                    out["n_samples"].append(n)
                    out["duration_s"].append(n / float(sample_rate))
                    out["mfcc"].append(
                        rng.standard_normal(n_mfcc).astype(np.float32).tolist()
                    )
                    continue
                if not raw:
                    # missing payloads: null row, don't fail the job
                    out["n_samples"].append(None)
                    out["duration_s"].append(None)
                    out["mfcc"].append(None)
                    continue
                if raw[:4] != b"RIFF":
                    raise NotImplementedError(
                        "only RIFF PCM WAV is decodable without codec "
                        "libraries (use fake=True for plumbing tests)"
                    )
                sig, sr = decode_wav(raw)
                out["n_samples"].append(int(sig.size))
                out["duration_s"].append(sig.size / float(sr))
                out["mfcc"].append(
                    mfcc(sig, sr, n_mfcc).astype(np.float32).tolist()
                )
            yield pd.DataFrame(out)

    return df.select(key, binary_col).mapInPandas(_extract, AUDIO_META_SCHEMA)


def resize_images(
    df: DataFrame, target_w: int, target_h: int,
    binary_col: str = "image", key: str = "doc_id", fake: bool = False,
) -> DataFrame:
    """binary image column → resized binary (PPM) + new dimensions.

    Decodable payloads (PPM/PGM/uncompressed BMP) are REALLY resized with
    numpy bilinear sampling and re-encoded as binary PPM; compressed
    formats raise NotImplementedError unless fake=True (md5-keyed stand-in
    payload). The iterator-of-batches streaming pattern — never holding a
    partition of images in memory at once — is the production shape."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("resized", T.BinaryType(), True),
        ]
    )

    def _bilinear(img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        ys = (np.arange(target_h) + 0.5) * h / target_h - 0.5
        xs = (np.arange(target_w) + 0.5) * w / target_w - 0.5
        y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
        x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
        y1 = np.minimum(y0 + 1, h - 1)
        x1 = np.minimum(x0 + 1, w - 1)
        wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
        wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
        a = img[y0][:, x0].astype(np.float64)
        b = img[y0][:, x1].astype(np.float64)
        c = img[y1][:, x0].astype(np.float64)
        d = img[y1][:, x1].astype(np.float64)
        mix = a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx \
            + c * wy * (1 - wx) + d * wy * wx
        return np.round(mix).astype(np.uint8)

    def _resize(batches):
        for pdf in batches:
            out = {"doc_id": pdf[key], "width": [], "height": [], "resized": []}
            for payload in pdf[binary_col]:
                raw = bytes(payload) if payload is not None else b""
                if fake:
                    h = hashlib.md5(raw + b"|resize").digest()
                    reps = (target_w * target_h * 3) // len(h) + 1
                    resized = (h * reps)[: target_w * target_h * 3]
                elif not raw:
                    resized = None  # missing payload: null row, no job kill
                else:
                    resized = encode_ppm(_bilinear(decode_image_array(raw)))
                out["width"].append(target_w)
                out["height"].append(target_h)
                out["resized"].append(resized)
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
