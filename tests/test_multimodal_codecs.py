"""Real (lib-free) multimodal codecs: PPM/PGM/BMP images, PCM WAV audio.

These test the pure decode/featurize kernels without Spark; the Spark-side
mapInPandas plumbing is covered in test_pipeline.py / the real-path tests
appended there.
"""

import io
import struct
import wave

import numpy as np
import pytest

from tantiny_spark.pipeline.multimodal import (
    decode_image_array,
    decode_wav,
    encode_ppm,
    mfcc,
)


def make_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n# a comment\n%d %d\n255\n" % (w, h) + img.tobytes()


def make_pgm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P5\n%d %d\n255\n" % (w, h) + img.tobytes()


def make_bmp(img: np.ndarray) -> bytes:
    """Uncompressed 24-bit bottom-up BMP from an HxWx3 RGB array."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y][:, ::-1].tobytes()  # RGB → BGR
        rows += row + b"\x00" * (stride - len(row))
    pixel_data = bytes(rows)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixel_data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data),
                      2835, 2835, 0, 0)
    return header + dib + pixel_data


def make_wav(sig: np.ndarray, sr: int = 16_000, n_ch: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(n_ch)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes((np.clip(sig, -1, 1) * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


def test_ppm_roundtrip_exact():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    got = decode_image_array(make_ppm(img))
    assert got.shape == (5, 7, 3)
    assert (got == img).all()
    # encode_ppm → decode roundtrip is exact too
    assert (decode_image_array(encode_ppm(img)) == img).all()


def test_pgm_grayscale():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4, 1)
    got = decode_image_array(make_pgm(img))
    assert got.shape == (3, 4, 1)
    assert (got == img).all()


def test_bmp_24bit_exact():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)  # w=5 forces padding
    got = decode_image_array(make_bmp(img))
    assert got.shape == (6, 5, 3)
    assert (got == img).all()  # BGR swap + bottom-up flip undone


def test_compressed_formats_raise_named_error():
    with pytest.raises(NotImplementedError, match="JPEG"):
        decode_image_array(b"\xff\xd8\xff\xe0rest")
    with pytest.raises(NotImplementedError, match="PNG"):
        decode_image_array(b"\x89PNG\r\n\x1a\nrest")


def test_wav_decode_mono_and_stereo():
    sr = 8000
    t = np.arange(sr) / sr
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    mono, got_sr = decode_wav(make_wav(sig, sr))
    assert got_sr == sr and mono.size == sr
    assert np.allclose(mono, sig, atol=1e-3)  # int16 quantization only
    stereo = np.stack([sig, -sig], axis=1).reshape(-1)
    mixed, _ = decode_wav(make_wav(stereo, sr, n_ch=2))
    assert np.allclose(mixed, 0.0, atol=1e-3)  # L/R cancel in the downmix


def test_mfcc_real_properties():
    sr = 16_000
    t = np.arange(sr // 2) / sr
    low = np.sin(2 * np.pi * 200 * t)
    high = np.sin(2 * np.pi * 4000 * t)
    m_low = mfcc(low, sr)
    m_high = mfcc(high, sr)
    assert m_low.shape == (13,)
    # deterministic
    assert (mfcc(low, sr) == m_low).all()
    # different spectral content → clearly different cepstra
    assert np.abs(m_low - m_high).max() > 1.0
    # short signals pad instead of crashing
    assert mfcc(np.zeros(10), sr).shape == (13,)
