"""Real PNG and WAV decoders (pipeline/multimodal.py): round-trip against
spec-faithful encoders written here as oracles — every PNG filter type,
every supported color type, mono/stereo WAV."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from lucene_solr_spark.pipeline import multimodal as mm


# --- PNG encoder oracle (spec-side: RFC 2083 filters applied forward) ---------
def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _filter_row(ft: int, row: np.ndarray, prev: np.ndarray, ch: int) -> np.ndarray:
    r = row.astype(np.int64)
    p = prev.astype(np.int64)
    out = np.empty_like(r)
    for c in range(len(r)):
        a = r[c - ch] if c >= ch else 0  # left RECONSTRUCTED (= raw here)
        b = p[c]
        cc = p[c - ch] if c >= ch else 0
        if ft == 0:
            out[c] = r[c]
        elif ft == 1:
            out[c] = r[c] - a
        elif ft == 2:
            out[c] = r[c] - b
        elif ft == 3:
            out[c] = r[c] - ((a + b) >> 1)
        else:  # Paeth
            q = a + b - cc
            pa, pb, pc = abs(q - a), abs(q - b), abs(q - cc)
            pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            out[c] = r[c] - pr
    return (out & 0xFF).astype(np.uint8)


def encode_png(px: np.ndarray, ctype: int, filters) -> bytes:
    """Minimal spec-correct PNG writer: `px` is (H, W, ch) uint8,
    `filters` a per-row filter-type list (the decoder must invert all 5)."""
    h, w, ch = px.shape
    flat = px.reshape(h, w * ch)
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        ft = filters[y % len(filters)]
        raw.append(ft)
        raw.extend(_filter_row(ft, flat[y], prev, ch).tobytes())
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _luma(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[:, :, i].astype(np.int64) for i in range(3))
    return ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)


@pytest.mark.parametrize("ctype,ch", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_png_roundtrip_all_filters(ctype, ch):
    rng = np.random.RandomState(7 + ctype)
    px = rng.randint(0, 256, size=(13, 9, ch), dtype=np.uint8)
    blob = encode_png(px, ctype, filters=[0, 1, 2, 3, 4])
    got = mm.decode_png(blob)
    if ctype == 0 or ctype == 4:
        want = px[:, :, 0]
    else:
        want = _luma(px)
    np.testing.assert_array_equal(got, want)


def test_png_single_filter_each():
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(6, 17, 3), dtype=np.uint8)
    for ft in range(5):
        got = mm.decode_png(encode_png(px, 2, filters=[ft]))
        np.testing.assert_array_equal(got, _luma(px))


def test_png_rejections():
    with pytest.raises(ValueError):
        mm.decode_png(b"notapng")
    px = np.zeros((2, 2, 1), dtype=np.uint8)
    blob = bytearray(encode_png(px, 0, [0]))
    blob[24] = 16  # bit depth 16
    with pytest.raises(NotImplementedError):
        mm.decode_png(bytes(blob))


def test_decode_image_dispatches_png():
    px = np.arange(64, dtype=np.uint8).reshape(8, 8, 1)
    blob = encode_png(px, 0, [0, 2])
    np.testing.assert_array_equal(mm.decode_image(blob, 8, 8), px[:, :, 0])


# --- WAV ----------------------------------------------------------------------
def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Minimal RIFF writer: samples (n,) or (n, ch) int16."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n_ch = samples.shape[1]
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * 2 * n_ch, 2 * n_ch, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_mono_roundtrip():
    t = np.arange(1000)
    sig = (np.sin(2 * np.pi * t / 50) * 20000).astype(np.int16)
    pcm, rate = mm.decode_wav(encode_wav(sig, 16000))
    assert rate == 16000
    np.testing.assert_allclose(pcm, sig.astype(np.float32) / 32768.0, atol=1e-7)


def test_wav_stereo_mixes_to_mono():
    left = np.full(100, 10000, dtype=np.int16)
    right = np.full(100, -10000, dtype=np.int16)
    pcm, rate = mm.decode_wav(encode_wav(np.stack([left, right], axis=1), 8000))
    assert rate == 8000
    np.testing.assert_allclose(pcm, np.zeros(100, np.float32), atol=1e-7)


def test_audio_features_accepts_wav_container(spark):
    sig = (np.sin(np.arange(4096) / 9.0) * 15000).astype(np.int16)
    blob = encode_wav(sig, 22050)
    df = spark.createDataFrame(
        [(1, bytearray(blob), "audio/wav", (0, 0, 0, 0))], mm.MEDIA_SCHEMA
    )
    out = mm.audio_features(df).toPandas()
    assert out["sample_rate"].iloc[0] == 22050  # container rate wins
    # matches the raw-PCM path on the same samples
    df_raw = spark.createDataFrame(
        [(1, bytearray(sig.astype("<i2").tobytes()), "audio/pcm", (0, 0, 0, 22050))],
        mm.MEDIA_SCHEMA,
    )
    raw = mm.audio_features(df_raw).toPandas()
    np.testing.assert_allclose(
        out["features"].iloc[0], raw["features"].iloc[0], atol=1e-6
    )


def test_image_features_tiny_image_no_nan(spark):
    # 2x2 and 1x5 images: tile slices must repeat pixels, never go empty
    rows = []
    for i, (h, w) in enumerate([(2, 2), (1, 5), (3, 1)]):
        px = np.full((h, w, 1), 100 + i, dtype=np.uint8)
        rows.append((i, bytearray(encode_png(px, 0, [0])), "image/png", (w, h, 1, 0)))
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.image_features(df, fake=False).orderBy("id").toPandas()
    feats = np.stack(out["features"].values)
    assert np.isfinite(feats).all()
    # constant images -> every tile mean equals the constant
    np.testing.assert_allclose(feats, np.array([[100.0] * 16, [101.0] * 16, [102.0] * 16]))


def test_image_features_real_png_path(spark):
    rng = np.random.RandomState(11)
    rows = []
    for i in range(4):
        px = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
        rows.append(
            (i, bytearray(encode_png(px, 2, [0, 1, 2, 3, 4])), "image/png",
             (16, 16, 1, 0))
        )
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.image_features(df, fake=False).toPandas()
    assert len(out) == 4 and all(len(f) == mm.FEATURE_DIM for f in out["features"])
    assert (out["width"] == 16).all() and (out["height"] == 16).all()
