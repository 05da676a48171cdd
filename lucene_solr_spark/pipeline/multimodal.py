"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery is real and tested — schema contracts, Arrow batch
shapes, `mapInPandas` feature extraction, partition sizing. Codec status:
- PNG: REAL decoder (`decode_png`) — chunk walk, stdlib zlib inflate,
  numpy scanline unfiltering (all five PNG filters), gray/RGB/GA/RGBA at
  bit depth 8. No image library involved.
- WAV: REAL parser (`decode_wav`) — RIFF chunk walk, 16-bit PCM to float32
  mono; raw PCM16 blobs decode directly (np.frombuffer).
- JPEG / compressed audio (mp3, ogg) / video codecs: stubbed — the decode
  UDFs use real libraries when importable (PIL etc., absent in this
  container) and otherwise raise `NotImplementedError` or run a
  clearly-marked deterministic fake decoder so the pipeline plumbing stays
  exercisable end-to-end.

Schema contract for a multimodal corpus table:
    id: long, media: binary, media_type: string,
    meta: struct<width:int, height:int, n_frames:int, sample_rate:int>

Scale notes: binary payloads dominate row size → keep
`spark.sql.files.maxPartitionBytes` small enough that one Arrow batch of
rows fits executor memory; feature extraction projects away `media` as the
FIRST select after the UDF so downstream stages never shuffle the blobs.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real decoder if available (not in this container)
    from PIL import Image  # type: ignore

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

MEDIA_SCHEMA = (
    "id long, media binary, media_type string, "
    "meta struct<width:int, height:int, n_frames:int, sample_rate:int>"
)

FEATURE_DIM = 16


def _fake_decode(blob: bytes, width: int, height: int) -> np.ndarray:
    """DETERMINISTIC FAKE image decode (container has no image libs):
    derives a (height, width) uint8 'pixel' grid from the blob digest.
    Replace with PIL/libvips in production."""
    digest = hashlib.sha256(blob).digest()
    rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
    return rng.randint(0, 256, size=(height, width), dtype=np.uint8)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+alpha, RGBA


def decode_png(blob: bytes) -> np.ndarray:
    """REAL PNG decode with no image library: chunk walk (IHDR/IDAT/IEND),
    stdlib zlib inflate, scanline unfiltering per the PNG spec (RFC 2083
    §6: filters None/Sub/Up/Average/Paeth). Supports bit depth 8, color
    types 0/2/4/6, no interlace — the overwhelming majority of real-world
    PNGs. Returns (H, W) uint8 grayscale; color converts via the ITU-R 601
    luma transform (R·299 + G·587 + B·114) // 1000 (what PIL convert('L')
    computes), alpha ignored.

    Unfiltering cost: None/Up are fully vectorized; Sub is a per-channel
    cumsum (vectorized); Average/Paeth fall back to a per-byte loop — rows
    are short, and an encoder that cares about this path pre-filters with
    None/Up anyway."""
    if not blob.startswith(_PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = ctype = None
    idat: list[bytes] = []
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        tag = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + data + CRC
        if tag == b"IHDR":
            width, height, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} (only 8)")
            if interlace:
                raise NotImplementedError("interlaced PNG")
            if ctype not in _PNG_CHANNELS:
                raise NotImplementedError(f"PNG color type {ctype}")
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG (no IHDR/IDAT)")
    raw = zlib.decompress(b"".join(idat))
    ch = _PNG_CHANNELS[ctype]
    stride = width * ch
    if len(raw) < height * (stride + 1):
        raise ValueError("truncated PNG scanline data")
    img = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    off = 0
    for y in range(height):
        ft = raw[off]
        row = np.frombuffer(raw, np.uint8, stride, off + 1).astype(np.int64)
        off += stride + 1
        if ft == 0:  # None
            rec = row
        elif ft == 1:  # Sub: per-channel running sum
            rec = np.empty_like(row)
            for c in range(ch):
                rec[c::ch] = np.cumsum(row[c::ch]) & 0xFF
        elif ft == 2:  # Up
            rec = (row + prev) & 0xFF
        elif ft == 3:  # Average
            rec = np.empty_like(row)
            for c in range(stride):
                left = rec[c - ch] if c >= ch else 0
                rec[c] = (row[c] + ((left + prev[c]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            rec = np.empty_like(row)
            for c in range(stride):
                a = rec[c - ch] if c >= ch else 0
                b = prev[c]
                cc = prev[c - ch] if c >= ch else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                rec[c] = (row[c] + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        img[y] = rec.astype(np.uint8)
        prev = rec
    px = img.reshape(height, width, ch)
    if ctype == 0:
        return px[:, :, 0]
    if ctype == 4:  # gray + alpha
        return px[:, :, 0]
    r, g, b = (px[:, :, i].astype(np.int64) for i in range(3))
    return ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)


def decode_bmp(blob: bytes) -> np.ndarray:
    """REAL BMP decode, no image library: BITMAPFILEHEADER + DIB header,
    uncompressed (BI_RGB) 24/32-bit truecolor or 8-bit paletted, bottom-up
    or top-down rows, 4-byte row padding. Returns (H, W) uint8 grayscale
    via the same ITU-R 601 luma as decode_png."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP (bad signature)")
    (data_off,) = struct.unpack("<I", blob[10:14])
    (hdr_size,) = struct.unpack("<I", blob[14:18])
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP")
    width, height_raw = struct.unpack("<ii", blob[18:26])
    planes, bpp = struct.unpack("<HH", blob[26:30])
    (compression,) = struct.unpack("<I", blob[30:34])
    if compression != 0:
        raise NotImplementedError(f"compressed BMP (method {compression})")
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"BMP bit depth {bpp}")
    height = abs(height_raw)
    top_down = height_raw < 0
    stride = (width * (bpp // 8) + 3) & ~3
    raw = np.frombuffer(blob, np.uint8, stride * height, data_off)
    rows = raw.reshape(height, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        # palette: BGRX quads right after the DIB header
        (used,) = struct.unpack("<I", blob[46:50])
        n_col = used or 256
        pal = np.frombuffer(blob, np.uint8, n_col * 4, 14 + hdr_size)
        pal = pal.reshape(n_col, 4).astype(np.int64)
        luma = (pal[:, 2] * 299 + pal[:, 1] * 587 + pal[:, 0] * 114) // 1000
        return luma.astype(np.uint8)[rows[:, :width]]
    ch = bpp // 8
    px = rows[:, : width * ch].reshape(height, width, ch).astype(np.int64)
    b, g, r = px[:, :, 0], px[:, :, 1], px[:, :, 2]  # BMP stores BGR
    return ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)


def _gif_lzw(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW decode (GIF89a spec appendix F): variable code
    width from min_code_size+1 up to 12 bits, CLEAR resets the table,
    EOI ends the stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    # bit reader (LSB-first within bytes)
    acc = bits = pos = 0
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = min_code_size + 1
    prev: bytes | None = None
    while n_out < n_pixels:
        while bits < code_size:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << bits
            bits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        bits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW code")
        if prev is not None and len(table) == (1 << code_size) \
                and code_size < 12:
            code_size += 1
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], np.uint8)
        n_out += take
        prev = entry
    if n_out < n_pixels:
        raise ValueError("GIF pixel data ended early")
    return out


def decode_gif(blob: bytes) -> np.ndarray:
    """REAL GIF decode (first frame), no image library: logical screen +
    color tables, extension skip, LZW decompress, interlace reorder.
    Returns (H, W) uint8 grayscale (601 luma of the palette)."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    flags = blob[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(blob, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(blob):
        block = blob[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while blob[pos] != 0:
                pos += 1 + blob[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _x, _y, width, height = struct.unpack("<HHHH", blob[pos + 1 : pos + 9])
            iflags = blob[pos + 9]
            pos += 10
            pal = gct
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 7)
                pal = np.frombuffer(blob, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if pal is None:
                raise ValueError("GIF image with no color table")
            min_code_size = blob[pos]
            pos += 1
            chunks = []
            while blob[pos] != 0:
                ln = blob[pos]
                chunks.append(blob[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            idx = _gif_lzw(b"".join(chunks), min_code_size, width * height)
            img = idx.reshape(height, width)
            if iflags & 0x40:  # interlaced: 4-pass row order
                deinterlaced = np.empty_like(img)
                order = (
                    list(range(0, height, 8)) + list(range(4, height, 8))
                    + list(range(2, height, 4)) + list(range(1, height, 2)))
                deinterlaced[order] = img
                img = deinterlaced
            pal64 = pal.astype(np.int64)
            luma = (pal64[:, 0] * 299 + pal64[:, 1] * 587
                    + pal64[:, 2] * 114) // 1000
            return luma.astype(np.uint8)[img]
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image data")


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """REAL RIFF/WAVE parse with no audio library: chunk walk, 'fmt '
    (PCM, 16-bit) + 'data'; returns (float32 mono samples in [-1, 1),
    sample_rate). Multi-channel input averages to mono. Odd-length chunks
    honor the RIFF pad byte."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = data = None
    while pos + 8 <= len(blob):
        tag = blob[pos : pos + 4]
        (ln,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        chunk = blob[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif tag == b"data":
            data = chunk
    if fmt is None or data is None:
        raise ValueError("truncated WAV (no fmt/data chunk)")
    audio_format, n_ch, rate, _byte_rate, _align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError("only 16-bit PCM WAV (format 1)")
    pcm = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
    if n_ch > 1:
        pcm = pcm[: len(pcm) // n_ch * n_ch].reshape(-1, n_ch).mean(axis=1)
    return pcm.astype(np.float32), int(rate)


def decode_image(blob: bytes, width: int, height: int) -> np.ndarray:
    blob = bytes(blob)
    if blob.startswith(_PNG_SIG):
        return decode_png(blob)  # real path, no libraries needed
    if blob[:2] == b"BM":
        return decode_bmp(blob)  # real path
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(blob)  # real path
    if _HAS_PIL:  # pragma: no cover - not installed in this container
        import io

        return np.asarray(Image.open(io.BytesIO(blob)).convert("L"))
    raise NotImplementedError(
        "non-PNG image decode needs PIL/libvips; use image_features("
        "fake=True) for plumbing tests"
    )


def image_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """media → fixed-width feature vector (mean/std per tile) via Arrow
    batches. The Spark plumbing (batch shape, schema, blob projection) is
    identical for the real decoder."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats, ws, hs = [], [], [], []
            for row in pdf.itertuples(index=False):
                meta = row.meta
                w, h = int(meta["width"]), int(meta["height"])
                if fake:
                    px = _fake_decode(bytes(row.media), w, h)
                else:  # pragma: no cover
                    px = decode_image(bytes(row.media), w, h)
                # 4x4 tile means → FEATURE_DIM floats (deterministic).
                # Rounded bounds clamped to ≥1 px so images smaller than
                # 4 px per side repeat rows/cols instead of producing
                # empty slices (mean of an empty slice is NaN and would
                # poison every downstream cosine/ANN comparison).
                ih, iw = px.shape
                rb = [min(ih - 1, round(i * ih / 4)) for i in range(4)] + [ih]
                cb = [min(iw - 1, round(j * iw / 4)) for j in range(4)] + [iw]
                tiles = [
                    float(
                        px[rb[i] : max(rb[i + 1], rb[i] + 1),
                           cb[j] : max(cb[j + 1], cb[j] + 1)].mean()
                    )
                    for i in range(4)
                    for j in range(4)
                ]
                ids.append(row.id)
                feats.append(np.asarray(tiles, dtype=np.float32))
                # real decoders report their own dimensions; meta is a hint
                hs.append(int(px.shape[0]))
                ws.append(int(px.shape[1]))
            yield pd.DataFrame(
                {"id": ids, "features": feats, "width": ws, "height": hs}
            )

    # project media away immediately after extraction — blobs never shuffle
    return df.select("id", "media", "meta").mapInPandas(
        kernel, schema="id long, features array<float>, width int, height int"
    )


def resize_gray(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """REAL area-mean resize of a grayscale array (pure numpy, no image
    libs): partitions the source grid into out_h × out_w cells and averages
    each — the standard anti-aliased downscale. Works for up- and
    down-scaling (nearest-neighbor rows/cols when upscaling)."""
    h, w = px.shape
    row_idx = (np.arange(out_h + 1) * h / out_h).round().astype(int)
    col_idx = (np.arange(out_w + 1) * w / out_w).round().astype(int)
    out = np.empty((out_h, out_w), dtype=np.float32)
    csum = px.astype(np.float64).cumsum(axis=0).cumsum(axis=1)
    padded = np.zeros((h + 1, w + 1), dtype=np.float64)
    padded[1:, 1:] = csum
    for i in range(out_h):
        r0, r1 = row_idx[i], max(row_idx[i + 1], row_idx[i] + 1)
        r1 = min(r1, h)
        for j in range(out_w):
            c0, c1 = col_idx[j], max(col_idx[j + 1], col_idx[j] + 1)
            c1 = min(c1, w)
            area = (r1 - r0) * (c1 - c0)
            s = (
                padded[r1, c1] - padded[r0, c1] - padded[r1, c0] + padded[r0, c0]
            )
            out[i, j] = s / area
    return out


def resize_images(
    df: DataFrame, out_h: int = 8, out_w: int = 8, fake: bool = True
) -> DataFrame:
    """media → resized grayscale pixel array (flattened), Arrow-batched.
    The resize itself is real (resize_gray); only the codec is fake/stubbed
    in this container."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, pxs = [], []
            for row in pdf.itertuples(index=False):
                meta = row.meta
                w, h = int(meta["width"]), int(meta["height"])
                px = (
                    _fake_decode(bytes(row.media), w, h)
                    if fake
                    else decode_image(bytes(row.media), w, h)
                )
                ids.append(row.id)
                pxs.append(resize_gray(px, out_h, out_w).ravel())
            yield pd.DataFrame({"id": ids, "pixels": pxs})

    return df.select("id", "media", "meta").mapInPandas(
        kernel, schema="id long, pixels array<float>"
    )


def audio_features(
    df: DataFrame, frame_len: int = 256, n_frames_keep: int = 8
) -> DataFrame:
    """Audio feature extraction — REAL end to end for raw PCM16 AND WAV
    containers: RIFF blobs parse through decode_wav (chunk walk, mono mix,
    container sample rate wins), anything else decodes as bare int16 PCM
    via np.frombuffer. Features: per-frame RMS energy and zero-crossing
    rate over the first `n_frames_keep` frames (padded with zeros for
    short clips). Compressed codecs (mp3/ogg) would slot in at the decode
    line."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats, rates = [], [], []
            for row in pdf.itertuples(index=False):
                raw = bytes(row.media)
                wav_rate = None
                if raw[:4] == b"RIFF":
                    pcm, wav_rate = decode_wav(raw)
                else:
                    pcm = np.frombuffer(raw, dtype="<i2").astype(np.float32)
                    pcm = pcm / 32768.0
                n = (len(pcm) // frame_len) * frame_len
                frames = pcm[:n].reshape(-1, frame_len) if n else np.zeros((0, frame_len), np.float32)
                rms = np.sqrt((frames**2).mean(axis=1)) if len(frames) else np.array([])
                zcr = (
                    (np.diff(np.signbit(frames), axis=1) != 0).mean(axis=1)
                    if len(frames)
                    else np.array([])
                )
                vec = np.zeros(2 * n_frames_keep, dtype=np.float32)
                k = min(n_frames_keep, len(rms))
                vec[:k] = rms[:k]
                vec[n_frames_keep : n_frames_keep + k] = zcr[:k]
                ids.append(row.id)
                feats.append(vec)
                rates.append(
                    int(wav_rate if wav_rate is not None
                        else (row.meta["sample_rate"] or 0))
                )
            yield pd.DataFrame(
                {"id": ids, "features": feats, "sample_rate": rates}
            )

    return df.select("id", "media", "meta").mapInPandas(
        kernel, schema="id long, features array<float>, sample_rate int"
    )


def frame_sample(
    df: DataFrame, every_n: int = 10, attach_bytes: bool = True
) -> DataFrame:
    """Video frame sampling: emits (id, frame_idx, frame) for frames
    0, every_n, 2*every_n, ... of meta.n_frames.

    For the raw-video container (media = n_frames concatenated
    width*height grayscale planes, detected by exact length match) the
    frame bytes are sliced JVM-side with substring over the binary column
    — no decode UDF, whole-stage codegen end to end. Compressed video
    codecs remain stubbed (frame = NULL, the libs aren't in this
    container); the per-frame row shape, partitioning, and downstream
    contract (feed frames to image_features via resize_gray) are identical
    either way."""
    idxs = F.sequence(
        F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n)
    )
    out = df.select("id", "media", "meta", F.explode(idxs).alias("frame_idx"))
    if not attach_bytes:
        return out.select("id", "frame_idx")
    fsz = F.col("meta.width") * F.col("meta.height")
    is_raw = F.length(F.col("media")) == fsz * F.col("meta.n_frames")
    frame = F.when(
        is_raw,
        F.expr(
            "substring(media, frame_idx * (meta.width * meta.height) + 1,"
            " meta.width * meta.height)"
        ),
    )
    return out.select("id", "frame_idx", frame.alias("frame"))


def synthetic_video(spark, n: int = 8, seed: int = 7) -> DataFrame:
    """Deterministic raw-container video corpus: media = n_frames
    concatenated width*height grayscale planes."""
    rows = []
    for i in range(n):
        rng = np.random.RandomState(seed * 99991 + i)
        w, h = int(rng.randint(4, 17)), int(rng.randint(4, 17))
        nf = int(rng.randint(1, 25))
        blob = rng.bytes(w * h * nf)
        rows.append((i, bytearray(blob), "video/raw-gray", (w, h, nf, 0)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_media(spark, n: int = 64, seed: int = 3) -> DataFrame:
    """Deterministic fake multimodal corpus for plumbing tests."""
    rows = []
    for i in range(n):
        rng = np.random.RandomState(seed * 100003 + i)
        w, h = int(rng.randint(8, 33)), int(rng.randint(8, 33))
        blob = rng.bytes(w * h)
        rows.append(
            (i, bytearray(blob), "image/fake", (w, h, int(rng.randint(1, 100)), 0))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
