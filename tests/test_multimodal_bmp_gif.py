"""BMP + GIF real-decode tests: hand-encoded fixtures, pixel-exact."""

import struct

import numpy as np
import pytest

from lucene_solr_spark.pipeline.multimodal import (
    decode_bmp, decode_gif, decode_image,
)


def _make_bmp24(px_rgb: np.ndarray, top_down: bool = False) -> bytes:
    h, w, _ = px_rgb.shape
    stride = (w * 3 + 3) & ~3
    rows = []
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        row = bytearray()
        for x in range(w):
            r, g, b = px_rgb[y, x]
            row += bytes([b, g, r])
        row += b"\0" * (stride - len(row))
        rows.append(bytes(row))
    data = b"".join(rows)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0,
        len(data), 2835, 2835, 0, 0)
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(data), 0, 0, 14 + 40)
    return hdr + dib + data


def _make_bmp8(idx: np.ndarray, palette_rgb) -> bytes:
    h, w = idx.shape
    stride = (w + 3) & ~3
    data = b"".join(
        bytes(idx[y].tolist()) + b"\0" * (stride - w)
        for y in range(h - 1, -1, -1))
    pal = b"".join(bytes([b, g, r, 0]) for r, g, b in palette_rgb)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(data), 0, 0,
        len(palette_rgb), 0)
    off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    return hdr + dib + pal + data


def _make_gif(idx: np.ndarray, palette_rgb, interlace: bool = False) -> bytes:
    """Minimal GIF89a writer: literal-only LZW with a CLEAR before every
    pixel code (valid per the spec; keeps the code width fixed)."""
    h, w = idx.shape
    n_col = len(palette_rgb)
    depth = max(2, (n_col - 1).bit_length())
    min_code = depth
    clear = 1 << min_code
    code_size = min_code + 1
    # bit-pack LSB-first: CLEAR, pixel, CLEAR, pixel, ..., EOI
    acc = bits = 0
    out = bytearray()
    rows = idx
    if interlace:
        order = (list(range(0, h, 8)) + list(range(4, h, 8))
                 + list(range(2, h, 4)) + list(range(1, h, 2)))
        rows = idx[order]

    def emit(code):
        nonlocal acc, bits
        acc |= code << bits
        bits += code_size
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    for v in rows.flatten().tolist():
        emit(clear)
        emit(v)
    emit(clear + 1)  # EOI
    if bits:
        out.append(acc & 0xFF)
    sub = bytearray()
    for i in range(0, len(out), 255):
        chunk = out[i : i + 255]
        sub += bytes([len(chunk)]) + chunk
    sub += b"\0"
    gct = b"".join(bytes(c) for c in palette_rgb)
    gct += b"\0\0\0" * ((1 << depth) - n_col)
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
        + gct
        + b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
        + bytes([0x40 if interlace else 0])
        + bytes([min_code]) + bytes(sub)
        + b"\x3b")


def _luma(rgb):
    r, g, b = (rgb[..., i].astype(np.int64) for i in range(3))
    return ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)


def test_bmp24_round_trip():
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(5, 3, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(_make_bmp24(px)), _luma(px))
    assert np.array_equal(
        decode_bmp(_make_bmp24(px, top_down=True)), _luma(px))


def test_bmp8_palette():
    idx = np.array([[0, 1, 2, 1], [2, 2, 0, 1]], dtype=np.uint8)
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    got = decode_bmp(_make_bmp8(idx, pal))
    want = np.array([76, 149, 29], dtype=np.uint8)[idx]
    assert np.array_equal(got, want)


def test_bmp_rejects():
    with pytest.raises(ValueError):
        decode_bmp(b"XX123456")


def test_gif_round_trip():
    rng = np.random.RandomState(9)
    idx = rng.randint(0, 4, size=(6, 5), dtype=np.uint8)
    pal = [(0, 0, 0), (85, 85, 85), (170, 170, 170), (255, 255, 255)]
    got = decode_gif(_make_gif(idx, pal))
    want = np.array([0, 85, 170, 255], dtype=np.uint8)[idx]
    assert np.array_equal(got, want)


def test_gif_interlaced():
    rng = np.random.RandomState(11)
    idx = rng.randint(0, 4, size=(9, 4), dtype=np.uint8)
    pal = [(0, 0, 0), (85, 85, 85), (170, 170, 170), (255, 255, 255)]
    got = decode_gif(_make_gif(idx, pal, interlace=True))
    want = np.array([0, 85, 170, 255], dtype=np.uint8)[idx]
    assert np.array_equal(got, want)


def test_decode_image_dispatch():
    idx = np.zeros((2, 2), dtype=np.uint8)
    pal = [(10, 10, 10)]
    gif = _make_gif(idx, pal)
    assert decode_image(gif, 2, 2).shape == (2, 2)
    bmp = _make_bmp24(np.zeros((2, 2, 3), dtype=np.uint8))
    assert decode_image(bmp, 2, 2).shape == (2, 2)


def _lzw_compress(indices, min_code):
    """Real GIF-LZW compressor (dictionary growth + width bumps) so the
    decoder's table-growth and KwKwK branches get exercised."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    codes = []
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    codes.append(clear)
    w = b""
    for v in bytes(indices):
        wk = w + bytes([v])
        if wk in table:
            w = wk
        else:
            codes.append(table[w])
            table[wk] = next_code
            next_code += 1
            w = bytes([v])
            if next_code > 4096:
                codes.append(clear)
                table = {bytes([i]): i for i in range(clear)}
                next_code = eoi + 1
    if w:
        codes.append(table[w])
    codes.append(eoi)
    # bit-pack with the decoder's width schedule: width bumps AFTER the
    # code that fills the table (encoder: when next_code-1 hits 2^width)
    out = bytearray()
    acc = bits = 0
    width = min_code + 1
    next_code = eoi + 1
    table_size = clear  # mirrors decoder's len(table) - 2
    for c in codes:
        acc |= c << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
        if c == clear:
            width = min_code + 1
            table_size = clear
            started = False
        elif c != eoi:
            if started:
                table_size += 1
                if table_size + 2 == (1 << width) and width < 12:
                    width += 1
            started = True
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_gif_real_lzw_stream():
    rng = np.random.RandomState(21)
    # repetitive rows force real dictionary reuse + KwKwK patterns
    idx = np.tile(rng.randint(0, 4, size=(4, 16), dtype=np.uint8), (8, 1))
    h, w = idx.shape
    pal = [(0, 0, 0), (85, 85, 85), (170, 170, 170), (255, 255, 255)]
    lzw = _lzw_compress(idx.flatten(), 2)
    sub = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        sub += bytes([len(chunk)]) + chunk
    sub += b"\0"
    gct = b"".join(bytes(c) for c in pal)
    blob = (
        b"GIF89a" + struct.pack("<HHBBB", w, h, 0x81, 0, 0) + gct
        + b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\0"
        + bytes([2]) + bytes(sub) + b"\x3b")
    got = decode_gif(blob)
    want = np.array([0, 85, 170, 255], dtype=np.uint8)[idx]
    assert np.array_equal(got, want)
