"""Minimal PNG/BMP/GIF *encoders* — test arbiters for the real pixel
decoders in ``geodistpy_spark.textops.pixels``.

These implement the forward direction of each format from the public
specs (scanline filtering for PNG, row packing for BMP, LZW compression
for GIF), so ``decode(encode(img)) == img`` is a genuine two-sided gate:
filter vs unfilter and LZW compress vs decompress are distinct
algorithms, not shared code. Also used by
``scripts/make_media_fixtures.py`` to produce the committed golden
bytes in ``fixtures/media/``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def _png_filter_row(ft: int, row: np.ndarray, prev: np.ndarray,
                    bpp: int) -> bytes:
    r = row.astype(np.int32)
    b = prev.astype(np.int32)
    a = np.concatenate([np.zeros(bpp, np.int32), r[:-bpp]])
    c = np.concatenate([np.zeros(bpp, np.int32), b[:-bpp]])
    if ft == 0:
        out = r
    elif ft == 1:
        out = r - a
    elif ft == 2:
        out = r - b
    elif ft == 3:
        out = r - ((a + b) >> 1)
    elif ft == 4:
        p = a + b - c
        pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
        pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
        out = r - pred
    else:
        raise ValueError(ft)
    return bytes([ft]) + (out & 0xFF).astype(np.uint8).tobytes()


def encode_png(img: np.ndarray, color_type: int = 2,
               filters=None, palette: np.ndarray | None = None) -> bytes:
    """(h, w, ch) uint8 -> PNG bytes. color_type 0 (gray, ch=1),
    2 (RGB), 3 (palette, ch=1 indices + palette table), 4 (gray+alpha,
    ch=2), 6 (RGBA). ``filters``: per-row filter type list (default:
    cycle 0..4)."""
    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    flat = img.reshape(h, w * ch)
    if filters is None:
        filters = [(y % 5) for y in range(h)]
    body = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        body += _png_filter_row(filters[y], flat[y], prev, ch)
        prev = flat[y]
    out = bytearray(_PNG_MAGIC)
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
    if color_type == 3:
        assert palette is not None
        out += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    out += _chunk(b"IDAT", zlib.compress(bytes(body), 6))
    out += _chunk(b"IEND", b"")
    return bytes(out)


def encode_bmp(img: np.ndarray, bpp: int = 24, top_down: bool = False,
               palette: np.ndarray | None = None) -> bytes:
    """(h, w, 3) uint8 RGB (or (h, w) indices for bpp=8) -> BMP bytes."""
    h, w = img.shape[:2]
    stride = (w * (bpp // 8) + 3) & ~3
    pal = b""
    if bpp == 8:
        assert palette is not None and img.ndim == 2
        pal_rgba = np.zeros((len(palette), 4), np.uint8)
        pal_rgba[:, :3] = palette[:, ::-1]  # RGB -> BGR0
        pal = pal_rgba.tobytes()
        rows = img.astype(np.uint8)
    else:
        bgr = img[:, :, ::-1]
        if bpp == 32:
            bgra = np.zeros((h, w, 4), np.uint8)
            bgra[:, :, :3] = bgr
            bgra[:, :, 3] = 255
            rows = bgra.reshape(h, w * 4)
        else:
            rows = bgr.reshape(h, w * 3)
    data = bytearray()
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        r = rows[y].tobytes()
        data += r + b"\x00" * (stride - len(r))
    data_off = 54 + len(pal)
    n_colors = (len(pal) // 4) if pal else 0
    hdr = (b"BM" + struct.pack("<IHHI", data_off + len(data), 0, 0, data_off)
           + struct.pack("<IiiHHIIiiII", 40, w, (-h if top_down else h),
                         1, bpp, 0, len(data), 2835, 2835, n_colors, 0))
    return hdr + pal + bytes(data)


def _gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Real GIF LZW compression (string-table build, CLEAR on 12-bit
    overflow), LSB-first variable-width code packing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, size: int):
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += size
        while nbits >= 8:
            out_bits.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    cur = b""
    for byte in indices:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], code_size)
        table[nxt] = next_code
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
        next_code += 1
        if next_code > 4095:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        cur = bytes([byte])
    if cur:
        emit(table[cur], code_size)
    emit(eoi, code_size)
    if nbits:
        out_bits.append(bitbuf & 0xFF)
    return bytes(out_bits)


def encode_gif(indices: np.ndarray, palette: np.ndarray,
               interlace: bool = False) -> bytes:
    """(h, w) uint8 palette indices + (n, 3) palette -> single-frame GIF."""
    h, w = indices.shape
    n = len(palette)
    bits = max(2, int(np.ceil(np.log2(max(n, 2)))))
    table_size = 1 << bits
    pal = np.zeros((table_size, 3), np.uint8)
    pal[:n] = palette
    rows = indices
    if interlace:
        order = np.concatenate([
            np.arange(0, h, 8), np.arange(4, h, 8),
            np.arange(2, h, 4), np.arange(1, h, 2)])
        rows = indices[order]
    min_code = max(2, bits)
    stream = _gif_lzw_encode(rows.astype(np.uint8).tobytes(), min_code)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT flag+size, bg=0, aspect=0
    out += pal.tobytes()
    out += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0x00])
    out += bytes([min_code])
    for i in range(0, len(stream), 255):
        block = stream[i:i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3B"
    return bytes(out)
