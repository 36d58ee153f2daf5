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


# --------------------------------------------------------------------------
# baseline JPEG encoder (forward DCT + quantize + Huffman). Uses FIXED-
# LENGTH canonical Huffman tables (all 12 DC symbols at 4 bits, all 162
# AC run/size symbols at 8 bits) — a perfectly valid T.81 code that
# keeps the encoder trivially correct; the decoder's variable-length
# path is exercised by the real-world CPython python.jpg fixture.

_JPEG_ZZ = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

_JPEG_A = np.array([
    [(np.sqrt(0.5) if u == 0 else 1.0) * 0.5
     * np.cos((2 * x + 1) * u * np.pi / 16.0)
     for x in range(8)] for u in range(8)])

_DC_BITS = [0, 0, 0, 12] + [0] * 12          # 12 symbols, all length 4
_DC_VALS = bytes(range(12))
_AC_VALS = bytes(sorted(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]))
_AC_BITS = [0] * 7 + [len(_AC_VALS)] + [0] * 8   # 162 symbols, length 8
_AC_CODE = {rs: i for i, rs in enumerate(_AC_VALS)}


class _JpegWriter:
    """MSB-first bit writer with 0xFF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, n: int):
        self.acc = (self.acc << n) | (code & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def pad(self):
        if self.nbits:
            self.put((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _jpeg_mag(v: int) -> tuple[int, int]:
    """value -> (size, raw bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _jpeg_block(wr: _JpegWriter, coef_zz: np.ndarray, pred: int) -> int:
    """Huffman-encode one quantized zigzag block; returns new DC pred."""
    dc = int(coef_zz[0])
    s, bits = _jpeg_mag(dc - pred)
    wr.put(s, 4)                 # fixed-length DC code == symbol value
    if s:
        wr.put(bits, s)
    run = 0
    for k in range(1, 64):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            wr.put(_AC_CODE[0xF0], 8)   # ZRL
            run -= 16
        s, bits = _jpeg_mag(v)
        wr.put(_AC_CODE[(run << 4) | s], 8)
        wr.put(bits, s)
        run = 0
    if run:
        wr.put(_AC_CODE[0x00], 8)       # EOB
    return dc


def _pad_to(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def encode_jpeg(img: np.ndarray, subsample: tuple[int, int] = (1, 1),
                qy: np.ndarray | int = 1, qc: np.ndarray | int = 1,
                restart_interval: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JPEG bytes.

    ``subsample=(1, 1)`` is 4:4:4; ``(2, 2)`` is 4:2:0 (box-average
    chroma downsampling). ``qy``/``qc`` are 8x8 quantization tables or
    a scalar (1 = near-lossless apart from DCT rounding).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (exercises the decoder's restart path).
    """
    h, w = img.shape[:2]
    qy = np.full((8, 8), qy, np.int32) if np.isscalar(qy) else np.asarray(qy, np.int32)
    qc = np.full((8, 8), qc, np.int32) if np.isscalar(qc) else np.asarray(qc, np.int32)
    sh, sv = subsample

    f = img.astype(np.float64)
    r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    if (sh, sv) != (1, 1):
        eh, ew = -(-h // sv) * sv, -(-w // sh) * sh
        cbp = _pad_to(cb, eh, ew).reshape(eh // sv, sv, ew // sh, sh)
        crp = _pad_to(cr, eh, ew).reshape(eh // sv, sv, ew // sh, sh)
        cb = cbp.mean(axis=(1, 3))
        cr = crp.mean(axis=(1, 3))

    mcux, mcuy = -(-w // (8 * sh)), -(-h // (8 * sv))
    planes = [
        (_pad_to(y, mcuy * sv * 8, mcux * sh * 8), sh, sv, qy),
        (_pad_to(cb, mcuy * 8, mcux * 8), 1, 1, qc),
        (_pad_to(cr, mcuy * 8, mcux * 8), 1, 1, qc),
    ]

    out = bytearray(b"\xff\xd8")
    for tid, q in ((0, qy), (1, qc)):
        zz = q.reshape(64)[_JPEG_ZZ].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, (hi, vi, tq) in ((1, (sh, sv, 0)), (2, (1, 1, 1)), (3, (1, 1, 1))):
        sof += bytes([cid, (hi << 4) | vi, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for cls, tid, bits, vals in ((0, 0, _DC_BITS, _DC_VALS),
                                 (1, 0, _AC_BITS, _AC_VALS),
                                 (0, 1, _DC_BITS, _DC_VALS),
                                 (1, 1, _AC_BITS, _AC_VALS)):
        body = bytes([(cls << 4) | tid]) + bytes(bits) + vals
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    wr = _JpegWriter()
    pred = [0, 0, 0]
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            wr.pad()
            wr.out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            pred = [0, 0, 0]
        my, mx = divmod(m, mcux)
        for ci, (plane, hi, vi, q) in enumerate(planes):
            for by in range(vi):
                for bx in range(hi):
                    y0, x0 = (my * vi + by) * 8, (mx * hi + bx) * 8
                    blk = plane[y0:y0 + 8, x0:x0 + 8] - 128.0
                    F = _JPEG_A @ blk @ _JPEG_A.T
                    qz = np.round(F / q).astype(np.int64)
                    pred[ci] = _jpeg_block(wr, qz.reshape(64)[_JPEG_ZZ],
                                           pred[ci])
    wr.pad()
    out += wr.out + b"\xff\xd9"
    return bytes(out)


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
