"""Multimodal column plumbing: opaque binary media + typed metadata.

Media payloads are opaque ``binary`` columns with typed metadata; the
Spark-side plumbing (schemas, partitioning, Arrow batch shapes,
``mapInPandas`` signatures) is real and tested.

The decode is REAL at two levels:

- container headers: PNG / BMP / GIF / JPEG-SOF / WEBP (VP8, VP8L,
  VP8X) / TIFF-IFD dimensions parsed from the payload bytes (pure byte
  math — :func:`parse_image_header`);
- pixels: PNG (stdlib zlib inflate + scanline unfiltering), BMP
  (uncompressed rows), GIF (LZW) and baseline JPEG (Huffman + IDCT)
  are fully pixel-decoded by :mod:`.pixels`, and
  ``decode_media(..., fake=False)`` computes its feature column from
  the true pixel values.

Progressive-JPEG / WebP / TIFF pixel streams need codec machinery out
of scope here: for those (and unrecognized payloads) ``fake=False``
raises, while ``fake=True`` keeps the deterministic byte-derived
stand-in features + pseudo-dimensions (oracle-mirrorable) — clearly
marked.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_FEATURE_DIM = 8
PAYLOAD_BYTES = 128

DECODED_SCHEMA = (
    "doc_id string, span_idx int, media_ref string, format string, "
    "width int, height int, n_bytes long, features array<float>"
)

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def parse_image_header(p: bytes):
    """(format, width, height) from container header bytes, or None.

    Pure-Python header parsing (public container specs): PNG IHDR,
    BMP BITMAPINFOHEADER, GIF logical screen descriptor, JPEG SOF scan,
    WEBP RIFF (VP8 lossy frame tag / VP8L bitstream / VP8X canvas),
    TIFF IFD (both byte orders, ImageWidth/ImageLength tags 256/257).
    """
    if len(p) >= 24 and p[:8] == _PNG_MAGIC and p[12:16] == b"IHDR":
        w, h = struct.unpack(">II", p[16:24])
        return "png", w, h
    if len(p) >= 26 and p[:2] == b"BM":
        (hdr_size,) = struct.unpack("<I", p[14:18])
        if hdr_size >= 40:
            w, h = struct.unpack("<ii", p[18:26])
            return "bmp", w, abs(h)
    if len(p) >= 10 and p[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", p[6:10])
        return "gif", w, h
    if len(p) >= 16 and p[:4] == b"RIFF" and p[8:12] == b"WEBP":
        chunk = p[12:16]
        if chunk == b"VP8X" and len(p) >= 30:
            w = 1 + int.from_bytes(p[24:27], "little")
            h = 1 + int.from_bytes(p[27:30], "little")
            return "webp", w, h
        if chunk == b"VP8 " and len(p) >= 30 and p[23:26] == b"\x9d\x01\x2a":
            w = int.from_bytes(p[26:28], "little") & 0x3FFF
            h = int.from_bytes(p[28:30], "little") & 0x3FFF
            return "webp", w, h
        if chunk == b"VP8L" and len(p) >= 25 and p[20] == 0x2F:
            bits = int.from_bytes(p[21:25], "little")
            return "webp", (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
        return None
    if len(p) >= 8 and p[:4] in (b"II*\x00", b"MM\x00*"):
        bo = "little" if p[:2] == b"II" else "big"
        off = int.from_bytes(p[4:8], bo)
        if off + 2 <= len(p):
            n = int.from_bytes(p[off:off + 2], bo)
            w = h = None
            for k in range(n):
                e = off + 2 + 12 * k
                if e + 12 > len(p):
                    break
                tag = int.from_bytes(p[e:e + 2], bo)
                typ = int.from_bytes(p[e + 2:e + 4], bo)
                # value is left-justified in the 4-byte field: SHORT (3)
                # reads 2 bytes, LONG (4) reads 4, in either byte order
                if typ == 3:
                    val = int.from_bytes(p[e + 8:e + 10], bo)
                else:
                    val = int.from_bytes(p[e + 8:e + 12], bo)
                if tag == 256:
                    w = val
                elif tag == 257:
                    h = val
            if w and h:
                return "tiff", w, h
        return None
    if len(p) >= 4 and p[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(p):
            if p[i] != 0xFF:
                break
            marker = p[i + 1]
            if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                h, w = struct.unpack(">HH", p[i + 5: i + 9])
                return "jpeg", w, h
            (seg,) = struct.unpack(">H", p[i + 2: i + 4])
            i += 2 + seg
        return None
    return None


def _synth_payload(ref: str) -> bytes:
    """Deterministic media payload for the fetch STUB: a fifth each of
    real PNG / BMP / WEBP-VP8X / TIFF headers (dimensions derived from
    sha256(ref), so a SQL oracle can mirror them) and raw unheadered
    streams. Always exactly PAYLOAD_BYTES bytes.
    """
    h = hashlib.sha256(ref.encode()).digest()
    kind = h[0] % 5
    w = 16 + (h[1] | (h[2] << 8)) % 2033
    ht = 16 + (h[3] | (h[4] << 8)) % 1525
    if kind == 0:
        head = (_PNG_MAGIC + b"\x00\x00\x00\x0d" + b"IHDR"
                + struct.pack(">II", w, ht) + b"\x08\x06\x00\x00\x00")
    elif kind == 1:
        head = (b"BM" + struct.pack("<I", PAYLOAD_BYTES) + b"\x00\x00\x00\x00"
                + struct.pack("<I", 54) + struct.pack("<I", 40)
                + struct.pack("<ii", w, ht))
    elif kind == 2:
        head = (b"RIFF" + struct.pack("<I", PAYLOAD_BYTES - 8) + b"WEBP"
                + b"VP8X" + struct.pack("<I", 10) + b"\x00\x00\x00\x00"
                + (w - 1).to_bytes(3, "little") + (ht - 1).to_bytes(3, "little"))
    elif kind == 3:
        head = (b"II*\x00" + struct.pack("<I", 8)
                + struct.pack("<H", 2)
                + struct.pack("<HHI", 256, 4, 1) + struct.pack("<I", w)
                + struct.pack("<HHI", 257, 4, 1) + struct.pack("<I", ht)
                + struct.pack("<I", 0))
    else:
        head = b""
    return (head + h * 4)[:PAYLOAD_BYTES]


def fetch_media_bytes(media_spans: DataFrame) -> DataFrame:
    """Resolve media_ref -> binary payload.

    STUB: a real deployment resolves ``media://`` refs against an object
    store. Here the payload is a deterministic function of the ref (see
    :func:`_synth_payload`) including REAL PNG/BMP/WEBP/TIFF container
    headers, so the downstream header decode runs on genuine byte layouts.
    Column types and batch flow match the real path exactly.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pdf.assign(payload=[_synth_payload(r) for r in pdf["media_ref"]])

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in media_spans.schema.fields)
    return media_spans.mapInPandas(gen, schema=schema + ", payload binary")


def decode_media(media_with_bytes: DataFrame, fake: bool = True) -> DataFrame:
    """Decode binary media -> (format, dimensions, feature vector).

    ``fake=False`` is the REAL path: PNG/BMP/GIF/baseline-JPEG payloads
    are pixel-decoded (stdlib zlib + numpy — :mod:`.pixels`),
    dimensions come from the decoded array, and ``features`` is
    :func:`.pixels.pixel_features` computed from true pixel values.
    Containers whose pixel streams need absent codec machinery
    (progressive JPEG/WebP/TIFF) or unrecognized payloads raise
    NotImplementedError from the executors.

    ``fake=True`` is the plumbing/oracle path: dimensions are real for
    recognized container headers, pseudo-dimensions are derived from
    leading bytes otherwise (format 'raw'), and features are a
    deterministic byte-derived stand-in that a SQL oracle can mirror.
    The Arrow batch shape, output schema, and partition behavior are
    identical in both modes.
    """
    from .pixels import decode_pixels, pixel_features

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, widths, heights = [], [], []
            real_feats: list[np.ndarray] = []
            # null payloads become b"": the real path then raises its
            # documented undecodable error; the fake path derives the
            # deterministic zero-stream stand-in instead of crashing
            # bytes(None) inside the executor
            payloads = [b"" if p is None else bytes(p) for p in pdf["payload"]]
            for b in payloads:
                if not fake:
                    fmt, img = decode_pixels(b)  # raises for jpeg/webp/raw
                    fmts.append(fmt)
                    heights.append(img.shape[0])
                    widths.append(img.shape[1])
                    real_feats.append(pixel_features(img))
                    continue
                hdr = parse_image_header(b)
                if hdr is not None:
                    fmts.append(hdr[0]); widths.append(hdr[1]); heights.append(hdr[2])
                else:
                    u0, u1 = (struct.unpack("<HH", b[:4])
                              if len(b) >= 4 else (64, 64))
                    fmts.append("raw")
                    widths.append(u0 % 1920 + 16)
                    heights.append(u1 % 1080 + 16)
            if fake:
                # sub-window payloads left-pad with zero bytes so the
                # stack stays rectangular (synth payloads are always
                # >= the window, so the padded branch never changes a
                # value the SQL oracle mirrors)
                win = MEDIA_FEATURE_DIM * 4
                raw = np.stack([
                    np.frombuffer(b[-win:].rjust(win, b"\0"), dtype=np.uint8)
                    for b in payloads
                ])
                feats = list((raw.reshape(len(pdf), MEDIA_FEATURE_DIM, 4)
                              .sum(axis=2) / 1020.0).astype(np.float32))
            else:
                feats = real_feats
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "span_idx": pdf["span_idx"],
                "media_ref": pdf["media_ref"],
                "format": fmts,
                "width": np.asarray(widths, dtype="int32"),
                "height": np.asarray(heights, dtype="int32"),
                "n_bytes": np.asarray([len(b) for b in payloads],
                                      dtype="int64"),
                "features": feats,
            })

    return media_with_bytes.mapInPandas(gen, schema=DECODED_SCHEMA)


def media_feature_pipeline(docs: DataFrame) -> DataFrame:
    """documents -> media spans -> bytes -> decoded features.

    The end-to-end multimodal path: extraction is pure Catalyst; fetch +
    decode are Arrow-batched mapInPandas stages that scale by partition.
    """
    from ..sources.documents import extract_media_spans

    spans = extract_media_spans(docs)
    with_bytes = fetch_media_bytes(spans.select("doc_id", "span_idx", "media_ref"))
    return decode_media(with_bytes)


FRAME_BYTES = 32


def sample_frames(media_with_bytes: DataFrame, n_frames: int = 4) -> DataFrame:
    """Uniform frame sampling from opaque video payloads — one output
    row per sampled frame: (doc_id, span_idx, media_ref, n_total,
    frame_idx, frame_bytes).

    Payloads are treated as a sequence of ``FRAME_BYTES``-byte frames
    (the deterministic stand-in for a codec's frame index; a real
    deployment points the SAME plumbing — mapInPandas with a
    one-in/many-out exploding batch shape — at the container's real
    frame table). Sampling picks ``n_frames`` evenly spaced frames
    (``floor(i * n_total / n_frames)``, deduplicated when the clip is
    shorter than the ask), so re-runs and engines agree byte-for-byte.
    """
    if n_frames < 1:
        raise ValueError(f"n_frames must be >= 1, got {n_frames}")

    out_schema = (
        "doc_id string, span_idx int, media_ref string, "
        "n_total int, frame_idx int, frame_bytes binary"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "span_idx", "media_ref",
                                   "n_total", "frame_idx", "frame_bytes")}
            for _, row in pdf.iterrows():
                raw = row["payload"]
                p = b"" if raw is None else bytes(raw)
                total = max(len(p) // FRAME_BYTES, 0)
                if total == 0:
                    continue
                n_eff = min(n_frames, total)
                picks = sorted({i * total // n_eff for i in range(n_eff)})
                for fi in picks:
                    out["doc_id"].append(row["doc_id"])
                    out["span_idx"].append(row["span_idx"])
                    out["media_ref"].append(row["media_ref"])
                    out["n_total"].append(total)
                    out["frame_idx"].append(fi)
                    out["frame_bytes"].append(
                        p[fi * FRAME_BYTES:(fi + 1) * FRAME_BYTES])
            if out["doc_id"]:
                yield pd.DataFrame(out)

    return media_with_bytes.mapInPandas(gen, schema=out_schema)


def resize_media(media_with_bytes: DataFrame, out_h: int = 8,
                 out_w: int = 8) -> DataFrame:
    """Bilinear resize of each media item's luminance grid to
    (out_h, out_w): (doc_id, span_idx, media_ref, src_h, src_w, pixels)
    with ``pixels`` a row-major array<float> of length out_h * out_w.

    The RESIZE math (vectorized numpy bilinear over the Arrow batch) is
    real, and so is the SOURCE grid for PNG/BMP/GIF/baseline-JPEG
    payloads: they are pixel-decoded (:mod:`.pixels`) to a true
    Rec.601 luminance grid. Payloads whose codecs are absent
    (progressive JPEG/WebP/TIFF/raw) fall back to a deterministic
    sha256-stream luminance grid at the header's true aspect ratio
    (clamped to 16x16 samples) — the honest stand-in.
    """
    if out_h < 1 or out_w < 1:
        raise ValueError(f"output shape must be >= 1x1, got {out_h}x{out_w}")

    out_schema = (
        "doc_id string, span_idx int, media_ref string, "
        "src_h int, src_w int, pixels array<float>"
    )

    def _src_grid(p: bytes):
        # real path first: PNG/BMP/GIF decode to a true luminance grid
        from .pixels import decode_pixels
        try:
            _, img = decode_pixels(p)
        except (NotImplementedError, ValueError):
            img = None
        if img is not None:
            f = img.astype(np.float64) / 255.0
            lum = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
            return img.shape[0], img.shape[1], lum
        hdr = parse_image_header(p)
        if hdr is not None:
            _, w, h = hdr
        else:
            u0, u1 = struct.unpack("<HH", p[:4]) if len(p) >= 4 else (64, 64)
            w, h = u0 % 1920 + 16, u1 % 1080 + 16
        gh, gw = min(h, 16), min(w, 16)
        stream = hashlib.sha256(p).digest()
        while len(stream) < gh * gw:
            stream += hashlib.sha256(stream).digest()
        g = np.frombuffer(stream[:gh * gw], dtype=np.uint8) / 255.0
        return h, w, g.reshape(gh, gw)

    def _bilinear(g: np.ndarray) -> np.ndarray:
        gh, gw = g.shape
        ys = np.linspace(0.0, gh - 1.0, out_h)
        xs = np.linspace(0.0, gw - 1.0, out_w)
        y0 = np.clip(np.floor(ys).astype(int), 0, gh - 1)
        x0 = np.clip(np.floor(xs).astype(int), 0, gw - 1)
        y1 = np.minimum(y0 + 1, gh - 1)
        x1 = np.minimum(x0 + 1, gw - 1)
        fy = (ys - y0)[:, None]
        fx = (xs - x0)[None, :]
        return ((g[y0][:, x0] * (1 - fy) * (1 - fx))
                + (g[y1][:, x0] * fy * (1 - fx))
                + (g[y0][:, x1] * (1 - fy) * fx)
                + (g[y1][:, x1] * fy * fx))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hs, ws, px = [], [], []
            for p in pdf["payload"]:
                h, w, g = _src_grid(b"" if p is None else bytes(p))
                hs.append(h)
                ws.append(w)
                px.append(_bilinear(g).ravel().astype(np.float32))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "span_idx": pdf["span_idx"],
                "media_ref": pdf["media_ref"],
                "src_h": np.asarray(hs, dtype="int32"),
                "src_w": np.asarray(ws, dtype="int32"),
                "pixels": px,
            })

    return media_with_bytes.mapInPandas(gen, schema=out_schema)
