"""Generate committed golden media fixtures for the real pixel
decoders: deterministic images encoded as PNG (every filter type /
color type), BMP (8/24/32 bpp, both row orders) and GIF (plain +
interlaced), plus the expected pixel arrays.

Writes fixtures/media/{name}.bin and fixtures/media/expected.npz.
The tests decode the committed bytes and compare against the committed
arrays — a regression gate independent of the encoders (which live in
tests/media_encoders.py and are themselves gated by round-trip tests).

Usage: python scripts/make_media_fixtures.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

from media_encoders import (  # noqa: E402
    encode_bmp, encode_gif, encode_jpeg, encode_png)

OUT = os.path.join(_REPO, "fixtures", "media")


def _img(h, w, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(7)
    expected = {}
    blobs = {}

    # PNG RGB, mixed filters (one of each type in the first 5 rows)
    img = _img(23, 17, 1)
    blobs["png_rgb"] = encode_png(img, color_type=2)
    expected["png_rgb"] = img

    # PNG grayscale
    g = rng.integers(0, 256, size=(12, 31), dtype=np.uint8)
    blobs["png_gray"] = encode_png(g, color_type=0)
    expected["png_gray"] = np.repeat(g[:, :, None], 3, axis=2)

    # PNG palette
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(9, 14), dtype=np.uint8)
    blobs["png_palette"] = encode_png(idx, color_type=3, palette=pal)
    expected["png_palette"] = pal[idx]

    # PNG RGBA (alpha dropped on decode)
    rgba = rng.integers(0, 256, size=(8, 8, 4), dtype=np.uint8)
    blobs["png_rgba"] = encode_png(rgba, color_type=6)
    expected["png_rgba"] = rgba[:, :, :3]

    # BMP 24-bit bottom-up (width not a multiple of 4 -> padded rows)
    img = _img(11, 13, 2)
    blobs["bmp24"] = encode_bmp(img, bpp=24)
    expected["bmp24"] = img

    # BMP 32-bit top-down
    img = _img(7, 9, 3)
    blobs["bmp32_topdown"] = encode_bmp(img, bpp=32, top_down=True)
    expected["bmp32_topdown"] = img

    # BMP 8-bit palette
    pal8 = rng.integers(0, 256, size=(32, 3), dtype=np.uint8)
    idx8 = rng.integers(0, 32, size=(10, 21), dtype=np.uint8)
    blobs["bmp8_palette"] = encode_bmp(idx8, bpp=8, palette=pal8)
    expected["bmp8_palette"] = pal8[idx8]

    # GIF: structured image (repeating texture -> multi-byte LZW strings
    # exercise real dictionary growth), 4-bit palette
    gpal = rng.integers(0, 256, size=(11, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:19, 0:27]
    gidx = ((yy // 3 + xx // 2) % 11).astype(np.uint8)
    blobs["gif_plain"] = encode_gif(gidx, gpal)
    expected["gif_plain"] = gpal[gidx]

    # GIF interlaced
    blobs["gif_interlaced"] = encode_gif(gidx, gpal, interlace=True)
    expected["gif_interlaced"] = gpal[gidx]

    # GIF big enough to cross at least one LZW code-width boundary
    big_idx = rng.integers(0, 4, size=(40, 40), dtype=np.uint8)
    big_pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    blobs["gif_width_growth"] = encode_gif(big_idx, big_pal)
    expected["gif_width_growth"] = big_pal[big_idx]

    # JPEG: expected arrays are the DECODED output (JPEG is lossy, so
    # these are regression goldens; truth comes from the tolerance-
    # bounded round-trip tests in tests/test_pixels.py)
    from geodistpy_spark.textops.pixels import decode_jpeg

    img = _img(24, 17, 4)
    blobs["jpeg_444"] = encode_jpeg(img, subsample=(1, 1))
    expected["jpeg_444"] = decode_jpeg(blobs["jpeg_444"])

    yy, xx = np.mgrid[0:21, 0:30]
    smooth = np.stack([5 * xx % 200 + 20, (4 * yy) % 200 + 30,
                       (2 * xx + 3 * yy) % 200 + 25], axis=2).astype(np.uint8)
    blobs["jpeg_420"] = encode_jpeg(smooth, subsample=(2, 2),
                                    restart_interval=3)
    expected["jpeg_420"] = decode_jpeg(blobs["jpeg_420"])

    for name, b in blobs.items():
        with open(os.path.join(OUT, f"{name}.bin"), "wb") as fh:
            fh.write(b)
    np.savez_compressed(os.path.join(OUT, "expected.npz"), **expected)
    print(f"wrote {len(blobs)} fixtures + expected.npz to {OUT}")


if __name__ == "__main__":
    main()
