"""Minimal pure-stdlib PNG writer (8-bit grayscale) for ``show(path=...)``.

From the public PNG specification: signature, IHDR, one zlib-compressed
IDAT of filter-0 scanlines, IEND.  No plotting stack exists in this
environment; a min-max-stretched grayscale image is the reference parity
for single-band raster display.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def write_png_grayscale(path: str, data: np.ndarray) -> None:
    """Min-max stretch ``data`` to uint8 and write an 8-bit grayscale PNG.
    NaNs render black."""
    arr = np.asarray(data, dtype=np.float64)
    finite = np.isfinite(arr)
    lo = float(arr[finite].min()) if finite.any() else 0.0
    hi = float(arr[finite].max()) if finite.any() else 1.0
    scale = 255.0 / (hi - lo) if hi > lo else 0.0
    img = np.zeros(arr.shape, dtype=np.uint8)
    img[finite] = np.clip((arr[finite] - lo) * scale, 0, 255).astype(np.uint8)

    h, w = img.shape
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(_chunk(b"IHDR", ihdr))
        f.write(_chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(_chunk(b"IEND", b""))
