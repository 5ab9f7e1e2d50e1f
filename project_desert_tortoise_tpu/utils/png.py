"""Minimal dependency-free grayscale PNG writer (for HIRS image products,
twin of the MATLAB ``imwrite(..., 'HIRS<n>.png')`` outputs, POES.m:855)."""

from __future__ import annotations

import struct
import zlib

import numpy as np


def write_gray_png(path: str, img: np.ndarray):
    """img: (h, w) uint8."""
    img = np.asarray(img, np.uint8)
    h, w = img.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw, 9)) + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def autoscale_u8(img: np.ndarray, clip_sigma: float = 2.0) -> np.ndarray:
    """Robust 0-255 scaling like the MATLAB HIRS display path
    (mean +/- k*std windowing, POES.m:829-848)."""
    x = np.asarray(img, np.float64)
    vals = x[x != 0]
    if len(vals) == 0:
        return np.zeros(x.shape, np.uint8)
    lo = vals.mean() - clip_sigma * vals.std()
    hi = vals.mean() + clip_sigma * vals.std()
    if hi <= lo:
        hi = lo + 1
    return np.clip((x - lo) / (hi - lo) * 255.0, 0, 255).astype(np.uint8)
