"""Dependency-free PNG writer (stdlib zlib only).

The container images used for TPU work carry no imaging libraries, so the
demo scripts (the analogue of the reference's demo pages, index.html /
cutout-demo.html) would otherwise emit raw .npy dumps. This writes
8-bit RGB/RGBA PNGs (no palette, no interlace) straight from float or
uint8 arrays.
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


def to_u8(img) -> np.ndarray:
    """Float [0,1] (or already-uint8) (H, W, {1,3,4}) -> uint8."""
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = np.clip(np.asarray(arr, np.float32), 0.0, 1.0)
        arr = np.floor(arr * 255.0 + 0.5).astype(np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def encode_png(img) -> bytes:
    """Encode (H, W, {1,3,4}) image (float [0,1] or uint8) as PNG bytes."""
    arr = to_u8(img)
    h, w, c = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 (None) per scanline
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def write_png(path: str, img) -> None:
    with open(path, "wb") as f:
        f.write(encode_png(img))
