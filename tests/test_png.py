"""PNG writer round-trip (splatjax.utils.png, stdlib-only)."""
import struct
import zlib

import numpy as np

from splatjax.utils import encode_png


def _decode(data):
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    i, chunks = 8, {}
    while i < len(data):
        (n,) = struct.unpack(">I", data[i:i + 4])
        chunks[data[i + 4:i + 8]] = data[i + 8:i + 8 + n]
        i += 12 + n
    w, h, depth, ct = struct.unpack(">IIBB", chunks[b"IHDR"][:10])
    raw = zlib.decompress(chunks[b"IDAT"])
    c = {0: 1, 2: 3, 6: 4}[ct]
    rows = np.frombuffer(raw, np.uint8).reshape(h, 1 + w * c)
    assert (rows[:, 0] == 0).all()
    return rows[:, 1:].reshape(h, w, c)


def test_png_round_trip_rgba():
    rng = np.random.default_rng(3)
    img = rng.random((23, 41, 4)).astype(np.float32)
    dec = _decode(encode_png(img))
    ref = np.floor(np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8)
    assert (dec == ref).all()


def test_png_rgb_and_gray_and_uint8():
    assert _decode(encode_png(np.zeros((5, 7, 3), np.float32))).shape == (5, 7, 3)
    assert _decode(encode_png(np.ones((4, 4)) * 0.5)).shape == (4, 4, 1)
    u8 = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    assert (_decode(encode_png(u8)) == u8).all()
