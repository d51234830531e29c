"""ctypes bindings for the native (C++) asset-ingestion library.

Falls back to the pure-NumPy loaders when the shared library has not been
built (``python -m splatjax.tools.build_native``). The native path is the
analogue of the reference's ingestion hot loops running outside Python —
the reference's are JS inside pushDataBuffer/processPlyBuffer
(index.js:328-437, 600-745); ours are C++ with identical byte semantics,
validated against the NumPy loaders in tests/test_native_io.py.
"""
from __future__ import annotations

import ctypes
import os
import pathlib
from typing import Optional

import numpy as np

from splatjax.scene import GaussianScene

_LIB_PATH = pathlib.Path(__file__).with_name("_splat_ingest.so")
_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.splat_count.restype = ctypes.c_int64
    lib.splat_count.argtypes = [ctypes.c_int64]
    lib.splat_parse.restype = None
    lib.splat_parse.argtypes = [u8p, ctypes.c_int64] + [f32p] * 5
    lib.splat_serialize.restype = None
    lib.splat_serialize.argtypes = [f32p] * 5 + [ctypes.c_int64, u8p]
    lib.ply_info.restype = ctypes.c_int64
    lib.ply_info.argtypes = [u8p, ctypes.c_int64, i32p]
    lib.ply_parse.restype = ctypes.c_int64
    lib.ply_parse.argtypes = (
        [u8p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32] + [f32p] * 6
    )
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def ensure_built() -> bool:
    """Try building the library in-place; returns availability."""
    if available():
        return True
    try:
        from splatjax.tools.build_native import build

        build(verbose=False)
        global _lib
        _lib = None
        return available()
    except Exception:
        return False


def _f32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def parse_splat_bytes_native(data: bytes) -> GaussianScene:
    lib = _load()
    assert lib is not None, "native library not built"
    buf = np.frombuffer(data, np.uint8)
    n = lib.splat_count(len(data))
    means = np.empty((n, 3), np.float32)
    scales = np.empty((n, 3), np.float32)
    quats = np.empty((n, 4), np.float32)
    colors = np.empty((n, 3), np.float32)
    opac = np.empty((n,), np.float32)
    lib.splat_parse(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
        _f32(means), _f32(scales), _f32(quats), _f32(colors), _f32(opac),
    )
    return GaussianScene(means=means, scales=scales, quats=quats,
                         colors=colors, opacities=opac)


def scene_to_splat_bytes_native(scene: GaussianScene) -> bytes:
    lib = _load()
    assert lib is not None, "native library not built"
    n = scene.num_gaussians
    out = np.empty((n * 32,), np.uint8)
    arrs = [
        np.ascontiguousarray(np.asarray(x, np.float32))
        for x in (scene.means, scene.scales, scene.quats, scene.colors,
                  scene.opacities)
    ]
    lib.splat_serialize(
        *(_f32(a) for a in arrs), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.tobytes()


def parse_ply_bytes_native(
    data: bytes, *, max_sh_degree: int = 3, importance_sort: bool = True
) -> GaussianScene:
    lib = _load()
    assert lib is not None, "native library not built"
    buf = np.frombuffer(data, np.uint8)
    ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    n_rest = ctypes.c_int32(0)
    n = lib.ply_info(ptr, len(data), ctypes.byref(n_rest))
    if n < 0:
        raise ValueError("Unable to read .ply file header")
    per_chan = n_rest.value // 3
    keep = min(per_chan, (max_sh_degree + 1) ** 2 - 1)
    means = np.empty((n, 3), np.float32)
    scales = np.empty((n, 3), np.float32)
    quats = np.empty((n, 4), np.float32)
    colors = np.empty((n, 3), np.float32)
    opac = np.empty((n,), np.float32)
    sh = np.empty((n, keep, 3), np.float32) if keep > 0 else None
    rc = lib.ply_parse(
        ptr, len(data), int(importance_sort), keep,
        _f32(means), _f32(scales), _f32(quats), _f32(colors), _f32(opac),
        _f32(sh) if sh is not None else ctypes.cast(
            None, ctypes.POINTER(ctypes.c_float)
        ),
    )
    if rc < 0:
        raise ValueError("malformed .ply body")
    return GaussianScene(means=means, scales=scales, quats=quats,
                         colors=colors, opacities=opac, sh=sh)
