"""Native (C++) ingestion vs the NumPy loaders: bit-identical semantics.

The native library implements the same reference-derived byte math
(index.js:343-359, 600-745); these tests build it with the repo toolchain
and require exact agreement with the Python loaders.
"""
import numpy as np
import pytest

from splatjax.io import native
from splatjax.io import (
    parse_ply_bytes,
    parse_splat_bytes,
    scene_to_splat_bytes,
    synthetic_scene,
)
from tests.test_io import _make_ply

pytestmark = pytest.mark.skipif(
    not native.ensure_built(), reason="g++ unavailable / build failed"
)


def test_native_splat_parse_matches_python():
    scene = synthetic_scene(513, seed=11)
    data = scene_to_splat_bytes(scene)
    a = parse_splat_bytes(data)
    b = native.parse_splat_bytes_native(data)
    for f in ("means", "scales", "quats", "colors", "opacities"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), err_msg=f
        )


def test_native_splat_serialize_round_trip():
    scene = synthetic_scene(257, seed=12)
    py_bytes = scene_to_splat_bytes(scene)
    nat_bytes = native.scene_to_splat_bytes_native(scene)
    # same length and near-identical rows (rounding mode at exact .5
    # boundaries may differ by 1 lsb in the u8 channels)
    assert len(py_bytes) == len(nat_bytes)
    a = np.frombuffer(py_bytes, np.uint8).astype(np.int16)
    b = np.frombuffer(nat_bytes, np.uint8).astype(np.int16)
    float_part = np.abs(a.reshape(-1, 32)[:, :24] - b.reshape(-1, 32)[:, :24])
    u8_part = np.abs(a.reshape(-1, 32)[:, 24:] - b.reshape(-1, 32)[:, 24:])
    assert float_part.max() == 0
    assert u8_part.max() <= 1


def test_native_ply_parse_matches_python():
    rng = np.random.default_rng(13)
    data, _ = _make_ply(200, rng, with_sh_rest=9)
    a = parse_ply_bytes(data, importance_sort=True)
    b = native.parse_ply_bytes_native(data, importance_sort=True)
    for f in ("means", "scales", "quats", "colors", "opacities"):
        np.testing.assert_allclose(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
            rtol=1e-6, atol=1e-7, err_msg=f,
        )
    assert a.sh is not None and b.sh is not None
    np.testing.assert_allclose(a.sh, b.sh, rtol=1e-6)


def test_native_ply_pointcloud_fallbacks():
    rng = np.random.default_rng(14)
    data, _ = _make_ply(20, rng, with_scale=False)
    a = parse_ply_bytes(data)
    b = native.parse_ply_bytes_native(data)
    np.testing.assert_allclose(np.asarray(a.scales), np.asarray(b.scales))
    np.testing.assert_allclose(
        np.asarray(a.colors), np.asarray(b.colors), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(a.quats), np.asarray(b.quats))
