"""`.splat` binary format: load / save with reference-exact byte semantics.

Row layout (32 bytes, index.js:227, 676):
  bytes  0-11: position xyz, 3x float32 (little-endian)
  bytes 12-23: scale xyz, 3x float32 (linear std-devs)
  bytes 24-27: color RGBA, 4x uint8
  bytes 28-31: quaternion (rot_0..rot_3) = (w, x, y, z), uint8, value*128+128

Loader coordinate mapping (pushDataBuffer, index.js:344-354): the viewer
negates Z of the position and builds THREE.Quaternion(x=q1, y=q2, z=-q3, w=q0)
then uses Sigma = R_three^T S^2 R_three. We fold the transpose into the
quaternion (R(q)^T == R(conj q) holds for the bilinear formula), so framework
quats are (w, x, y, z) = (q0, -q1, -q2, q3) and Sigma = R S^2 R^T is standard.
"""
from __future__ import annotations

import io as _io
import os
from typing import Union

import numpy as np

from splatjax.scene import GaussianScene

ROW_LENGTH = 32  # index.js:227


def parse_splat_bytes(data: bytes) -> GaussianScene:
    """Parse raw .splat bytes into a GaussianScene (NumPy -> jnp on use)."""
    n = len(data) // ROW_LENGTH
    raw = np.frombuffer(data, dtype=np.uint8, count=n * ROW_LENGTH)
    rows = raw.reshape(n, ROW_LENGTH)

    floats = rows[:, :24].copy().view("<f4")  # (n, 6)
    positions = floats[:, :3].astype(np.float32)
    scales = floats[:, 3:6].astype(np.float32)

    rgba = rows[:, 24:28].astype(np.float32) / 255.0
    colors = rgba[:, :3]
    opacities = rgba[:, 3]

    qb = rows[:, 28:32].astype(np.float32)
    q = (qb - 128.0) / 128.0  # stored (w, x, y, z), index.js:344-349
    # Framework convention: negate Z of position, conjugate the viewer's
    # z-negated quaternion (see module docstring).
    positions = positions * np.array([1.0, 1.0, -1.0], dtype=np.float32)
    quats = np.stack([q[:, 0], -q[:, 1], -q[:, 2], q[:, 3]], axis=-1)

    return GaussianScene(
        means=positions,
        scales=scales,
        quats=quats,
        colors=colors,
        opacities=opacities,
    )


def load_splat(
    path: Union[str, os.PathLike], backend: str = "auto"
) -> GaussianScene:
    """Load a .splat file. backend: "auto" uses the native (C++) parser
    when built (bit-identical; tests/test_native_io.py), else NumPy."""
    with open(path, "rb") as f:
        data = f.read()
    if backend in ("auto", "native"):
        from splatjax.io import native

        if native.available() or (
            backend == "native" and native.ensure_built()
        ):
            return native.parse_splat_bytes_native(data)
        if backend == "native":
            raise RuntimeError("native ingestion library unavailable")
    return parse_splat_bytes(data)


def scene_to_splat_bytes(scene: GaussianScene) -> bytes:
    """Serialize a scene to .splat bytes (viewer interop; inverse of load).

    Quaternions are normalized then quantized with round-half-away like the
    reference's .ply converter output path (Uint8ClampedArray, index.js:704-707
    — rounds to nearest; we use np.rint which matches except exact .5 ties,
    which cannot occur for q*128+128 with normalized float inputs in practice).
    """
    means = np.asarray(scene.means, dtype=np.float32)
    scales = np.asarray(scene.scales, dtype=np.float32)
    quats = np.asarray(scene.quats, dtype=np.float32)
    colors = np.asarray(scene.colors, dtype=np.float32)
    opac = np.asarray(scene.opacities, dtype=np.float32)
    n = means.shape[0]

    qn = quats / np.maximum(np.linalg.norm(quats, axis=-1, keepdims=True), 1e-12)
    # invert the loader mapping: stored (q0,q1,q2,q3) = (w, -x, -y, z)
    stored_q = np.stack([qn[:, 0], -qn[:, 1], -qn[:, 2], qn[:, 3]], axis=-1)
    qb = np.clip(np.rint(stored_q * 128.0 + 128.0), 0, 255).astype(np.uint8)

    pos_out = means * np.array([1.0, 1.0, -1.0], dtype=np.float32)

    rows = np.zeros((n, ROW_LENGTH), dtype=np.uint8)
    # ascontiguousarray: np.asarray of a device array (or a sliced pytree
    # leaf, e.g. after densification) may be non-contiguous, which .view
    # rejects
    rows[:, :12] = np.ascontiguousarray(
        pos_out.astype("<f4")
    ).view(np.uint8).reshape(n, 12)
    rows[:, 12:24] = np.ascontiguousarray(
        scales.astype("<f4")
    ).view(np.uint8).reshape(n, 12)
    rows[:, 24:27] = np.clip(np.rint(colors * 255.0), 0, 255).astype(np.uint8)
    rows[:, 27] = np.clip(np.rint(opac * 255.0), 0, 255).astype(np.uint8)
    rows[:, 28:32] = qb
    return rows.tobytes()


def save_splat(path: Union[str, os.PathLike], scene: GaussianScene) -> None:
    with open(path, "wb") as f:
        f.write(scene_to_splat_bytes(scene))


class StreamingSplatReader:
    """Progressive .splat ingestion: feed arbitrary byte chunks, get complete
    rows back as scenes (the reference's streaming path, index.js:279-298 —
    whole 32-byte rows are pushed as they arrive, partial rows carried over).
    """

    def __init__(self) -> None:
        self._pending = _io.BytesIO()
        self.rows_emitted = 0

    def feed(self, chunk: bytes) -> GaussianScene | None:
        self._pending.write(chunk)
        buf = self._pending.getvalue()
        n_rows = len(buf) // ROW_LENGTH
        if n_rows == 0:
            return None
        complete = buf[: n_rows * ROW_LENGTH]
        remainder = buf[n_rows * ROW_LENGTH:]
        self._pending = _io.BytesIO()
        self._pending.write(remainder)
        self.rows_emitted += n_rows
        return parse_splat_bytes(complete)
