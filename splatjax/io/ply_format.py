"""3DGS `.ply` loader/saver with reference-exact activation semantics.

Mirrors processPlyBuffer (index.js:600-745):
  * binary-little-endian ply, header parsed for per-property offsets/types
    (TYPE_MAP, index.js:613-631);
  * importance = exp(scale_0)*exp(scale_1)*exp(scale_2)*sigmoid(opacity),
    splats sorted descending so capacity truncation keeps the most visible
    ones (index.js:653-669);
  * activations: scales = exp(scale_k) (:709-711), color = 0.5 + SH_C0*f_dc_k
    (:727-731) or raw red/green/blue, opacity = sigmoid (:737-741);
  * quaternion (rot_0..rot_3) normalized, stored as (w, x, y, z) (:697-707);
  * fallbacks when fields are missing: scale 0.01, identity quat, alpha 1
    (:712-721, 740).

The loader then applies the same coordinate mapping as the .splat loader
(Z negation + quaternion conjugation) so both formats land in the same
framework world space. Optionally reads higher SH bands (f_rest_*) which the
reference discards — kept here because training wants them.
"""
from __future__ import annotations

import os
import re
from typing import Union

import numpy as np

from splatjax.scene import GaussianScene

SH_C0 = 0.28209479177387814  # index.js:728

# The framework maps 3DGS world space through the viewer's Z reflection
# (index.js:350-354). Real SH basis functions that are odd in z flip sign
# under z -> -z, so their coefficients must be negated on load (and again on
# save) for view-dependent color to match the source asset. Within the
# (N, K, 3) band layout (bands 1..3, DC excluded) the z-odd basis indices are:
#   band 1: z            -> 1
#   band 2: yz, xz       -> 4, 6
#   band 3: xyz, z(2z^2-3x^2-3y^2), z(x^2-y^2) -> 9, 11, 13
_SH_Z_ODD = (1, 4, 6, 9, 11, 13)


def _flip_sh_z(sh: np.ndarray) -> np.ndarray:
    """Negate z-odd SH coefficients in-place-safe; sh is (N, K, 3)."""
    sh = sh.copy()
    for i in _SH_Z_ODD:
        if i < sh.shape[1]:
            sh[:, i, :] = -sh[:, i, :]
    return sh

_PLY_DTYPES = {
    "double": "<f8",
    "int": "<i4",
    "uint": "<u4",
    "float": "<f4",
    "short": "<i2",
    "ushort": "<u2",
    "uchar": "u1",
    "char": "i1",  # reference TYPE_MAP falls back to getInt8 (index.js:627)
}


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def parse_ply_bytes(
    data: bytes,
    *,
    max_sh_degree: int = 3,
    importance_sort: bool = True,
) -> GaussianScene:
    header_end = b"end_header\n"
    idx = data.find(header_end)
    if idx < 0:
        raise ValueError("Unable to read .ply file header")  # index.js:607
    header = data[:idx].decode("ascii", errors="replace")
    m = re.search(r"element vertex (\d+)", header)
    if not m:
        raise ValueError("missing 'element vertex' in .ply header")
    n = int(m.group(1))

    fields: list[tuple[str, str]] = []
    for line in header.split("\n"):
        line = line.strip()
        if line.startswith("property "):
            parts = line.split(" ")
            if parts[1] == "list":
                raise ValueError("list properties unsupported for 3DGS ply")
            fields.append((parts[2], _PLY_DTYPES.get(parts[1], "i1")))
    dtype = np.dtype([(name, dt) for name, dt in fields])
    body = np.frombuffer(data, dtype=dtype, count=n, offset=idx + len(header_end))
    names = set(dtype.names or ())

    def col(name: str) -> np.ndarray:
        return body[name].astype(np.float32)

    positions = np.stack([col("x"), col("y"), col("z")], axis=-1)

    if "scale_0" in names:
        scales = np.exp(
            np.stack([col("scale_0"), col("scale_1"), col("scale_2")], axis=-1)
        )
        q = np.stack([col(f"rot_{i}") for i in range(4)], axis=-1)
        q = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    else:
        scales = np.full((n, 3), 0.01, dtype=np.float32)
        q = np.tile(
            np.array([[1.0, 0.0, 0.0, 0.0]], dtype=np.float32), (n, 1)
        )

    if "f_dc_0" in names:
        colors = 0.5 + SH_C0 * np.stack(
            [col("f_dc_0"), col("f_dc_1"), col("f_dc_2")], axis=-1
        )
    elif "red" in names:
        colors = np.stack([col("red"), col("green"), col("blue")], axis=-1) / 255.0
    else:
        colors = np.full((n, 3), 0.5, dtype=np.float32)

    if "opacity" in names:
        opacities = _sigmoid(col("opacity"))
    else:
        opacities = np.ones((n,), dtype=np.float32)

    sh = None
    if max_sh_degree > 0:
        n_rest = sum(1 for f in names if f.startswith("f_rest_"))
        if n_rest > 0:
            per_chan = n_rest // 3
            keep = min(per_chan, (max_sh_degree + 1) ** 2 - 1)
            rest = np.stack(
                [col(f"f_rest_{i}") for i in range(n_rest)], axis=-1
            ).reshape(n, 3, per_chan)  # 3DGS ply stores channel-major
            sh = np.transpose(rest[:, :, :keep], (0, 2, 1)).astype(np.float32)
            sh = _flip_sh_z(sh)  # Z reflection parity (see _SH_Z_ODD)

    if importance_sort and "scale_0" in names:
        importance = scales.prod(axis=-1) * opacities  # index.js:658-663
        order = np.argsort(-importance, kind="stable")
        positions, scales, q = positions[order], scales[order], q[order]
        colors, opacities = colors[order], opacities[order]
        if sh is not None:
            sh = sh[order]

    # Map into framework world space (same as .splat loader).
    positions = positions * np.array([1.0, 1.0, -1.0], dtype=np.float32)
    quats = np.stack([q[:, 0], -q[:, 1], -q[:, 2], q[:, 3]], axis=-1)

    return GaussianScene(
        means=positions.astype(np.float32),
        scales=scales.astype(np.float32),
        quats=quats.astype(np.float32),
        colors=np.clip(colors, 0.0, None).astype(np.float32),
        opacities=opacities.astype(np.float32),
        sh=sh,
    )


def load_ply(
    path: Union[str, os.PathLike], backend: str = "auto", **kw
) -> GaussianScene:
    """Load a 3DGS .ply. backend: "auto" uses the native (C++) converter
    when built (tests/test_native_io.py verify identical output)."""
    with open(path, "rb") as f:
        data = f.read()
    if backend in ("auto", "native"):
        from splatjax.io import native

        if native.available() or (
            backend == "native" and native.ensure_built()
        ):
            try:
                return native.parse_ply_bytes_native(data, **kw)
            except ValueError:
                if backend == "native":
                    raise
                # fall through: the NumPy parser is the semantics of record
        elif backend == "native":
            raise RuntimeError("native ingestion library unavailable")
    return parse_ply_bytes(data, **kw)


def save_ply(path: Union[str, os.PathLike], scene: GaussianScene) -> None:
    """Write a standard 3DGS binary ply (inverse activations)."""
    means = np.asarray(scene.means, np.float32) * np.array([1, 1, -1], np.float32)
    scales = np.asarray(scene.scales, np.float32)
    quats = np.asarray(scene.quats, np.float32)
    colors = np.asarray(scene.colors, np.float32)
    opac = np.asarray(scene.opacities, np.float32)
    n = means.shape[0]

    qn = quats / np.maximum(np.linalg.norm(quats, axis=-1, keepdims=True), 1e-12)
    stored_q = np.stack([qn[:, 0], -qn[:, 1], -qn[:, 2], qn[:, 3]], axis=-1)
    log_scales = np.log(np.maximum(scales, 1e-12))
    f_dc = (np.asarray(colors) - 0.5) / SH_C0
    eps = 1e-6
    o = np.clip(opac, eps, 1 - eps)
    logit_o = np.log(o) - np.log1p(-o)

    sh = scene.sh
    n_rest = 0 if sh is None else sh.shape[1] * 3

    props = (
        ["x", "y", "z", "nx", "ny", "nz"]
        + [f"f_dc_{i}" for i in range(3)]
        + [f"f_rest_{i}" for i in range(n_rest)]
        + ["opacity"]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
    )
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        + "".join(f"property float {p}\n" for p in props)
        + "end_header\n"
    )
    out = np.zeros((n, len(props)), dtype="<f4")
    out[:, 0:3] = means
    out[:, 6:9] = f_dc
    off = 9
    if sh is not None:
        # invert the loader's z-odd coefficient flip (see _SH_Z_ODD)
        flipped = _flip_sh_z(np.asarray(sh, np.float32))
        rest = np.transpose(flipped, (0, 2, 1)).reshape(n, -1)
        out[:, off: off + n_rest] = rest
        off += n_rest
    out[:, off] = logit_o
    out[:, off + 1: off + 4] = log_scales
    out[:, off + 4: off + 8] = stored_q
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(out.tobytes())
