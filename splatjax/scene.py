"""Gaussian scene containers (parameter pytrees).

The framework-internal world space is the reference viewer's *internal* space
(what lands in its GPU textures after load): positions have Z negated relative
to the raw ``.splat`` bytes and quaternions are conjugated/reordered so that the
standard 3DGS covariance formula

    Sigma = R(q) @ diag(s^2) @ R(q)^T

reproduces the reference's ``Sigma = R_three^T S^2 R_three`` construction
(reference: /root/reference/index.js:344-367, pushDataBuffer). The loaders in
:mod:`splatjax.io` perform that mapping, so everything downstream is clean,
standard math.

Two containers:

* :class:`GaussianScene` — "activated" parameters (linear scales, [0,1]
  opacity/colors). What renderers consume.
* :class:`TrainableGaussians` — raw optimization parameters (log-scales,
  logit-opacities, unnormalized quaternions) with ``.to_scene()``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _pytree_dataclass(cls):
    return jax.tree_util.register_dataclass(
        dataclasses.dataclass(frozen=True)(cls)
    )


@_pytree_dataclass
class GaussianScene:
    """A set of 3D Gaussians in framework world space.

    Attributes:
      means:      (N, 3) float32 positions.
      scales:     (N, 3) float32 *linear* per-axis standard deviations.
      quats:      (N, 4) float32 rotations, (w, x, y, z) order. May be slightly
                  un-normalized when round-tripped through u8 quantization
                  (the reference does not re-normalize either,
                  index.js:344-349 + THREE.makeRotationFromQuaternion).
      colors:     (N, 3) float32 DC colors in [0, 1].
      opacities:  (N,) float32 opacity in [0, 1].
      sh:         optional (N, K, 3) higher-order SH coefficients (bands >= 1),
                  absent for .splat assets (the format stores only DC color,
                  index.js:727-741).
    """

    means: Array
    scales: Array
    quats: Array
    colors: Array
    opacities: Array
    sh: Optional[Array] = None

    @property
    def num_gaussians(self) -> int:
        return self.means.shape[0]

    def normalized(self) -> "GaussianScene":
        """Return a copy with unit quaternions (training path)."""
        q = self.quats / jnp.linalg.norm(self.quats, axis=-1, keepdims=True)
        return dataclasses.replace(self, quats=q)


@_pytree_dataclass
class TrainableGaussians:
    """Raw optimization parameters for fit-from-scratch training.

    Activations follow 3DGS convention (the same ones the reference's .ply
    converter applies at load: exp() on scales, sigmoid() on opacity,
    index.js:709-711, 737-741).
    """

    means: Array          # (N, 3)
    log_scales: Array     # (N, 3)
    quats: Array          # (N, 4) unnormalized (w, x, y, z)
    logit_opacities: Array  # (N,)
    colors: Array         # (N, 3) raw; sigmoid-activated to [0,1]
    sh: Optional[Array] = None

    def to_scene(self) -> GaussianScene:
        q = self.quats / (
            jnp.linalg.norm(self.quats, axis=-1, keepdims=True) + 1e-12
        )
        return GaussianScene(
            means=self.means,
            scales=jnp.exp(self.log_scales),
            quats=q,
            colors=jax.nn.sigmoid(self.colors),
            opacities=jax.nn.sigmoid(self.logit_opacities),
            sh=self.sh,
        )

    @staticmethod
    def from_scene(scene: GaussianScene) -> "TrainableGaussians":
        eps = 1e-6
        col = jnp.clip(scene.colors, eps, 1.0 - eps)
        opa = jnp.clip(scene.opacities, eps, 1.0 - eps)
        return TrainableGaussians(
            means=scene.means,
            log_scales=jnp.log(jnp.maximum(scene.scales, 1e-12)),
            quats=scene.quats,
            logit_opacities=jnp.log(opa) - jnp.log1p(-opa),
            colors=jnp.log(col) - jnp.log1p(-col),
            sh=scene.sh,
        )


def quat_to_rotmat(quats: Array) -> Array:
    """Standard quaternion (w,x,y,z) -> 3x3 rotation matrix, batched.

    Matches THREE.Matrix4.makeRotationFromQuaternion algebraically (the
    reference feeds it possibly-unnormalized quats, index.js:362; we keep the
    same bilinear formula so R(q)^T == R(conj q) holds exactly even then).
    """
    w, x, y, z = quats[..., 0], quats[..., 1], quats[..., 2], quats[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(quats.shape[:-1] + (3, 3))


def build_covariances(quats: Array, scales: Array) -> Array:
    """3D covariances Sigma = R diag(s^2) R^T, (N, 3, 3).

    Equivalent to the reference's M = R_three^T S; Sigma = M M^T construction
    (index.js:361-367) under the loader's quaternion mapping.
    """
    rot = quat_to_rotmat(quats)
    m = rot * scales[..., None, :]  # R @ diag(s): scale columns
    # Elementwise m @ m^T: exact f32 on the VPU. Batched (N,3,3) matmuls on
    # TPU would go through bf16 MXU passes (breaking 1e-3 viewer parity) and
    # are slow for tiny matrices anyway.
    prods = m[..., :, None, :] * m[..., None, :, :]  # (N, 3, 3, 3)
    return jnp.sum(prods, axis=-1)


def covariance_upper(covs: Array) -> Array:
    """Extract (N, 6) upper-triangle (s11,s12,s13,s22,s23,s33).

    Same 6 elements the reference packs into its int16 texture
    (flat indices [0,1,2,5,6,10] of the column-major 4x4, index.js:370).
    """
    return jnp.stack(
        [
            covs[..., 0, 0], covs[..., 0, 1], covs[..., 0, 2],
            covs[..., 1, 1], covs[..., 1, 2], covs[..., 2, 2],
        ],
        axis=-1,
    )


def quantize_covariances_int16(cov6: Array) -> tuple[Array, Array]:
    """Reference-exact int16 quantization of the 6 covariance elements.

    q = trunc(c * 32767 / max|c|) as int16, dequant scale = max|c| / 32767
    (index.js:371-387: parseInt truncates toward zero). Returns (q, scale).
    Used only by the ``viewer_exact`` parity path and the .splat texture
    packing emulation — the training path keeps full-precision covariances.
    """
    max_val = jnp.max(jnp.abs(cov6), axis=-1, keepdims=True)
    safe = jnp.where(max_val > 0, max_val, 1.0)
    q = jnp.trunc(cov6 * 32767.0 / safe).astype(jnp.int16)
    return q, (max_val[..., 0] / 32767.0)


def dequantize_covariances_int16(q: Array, scale: Array) -> Array:
    """Inverse of :func:`quantize_covariances_int16` (shader side,
    index.js:118-125)."""
    return q.astype(jnp.float32) * scale[..., None]


def cov6_to_mat(cov6: Array) -> Array:
    """(N, 6) upper-triangle -> (N, 3, 3) symmetric matrices."""
    s11, s12, s13, s22, s23, s33 = [cov6[..., i] for i in range(6)]
    row0 = jnp.stack([s11, s12, s13], axis=-1)
    row1 = jnp.stack([s12, s22, s23], axis=-1)
    row2 = jnp.stack([s13, s23, s33], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def importance(scene: GaussianScene) -> Array:
    """Per-gaussian importance = volume x opacity — EXACTLY the metric
    the reference sorts by before truncating at its texture capacity
    (processPlyBuffer: exp(s0)exp(s1)exp(s2) * sigmoid(opacity),
    index.js:653-669; our scales/opacities are already activated, so the
    product is scales.prod() * opacity)."""
    s = jnp.asarray(scene.scales, jnp.float32)
    return (
        s[:, 0] * s[:, 1] * s[:, 2]
        * jnp.asarray(scene.opacities, jnp.float32)
    )


def select_important(scene: GaussianScene, fraction: float) -> GaussianScene:
    """Level-of-detail subset: keep the top ``fraction`` of gaussians by
    :func:`importance`, importance-descending — the reference's own
    quality knob (it keeps the most important splats when an asset
    exceeds capacity, index.js:329-335 + the importance sort at
    653-669). The measured speed model (docs/PERF.md roofline): every
    K-proportional stage (gathers, sorts, kernels) scales ~linearly with
    the duplicated-instance count, so ``fraction=0.25`` is the honest
    route to ~60 fps exact-forward at 1M@1080p on one v5e.
    """
    if not (0.0 < fraction <= 1.0):
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    n = scene.num_gaussians
    k = max(int(round(n * fraction)), 1)
    order = jnp.argsort(-importance(scene))[:k]

    def take(a):
        return None if a is None else jnp.asarray(a)[order]

    return GaussianScene(
        means=take(scene.means),
        scales=take(scene.scales),
        quats=take(scene.quats),
        colors=take(scene.colors),
        opacities=take(scene.opacities),
        sh=take(scene.sh),
    )
