"""Synthetic scene generators for tests and benchmarks.

The reference ships no test assets (SURVEY.md §4); these replace its demo
.splat downloads (index.html:13) for unit / golden / benchmark configs.
"""
from __future__ import annotations

import numpy as np

from splatjax.scene import GaussianScene


def synthetic_scene(
    n: int,
    seed: int = 0,
    *,
    extent: float = 1.0,
    scale_range: tuple[float, float] = (0.01, 0.08),
    opacity_range: tuple[float, float] = (0.3, 1.0),
) -> GaussianScene:
    """Random Gaussians in a cube of half-width ``extent`` around origin."""
    rng = np.random.default_rng(seed)
    means = rng.uniform(-extent, extent, size=(n, 3)).astype(np.float32)
    scales = rng.uniform(*scale_range, size=(n, 3)).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    colors = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    opac = rng.uniform(*opacity_range, size=(n,)).astype(np.float32)
    return GaussianScene(
        means=means, scales=scales, quats=q, colors=colors, opacities=opac
    )


def synthetic_splat_bytes(n: int, seed: int = 0) -> bytes:
    """Raw .splat bytes of a random scene (loader round-trip tests)."""
    from splatjax.io.splat_format import scene_to_splat_bytes

    return scene_to_splat_bytes(synthetic_scene(n, seed))


def tile_scene(base, n: int, *, scale: float = 0.25, jitter: float = 0.9,
               seed: int = 11):
    """Tile a (small) scene into an n-splat one with jittered offsets.

    The bench/test recipe for turning the in-repo trained fixture (real
    3DGS statistics: anisotropic covariances, optimizer-shaped opacities)
    into arbitrary-size scenes: each repeat is shrunk by ``scale`` and
    placed at a uniform random offset in [-jitter, jitter]^3. One shared
    definition so bench.py, benchmarks/scaling.py and the tests measure
    the SAME scene.
    """
    import numpy as np
    import jax.numpy as jnp

    from splatjax.scene import GaussianScene

    reps = -(-n // base.num_gaussians)
    rng = np.random.default_rng(seed)
    offs = rng.uniform(-jitter, jitter, (reps, 3)).astype(np.float32)
    return GaussianScene(
        means=jnp.concatenate(
            [jnp.asarray(base.means) * scale + o for o in offs]
        )[:n],
        scales=jnp.tile(jnp.asarray(base.scales) * scale, (reps, 1))[:n],
        quats=jnp.tile(jnp.asarray(base.quats), (reps, 1))[:n],
        colors=jnp.tile(jnp.asarray(base.colors), (reps, 1))[:n],
        opacities=jnp.tile(jnp.asarray(base.opacities), reps)[:n],
    )
