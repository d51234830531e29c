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
