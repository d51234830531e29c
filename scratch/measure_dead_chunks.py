"""Measure the DEAD-CHUNK fraction of the fwd kernel at bench shapes.

A chunk (128 tile-sorted instances walked by one inner step of the
rasterize kernel) is 'dead' when every in-range instance's ellipse misses
the tile entirely (rect-min of the quadratic form > 4) — the kernel would
compute full fragment math for it and add exactly nothing. Round-3 verdict
item 3 proposes pl.when-skipping such chunks; this measures how often they
occur (on the trained-fixture bench scene AND the synthetic one) to decide
whether the skip pays for its per-chunk reduction cost.

Also reports the dead-LANE fraction (in-range instances that miss their
tile): the bound on what a per-lane skip could save.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"),
)

from splatjax.camera import make_camera  # noqa: E402
from splatjax.io import synthetic_scene  # noqa: E402
from splatjax.ops.binning import TileConfig, bin_gaussians  # noqa: E402
from splatjax.ops.projection import project_gaussians  # noqa: E402
from splatjax.ops.rasterize import CHUNK  # noqa: E402
from splatjax.scene import build_covariances  # noqa: E402
from scratch.measure_ellipse_cut import load_bench_scene, rect_qmin  # noqa: E402


def measure(scene, name, width=1920, height=1080):
    cam = make_camera((0, 0, 2.8), (0, 0, 0), width=width, height=height)
    cfg = TileConfig(width, height, 16, 16)
    cap = 3 * scene.num_gaussians

    cov3d = build_covariances(scene.quats, scene.scales)
    proj = project_gaussians(
        scene.means, cov3d, scene.colors, scene.opacities,
        cam.modelview, cam.projection, width, height,
        max_scales=jnp.max(scene.scales, axis=-1),
    )
    b = bin_gaussians(proj, cfg, cap, with_features=False)
    gid = np.asarray(b.gauss_id)
    tile = np.asarray(b.tile_id)
    starts = np.asarray(b.starts)
    ends = np.asarray(b.ends)

    # per-instance alive: exact rect-min of the quadratic over its tile
    mx = np.asarray(proj.mean2d[:, 0])[gid]
    my = np.asarray(proj.mean2d[:, 1])[gid]
    ca = np.asarray(proj.conic[:, 0])[gid]
    cb = np.asarray(proj.conic[:, 1])[gid]
    cc = np.asarray(proj.conic[:, 2])[gid]
    tx = (tile % cfg.tiles_x).astype(np.float32) * 16.0
    ty = (tile // cfg.tiles_x).astype(np.float32) * 16.0
    valid = tile < cfg.num_tiles
    qm = np.asarray(jax.jit(rect_qmin)(
        jnp.asarray(mx), jnp.asarray(my), jnp.asarray(ca),
        jnp.asarray(cb), jnp.asarray(cc),
        jnp.asarray(tx), jnp.asarray(tx + 16.0),
        jnp.asarray(ty), jnp.asarray(ty + 16.0),
    ))
    alive = (qm <= 4.0) & valid
    k_real = int(valid.sum())
    print(f"[{name}] instances={k_real} dead-lane fraction="
          f"{1.0 - alive.sum() / max(k_real, 1):.3f}")

    # simulate the kernel walk: per tile, chunks [astart, end) at CHUNK
    # stride; a chunk is dead iff no alive in-range instance falls in it
    n_t = cfg.num_tiles
    total_chunks = 0
    dead_chunks = 0
    # alive positions per tile via prefix sums of alive[] over positions
    alive_prefix = np.concatenate([[0], np.cumsum(alive.astype(np.int64))])
    for t in range(n_t):
        s, e = int(starts[t]), int(ends[t])
        if e <= s:
            continue
        astart = (s // CHUNK) * CHUNK
        nch = -(-(e - astart) // CHUNK)
        total_chunks += nch
        for c in range(nch):
            lo = max(astart + c * CHUNK, s)
            hi = min(astart + (c + 1) * CHUNK, e)
            if alive_prefix[hi] - alive_prefix[lo] == 0:
                dead_chunks += 1
    print(f"[{name}] chunks={total_chunks} dead={dead_chunks} "
          f"({100.0 * dead_chunks / max(total_chunks, 1):.1f}%)")


def main():
    n = int(os.environ.get("N", 1_000_000))
    measure(load_bench_scene(n), "trained")
    measure(
        synthetic_scene(n, seed=7, extent=1.0, scale_range=(0.002, 0.008)),
        "synthetic",
    )


if __name__ == "__main__":
    main()
