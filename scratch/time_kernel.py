"""A/B timing for the rasterize fwd/bwd kernels at bench shapes.

Builds one realistic binned 1M@1080p scene, then times rasterize_cm_fwd
(and optionally the bwd pallas kernel) in isolation. Edit ops/rasterize.py
between runs to compare variants.

Usage: python scratch/time_kernel.py [--bwd] [--iters 30]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from splatjax.camera import make_camera  # noqa: E402
from splatjax.io import synthetic_scene  # noqa: E402
from splatjax.ops.binning import (  # noqa: E402
    TileConfig, bin_gaussians, features_from_projection,
)
from splatjax.ops.projection import project_gaussians  # noqa: E402
from splatjax.ops.rasterize import (  # noqa: E402
    chunk_major_rows, pack_feature_table, pack_feature_table16,
    rasterize_cm_fwd,
)
from splatjax.scene import build_covariances  # noqa: E402


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.ravel(leaf)[0])


def timeit(f, *a, iters=30, batch=4):
    # two-batch-size timing: per-sync overhead cancels exactly (see
    # benchmarks/stages.py — ping-based RTT over-subtracts on this tunnel)
    _sync(f(*a))

    def wall(j):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(j):
                out = f(*a)
            _sync(out)
            best = min(best, time.perf_counter() - t0)
        return best

    j1, j2 = 2, 2 + max(iters // 4, 4)
    return (wall(j2) - wall(j1)) / (j2 - j1) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--fb", type=int, default=32, choices=(16, 32))
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    width, height = 1920, 1080
    cap = 3 * args.n
    scene = synthetic_scene(args.n, seed=7, extent=1.0,
                            scale_range=(0.002, 0.008))
    cam = make_camera((0, 0, 2.8), (0, 0, 0), width=width, height=height)
    cfg = TileConfig(width, height, 16, 16)

    @jax.jit
    def prep(means, scales, quats, colors, opac):
        cov3d = build_covariances(quats, scales)
        proj = project_gaussians(
            means, cov3d, colors, opac, cam.modelview, cam.projection,
            width, height, max_scales=jnp.max(scales, axis=-1),
        )
        binned = bin_gaussians(proj, cfg, cap, with_features=False)
        feat_n = features_from_projection(proj)
        pack = pack_feature_table16 if args.fb == 16 else pack_feature_table
        feat_cm = chunk_major_rows(pack(feat_n)[binned.gauss_id])
        return feat_cm, binned.starts, binned.ends, binned.num_instances

    feat_cm, starts, ends, ninst = prep(
        scene.means, scene.scales, scene.quats, scene.colors,
        scene.opacities,
    )
    jax.block_until_ready(feat_cm)
    print(f"instances: {int(ninst)}  chunks: {feat_cm.shape[0]}")

    pk16 = args.fb == 16
    fwd = jax.jit(lambda f, s, e: rasterize_cm_fwd(
        f, s, e, cfg, alpha_clip=0.999, early_stop=1e-4,
        packed16=pk16)[0])
    ms = timeit(fwd, feat_cm, starts, ends, iters=args.iters)
    print(f"rasterize_cm_fwd: {ms:.2f} ms")

    if args.bwd:
        from splatjax.ops.rasterize_vjp import _bwd_pallas

        out_tiles, chunks_done = jax.jit(
            lambda f, s, e: rasterize_cm_fwd(
                f, s, e, cfg, alpha_clip=0.999, early_stop=1e-4,
                packed16=pk16)
        )(feat_cm, starts, ends)
        g_out = jnp.ones_like(out_tiles[:, :4, :])
        bwd = jax.jit(lambda f, s, e, c, o, g: _bwd_pallas(
            f, s, e, c, o, g, cfg, 0.999, packed16=pk16))
        ms = timeit(bwd, feat_cm, starts, ends, chunks_done, out_tiles,
                    g_out, iters=args.iters)
        print(f"rasterize bwd kernel: {ms:.2f} ms")


if __name__ == "__main__":
    main()
