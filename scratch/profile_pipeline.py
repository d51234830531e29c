"""Trace the 1M@1080p fwd and fwd+bwd pipeline; print device-time per op.

Usage: python scratch/profile_pipeline.py [--n 1000000] [--iters 3]
Writes the trace to /tmp/jaxtrace-pipe and prints the parse_trace summary.
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

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
from splatjax.ops.rasterize_vjp import rasterize_gathered  # noqa: E402
from splatjax.scene import build_covariances  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--res", default="1920x1080")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default="/tmp/jaxtrace-pipe")
    ap.add_argument("--fb", type=int, default=32, choices=(16, 32))
    args = ap.parse_args()

    w, h = (int(v) for v in args.res.split("x"))
    cap = 3 * args.n
    scene = synthetic_scene(
        args.n, seed=7, extent=1.0, scale_range=(0.002, 0.008)
    )
    cam = make_camera((0, 0, 2.8), (0, 0, 0), width=w, height=h)
    cfg = TileConfig(w, h, 16, 16)
    arrs = tuple(
        jax.device_put(jnp.asarray(x))
        for x in (scene.means, scene.scales, scene.quats,
                  scene.colors, scene.opacities)
    )
    mv, pr = cam.modelview, cam.projection

    @jax.jit
    def fwd(means, scales, quats, colors, opac):
        cov3d = build_covariances(quats, scales)
        proj = project_gaussians(
            means, cov3d, colors, opac, mv, pr, w, h,
            max_scales=jnp.max(scales, axis=-1),
        )
        b = bin_gaussians(proj, cfg, cap, with_features=False)
        out, _ = rasterize_gathered(
            features_from_projection(proj), b.gauss_id, b.starts, b.ends,
            b.cum, b.count, b.perm, b.cum_d, b.count_d, b.overflow,
            None, cfg, 0.999, 1e-4, args.fb == 16,
        )
        return out

    @jax.jit
    def step(means, scales, quats, colors, opac):
        def loss(ms):
            means_, scales_ = ms
            cov3d = build_covariances(quats, scales_)
            proj = project_gaussians(
                means_, cov3d, colors, opac, mv, pr, w, h,
                max_scales=jnp.max(scales_, axis=-1),
            )
            b = bin_gaussians(proj, cfg, cap, with_features=False)
            out, _ = rasterize_gathered(
                features_from_projection(proj), b.gauss_id, b.starts,
                b.ends, b.cum, b.count, b.perm, b.cum_d, b.count_d,
                b.overflow, None, cfg, 0.999, 1e-4, args.fb == 16,
            )
            return jnp.sum(out[:, :4, :] ** 2)
        return jax.grad(loss)((means, scales))

    jax.block_until_ready(fwd(*arrs))
    jax.block_until_ready(step(*arrs))
    with jax.profiler.trace(args.out):
        for _ in range(args.iters):
            jax.block_until_ready(fwd(*arrs))
        for _ in range(args.iters):
            jax.block_until_ready(step(*arrs))
    subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "parse_trace.py"), args.out, "50"],
    )


if __name__ == "__main__":
    main()
