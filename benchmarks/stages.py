#!/usr/bin/env python
"""Per-stage timing breakdown of the tiled render pipeline on real TPU.

Complements the headline `bench.py` (one fused fwd+bwd number) with the
stage split used to direct optimization work: projection, binning
(expansion + sort + gathers), Pallas rasterize fwd, image assembly, and the
two backward legs (rasterize bwd kernel, gather-transpose segment-sum).

The reference viewer has no analogue (its only instrumentation is console
progress logging, index.js:266-276); this is the `jax.profiler`-adjacent
harness promised in SURVEY.md §5.

Usage:  python benchmarks/stages.py [--n 1000000] [--res 1920x1080]
Prints one JSON line with per-stage milliseconds.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from splatjax.camera import make_camera  # noqa: E402
from splatjax.io import synthetic_scene  # noqa: E402
from splatjax.ops.binning import TileConfig, bin_gaussians  # noqa: E402
from splatjax.ops.projection import project_gaussians  # noqa: E402
from splatjax.ops.rasterize import tiles_to_image  # noqa: E402
from splatjax.ops.rasterize_vjp import rasterize_tiles  # noqa: E402
from splatjax.scene import build_covariances  # noqa: E402


def _sync(x):
    # On the axon tunnel a scalar readback is the only reliable fence.
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.ravel(leaf)[0])


def _timer(iters):
    """Two-batch-size timing: wall(j) = overhead + j * device_ms, so
    device_ms = (wall(j2) - wall(j1)) / (j2 - j1) and the tunnel's
    per-sync overhead cancels EXACTLY — no ping-based RTT estimate.
    (A tiny-program ping measures a different, larger latency than the
    dispatch-pipeline overhead of real calls: subtracting it zeroed
    whole stages on the current tunnel.)
    """
    j1, j2 = 2, 2 + max(iters, 4)

    def timeit(f, *a):
        _sync(f(*a))  # warm / compile

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

        w1, w2 = wall(j1), wall(j2)
        return round(max((w2 - w1) / (j2 - j1), 0.0) * 1e3, 2)

    return timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--res", default="1920x1080")
    ap.add_argument("--cap", type=int, default=0, help="0 = 3n")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--fb", type=int, default=32, choices=(16, 32),
                    help="packed feature row bytes (16 = training rows)")
    args = ap.parse_args()

    w, h = (int(v) for v in args.res.split("x"))
    cap = args.cap or 3 * args.n
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
    def stage_proj(means, scales, quats, colors, opac):
        cov3d = build_covariances(quats, scales)
        return project_gaussians(
            means, cov3d, colors, opac, mv, pr, w, h,
            max_scales=jnp.max(scales, axis=-1),
        )

    from splatjax.ops.binning import features_from_projection  # noqa: E402
    from splatjax.ops.rasterize_vjp import rasterize_gathered  # noqa: E402

    @jax.jit
    def stage_bin(proj):
        # index-only binning: depth-compact sort + Pallas expand + tile sort
        b = bin_gaussians(proj, cfg, cap, with_features=False)
        return (b.gauss_id, b.starts, b.ends, b.cum, b.count, b.perm,
                b.cum_d, b.count_d, b.overflow)

    def _rast(feat_n, b):
        out, _ = rasterize_gathered(
            feat_n, b[0], b[1], b[2], b[3], b[4], b[5], b[6], b[7], b[8],
            None, cfg, 0.999, 1e-4, args.fb == 16,
        )
        return out

    @jax.jit
    def stage_rast(proj, b):
        # packed per-instance gather + tile sweep (the merged fwd)
        return _rast(features_from_projection(proj), b)

    @jax.jit
    def stage_img(out_tiles):
        return tiles_to_image(out_tiles, cfg, None)

    @jax.jit
    def rast_grad(proj, b):
        # merged backward: packed bwd kernel + sort/segment-sum transpose
        def loss(feat_n):
            return jnp.sum(_rast(feat_n, b)[:, :4, :] ** 2)
        return jax.grad(loss)(features_from_projection(proj))

    timeit = _timer(args.iters)
    proj = stage_proj(*arrs)
    jax.block_until_ready(proj)
    b = stage_bin(proj)
    out_tiles = stage_rast(proj, b)

    @jax.jit
    def stage_frame_stale(proj, b):
        # viewer redraw with a cached tile index (render_binned path):
        # fresh projection + gather + rasterize + assembly, stale binning
        return tiles_to_image(_rast(features_from_projection(proj), b), cfg)

    # cached-params redraw (bin_scene(cache_params=True)): per-instance
    # projection replaces the per-frame feature gather entirely
    from splatjax.render import bin_scene, render_binned  # noqa: E402
    from splatjax.scene import GaussianScene  # noqa: E402

    scene_dev = jax.device_put(scene)
    cbins = bin_scene(scene_dev, cam, capacity=cap,
                      cache_params=True)
    jax.block_until_ready(cbins.bins.gauss_id)

    def stage_frame_cached(s):
        return render_binned(
            s, cam, cbins, alpha_clip=0.999, early_stop=1e-4,
            feature_bytes=args.fb,
        )

    result = {
        "n": args.n,
        "res": args.res,
        "feature_bytes": args.fb,
        "capacity": cap,
        "overflow": int(b[8]),
        "proj_ms": timeit(stage_proj, *arrs),
        "binning_index_ms": timeit(stage_bin, proj),
        "gather_rasterize_fwd_ms": timeit(stage_rast, proj, b),
        "assembly_ms": timeit(stage_img, out_tiles),
        "stale_order_frame_ms": timeit(stage_frame_stale, proj, b),
        "cached_redraw_frame_ms": timeit(stage_frame_cached, scene_dev),
        "gather_rasterize_fwd_bwd_ms": timeit(rast_grad, proj, b),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
