"""Trace the BENCH-equivalent train step (image loss, grads w.r.t. ALL
parameters, trained fixture) and print the full per-op device-time split.

The profile_pipeline.py step is lighter (tile-space loss, means+scales
grads only) and under-reports the backward by ~9 ms; this traces what
bench.py actually times.

Usage: python scratch/profile_bench_step.py [--iters 3]
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
from splatjax.io import load_splat, tile_scene  # noqa: E402
from splatjax.render import render  # noqa: E402
from splatjax.scene import TrainableGaussians  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default="/tmp/jaxtrace-bench-step")
    args = ap.parse_args()

    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    scene = tile_scene(
        load_splat(os.path.join(here, "tests", "fixtures",
                                "trained_scene.splat")),
        args.n,
    )
    cam = make_camera((0, 0, 2.8), (0, 0, 0), width=1920, height=1080)
    params = jax.device_put(TrainableGaussians.from_scene(scene))
    kwargs = dict(capacity=3 * args.n, alpha_clip=0.999, early_stop=1e-4)

    grad_fn = jax.jit(jax.grad(
        lambda p: jnp.sum(
            render(p.to_scene(), cam, feature_bytes=16, **kwargs) ** 2
        )
    ))
    jax.block_until_ready(grad_fn(params))
    with jax.profiler.trace(args.out):
        for _ in range(args.iters):
            jax.block_until_ready(grad_fn(params))
    subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "parse_trace_full.py"),
         args.out, "60"],
    )


if __name__ == "__main__":
    main()
