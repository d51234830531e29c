#!/usr/bin/env python
"""Headline benchmark: tiled differentiable render at 1M splats / 1080p.

Prints ONE JSON line:
  {"metric": ..., "value": <fwd+bwd Mpix/s/chip>, "unit": "Mpix/s",
   "vs_baseline": <fwd fps / 60>}

vs_baseline references the north-star bar (BASELINE.md): >60 fps-equivalent
forward per v5e chip at 1M splats @1080p (the reference viewer publishes no
numbers of its own — BASELINE.json.published is empty).

Environment knobs: SPLATJAX_BENCH_N (splats), SPLATJAX_BENCH_RES ("WxH"),
SPLATJAX_BENCH_CAP (instance capacity).
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from splatjax.camera import make_camera  # noqa: E402
from splatjax.io import synthetic_scene  # noqa: E402
from splatjax.render import render  # noqa: E402
from splatjax.scene import TrainableGaussians  # noqa: E402


def main():
    n = int(os.environ.get("SPLATJAX_BENCH_N", 1_000_000))
    res = os.environ.get("SPLATJAX_BENCH_RES", "1920x1080")
    width, height = (int(v) for v in res.split("x"))
    capacity = int(os.environ.get("SPLATJAX_BENCH_CAP", 3 * n))
    # the tunnel adds ~±5 ms of per-call jitter on top of the ~26 ms RTT;
    # 20 samples keeps the median's noise ~1-2 ms
    iters = int(os.environ.get("SPLATJAX_BENCH_ITERS", 20))

    # scale_range tuned so a 1M scene lands ~3-4 duplicated instances per
    # splat at 1080p (train.splat-like screen footprints). With
    # SPLATJAX_BENCH_SRC=trained the in-repo trained fixture (real 3DGS
    # optimization statistics: anisotropic covariances, optimizer-shaped
    # opacities) is tiled with jittered offsets up to n splats instead.
    src = os.environ.get("SPLATJAX_BENCH_SRC", "synthetic")
    if src == "synthetic":
        scene = synthetic_scene(
            n, seed=7, extent=1.0, scale_range=(0.002, 0.008)
        )
    else:
        from splatjax.io import load_splat  # noqa: E402
        from splatjax.scene import GaussianScene  # noqa: E402

        here = (
            os.path.dirname(os.path.abspath(__file__))
            if "__file__" in globals() else os.getcwd()
        )
        path = src if src != "trained" else os.path.join(
            here, "tests", "fixtures", "trained_scene.splat"
        )
        base = load_splat(path)
        reps = -(-n // base.num_gaussians)
        rng = np.random.default_rng(11)
        offs = rng.uniform(-0.9, 0.9, (reps, 3)).astype(np.float32)
        scene = GaussianScene(
            means=jnp.concatenate(
                [base.means * 0.25 + o for o in offs]
            )[:n],
            scales=jnp.tile(base.scales * 0.25, (reps, 1))[:n],
            quats=jnp.tile(base.quats, (reps, 1))[:n],
            colors=jnp.tile(base.colors, (reps, 1))[:n],
            opacities=jnp.tile(base.opacities, reps)[:n],
        )
    cam = make_camera((0, 0, 2.8), (0, 0, 0), width=width, height=height)
    # device_put: passthrough leaves (means, quats) would otherwise stay
    # NumPy and be re-uploaded on every call (~28 MB/frame over the tunnel)
    params = jax.device_put(TrainableGaussians.from_scene(scene))

    kwargs = dict(capacity=capacity, alpha_clip=0.999, early_stop=1e-4)

    def fwd(p):
        return render(p.to_scene(), cam, **kwargs)

    grad_fn = jax.jit(jax.grad(lambda p: jnp.sum(fwd(p) ** 2)))
    fwd_fn = jax.jit(lambda p: fwd(p))

    # correctness gate before timing anything: a small scene must match the
    # differentiable ground-truth rasterizer ON THIS BACKEND. Guards against
    # hardware-only kernel bugs that CPU interpret-mode tests cannot see
    # (e.g. the MXU's default-precision bf16 rounding of one-hot matmuls,
    # which silently corrupted binning on v5e until round 2).
    from splatjax.reference import render_reference  # noqa: E402
    _s = synthetic_scene(2000, seed=5, extent=0.7, scale_range=(0.01, 0.05))
    _c = make_camera((0.1, -0.2, 2.4), (0, 0, 0), width=192, height=128)
    _img = np.asarray(render(_s, _c, early_stop=0.0, alpha_clip=None))
    _err = float(np.abs(_img - np.asarray(render_reference(_s, _c))).max())
    assert _err < 1e-3, f"device parity check failed: max err {_err}"

    img, ov = render(scene, cam, return_overflow=True, **kwargs)
    jax.block_until_ready(img)
    overflow = int(ov)

    def _sync(x):
        # On the axon tunnel backend block_until_ready returns before the
        # device finishes; a scalar readback is the only reliable fence.
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(jnp.ravel(leaf)[0])

    # measure the host<->device round-trip so it can be subtracted
    tiny = jax.jit(lambda x: x + 1.0)
    t = jax.device_put(jnp.zeros((8, 128)))
    _sync(tiny(t))
    t0 = time.perf_counter()
    for _ in range(5):
        _sync(tiny(t))
    rtt = (time.perf_counter() - t0) / 5

    def timeit(f, *a):
        _sync(f(*a))  # warm
        # J async dispatches per sync: device executions queue back-to-back,
        # so the tunnel RTT (and its drift) is paid once per J frames
        j = int(os.environ.get("SPLATJAX_BENCH_BATCH", 4))
        times = []
        for _ in range(max(iters // j, 3)):
            t0 = time.perf_counter()
            out = None
            for _ in range(j):
                out = f(*a)
            _sync(out)
            times.append((time.perf_counter() - t0 - rtt) / j)
        return max(float(np.median(times)), 1e-6)

    t_fwd = timeit(fwd_fn, params)
    t_fwdbwd = timeit(grad_fn, params)

    mpix = width * height / 1e6
    fwd_fps = 1.0 / t_fwd
    value = mpix / t_fwdbwd  # Mpix/s fwd+bwd (the BASELINE.json metric)

    result = {
        "metric": f"fwd+bwd Mpix/s/chip @{n} splats {width}x{height}",
        "value": round(value, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(fwd_fps / 60.0, 3),
        "fwd_ms": round(t_fwd * 1e3, 2),
        "fwd_bwd_ms": round(t_fwdbwd * 1e3, 2),
        "fwd_fps": round(fwd_fps, 1),
        "overflow": overflow,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
