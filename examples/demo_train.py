"""Demo: fit a Gaussian scene from scratch against rendered target views.

The capability the reference viewer lacks entirely (it only displays
pre-trained assets, SURVEY.md §2): differentiable optimization of means /
scales / rotations / opacities / colors with Adam, optional 3DGS adaptive
density control, checkpoint/resume, and export of the result as a .splat
that loads in the upstream viewer.

    python examples/demo_train.py [--steps 600] [--n 400] [--densify]

Targets are renders of a synthetic ground-truth scene from a ring of
cameras (a self-contained stand-in for a photo dataset); the fit starts
from random gaussians and reports PSNR against held-out views.
"""
import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

from splatjax import make_camera
from splatjax.io import synthetic_scene
from splatjax.render import render
from splatjax.train import FitConfig, fit, init_random
from splatjax.train.loss import psnr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--n", type=int, default=400, help="fit capacity")
    ap.add_argument("--views", type=int, default=10)
    ap.add_argument("--res", default="128x96")
    ap.add_argument("--densify", action="store_true")
    ap.add_argument("--out", default="/tmp/splatjax_fit.splat")
    args = ap.parse_args()
    w, h = (int(v) for v in args.res.split("x"))

    gt = synthetic_scene(120, seed=3, extent=0.55, scale_range=(0.04, 0.1))
    cams, targets = [], []
    for i in range(args.views):
        a = 2 * math.pi * i / args.views
        cam = make_camera(
            (2.3 * math.sin(a), 0.35 * math.cos(2 * a), 2.3 * math.cos(a)),
            (0, 0, 0), width=w, height=h,
        )
        cams.append(cam)
        targets.append(np.asarray(render(gt, cam, early_stop=0.0)))
    held_cam = make_camera((0.9, 0.8, 2.0), (0, 0, 0), width=w, height=h)
    held_tgt = np.asarray(render(gt, held_cam, early_stop=0.0))

    params = init_random(args.n, jax.random.PRNGKey(0), extent=0.6)
    densify = None
    if args.densify:
        from splatjax.train import DensifyConfig

        densify = DensifyConfig()
    t0 = time.time()
    params, history = fit(
        params, cams, targets,
        FitConfig(steps=args.steps, log_every=max(args.steps // 10, 1)),
        densify=densify,
        log_fn=lambda m: print(
            f"step {m['step']:5d}  loss {m['loss']:.4f}  "
            f"psnr {m['psnr']:.2f} dB" if "loss" in m
            else f"step {m['step']:5d}  densify: {m['densify']}"
        ),
    )
    dt = time.time() - t0

    held = np.asarray(render(params.to_scene(), held_cam, early_stop=0.0))
    print(f"\ntrained {args.steps} steps in {dt:.1f}s "
          f"({args.steps / dt:.1f} steps/s)")
    print(f"held-out view PSNR: {float(psnr(held, held_tgt)):.2f} dB")

    from splatjax.train import export_splat

    export_splat(args.out, params)
    print(f"exported {args.out} — loads in the upstream WebGL viewer")


if __name__ == "__main__":
    main()
