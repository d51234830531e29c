"""Generate the in-repo trained-asset fixture (tests/fixtures/).

The reference's de-facto integration asset is train.splat — a scene
produced by a real 3DGS optimization (index.html:13). This repo cannot ship
that file, so the fixture is produced the same way the reference's asset
was: by *training* — fit gaussians from scratch against multi-view images
of an analytic 3D scene (checkered sphere over a striped ground plane),
with adaptive density control, then freeze to .ply/.splat. The result has
trained-asset statistics (anisotropic covariances, optimizer-shaped
opacities/colors, importance spread) rather than synthetic-uniform ones.

    python -m splatjax.tools.make_fixture [--steps 1200] [--out tests/fixtures]
"""
from __future__ import annotations

import argparse
import math
import os

import numpy as np
import jax
import jax.numpy as jnp


def _ray_dirs(cam, width, height):
    pr = np.asarray(cam.projection)
    focal = (height / 2.0) * abs(pr[1, 1])
    ys, xs = np.mgrid[0:height, 0:width]
    px = (xs + 0.5) - width / 2.0
    py = (height - 1 - ys + 0.5) - height / 2.0
    d = np.stack([px / focal, py / focal, -np.ones_like(px)], -1)
    mv = np.asarray(cam.modelview)
    rot = mv[:3, :3]
    origin = -rot.T @ mv[:3, 3]
    dirs = d @ rot  # camera->world (rows of mv[:3,:3] are world axes in cam)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return origin.astype(np.float32), dirs.astype(np.float32)


def analytic_target(cam, width, height):
    """Ray-traced RGBA of a checkered sphere + striped tilted disc."""
    o, d = _ray_dirs(cam, width, height)
    img = np.zeros((height, width, 4), np.float32)
    tbest = np.full((height, width), np.inf, np.float32)

    # sphere at origin, r=0.35, checker by octants
    b = d @ o
    c = o @ o - 0.35 ** 2
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0))
    ok = hit & (t > 0)
    p = o + d * t[..., None]
    checker = ((p[..., 0] > 0).astype(int) + (p[..., 1] > 0).astype(int)
               + (p[..., 2] > 0).astype(int)) % 2
    n = p / 0.35
    lam = np.clip(n @ np.array([0.5, 0.7, 0.5]) / 1.0, 0.15, 1.0)
    col = np.where(checker[..., None] > 0,
                   np.array([0.9, 0.35, 0.2]), np.array([0.2, 0.5, 0.9]))
    m = ok & (t < tbest)
    img[m, :3] = (col * lam[..., None])[m]
    img[m, 3] = 1.0
    tbest[m] = t[m]

    # tilted disc (plane y = -0.4, |x|,|z| <= 0.6) with stripes
    denom = d[..., 1]
    tp = np.where(np.abs(denom) > 1e-6, (-0.4 - o[1]) / denom, np.inf)
    pp = o + d * tp[..., None]
    on = (tp > 0) & (np.abs(pp[..., 0]) < 0.6) & (np.abs(pp[..., 2]) < 0.6)
    stripes = (np.floor(pp[..., 0] * 6) + np.floor(pp[..., 2] * 6)) % 2
    pcol = np.where(stripes[..., None] > 0,
                    np.array([0.85, 0.8, 0.3]), np.array([0.35, 0.3, 0.45]))
    m = on & (tp < tbest)
    img[m, :3] = pcol[m]
    img[m, 3] = 1.0
    return img


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--res", type=int, default=96)
    ap.add_argument("--views", type=int, default=10)
    ap.add_argument("--out", default="tests/fixtures")
    args = ap.parse_args(argv)

    from splatjax.camera import make_camera
    from splatjax.io import save_splat
    from splatjax.io.ply_format import save_ply
    from splatjax.train import DensifyConfig, FitConfig, fit, init_random, psnr
    from splatjax.render import render

    w = h = args.res
    cams, targets = [], []
    for i in range(args.views):
        ang = 2 * math.pi * i / args.views
        el = 0.25 + 0.25 * (i % 3)
        pos = (1.9 * math.cos(ang) * math.cos(el),
               1.9 * math.sin(el),
               1.9 * math.sin(ang) * math.cos(el))
        cam = make_camera(pos, (0, 0, 0), width=w, height=h)
        cams.append(cam)
        targets.append(jnp.asarray(analytic_target(cam, w, h)))

    init = init_random(512, jax.random.PRNGKey(11), extent=0.5,
                       initial_scale=0.06)
    cfg = FitConfig(steps=args.steps, log_every=max(args.steps // 6, 1),
                    capacity=1 << 17, lr_means=2e-3)
    params, history = fit(
        init, cams, targets, cfg,
        densify=DensifyConfig(
            start=100, stop=args.steps // 2, every=100,
            grad_threshold=5e-7, split_scale=0.05,
            max_gaussians=6000, prune_opacity=0.01,
        ),
        log_fn=lambda r: print(r),
    )
    final_psnr = float(psnr(render(params.to_scene(), cams[0]), targets[0]))
    print(f"fit done: {params.means.shape[0]} rows, psnr={final_psnr:.2f}")

    # drop dead (pruned / ~transparent) slots before freezing
    scene = jax.device_get(params.to_scene())
    alive = np.asarray(scene.opacities) > 0.01
    scene = jax.tree_util.tree_map(lambda x: np.asarray(x)[alive], scene)
    print(f"frozen: {scene.num_gaussians} gaussians")

    os.makedirs(args.out, exist_ok=True)
    save_ply(os.path.join(args.out, "trained_scene.ply"), scene)
    save_splat(os.path.join(args.out, "trained_scene.splat"), scene)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
