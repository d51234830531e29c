"""Measure the exact ellipse-vs-tile instance cut on the bench scene.

For each gaussian and each tile in its bbox span, compute the exact minimum
of the quadratic form q(d) = 0.5 d^T conic d over the tile rectangle. The
kernel discards fragments with power < -4 (q > 4), so tiles whose continuous
minimum exceeds 4 contribute exactly nothing — dropping them is bit-exact.

Reports current (bbox) instance totals vs exact-test totals.
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
from splatjax.ops.binning import TileConfig, gaussian_tile_span  # noqa: E402
from splatjax.ops.projection import project_gaussians  # noqa: E402
from splatjax.scene import build_covariances  # noqa: E402


def load_bench_scene(n=1_000_000):
    from splatjax.io import load_splat, tile_scene

    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "..", "tests", "fixtures",
                        "trained_scene.splat")
    return tile_scene(load_splat(path), n)


def rect_qmin(mx, my, ca, cb, cc, ax0, ax1, ay0, ay1):
    """Exact min of 0.5 d^T C d over rect [ax0,ax1]x[ay0,ay1] (absolute px),
    d measured from (mx, my). All args broadcastable."""
    dx0, dx1 = ax0 - mx, ax1 - mx
    dy0, dy1 = ay0 - my, ay1 - my
    inside = (dx0 <= 0) & (dx1 >= 0) & (dy0 <= 0) & (dy1 >= 0)

    def q(dx, dy):
        return 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy

    def edge_x(dxc):  # fixed x edge, optimize dy
        dy = jnp.clip(-cb * dxc / jnp.maximum(cc, 1e-12), dy0, dy1)
        return q(dxc, dy)

    def edge_y(dyc):
        dx = jnp.clip(-cb * dyc / jnp.maximum(ca, 1e-12), dx0, dx1)
        return q(dx, dyc)

    m = jnp.minimum(
        jnp.minimum(edge_x(dx0), edge_x(dx1)),
        jnp.minimum(edge_y(dy0), edge_y(dy1)),
    )
    return jnp.where(inside, 0.0, m)


def main():
    n = int(os.environ.get("N", 1_000_000))
    width, height = 1920, 1080
    scene = load_bench_scene(n)
    cam = make_camera((0, 0, 2.8), (0, 0, 0), width=width, height=height)
    cfg = TileConfig(width, height, 16, 16)

    @jax.jit
    def counts(means, scales, quats, colors, opac):
        cov3d = build_covariances(quats, scales)
        proj = project_gaussians(
            means, cov3d, colors, opac, cam.modelview, cam.projection,
            width, height, max_scales=jnp.max(scales, axis=-1),
        )
        x0, x1, y0, y1, count = gaussian_tile_span(proj, cfg)
        mx, my = proj.mean2d[:, 0], proj.mean2d[:, 1]
        ca, cb, cc = proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2]
        W = 16  # max span window per axis (covers spans up to 16x16 tiles)
        dxs = jnp.arange(W, dtype=jnp.int32)
        exact = jnp.zeros_like(count)
        spanw = x1 - x0 + 1
        spanh = y1 - y0 + 1
        big = (spanw > W) | (spanh > W)

        def body(i, acc):
            ty = y0 + i
            rowok = (i < spanh) & (count > 0)
            tx = x0[:, None] + dxs[None, :]
            colok = rowok[:, None] & (dxs[None, :] < spanw[:, None])
            qm = rect_qmin(
                mx[:, None], my[:, None],
                ca[:, None], cb[:, None], cc[:, None],
                (tx * 16).astype(jnp.float32),
                (tx * 16 + 16).astype(jnp.float32),
                (ty[:, None] * 16).astype(jnp.float32),
                (ty[:, None] * 16 + 16).astype(jnp.float32),
            )
            hit = colok & (qm <= 4.0)
            return acc + jnp.sum(hit.astype(jnp.int32), axis=1)

        exact = jax.lax.fori_loop(0, W, body, exact)
        # big spans: keep bbox count (conservative)
        exact = jnp.where(big, count, exact)
        return (
            jnp.sum(count), jnp.sum(exact), jnp.sum(big.astype(jnp.int32)),
            jnp.sum((count > 0).astype(jnp.int32)),
        )

    tot, ex, nbig, nvis = counts(
        scene.means, scene.scales, scene.quats, scene.colors,
        scene.opacities,
    )
    tot, ex, nbig, nvis = int(tot), int(ex), int(nbig), int(nvis)
    print(f"visible gaussians: {nvis}")
    print(f"bbox instances:    {tot}")
    print(f"exact instances:   {ex}  ({ex / max(tot, 1):.3f} of bbox)")
    print(f"spans > 16x16 kept as bbox: {nbig}")


if __name__ == "__main__":
    main()
