"""Isolated timing of the expansion kernel + binning sub-stages at bench
shapes. Edit ops/expand.py between runs to A/B kernel variants.

Usage: python scratch/time_expand.py
"""
from __future__ import annotations

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
from splatjax.ops import expand as expand_mod  # noqa: E402
from splatjax.ops.binning import TileConfig, bin_gaussians, gaussian_tile_span  # noqa: E402
from splatjax.ops.projection import project_gaussians  # noqa: E402
from splatjax.scene import build_covariances  # noqa: E402


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.ravel(leaf)[0])


def timeit(f, *a, iters=20):
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

    w1, w2 = wall(2), wall(2 + iters)
    return round(max((w2 - w1) / iters, 0.0) * 1e3, 2)


def main():
    n = 1_000_000
    w, h = 1920, 1080
    cap = 3 * n
    scene = synthetic_scene(n, seed=7, extent=1.0, scale_range=(0.002, 0.008))
    cam = make_camera((0, 0, 2.8), (0, 0, 0), width=w, height=h)
    cfg = TileConfig(w, h, 16, 16)
    cov3d = build_covariances(scene.quats, scene.scales)
    proj = project_gaussians(
        scene.means, cov3d, scene.colors, scene.opacities,
        cam.modelview, cam.projection, w, h,
        max_scales=jnp.max(scene.scales, axis=-1),
    )
    proj = jax.device_put(proj)

    # Rebuild the exact table/sub_g0 inputs bin_gaussians hands the kernel.
    cap_pad = -(-cap // expand_mod.CHUNK) * expand_mod.CHUNK
    x0, x1, y0, y1, count = gaussian_tile_span(proj, cfg)
    span_w = (x1 - x0 + 1).astype(jnp.int32)
    has_inst = count > 0
    dkey = jnp.where(has_inst, -proj.depth.astype(jnp.float32), jnp.inf)
    _, perm = jax.lax.sort(
        (dkey, jnp.arange(n, dtype=jnp.int32)), is_stable=True, num_keys=1
    )
    n_vis = jnp.sum(has_inst.astype(jnp.int32))
    tbl = jnp.stack(
        [x0.astype(jnp.float32), y0.astype(jnp.float32),
         span_w.astype(jnp.float32), count.astype(jnp.float32),
         jnp.arange(n, dtype=jnp.float32),
         jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32),
         jnp.zeros((n,), jnp.float32)], axis=-1,
    )
    tbl_d = tbl[perm]
    count_d = tbl_d[:, 3]
    cum_d = jnp.cumsum(count_d)
    cum_ex = cum_d - count_d
    ogid_d = tbl_d[:, 4].astype(jnp.int32)
    cum_ex_i = cum_ex.astype(jnp.int32)

    def limbs(v):
        return ((v & 255).astype(jnp.float32),
                ((v >> 8) & 255).astype(jnp.float32),
                (v >> 16).astype(jnp.float32))

    og0, og1, og2 = limbs(ogid_d)
    ce0, ce1, ce2 = limbs(cum_ex_i)
    zero = jnp.zeros((n,), jnp.float32)
    tbl16 = jnp.stack(
        [tbl_d[:, 0], tbl_d[:, 1], tbl_d[:, 2], cum_d, cum_ex,
         og0, og1, og2, ce0, ce1, ce2, zero, zero, zero, zero, zero],
        axis=-1,
    )
    vpad = -(-(n + expand_mod.PAD_G) // 128) * 128
    pad_row = jnp.zeros((expand_mod.TBL_ROWS,), jnp.float32)
    pad_row = pad_row.at[expand_mod.COL_SPANW].set(1.0)
    pad_row = pad_row.at[expand_mod.COL_CUM_INCL].set(float(1 << 24))
    pad_row = pad_row.at[expand_mod.COL_CUM_EXCL].set(float(1 << 24))
    tbl_pad = jnp.concatenate(
        [tbl16, jnp.broadcast_to(pad_row, (vpad - n, expand_mod.TBL_ROWS))],
        axis=0,
    )
    tbl_t = jax.device_put(jnp.asarray(tbl_pad.T))

    stride = expand_mod.CHUNK
    j_bounds = jnp.arange(0, cap_pad, stride, dtype=jnp.int32).astype(
        jnp.float32
    )
    sub_g0 = jnp.minimum(
        jnp.searchsorted(cum_d, j_bounds, side="right").astype(jnp.int32),
        n_vis,
    )
    sub_g0 = jax.device_put(sub_g0)
    total = cum_d[-1].astype(jnp.int32)
    total_clamped = jax.device_put(jnp.minimum(total, cap))
    print("total instances:", int(total))

    expand_fn = jax.jit(
        lambda t, s, tc: expand_mod.expand_instances(
            t, s, tc, cap_pad, cfg.tiles_x, cfg.num_tiles, n
        )
    )
    tile, gid = expand_fn(tbl_t, sub_g0, total_clamped)
    print("expand_ms:", timeit(expand_fn, tbl_t, sub_g0, total_clamped))

    # sub-stage: the searchsorted that builds sub_g0
    cum_d_dev = jax.device_put(cum_d)
    ss_fn = jax.jit(
        lambda c: jnp.minimum(
            jnp.searchsorted(c, j_bounds, side="right").astype(jnp.int32),
            n_vis,
        )
    )
    print("searchsorted_ms:", timeit(ss_fn, cum_d_dev))

    # sub-stage: tile sort of the expansion output
    tile_d, gid_d = jax.device_put(tile), jax.device_put(gid)
    sort_fn = jax.jit(
        lambda t, g: jax.lax.sort((t, g), is_stable=True, num_keys=1)
    )
    print("tile_sort_ms:", timeit(sort_fn, tile_d, gid_d))

    # sub-stage: depth sort (1M)
    dkey_d = jax.device_put(dkey)
    dsort_fn = jax.jit(
        lambda d: jax.lax.sort(
            (d, jnp.arange(n, dtype=jnp.int32)), is_stable=True, num_keys=1
        )
    )
    print("depth_sort_ms:", timeit(dsort_fn, dkey_d))

    # sub-stage: depth-table gather (1M x 32 B)
    tbl_dev = jax.device_put(tbl)
    perm_dev = jax.device_put(perm)
    g_fn = jax.jit(lambda t, p: t[p])
    print("depth_gather_ms:", timeit(g_fn, tbl_dev, perm_dev))

    # full binning for reference
    bin_fn = jax.jit(
        lambda p: bin_gaussians(p, cfg, cap, with_features=False).gauss_id
    )
    print("bin_full_ms:", timeit(bin_fn, proj))


if __name__ == "__main__":
    main()
