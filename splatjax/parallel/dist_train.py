"""Composed 2-D-mesh training: view data-parallelism x band-sharded
rendering (SURVEY.md §5 "shard primitives for project/cull/sort, shard
tiles/pixels for rasterize", BASELINE.json config 5).

Mesh layout ('view', 'band') — names are the caller's mesh axis names:

  * gaussians are sharded over the BAND axis and replicated over the VIEW
    axis (in_spec P(band): each view group holds a full copy, split across
    its band devices);
  * each view group renders ONE view of the per-step batch: local
    projection -> fixed-capacity all_to_all (band axis) -> band-local
    binning + fused rasterize (the exact single-view body of
    render_sharded, _band_render_body);
  * the view's bands all_gather their tiles (a few MB over ICI) so every
    device assembles the full image and computes the same loss — keeping
    SSIM windows exact across band boundaries;
  * gradients: jax transposes the all_gather into a psum_scatter and the
    all_to_all into its reverse, so each device gets d(view loss)/d(its
    gaussian shard); ONE explicit psum over the VIEW axis averages the
    views. XLA schedules that psum against the backward sweep — the
    gradient-reduction/compute overlap called for by the north star.

A (D_view x D_band) step therefore equals a single-chip step on the mean
loss of D_view views (tested on the 8-device virtual mesh).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from splatjax.camera import Camera
from splatjax.ops.binning import TileConfig
from splatjax.parallel.dist_render import (
    _assemble_band_tiles,
    _band_render_body,
    max_band_rows,
    padded_band_height,
)
from splatjax.render import default_capacity, resolve_alpha_clip
from splatjax.scene import TrainableGaussians

Array = jax.Array


def make_dp_band_train_step(
    cameras: Sequence[Camera],
    cfg,
    mesh: Mesh,
    *,
    view_axis: str = "host",
    band_axis: str = "chip",
    tile_size: int = 16,
    capacity: Optional[int] = None,
    pair_capacity: Optional[int] = None,
    redistribute: str = "all_to_all",
    steps_per_call: int = 1,
    balance: str = "load",
):
    """Build a jitted 2-D-mesh train step.

    Returns (step, opt); ``step(params, opt_state, mvs, prs, targets)``
    takes stacked (D_view, 4, 4) camera matrices and (D_view, H, W, 4)
    targets and returns ``(params, opt_state, loss, psnr, gnorm, drops)``
    where ``gnorm`` is the (N,) per-gaussian mean-gradient norm (the
    densify signal, already psum'd over views) and ``drops`` the total
    instance count lost to transfer/band/binning capacity this step.
    Gaussian count must divide by the band-axis size. With
    ``steps_per_call=k > 1`` the step takes (k, D_view, ...) stacks and
    scans k sequential steps in one dispatch (the same amortization as
    the single-chip path — see FitConfig.steps_per_call for the
    agreement contract). User-facing entry:
    ``fit(mesh=..., band_axis=...)`` routes here (train/fit.py).
    """
    from splatjax.train.fit import _optimizer
    from splatjax.train.loss import combined_loss, psnr

    w, h = cameras[0].width, cameras[0].height
    d_band = mesh.shape[band_axis]
    d_view = mesh.shape[view_axis]
    opt = _optimizer(cfg)
    alpha_clip = resolve_alpha_clip(cfg.alpha_clip, False)

    if balance == "load":
        band_rows = max_band_rows(h, d_band, tile_size)
        n_rows = -(-h // tile_size)
    else:
        band_rows = padded_band_height(h, d_band, tile_size) // tile_size
        n_rows = band_rows * d_band
    cfg_band = TileConfig(w, band_rows * tile_size, tile_size, tile_size)

    def shard_fn(means, scales, quats, colors, opacities, sh, mv, pr,
                 target):
        n_loc = means.shape[0]
        # 6x N/D^2 pair capacity, matching render_sharded: the round-4
        # trained-fixture run showed real assets concentrate ~2x into hot
        # bands and the old 3x default silently dropped ~3% of instances
        # (parallel/dist_render.py render_sharded docstring).
        pc = pair_capacity or max(-(-6 * n_loc // d_band // 128) * 128, 128)
        cap = capacity or max(default_capacity(d_band * pc), 2048)

        def local_loss(ms, sc, qu, co, op, s):
            out_tiles, my_drop, bounds = _band_render_body(
                ms, sc, qu, co, op, s, mv[0], pr[0],
                axis=band_axis, n_dev=d_band, width=w, height=h,
                n_rows=n_rows, cfg_band=cfg_band, pair_capacity=pc,
                capacity=cap, alpha_clip=alpha_clip,
                early_stop=cfg.early_stop, redistribute=redistribute,
                packed16=getattr(cfg, "feature_bytes", 32) == 16,
                balance=balance,
            )
            tiles_full = jax.lax.all_gather(
                out_tiles, band_axis, axis=0, tiled=True
            )
            img = _assemble_band_tiles(tiles_full, bounds, cfg_band,
                                       n_rows, h)
            return (
                combined_loss(img, target[0], ssim_weight=cfg.ssim_weight),
                (img, my_drop),
            )

        (loss, (img, my_drop)), grads = jax.value_and_grad(
            local_loss, argnums=(0, 1, 2, 3, 4, 5), has_aux=True
        )(means, scales, quats, colors, opacities, sh)
        # 1/d_band: every band device computes the IDENTICAL full-image
        # loss (the tiles were all_gathered), so the device-local backward
        # sums d_band identical cotangents through the all_gather's
        # psum_scatter transpose — the raw local grads are d_band x the
        # true d(view loss)/d(shard). (Round-2 latent bug: Adam's scale
        # invariance hid the factor, but it skewed the densify
        # grad-threshold signal and any scale-sensitive consumer.)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, view_axis) / (d_view * d_band), grads
        )
        loss = jax.lax.psum(loss, view_axis) / d_view
        p = jax.lax.psum(psnr(img, target[0]), view_axis) / d_view
        # total instances dropped at any capacity this step, all bands/views
        drops = jax.lax.psum(
            jax.lax.psum(my_drop[0], band_axis), view_axis
        )
        return (*grads, loss[None], p[None], drops[None])

    spec_g = P(band_axis)     # gaussian shards: split on band, replicated
    spec_v = P(view_axis)     # per-view batch items
    spec_r = P()
    sharded = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec_g,) * 6 + (spec_v, spec_v, spec_v),
        out_specs=(spec_g,) * 6 + (spec_r, spec_r, spec_r),
        check_vma=False,
    )

    def _step(params: TrainableGaussians, opt_state, mvs, prs, targets):
        scene = params.to_scene()
        n = scene.means.shape[0]
        sh = (
            scene.sh if scene.sh is not None
            else jnp.zeros((n, 0, 3), jnp.float32)
        )
        # Deal gaussians round-robin to band shards exactly as
        # render_sharded does (see the comment there): index-contiguous
        # shards of real assets are spatially clustered and overflow the
        # per-pair transfer caps. The permutation is static per gaussian
        # count; parameters/optimizer state stay in ORIGINAL order outside
        # the step (densify bucket growth recompiles with a fresh deal),
        # and gradients are un-dealt on the way out.
        n_sh = n // d_band
        deal = jnp.arange(n).reshape(n_sh, d_band).T.reshape(-1)
        inv_deal = jnp.arange(n).reshape(d_band, n_sh).T.reshape(-1)

        def _deal(a):
            return jnp.take(a, deal, axis=0)

        (g_means, g_scales, g_quats, g_colors, g_opac, g_sh, loss,
         p, drops) = sharded(
            _deal(scene.means), _deal(scene.scales), _deal(scene.quats),
            _deal(scene.colors), _deal(scene.opacities), _deal(sh),
            mvs, prs, targets,
        )
        (g_means, g_scales, g_quats, g_colors, g_opac, g_sh) = (
            jnp.take(g, inv_deal, axis=0)
            for g in (g_means, g_scales, g_quats, g_colors, g_opac, g_sh)
        )
        # chain scene-space gradients back through the parameter
        # activations (exp / sigmoid / normalize) with one tiny vjp
        _, act_vjp = jax.vjp(lambda q: q.to_scene(), params)
        from splatjax.scene import GaussianScene

        (grads,) = act_vjp(
            GaussianScene(
                means=g_means, scales=g_scales, quats=g_quats,
                colors=g_colors, opacities=g_opac,
                sh=None if scene.sh is None else g_sh,
            )
        )
        gnorm = jnp.linalg.norm(grads.means, axis=-1)  # densify signal
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss[0], p[0], gnorm, drops[0]

    if steps_per_call <= 1:
        return jax.jit(_step), opt

    @jax.jit
    def step_scan(params, opt_state, mvs, prs, targets):
        """k = steps_per_call sequential 2-D-mesh steps in ONE dispatch.

        mvs/prs: (k, D_view, 4, 4); targets: (k, D_view, H, W, 4).
        Returns the LAST step's loss/psnr, the SUM of per-step gnorms,
        and the SUM of per-step drops. Agrees with k separate dispatches
        up to fusion/reassociation noise (FitConfig.steps_per_call)."""
        def body(carry, xs):
            p, os_ = carry
            mv, pr, tg = xs
            p, os_, loss, ps, gn, dr = _step(p, os_, mv, pr, tg)
            return (p, os_), (loss, ps, gn, dr)

        (params, opt_state), (losses, pss, gns, drs) = jax.lax.scan(
            body, (params, opt_state), (mvs, prs, targets)
        )
        return (params, opt_state, losses[-1], pss[-1],
                jnp.sum(gns, axis=0), jnp.sum(drs))

    return step_scan, opt
