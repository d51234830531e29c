"""Fit-from-scratch training loop: Adam over all Gaussian parameters.

The viewer renders pre-trained assets only; this module adds the training
capability (BASELINE.json config 4): optimize means / scales / rotations /
opacities / colors (and SH) against target images through the differentiable
tiled renderer, with per-parameter learning rates as in standard 3DGS
practice, structured metrics, and periodic checkpointing.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from splatjax.camera import Camera
from splatjax.render import default_capacity, render
from splatjax.scene import GaussianScene, TrainableGaussians
from splatjax.train.loss import combined_loss, psnr

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class FitConfig:
    steps: int = 2000
    lr_means: float = 1.6e-4
    lr_scales: float = 5e-3
    lr_quats: float = 1e-3
    lr_opacities: float = 5e-2
    lr_colors: float = 2.5e-2
    lr_sh: float = 1.25e-3
    ssim_weight: float = 0.2
    alpha_clip: float = 0.999
    early_stop: float = 1e-4
    capacity: Optional[int] = None
    log_every: int = 100
    # 16-byte packed instance rows (fixed-point mean / bf16 conic / RGBA8
    # color) — halves the training step's dominant gather + kernel DMA
    # traffic; forward quantization ~1e-3 mean, gradients consistent with
    # the quantized forward (ops/rasterize.py PACKED16 docs). Set 32 for
    # full-precision rows.
    feature_bytes: int = 16
    # Steps folded into one jitted lax.scan dispatch. Runs the SAME ops in
    # the SAME per-view order as k sequential steps, but XLA fuses the
    # scanned body differently than the standalone step, so results agree
    # only up to float reassociation noise (measured <~1e-5 relative on
    # parameters over 6 steps; bitwise identity across fusion contexts is
    # not an XLA guarantee). Amortizes the per-dispatch host/tunnel
    # latency (~10-14 ms on the axon tunnel) so training runs at device
    # speed — the standard TPU multi-step pattern. Densify granularity
    # becomes k steps (densify.every should be a multiple).
    steps_per_call: int = 1


def _optimizer(cfg: FitConfig) -> optax.GradientTransformation:
    """Per-leaf Adam learning rates (3DGS-style)."""
    def label(params: TrainableGaussians):
        return TrainableGaussians(
            means="means",
            log_scales="scales",
            quats="quats",
            logit_opacities="opacities",
            colors="colors",
            sh=None if params.sh is None else "sh",
        )

    return optax.multi_transform(
        {
            "means": optax.adam(cfg.lr_means),
            "scales": optax.adam(cfg.lr_scales),
            "quats": optax.adam(cfg.lr_quats),
            "opacities": optax.adam(cfg.lr_opacities),
            "colors": optax.adam(cfg.lr_colors),
            "sh": optax.adam(cfg.lr_sh),
        },
        label,
    )


def make_train_step(
    cameras: Sequence[Camera],
    cfg: FitConfig,
    capacity: int,
) -> Callable:
    """Build a jitted (params, opt_state, targets, cam_idx) -> ... step.

    All cameras must share (width, height) so one compiled step serves every
    view (camera matrices are traced arguments, resolution is static).
    """
    w, h = cameras[0].width, cameras[0].height
    opt = _optimizer(cfg)

    def loss_fn(params: TrainableGaussians, modelview, projection, target):
        cam = Camera(modelview=modelview, projection=projection,
                     width=w, height=h)
        img = render(
            params.to_scene(), cam,
            capacity=capacity,
            alpha_clip=cfg.alpha_clip,
            early_stop=cfg.early_stop,
            feature_bytes=cfg.feature_bytes,
        )
        return combined_loss(img, target, ssim_weight=cfg.ssim_weight), img

    def one_step(params, opt_state, modelview, projection, target):
        (loss, img), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, modelview, projection, target
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gnorm = jnp.linalg.norm(grads.means, axis=-1)  # densify signal
        return params, opt_state, loss, psnr(img, target), gnorm

    if cfg.steps_per_call <= 1:
        return jax.jit(one_step), opt

    @jax.jit
    def step_scan(params, opt_state, mvs, prs, targets):
        """k = cfg.steps_per_call sequential steps in ONE dispatch.

        mvs/prs: (k, 4, 4); targets: (k, H, W, 4). Returns the LAST
        step's loss/psnr and the SUM of the k per-step gnorm vectors
        (densify is rejected with k > 1 — fit() raises). Agrees with k
        separate dispatches up to fusion/reassociation noise — see the
        FitConfig.steps_per_call note."""
        def body(carry, xs):
            params, opt_state = carry
            mv, pr, target = xs
            params, opt_state, loss, p, gnorm = one_step(
                params, opt_state, mv, pr, target
            )
            return (params, opt_state), (loss, p, gnorm)

        (params, opt_state), (losses, ps, gnorms) = jax.lax.scan(
            body, (params, opt_state), (mvs, prs, targets)
        )
        return (params, opt_state, losses[-1], ps[-1],
                jnp.sum(gnorms, axis=0))

    return step_scan, opt


def make_dp_train_step(
    cameras: Sequence[Camera],
    cfg: FitConfig,
    capacity: int,
    mesh,
    axis: str = "dev",
):
    """Data-parallel train step: one view per device, grads psum'd.

    The canonical DP sharding (SURVEY.md §5): parameters are replicated,
    each device renders + differentiates its OWN view of the per-step
    batch, and parameter gradients reduce over the mesh with one psum that
    XLA schedules against the backward sweep. The optimizer update runs on
    the reduced mean gradient, so a B-view DP step equals a single-chip
    step on the averaged loss of those B views.

    Returns (step, opt); step(params, opt_state, mvs, prs, targets) takes
    stacked (B, 4, 4) camera matrices and (B, H, W, 4) targets with
    B == mesh size.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    w, h = cameras[0].width, cameras[0].height
    opt = _optimizer(cfg)
    n_dev = 1
    for name in ([axis] if isinstance(axis, str) else axis):
        n_dev *= mesh.shape[name]

    def loss_fn(params, modelview, projection, target):
        cam = Camera(modelview=modelview, projection=projection,
                     width=w, height=h)
        img = render(
            params.to_scene(), cam,
            capacity=capacity,
            alpha_clip=cfg.alpha_clip,
            early_stop=cfg.early_stop,
            feature_bytes=cfg.feature_bytes,
        )
        return combined_loss(img, target, ssim_weight=cfg.ssim_weight), img

    def shard_fn(params, mv, pr, target):
        # local leading dim is 1: this device's view of the batch
        (loss, img), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, mv[0], pr[0], target[0]
        )
        grads = jax.tree_util.tree_map(
            lambda gr: jax.lax.psum(gr, axis) / n_dev, grads
        )
        loss = jax.lax.psum(loss, axis) / n_dev
        p = jax.lax.psum(psnr(img, target[0]), axis) / n_dev
        gnorm = jnp.linalg.norm(grads.means, axis=-1)
        return grads, loss[None], p[None], gnorm

    spec_b = P(axis)
    spec_r = P()
    sharded = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec_r, spec_b, spec_b, spec_b),
        out_specs=(spec_r, spec_b, spec_b, spec_r),
        check_vma=False,
    )

    def _step(params, opt_state, mvs, prs, targets):
        grads, loss, p, gnorm = sharded(params, mvs, prs, targets)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss[0], p[0], gnorm

    if cfg.steps_per_call <= 1:
        return jax.jit(_step), opt

    @jax.jit
    def step_scan(params, opt_state, mvs, prs, targets):
        """k sequential DP steps in ONE dispatch: mvs/prs (k, B, 4, 4),
        targets (k, B, H, W, 4). Returns the LAST step's loss/psnr and
        the SUM of per-step gnorms (FitConfig.steps_per_call)."""
        def body(carry, xs):
            p, os_ = carry
            mv, pr, tg = xs
            p, os_, loss, ps, gn = _step(p, os_, mv, pr, tg)
            return (p, os_), (loss, ps, gn)

        (params, opt_state), (losses, pss, gns) = jax.lax.scan(
            body, (params, opt_state), (mvs, prs, targets)
        )
        return (params, opt_state, losses[-1], pss[-1],
                jnp.sum(gns, axis=0))

    return step_scan, opt


def fit(
    initial: TrainableGaussians | GaussianScene,
    cameras: Sequence[Camera],
    targets: Sequence[Array],
    cfg: FitConfig = FitConfig(),
    *,
    checkpoint_fn: Optional[Callable[[int, TrainableGaussians], None]] = None,
    checkpoint_every: int = 0,
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
    densify: Optional["DensifyConfig"] = None,
    densify_seed: int = 0,
    log_fn: Callable[[dict], None] = None,
    mesh=None,
    dp_axis: str = "dev",
    band_axis: Optional[str] = None,
):
    """Optimize gaussians to match target images. Returns (params, history).

    targets: (H, W, 3|4) arrays aligned with ``cameras``.

    Crash/resume (SURVEY.md §5 "checkpoint/resume"): pass ``checkpoint_dir``
    to save the full training state (params + optimizer state) every
    ``checkpoint_every`` steps via orbax; with ``resume=True`` the latest
    checkpoint in that directory is restored and training continues from the
    step after it — a resumed run is step-for-step identical to an
    uninterrupted one (same jitted step on the same state).
    ``checkpoint_fn`` remains available as a lightweight callback (e.g. for
    .splat exports).

    Adaptive density control: pass ``densify=DensifyConfig(...)`` to run
    3DGS clone/split/prune between jitted steps (see train/densify.py);
    parameter arrays grow in capacity buckets so recompiles stay
    O(log growth).

    Multi-chip training (BASELINE.json config 5 shapes):
      * ``mesh=make_mesh(...)`` alone: view-level data parallelism —
        parameters replicated, one view per device, grads psum'd.
      * ``mesh=make_mesh_2d((v, b), ("view", "band")), dp_axis="view",
        band_axis="band"``: the composed 2-D step — gaussians SHARDED over
        the band axis (for scenes that don't fit one device), views
        data-parallel over the other; routes to
        parallel.dist_train.make_dp_band_train_step. Gaussian count must
        divide the band-axis size (densify's 1024-aligned buckets keep
        this true for power-of-two band sizes); per-step capacity drop
        counts are surfaced in history records as ``drops``.
    """
    import numpy as np

    if isinstance(initial, GaussianScene):
        params = TrainableGaussians.from_scene(initial)
    else:
        params = initial

    n_dp = 1
    if mesh is not None:
        for name in ([dp_axis] if isinstance(dp_axis, str) else dp_axis):
            n_dp *= mesh.shape[name]

    def build_step(n):
        capacity = cfg.capacity or default_capacity(n)
        if mesh is not None and band_axis is not None:
            from splatjax.parallel.dist_train import make_dp_band_train_step

            d_band = mesh.shape[band_axis]
            if n % d_band:
                raise ValueError(
                    f"gaussian count {n} must divide the band-axis size "
                    f"{d_band} (pad the scene or pick a bucket-aligned N)"
                )
            return make_dp_band_train_step(
                cameras, cfg, mesh, view_axis=dp_axis, band_axis=band_axis,
                capacity=cfg.capacity, steps_per_call=cfg.steps_per_call,
            )
        if mesh is not None:
            return make_dp_train_step(
                cameras, cfg, capacity, mesh, axis=dp_axis
            )
        return make_train_step(cameras, cfg, capacity)

    n_rows = params.means.shape[0]
    step_fn, opt = build_step(n_rows)
    opt_state = opt.init(params)

    alive = np.ones((n_rows,), bool)
    grad_sum = np.zeros((n_rows,), np.float64)
    grad_cnt = np.zeros((n_rows,), np.int64)
    dense_rng = None
    if densify is not None:
        from splatjax.train.densify import densify_and_prune

        dense_rng = np.random.default_rng(densify_seed)

    start_step = 0
    mgr = None
    if checkpoint_dir is not None:
        from splatjax.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(checkpoint_dir)
        if resume and mgr.latest_step() is not None:
            params, opt_state, ckpt_step = mgr.restore(params, opt_state)
            start_step = int(ckpt_step)

    mvs = [c.modelview for c in cameras]
    projs = [c.projection for c in cameras]
    targets = [jnp.asarray(t[..., :4], jnp.float32) for t in targets]

    k = cfg.steps_per_call
    if k > 1 and densify is not None:
        raise ValueError(
            "steps_per_call > 1 is incompatible with densify (the "
            "clone/split/prune pass needs per-step python control); set "
            "steps_per_call=1 or drop densify"
        )
    if k > 1 and (cfg.steps - start_step) % k:
        raise ValueError(
            f"steps ({cfg.steps}, resuming at {start_step}) must be a "
            f"multiple of steps_per_call ({k}) — the scanned dispatch "
            "always runs k full steps"
        )
    history = []
    drops = None
    t_start = time.time()
    for i in range(start_step, cfg.steps, k):
        if mesh is not None:
            # data-parallel: step i+t takes the next n_dp views
            # round-robin, one per device; k > 1 stacks the per-step
            # batches along a leading scan axis (same view order as k
            # separate dispatches)
            def _batch(src):
                per_step = [
                    jnp.stack([
                        src[((i + t) * n_dp + j) % len(cameras)]
                        for j in range(n_dp)
                    ])
                    for t in range(k)
                ]
                return per_step[0] if k == 1 else jnp.stack(per_step)

            out = step_fn(
                params, opt_state, _batch(mvs), _batch(projs),
                _batch(targets),
            )
            if band_axis is not None:
                params, opt_state, loss, p, gnorm, drops = out
            else:
                params, opt_state, loss, p, gnorm = out
        elif k > 1:
            # k sequential views in one scanned dispatch (same round-robin
            # order as k separate steps — math-identical)
            vis = [(i + j) % len(cameras) for j in range(k)]
            params, opt_state, loss, p, gnorm = step_fn(
                params, opt_state,
                jnp.stack([mvs[v] for v in vis]),
                jnp.stack([projs[v] for v in vis]),
                jnp.stack([targets[v] for v in vis]),
            )
        else:
            vi = i % len(cameras)
            params, opt_state, loss, p, gnorm = step_fn(
                params, opt_state, mvs[vi], projs[vi], targets[vi]
            )
        if densify is not None:
            grad_sum += np.asarray(gnorm, np.float64)
            grad_cnt += 1
            if (
                densify.start <= i <= densify.stop
                and (i - densify.start) % densify.every == densify.every - 1
            ):
                params, opt_state, alive, rep = densify_and_prune(
                    params, opt_state, grad_sum, grad_cnt, alive,
                    densify, dense_rng,
                )
                new_n = params.means.shape[0]
                if new_n != n_rows:
                    n_rows = new_n
                    step_fn, _ = build_step(n_rows)
                grad_sum = np.zeros((n_rows,), np.float64)
                grad_cnt = np.zeros((n_rows,), np.int64)
                if log_fn is not None:
                    log_fn({"step": i, "densify": rep})
        # boundary-crossing condition: identical to the k == 1 cadence
        # (i % log_every == 0) and fires once per crossed multiple at k > 1
        if cfg.log_every and (
            i % cfg.log_every < k or i + k >= cfg.steps
        ):
            rec = {
                # the scanned dispatch reports the LAST step's metrics
                "step": i + k - 1,
                "loss": float(loss),
                "psnr": float(p),
                "elapsed_s": time.time() - t_start,
            }
            if drops is not None:
                rec["drops"] = int(drops)
            history.append(rec)
            if log_fn is not None:
                log_fn(rec)
        done = i + k
        if mgr is not None and checkpoint_every and (
            done % checkpoint_every < k or done == cfg.steps
        ):
            mgr.save(done, params, opt_state)
        if checkpoint_fn is not None and checkpoint_every and (
            done % checkpoint_every < k
        ):
            checkpoint_fn(done, params)
    return params, history


def init_random(
    n: int, key: Array, *, extent: float = 1.0, initial_scale: float = 0.02
) -> TrainableGaussians:
    """Random initialization for fit-from-scratch."""
    k1, k2, k3 = jax.random.split(key, 3)
    means = jax.random.uniform(k1, (n, 3), minval=-extent, maxval=extent)
    quats = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0, 0.0]]), (n, 1))
    quats = quats + 0.01 * jax.random.normal(k2, (n, 4))
    return TrainableGaussians(
        means=means.astype(jnp.float32),
        log_scales=jnp.full((n, 3), jnp.log(initial_scale), jnp.float32),
        quats=quats.astype(jnp.float32),
        logit_opacities=jnp.full((n,), -1.0, jnp.float32),
        colors=jax.random.normal(k3, (n, 3)).astype(jnp.float32) * 0.3,
    )
