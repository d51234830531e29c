"""Adaptive density control: clone / split / prune (3DGS-style).

The reference viewer renders fixed assets; fitting from scratch needs the
3DGS densification loop: gaussians whose accumulated positional gradient is
large are under-reconstructing their region — small ones are CLONED, large
ones SPLIT into two smaller samples — while near-transparent ones are
PRUNED.

TPU adaptation: parameter arrays are padded to capacity *buckets* (grow by
1.5x when full) so the jitted train step recompiles only O(log growth)
times; dead/pruned slots live on as opacity ~= 0 gaussians that the binning
stage's depth-compaction culls for free (ops/binning.py). The bookkeeping
itself runs on host between jitted steps — it is O(N) numpy on data that
must cross the host boundary anyway when shapes change.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from splatjax.scene import TrainableGaussians

DEAD_LOGIT = -15.0     # sigmoid(-15) ~ 3e-7: culled by the size-opacity test
DEAD_LOG_SCALE = -12.0


@dataclasses.dataclass(frozen=True)
class DensifyConfig:
    start: int = 50                # first step eligible
    stop: int = 10 ** 9            # last step eligible
    every: int = 50                # densify cadence (steps)
    grad_threshold: float = 2e-4   # avg |d loss/d mean| trigger
    split_scale: float = 0.02      # world-size boundary: clone below, split above
    split_factor: float = 1.6      # scale shrink for split children
    prune_opacity: float = 0.005   # prune below this opacity
    max_gaussians: int = 1 << 22
    bucket_growth: float = 1.5


def _bucket(n: int, growth: float) -> int:
    """Smallest capacity bucket >= n (1024-aligned, growth-factor spaced)."""
    cap = 1024
    while cap < n:
        cap = int(np.ceil(cap * growth / 1024)) * 1024
    return cap


def _pad_rows(x: np.ndarray, rows: int, fill: float = 0.0) -> np.ndarray:
    if x.shape[0] >= rows:
        return x
    pad = np.full((rows - x.shape[0],) + x.shape[1:], fill, x.dtype)
    return np.concatenate([x, pad], axis=0)


def _quat_rotate(q: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Rotate vectors v (N,3) by unit quaternions q (N,4) (w,x,y,z)."""
    w, x, y, z = q[:, 0:1], q[:, 1:2], q[:, 2:3], q[:, 3:4]
    u = np.concatenate([x, y, z], axis=1)
    t = 2.0 * np.cross(u, v)
    return v + w * t + np.cross(u, t)


def densify_and_prune(
    params: TrainableGaussians,
    opt_state: Any,
    grad_sum: np.ndarray,
    grad_cnt: np.ndarray,
    alive: np.ndarray,
    cfg: DensifyConfig,
    rng: np.random.Generator,
):
    """One adaptive-density pass on host.

    grad_sum/grad_cnt: accumulated ||d loss/d mean|| and update counts since
    the previous pass. alive: (cap,) bool slot mask. Returns
    (params, opt_state, alive, report); arrays may grow to a larger bucket
    (caller must rebuild the jitted step when the capacity changes).
    """
    p = jax.device_get(params)
    means = np.array(p.means)
    log_scales = np.array(p.log_scales)
    quats = np.array(p.quats)
    logit_op = np.array(p.logit_opacities)
    colors = np.array(p.colors)
    sh = None if p.sh is None else np.array(p.sh)
    cap = means.shape[0]
    alive = alive.copy()

    avg = grad_sum / np.maximum(grad_cnt, 1)
    opac = 1.0 / (1.0 + np.exp(-logit_op))
    scales = np.exp(log_scales)
    max_scale = scales.max(axis=1)

    # prune: transparent slots die (stay allocated, culled by the renderer)
    prune = alive & (opac < cfg.prune_opacity)
    alive &= ~prune
    logit_op[prune] = DEAD_LOGIT
    log_scales[prune] = DEAD_LOG_SCALE

    hot = alive & (avg > cfg.grad_threshold) & (grad_cnt > 0)
    clone_idx = np.flatnonzero(hot & (max_scale <= cfg.split_scale))
    split_idx = np.flatnonzero(hot & (max_scale > cfg.split_scale))
    n_alive = int(alive.sum())
    # Budget the children BEFORE killing any parent: clones fill first,
    # then split parents in whole 2-child pairs. A split parent whose
    # children don't fit the max_gaussians budget keeps living (its
    # children are dropped and counted) — killing it unconditionally would
    # silently erase coverage at the budget boundary. Each placed split
    # also frees its parent's slot, so the real capacity delta of a split
    # is +1; budgeting its 2 children against the raw headroom is
    # conservative and keeps alive-count monotone (absent pruning).
    n_children = len(clone_idx) + 2 * len(split_idx)
    budget = max(cfg.max_gaussians - n_alive, 0)
    n_clone_placed = min(len(clone_idx), budget)
    n_split_placed = min((budget - n_clone_placed) // 2, len(split_idx))
    clone_idx = clone_idx[:n_clone_placed]
    split_idx = split_idx[:n_split_placed]
    n_new = n_clone_placed + 2 * n_split_placed
    dropped_children = n_children - n_new
    if n_new <= 0 and not prune.any():
        report = {"cloned": 0, "split": 0, "pruned": int(prune.sum()),
                  "dropped_children": dropped_children,
                  "alive": n_alive, "capacity": cap}
        return params, opt_state, alive, report

    # children: clones duplicate in place; splits sample two children from
    # the parent's own distribution with scales / split_factor, parent dies
    new_rows = []
    qn = quats / np.maximum(
        np.linalg.norm(quats, axis=1, keepdims=True), 1e-12
    )
    for idx, k_children, shrink in (
        (clone_idx, 1, 1.0),
        (split_idx, 2, cfg.split_factor),
    ):
        if len(idx) == 0:
            continue
        rep = np.repeat(idx, k_children)
        offs = rng.normal(size=(len(rep), 3)).astype(np.float32) * scales[rep]
        offs = _quat_rotate(qn[rep], offs) if shrink > 1.0 else 0.0 * offs
        new_rows.append((
            means[rep] + offs,
            log_scales[rep] - np.log(shrink),
            quats[rep],
            logit_op[rep],
            colors[rep],
            None if sh is None else sh[rep],
        ))
    if split_idx.size:
        # only parents whose children were actually budgeted above die
        alive[split_idx] = False
        logit_op[split_idx] = DEAD_LOGIT
        log_scales[split_idx] = DEAD_LOG_SCALE

    cat = lambda i: np.concatenate([r[i] for r in new_rows], axis=0)
    if new_rows and n_new > 0:
        nm, nls, nq, nlo, nc = cat(0), cat(1), cat(2), cat(3), cat(4)
        nsh = None if sh is None else cat(5)
        free = np.flatnonzero(~alive)
        n_place = min(len(free), nm.shape[0])
        grow = nm.shape[0] - n_place
        if grow > 0:
            new_cap = _bucket(cap + grow, cfg.bucket_growth)
            means = _pad_rows(means, new_cap)
            log_scales = _pad_rows(log_scales, new_cap, DEAD_LOG_SCALE)
            quats = _pad_rows(quats, new_cap)
            quats[cap:, 0] = 1.0
            logit_op = _pad_rows(logit_op, new_cap, DEAD_LOGIT)
            colors = _pad_rows(colors, new_cap)
            if sh is not None:
                sh = _pad_rows(sh, new_cap)
            alive = _pad_rows(alive, new_cap, False)
            free = np.flatnonzero(~alive)
            cap = new_cap
        slots = free[: nm.shape[0]]
        means[slots] = nm
        log_scales[slots] = nls
        quats[slots] = nq
        logit_op[slots] = nlo
        colors[slots] = nc
        if sh is not None:
            sh[slots] = nsh
        alive[slots] = True

    new_params = TrainableGaussians(
        means=jnp.asarray(means),
        log_scales=jnp.asarray(log_scales),
        quats=jnp.asarray(quats),
        logit_opacities=jnp.asarray(logit_op),
        colors=jnp.asarray(colors),
        sh=None if sh is None else jnp.asarray(sh),
    )
    # optimizer moments: keep existing rows, zero-extend for grown capacity,
    # and RESET the rows of newly placed children — inheriting a dead slot's
    # stale Adam moments would kick fresh gaussians with unrelated momentum
    placed = slots if (new_rows and n_new > 0) else np.zeros((0,), np.int64)

    def _grow_leaf(x):
        x = np.array(jax.device_get(x))
        if x.ndim >= 1 and x.shape[0] == len(grad_sum):
            if cap > x.shape[0]:
                x = _pad_rows(x, cap)
            if placed.size and np.issubdtype(x.dtype, np.floating):
                x[placed] = 0.0
        return jnp.asarray(x)

    new_opt_state = jax.tree_util.tree_map(_grow_leaf, opt_state)
    report = {
        "cloned": int(len(clone_idx)), "split": int(len(split_idx)),
        "pruned": int(prune.sum()),
        "dropped_children": dropped_children,
        "alive": int(alive.sum()),
        "capacity": cap,
    }
    return new_params, new_opt_state, alive, report
