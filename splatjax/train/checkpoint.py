"""Checkpoint / resume + viewer interop export.

The reference has no checkpointing — its "checkpoints" are the .splat/.ply
assets themselves (SURVEY.md §5). Here:

  * orbax checkpoints of the full training state (parameter pytree +
    optimizer state) for crash/resume;
  * export of trained scenes to the reference's exact `.splat` byte layout
    (splatjax.io.splat_format, mirroring index.js:676-742), so our output
    loads in the upstream WebGL viewer — the interop proof.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax

from splatjax.scene import GaussianScene, TrainableGaussians
from splatjax.io.splat_format import save_splat
from splatjax.io.ply_format import save_ply

try:  # orbax is baked into the image; guard anyway for leanness
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


class CheckpointManager:
    """Thin orbax wrapper over (params, opt_state, step)."""

    def __init__(self, directory: str, *, max_to_keep: int = 3):
        if not _HAS_ORBAX:
            raise RuntimeError("orbax-checkpoint is unavailable")
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, params: Any, opt_state: Any) -> None:
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardSave(params),
                opt_state=ocp.args.StandardSave(opt_state),
            ),
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, params_like: Any, opt_state_like: Any, step=None):
        step = self._mgr.latest_step() if step is None else step
        out = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardRestore(params_like),
                opt_state=ocp.args.StandardRestore(opt_state_like),
            ),
        )
        return out["params"], out["opt_state"], step


def export_splat(path: str, params: TrainableGaussians | GaussianScene):
    """Write a trained scene as .splat for the reference viewer."""
    scene = params.to_scene() if isinstance(params, TrainableGaussians) else params
    save_splat(path, jax.device_get(scene))


def export_ply(path: str, params: TrainableGaussians | GaussianScene):
    """Write a trained scene as 3DGS .ply (keeps SH bands)."""
    scene = params.to_scene() if isinstance(params, TrainableGaussians) else params
    save_ply(path, jax.device_get(scene))
