"""Device mesh helpers for multi-chip / multi-host execution.

The reference has no parallelism at all — one browser tab, one Web Worker
(SURVEY.md §2). Here the scaling axes are primitives (projection/cull) and
tiles/pixels (rasterization), mapped onto a jax.sharding.Mesh whose
collectives ride ICI (SURVEY.md §5 "long-context" analogue).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = "dev"
) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def make_mesh_2d(
    shape: Sequence[int], axis_names: Sequence[str] = ("data", "dev")
) -> Mesh:
    """2-D mesh, e.g. (hosts, chips) = data x tile sharding for training."""
    devs = np.asarray(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, tuple(axis_names))
