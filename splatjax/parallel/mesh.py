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
    shape: Sequence[int], axis_names: Sequence[str] = ("host", "chip")
) -> Mesh:
    """2-D (hosts, chips) mesh.

    ``render_sharded(..., axis=("host", "chip"))`` flattens both axes into
    one band axis with 'chip' minor, so the all_to_all's intra-host slices
    ride ICI and only the cross-host slices touch DCN.
    """
    devs = np.asarray(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, tuple(axis_names))


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize multi-host JAX (DCN) if a multi-process env is configured.

    Call once at program start on every host before building meshes; after
    it, jax.devices() spans all hosts and make_mesh_2d((hosts, chips))
    lays collectives out so ICI carries intra-host traffic. On TPU pods the
    runtime autodetects everything (no arguments needed); elsewhere pass the
    coordinator explicitly or set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES
    / JAX_PROCESS_ID. Returns True if distributed mode was initialized,
    False for the single-process fallback (keeps single-host runs zero-
    config: no env, no args -> no-op).
    """
    import os

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    on_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES"))
    if coordinator_address is None and not on_pod:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True
