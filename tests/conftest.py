"""Test configuration: run the suite on CPU with 8 virtual devices.

Multi-chip sharding paths (psum, all_gather, tile sharding) execute under
pytest without real hardware (SURVEY.md §4 item 4). Pallas kernels detect the
CPU backend and run in interpreter mode.

Note: the container's sitecustomize imports jax at interpreter start with
JAX_PLATFORMS=axon (TPU) already in the environment, so plain env mutation
here is too late — use jax.config.update before any backend initializes.
Override with SPLATJAX_TEST_PLATFORM=axon to exercise real hardware.
"""
import os

_platform = os.environ.get("SPLATJAX_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
jax.config.update("jax_num_cpu_devices", 8)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables between test modules.

    The suite compiles hundreds of CPU programs across ~15 modules in one
    process; jax retains every executable, and the accumulated RSS has
    produced segfaults INSIDE XLA's CPU compiler near the end of full
    runs (observed at test 130/140 — the same tests pass in isolation).
    Dropping the in-process caches at module teardown keeps the compiler
    fed; shapes rarely repeat across modules, so the recompile cost is
    negligible."""
    yield
    import jax

    jax.clear_caches()
