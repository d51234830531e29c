"""Real-hardware parity: the compiled kernels must match the ground-truth
rasterizer and its autodiff gradients ON THE ACCELERATOR.

The default suite runs on CPU where Pallas kernels execute in interpreter
mode — which is exact and therefore blind to hardware-only lowering bugs
(e.g. Mosaic's default MXU precision is bf16 passes: one-hot selection
matmuls in the expansion kernel silently rounded integer table values > 2^8
on v5e until Precision.HIGHEST was forced; CPU tests stayed green the whole
time). Run with

    SPLATJAX_TEST_PLATFORM=axon python -m pytest tests/test_tpu_parity.py

bench.py runs the same image gate before timing, so every benchmark run on
real hardware re-checks this too.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatjax.camera import make_camera
from splatjax.io import synthetic_scene
from splatjax.reference import render_reference
from splatjax.render import render
from splatjax.scene import TrainableGaussians

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="hardware parity test: run with SPLATJAX_TEST_PLATFORM=axon",
)


def _setup(n=3000, seed=5):
    scene = synthetic_scene(n, seed=seed, extent=0.7,
                            scale_range=(0.01, 0.05))
    cam = make_camera((0.1, -0.2, 2.4), (0, 0, 0), width=256, height=192)
    return scene, cam


def test_device_image_matches_reference():
    scene, cam = _setup()
    img = np.asarray(render(scene, cam, early_stop=0.0, alpha_clip=None))
    ref = np.asarray(render_reference(scene, cam))
    np.testing.assert_allclose(img, ref, atol=1e-3)


def test_device_grads_match_reference_autodiff():
    scene, cam = _setup(n=500, seed=9)
    params = TrainableGaussians.from_scene(scene)

    def loss_tiled(p):
        return jnp.mean(
            render(p.to_scene(), cam, early_stop=0.0, alpha_clip=None) ** 2
        )

    def loss_ref(p):
        return jnp.mean(render_reference(p.to_scene(), cam) ** 2)

    g_tiled = jax.grad(loss_tiled)(params)
    g_ref = jax.grad(loss_ref)(params)
    for name in ("means", "log_scales", "quats", "colors",
                 "logit_opacities"):
        a = np.asarray(getattr(g_tiled, name))
        b = np.asarray(getattr(g_ref, name))
        np.testing.assert_allclose(a, b, atol=2e-4, rtol=2e-2)
