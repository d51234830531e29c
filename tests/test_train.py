"""Training-loop tests: loss functions, a short fit actually reduces loss
and recovers a target scene's appearance (BASELINE.json config 4, scaled
down for CI), checkpoint export round-trip.
"""
import numpy as np
import jax
import jax.numpy as jnp

from splatjax.camera import make_camera
from splatjax.io import parse_splat_bytes, synthetic_scene
from splatjax.render import render
from splatjax.train import (
    FitConfig,
    combined_loss,
    export_splat,
    fit,
    init_random,
    psnr,
    ssim,
)
from splatjax.scene import TrainableGaussians


def test_ssim_identity_and_bounds():
    img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
    assert float(ssim(img, img)) > 0.9999
    noise = jnp.clip(img + 0.5 * jax.random.normal(
        jax.random.PRNGKey(1), img.shape), 0, 1)
    assert float(ssim(img, noise)) < 0.9


def test_loss_zero_at_identity():
    img = jax.random.uniform(jax.random.PRNGKey(2), (24, 24, 4))
    assert float(combined_loss(img, img)) < 1e-6


def test_fit_improves_loss_and_psnr():
    target_scene = synthetic_scene(
        30, seed=40, extent=0.5, scale_range=(0.06, 0.15),
        opacity_range=(0.6, 1.0),
    )
    cams = [
        make_camera((0, 0, 2.0), (0, 0, 0), width=48, height=32),
        make_camera((0.6, 0.3, 1.9), (0, 0, 0), width=48, height=32),
    ]
    targets = [render(target_scene, c) for c in cams]

    init = init_random(60, jax.random.PRNGKey(3), extent=0.5,
                       initial_scale=0.08)
    cfg = FitConfig(steps=120, log_every=40, capacity=4096)
    params, history = fit(init, cams, targets, cfg)
    assert history[0]["loss"] > history[-1]["loss"]
    final = render(params.to_scene(), cams[0])
    p = float(psnr(final, targets[0]))
    assert p > 14.0, p  # coarse fit in 120 steps


def test_export_splat_round_trip(tmp_path):
    params = init_random(16, jax.random.PRNGKey(4))
    path = str(tmp_path / "out.splat")
    export_splat(path, params)
    back = parse_splat_bytes(open(path, "rb").read())
    scene = params.to_scene()
    np.testing.assert_allclose(
        np.asarray(back.means), np.asarray(scene.means), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(back.opacities), np.asarray(scene.opacities),
        atol=0.5 / 255,
    )
