"""Adversarial scene shapes for the tiled pipeline: a splat covering every
tile, everything stacked in one tile, saturated alpha==1 fragments,
non-tile-multiple viewports, and tiny capacities — each against the
ground-truth rasterizer or a finiteness/gradient invariant."""
import numpy as np
import jax
import jax.numpy as jnp

from splatjax.camera import make_camera
from splatjax.io import synthetic_scene
from splatjax.reference import render_reference
from splatjax.render import render
from splatjax.scene import GaussianScene, TrainableGaussians


def _scene(means, scales, colors=None, opac=None):
    n = len(means)
    rng = np.random.default_rng(1)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    return GaussianScene(
        means=jnp.asarray(np.asarray(means, np.float32)),
        scales=jnp.asarray(np.asarray(scales, np.float32)),
        quats=jnp.asarray(quats),
        colors=jnp.asarray(
            np.asarray(colors, np.float32) if colors is not None
            else rng.uniform(0.2, 1.0, (n, 3)).astype(np.float32)
        ),
        opacities=jnp.asarray(
            np.asarray(opac, np.float32) if opac is not None
            else rng.uniform(0.4, 1.0, n).astype(np.float32)
        ),
    )


def test_splat_covering_every_tile():
    # one giant gaussian behind a handful of small ones: its instance list
    # spans the full tile grid (max span_w, window jumps in every kernel)
    rng = np.random.default_rng(2)
    small = rng.uniform(-0.5, 0.5, (30, 3)).astype(np.float32)
    means = np.concatenate([small, [[0.0, 0.0, -0.5]]])
    scales = np.concatenate([
        rng.uniform(0.01, 0.03, (30, 3)).astype(np.float32),
        [[2.0, 2.0, 0.1]],
    ])
    scene = _scene(means, scales)
    cam = make_camera((0, 0, 2.2), (0, 0, 0), width=96, height=80)
    ref = np.asarray(render_reference(scene, cam))
    img = np.asarray(render(scene, cam, early_stop=0.0, alpha_clip=None))
    assert np.abs(img - ref).max() < 1e-3


def test_all_splats_in_one_tile():
    rng = np.random.default_rng(3)
    means = (rng.normal(scale=0.01, size=(200, 3)) + [0.4, 0.3, 0]).astype(
        np.float32
    )
    scene = _scene(means, rng.uniform(0.004, 0.01, (200, 3)))
    cam = make_camera((0, 0, 2.0), (0, 0, 0), width=64, height=64)
    ref = np.asarray(render_reference(scene, cam))
    img = np.asarray(render(scene, cam, early_stop=0.0, alpha_clip=None))
    assert np.abs(img - ref).max() < 1e-3


def test_saturated_alpha_one_gradients_finite():
    # opacity exactly 1.0 with alpha_clip=None: fragments can saturate to
    # alpha == 1 (transmittance exactly 0 behind them). The log-space
    # backward must return finite gradients (zero behind the saturate).
    rng = np.random.default_rng(4)
    means = rng.uniform(-0.3, 0.3, (40, 3)).astype(np.float32)
    scene = _scene(
        means, np.full((40, 3), 0.08, np.float32),
        opac=np.ones(40, np.float32),
    )
    cam = make_camera((0, 0, 2.0), (0, 0, 0), width=48, height=48)
    params = TrainableGaussians.from_scene(scene)

    def loss(p):
        s = p.to_scene()
        # force opacities to exactly 1.0 post-activation
        s = GaussianScene(
            means=s.means, scales=s.scales, quats=s.quats,
            colors=s.colors, opacities=jnp.ones_like(s.opacities),
        )
        return jnp.sum(render(s, cam, alpha_clip=None, early_stop=0.0))

    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_odd_viewport_sizes():
    scene = synthetic_scene(80, seed=5, extent=0.6, scale_range=(0.02, 0.06))
    for w, h in [(50, 34), (17, 129), (129, 17)]:
        cam = make_camera((0, 0, 2.3), (0, 0, 0), width=w, height=h)
        ref = np.asarray(render_reference(scene, cam))
        img = np.asarray(render(scene, cam, early_stop=0.0, alpha_clip=None))
        assert img.shape == (h, w, 4)
        assert np.abs(img - ref).max() < 1e-3, (w, h)


def test_tiny_capacity_gradients_finite():
    scene = synthetic_scene(100, seed=6, extent=0.5, scale_range=(0.03, 0.08))
    cam = make_camera((0, 0, 2.0), (0, 0, 0), width=48, height=32)
    params = TrainableGaussians.from_scene(scene)

    def loss(p):
        return jnp.sum(render(p.to_scene(), cam, capacity=128) ** 2)

    img, ov = render(scene, cam, capacity=128, return_overflow=True)
    assert int(ov) > 0
    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))
