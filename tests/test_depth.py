"""Depth output + opaque-geometry interaction tests.

The reference renders splats with depthTest:true into a scene with opaque
meshes (index.js:177-181; index.html:9-14's animated spheres slice through
the splat volume). Here: the tiled pipeline's expected-depth channel and
in-sweep z-buffer culling are validated against the ground-truth
rasterizer given the same z-test.
"""
import numpy as np
import jax.numpy as jnp

from splatjax.camera import make_camera
from splatjax.io import synthetic_scene
from splatjax.reference import render_reference
from splatjax.render import composite_over, render
from splatjax.scene import GaussianScene

W, H = 80, 64


def _scene_cam(n=250, seed=50):
    scene = synthetic_scene(n, seed=seed, extent=0.6, scale_range=(0.02, 0.08))
    cam = make_camera((0, 0, 2.2), (0, 0, 0), width=W, height=H)
    return scene, cam


def test_depth_channel_matches_color_blend():
    # Expected depth is blended exactly like a color channel, so encoding
    # each gaussian's (negated, scaled) camera depth into the red channel
    # must reproduce the depth map up to the color path's u16 quantization.
    scene, cam = _scene_cam()
    mv = np.asarray(cam.modelview)
    means = np.asarray(scene.means)
    camz = (means @ mv[:3, :3].T + mv[:3, 3])[:, 2]    # camera-space z
    assert (camz < 0).all() and (camz > -10).all()

    probe = GaussianScene(
        means=scene.means, scales=scene.scales, quats=scene.quats,
        colors=np.stack([-camz / 10.0, np.zeros_like(camz),
                         np.zeros_like(camz)], -1).astype(np.float32),
        opacities=scene.opacities,
    )
    img, depth = render(scene, cam, early_stop=0.0, return_depth=True)
    probe_img = render(probe, cam, early_stop=0.0)
    expect = -10.0 * np.asarray(probe_img[..., 0])
    got = np.asarray(depth)
    assert np.abs(got - expect).max() < 2e-3  # u16 color quantization
    # depth is negative (camera z) wherever something rendered
    covered = np.asarray(img[..., 3]) > 0.05
    assert (got[covered] < 0).all()


def test_zbuffer_occlusion_matches_reference():
    # An opaque half-plane quad at camera z = z0 slicing the splat cloud:
    # the tiled in-sweep z-test must match the ground-truth rasterizer
    # given the same z-buffer, and splats behind the quad must vanish.
    scene, cam = _scene_cam(seed=51)
    z0 = -2.2  # quad at scene center depth
    zbuf = np.full((H, W), -np.inf, np.float32)
    zbuf[:, W // 2:] = z0   # right half occluded beyond z0

    ours = np.asarray(render(scene, cam, early_stop=0.0, zbuf=zbuf))
    ref = np.asarray(
        render_reference(scene, cam, pixel_chunk=512, zbuf=zbuf)
    )
    assert np.abs(ours - ref).max() < 1e-3

    free = np.asarray(render(scene, cam, early_stop=0.0))
    # unoccluded half identical, occluded half loses alpha
    np.testing.assert_allclose(
        ours[:, : W // 2], free[:, : W // 2], atol=1e-6
    )
    assert ours[:, W // 2:, 3].sum() < free[:, W // 2:, 3].sum()


def test_zbuffer_gradients_flow():
    import jax
    from splatjax.scene import TrainableGaussians

    scene, cam = _scene_cam(n=60, seed=52)
    zbuf = np.full((H, W), -2.2, np.float32)
    params = TrainableGaussians.from_scene(scene)
    tgt = jnp.ones((H, W, 4)) * 0.3

    def loss(p):
        img = render(p.to_scene(), cam, zbuf=zbuf, early_stop=0.0)
        return jnp.sum((img - tgt) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert any(float(jnp.abs(x).max()) > 0 for x in leaves)


def test_composite_over_identity():
    scene, cam = _scene_cam(n=80, seed=53)
    img = render(scene, cam)
    mesh_rgb = jnp.broadcast_to(jnp.asarray([0.2, 0.4, 0.6]), (H, W, 3))
    out = np.asarray(composite_over(img, mesh_rgb))
    expect = np.asarray(img[..., :3]) + (
        1.0 - np.asarray(img[..., 3:4])
    ) * np.asarray(mesh_rgb)
    np.testing.assert_allclose(out[..., :3], expect, atol=1e-6)
