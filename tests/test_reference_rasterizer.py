"""Golden tests for the pure-JAX ground-truth rasterizer.

Oracle: a scalar NumPy renderer that follows the viewer's actual pipeline —
worker cull + counting sort (far-to-near), per-fragment quad alpha, WebGL
back-to-front "over" blending (index.js:170-181). SURVEY.md §4 item 2/3.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from splatjax.camera import make_camera
from splatjax.io import parse_splat_bytes, scene_to_splat_bytes, synthetic_scene
from splatjax.reference import render_reference
from splatjax.reference import viewer_math as vm
from splatjax.scene import TrainableGaussians

W, H = 48, 32


def _numpy_viewer_render(raw, modelview, projection, width, height):
    """Back-to-front over-composite, exactly like the WebGL pipeline."""
    viewer = vm.push_data_buffer_math(raw)
    mv = np.asarray(modelview, np.float64)
    pr = np.asarray(projection, np.float64)
    focal = (height / 2.0) * abs(pr[1, 1])
    order = vm.worker_sort_cull(viewer["centers"], viewer["sort_metric"], mv)

    img = np.zeros((height, width, 4))  # y-up rows; flip at end
    for idx in order:  # far to near
        i = int(idx)
        cov6 = viewer["cov6_q"][i].astype(np.float64) * viewer["quant_scale"][i]
        out = vm.vertex_shader_math(
            viewer["centers"][i], cov6, mv, pr, (width, height), focal
        )
        if out is None:
            continue
        ndc_center, v1, v2, _ = out
        color = viewer["colors"][i]
        opacity = viewer["opacities"][i]
        for iy in range(height):
            for ix in range(width):
                a = vm.splat_alpha_at_pixel(
                    ndc_center, v1, v2,
                    (ix + 0.5, iy + 0.5), (width, height), opacity,
                )
                if a <= 0.0:
                    continue
                # gl blend: rgb = src*a + dst*(1-a); alpha = src + dst*(1-a)
                img[iy, ix, :3] = color * a + img[iy, ix, :3] * (1 - a)
                img[iy, ix, 3] = a + img[iy, ix, 3] * (1 - a)
    return img[::-1]


def test_reference_render_matches_viewer_pipeline():
    n = 40
    scene = synthetic_scene(n, seed=12, extent=0.6,
                            scale_range=(0.03, 0.12))
    raw = np.frombuffer(scene_to_splat_bytes(scene), np.uint8).reshape(n, 32)
    scene = parse_splat_bytes(raw.tobytes())
    cam = make_camera((0.0, 0.0, 2.5), (0.0, 0.0, 0.0), width=W, height=H)

    golden = _numpy_viewer_render(
        raw, np.asarray(cam.modelview), np.asarray(cam.projection), W, H
    )
    ours = np.asarray(
        render_reference(scene, cam, viewer_exact=True, pixel_chunk=256)
    )
    # north-star parity bound: 1e-3 on RGBA (BASELINE.md)
    assert np.max(np.abs(ours - golden)) < 1e-3
    # scene must actually cover pixels
    assert golden[..., 3].max() > 0.2


def test_reference_render_cutout():
    n = 60
    scene = synthetic_scene(n, seed=13, extent=0.6, scale_range=(0.03, 0.1))
    raw = np.frombuffer(scene_to_splat_bytes(scene), np.uint8).reshape(n, 32)
    scene = parse_splat_bytes(raw.tobytes())
    cam = make_camera((0.0, 0.0, 2.5), (0.0, 0.0, 0.0), width=W, height=H)
    box_world = np.diag([1.0, 1.0, 1.0, 1.0]).astype(np.float32)
    box_world[:3, 3] = [0.1, 0.0, 0.0]
    cutout = np.linalg.inv(box_world).astype(np.float32)

    viewer = vm.push_data_buffer_math(raw)
    order = vm.worker_sort_cull(
        viewer["centers"], viewer["sort_metric"],
        np.asarray(cam.modelview), cutout=cutout,
    )
    ours = np.asarray(
        render_reference(
            scene, cam, viewer_exact=True, cutout=jnp.asarray(cutout),
            pixel_chunk=256,
        )
    )
    full = np.asarray(
        render_reference(scene, cam, viewer_exact=True, pixel_chunk=256)
    )
    # cutout culls some splats -> image differs, and fewer kept
    assert len(order) < n
    assert np.max(np.abs(ours - full)) > 1e-3


def test_reference_render_is_differentiable():
    scene = synthetic_scene(24, seed=14, extent=0.5, scale_range=(0.04, 0.1))
    params = TrainableGaussians.from_scene(scene)
    cam = make_camera((0.0, 0.0, 2.0), (0.0, 0.0, 0.0), width=32, height=24)
    target = jnp.zeros((24, 32, 4))

    def loss_fn(p):
        img = render_reference(p.to_scene(), cam, pixel_chunk=256)
        return jnp.mean((img - target) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    flat, _ = ravel_pytree(
        (grads.means, grads.log_scales, grads.quats,
         grads.logit_opacities, grads.colors)
    )
    flat = np.asarray(flat)
    assert np.all(np.isfinite(flat))
    assert np.abs(flat).max() > 0.0  # gradients actually flow


def test_reference_render_finite_diff_gradcheck():
    """Directional finite-difference check through the full renderer."""
    scene = synthetic_scene(8, seed=15, extent=0.4, scale_range=(0.05, 0.15))
    params = TrainableGaussians.from_scene(scene)
    cam = make_camera((0.0, 0.0, 1.8), (0.0, 0.0, 0.0), width=24, height=16)
    key = jax.random.PRNGKey(0)

    def loss_fn(p):
        img = render_reference(p.to_scene(), cam, pixel_chunk=128)
        return jnp.sum(img[..., :3] * jnp.cos(jnp.arange(img[..., :3].size)
                                              .reshape(img[..., :3].shape)))

    flat, unravel = ravel_pytree(params)
    f = lambda x: loss_fn(unravel(x))
    g = jax.grad(f)(flat)
    d = jax.random.normal(key, flat.shape)
    d = d / jnp.linalg.norm(d)
    eps = 1e-3
    fd = (f(flat + eps * d) - f(flat - eps * d)) / (2 * eps)
    an = jnp.dot(g, d)
    np.testing.assert_allclose(float(fd), float(an), rtol=2e-2, atol=1e-4)
