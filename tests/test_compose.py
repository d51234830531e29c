"""Whole-scene-graph composition (splatjax/compose.py): many opaque
layers + many splat entities in one depth-correct frame — the browser
depth-buffer semantics the reference inherits (index.js:177-181)."""
import numpy as np
import jax.numpy as jnp

from splatjax.camera import make_camera
from splatjax.compose import OpaqueLayer, compose_scene, merge_opaque_layers
from splatjax.io import synthetic_scene
from splatjax.render import composite_over, render, render_instances
from splatjax.scene import GaussianScene

W, H = 64, 48


def _cam():
    return make_camera((0, 0, 2.2), (0, 0, 0), width=W, height=H)


def test_merge_opaque_layers_nearest_wins():
    rng = np.random.default_rng(0)
    a = OpaqueLayer(rng.random((H, W, 3)).astype(np.float32),
                    rng.uniform(-5, -1, (H, W)).astype(np.float32))
    zb = np.full((H, W), -np.inf, np.float32)
    zb[:, : W // 2] = -0.5  # nearer on the left half only
    b = OpaqueLayer(np.full((H, W, 3), 0.25, np.float32), zb)
    rgb, z, mask = merge_opaque_layers([a, b])
    rgb, z, mask = np.asarray(rgb), np.asarray(z), np.asarray(mask)
    assert np.all(z[:, : W // 2] == -0.5)
    np.testing.assert_array_equal(z[:, W // 2:], np.asarray(a.z)[:, W // 2:])
    assert np.all(rgb[:, : W // 2] == 0.25)
    assert mask.all()


def test_compose_single_layer_matches_primitive_path():
    scene = synthetic_scene(200, seed=51, extent=0.6,
                            scale_range=(0.02, 0.08))
    cam = _cam()
    z = np.full((H, W), -np.inf, np.float32)
    z[:, W // 2:] = -2.1
    rgb = np.zeros((H, W, 3), np.float32)
    rgb[:, W // 2:] = [0.2, 0.6, 0.1]
    layer = OpaqueLayer(rgb, z)

    got = np.asarray(compose_scene(
        [(scene, None)], [layer], cam, early_stop=0.0
    ))
    want = np.asarray(composite_over(
        render(scene, cam, zbuf=z, early_stop=0.0),
        jnp.asarray(rgb) * jnp.isfinite(jnp.asarray(z))[..., None],
        under_mask=np.isfinite(z),
    ))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_compose_two_layers_equals_premerged_single_layer():
    scene = synthetic_scene(150, seed=52, extent=0.6,
                            scale_range=(0.03, 0.08))
    cam = _cam()
    rng = np.random.default_rng(1)
    z1 = rng.uniform(-4.0, -2.5, (H, W)).astype(np.float32)
    z2 = rng.uniform(-4.0, -2.5, (H, W)).astype(np.float32)
    c1 = rng.random((H, W, 3)).astype(np.float32)
    c2 = rng.random((H, W, 3)).astype(np.float32)

    got = np.asarray(compose_scene(
        [(scene, None)], [OpaqueLayer(c1, z1), OpaqueLayer(c2, z2)],
        cam, early_stop=0.0,
    ))
    nearer = z2 > z1
    zm = np.where(nearer, z2, z1)
    cm = np.where(nearer[..., None], c2, c1)
    want = np.asarray(compose_scene(
        [(scene, None)], [OpaqueLayer(cm, zm)], cam, early_stop=0.0,
    ))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_compose_depth_orders_splats_and_meshes():
    """A splat in FRONT of the nearest opaque surface blends over it; a
    splat BEHIND any opaque surface is culled; two splat entities
    interleave through the shared sort."""
    def one_splat(zworld):
        return GaussianScene(
            means=np.array([[0.0, 0.0, zworld]], np.float32),
            scales=np.full((1, 3), 0.3, np.float32),
            quats=np.array([[1, 0, 0, 0]], np.float32),
            colors=np.array([[1.0, 0.0, 0.0]], np.float32),
            opacities=np.array([0.8], np.float32),
        )

    cam = _cam()  # camera at z=2.2 looking at origin
    # opaque wall at camera z = -2.2 (world z = 0 plane)
    wall = OpaqueLayer(
        np.full((H, W, 3), [0.0, 1.0, 0.0], np.float32),
        np.full((H, W), -2.2, np.float32),
    )
    front = one_splat(1.0)    # camera z ~ -1.2: in front of the wall
    behind = one_splat(-1.0)  # camera z ~ -3.2: hidden by the wall

    img_f = np.asarray(compose_scene([(front, None)], [wall], cam,
                                     early_stop=0.0))
    img_b = np.asarray(compose_scene([(behind, None)], [wall], cam,
                                     early_stop=0.0))
    cy, cx = H // 2, W // 2
    assert img_f[cy, cx, 0] > 0.5          # red splat visible over wall
    assert img_b[cy, cx, 0] < 1e-6         # hidden splat fully culled
    np.testing.assert_allclose(img_b[cy, cx, 1], 1.0, atol=1e-6)  # wall
    assert img_b[cy, cx, 3] == 1.0         # opaque coverage -> alpha 1

    # both entities in one frame == the concatenated-scene single call
    both = np.asarray(compose_scene(
        [(front, None), (behind, None)], [wall], cam, early_stop=0.0
    ))
    cat = GaussianScene(
        means=np.concatenate([front.means, behind.means]),
        scales=np.concatenate([front.scales, behind.scales]),
        quats=np.concatenate([front.quats, behind.quats]),
        colors=np.concatenate([front.colors, behind.colors]),
        opacities=np.concatenate([front.opacities, behind.opacities]),
    )
    want = np.asarray(compose_scene([(cat, None)], [wall], cam,
                                    early_stop=0.0))
    np.testing.assert_allclose(both, want, atol=1e-6)
