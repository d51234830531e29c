"""Model transforms + multi-instance rendering tests.

The reference's cutout demo renders two entities of the same asset with
different world transforms in one frame (cutout-demo.html:23-25), folding
each entity's object.matrixWorld into the modelview (index.js:443-448,
467-487). render_instances reproduces this depth-correctly in one pipeline
pass; ground truth is the reference rasterizer over the host-transformed
concatenated scene.
"""
import numpy as np
import jax.numpy as jnp

from splatjax.camera import make_camera
from splatjax.io import synthetic_scene
from splatjax.reference import render_reference
from splatjax.render import render, render_instances
from splatjax.scene import GaussianScene

W, H = 80, 64


def _rigid(axis, angle, t):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    c, s = np.cos(angle), np.sin(angle)
    x, y, z = axis
    k = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
    rot = np.eye(3) + s * k + (1 - c) * (k @ k)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = rot.astype(np.float32)
    m[:3, 3] = np.asarray(t, np.float32)
    return m


def _quat_mul(q1, q2):
    """(w,x,y,z) Hamilton product, batched on q2."""
    w1, x1, y1, z1 = q1
    w2, x2, y2, z2 = q2[:, 0], q2[:, 1], q2[:, 2], q2[:, 3]
    return np.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1).astype(np.float32)


def _rot_to_quat(rot):
    w = np.sqrt(max(0.0, 1 + rot[0, 0] + rot[1, 1] + rot[2, 2])) / 2
    x = (rot[2, 1] - rot[1, 2]) / (4 * w)
    y = (rot[0, 2] - rot[2, 0]) / (4 * w)
    z = (rot[1, 0] - rot[0, 1]) / (4 * w)
    return (w, x, y, z)


def _transform_scene(scene, m):
    """Host-side rigid transform of a GaussianScene (ground-truth path)."""
    rot = np.asarray(m[:3, :3], np.float64)
    t = np.asarray(m[:3, 3], np.float32)
    means = (np.asarray(scene.means) @ rot.T.astype(np.float32)) + t
    q_m = _rot_to_quat(rot)
    quats = _quat_mul(q_m, np.asarray(scene.quats))
    return GaussianScene(
        means=means.astype(np.float32),
        scales=np.asarray(scene.scales),
        quats=quats,
        colors=np.asarray(scene.colors),
        opacities=np.asarray(scene.opacities),
    )


def _concat(a, b):
    return GaussianScene(
        means=np.concatenate([a.means, b.means]),
        scales=np.concatenate([a.scales, b.scales]),
        quats=np.concatenate([a.quats, b.quats]),
        colors=np.concatenate([a.colors, b.colors]),
        opacities=np.concatenate([a.opacities, b.opacities]),
    )


def test_single_model_transform_matches_host_transform():
    scene = synthetic_scene(200, seed=60, extent=0.5,
                            scale_range=(0.02, 0.08))
    cam = make_camera((0, 0, 2.2), (0, 0, 0), width=W, height=H)
    m = _rigid((0.3, 1.0, 0.2), 0.7, (0.15, -0.1, 0.05))
    ours = np.asarray(render(scene, cam, model=m, early_stop=0.0))
    expect = np.asarray(render(_transform_scene(scene, m), cam,
                               early_stop=0.0))
    assert np.abs(ours - expect).max() < 1e-3


def test_two_instances_depth_correct():
    # two overlapping instances of the same asset; ground truth = reference
    # rasterizer over the concatenated transformed scene (global depth
    # interleave — NOT two composited render() calls)
    scene = synthetic_scene(150, seed=61, extent=0.4,
                            scale_range=(0.02, 0.08))
    cam = make_camera((0, 0, 2.2), (0, 0, 0), width=W, height=H)
    m1 = _rigid((0, 1, 0), 0.4, (-0.1, 0.0, 0.15))
    m2 = _rigid((1, 0, 0), -0.3, (0.12, 0.05, -0.15))
    ours = np.asarray(render_instances(
        [(scene, m1), (scene, m2)], cam, early_stop=0.0
    ))
    merged = _concat(_transform_scene(scene, m1), _transform_scene(scene, m2))
    ref = np.asarray(render_reference(merged, cam, pixel_chunk=512))
    assert np.abs(ours - ref).max() < 1e-3


def test_per_instance_cutout():
    # one instance clipped by a cutout box, the other untouched — the
    # cutout-demo configuration (cutout-demo.html:23-25)
    scene = synthetic_scene(120, seed=62, extent=0.4,
                            scale_range=(0.02, 0.08))
    cam = make_camera((0, 0, 2.2), (0, 0, 0), width=W, height=H)
    m2 = _rigid((0, 0, 1), 0.0, (0.3, 0.0, 0.0))
    box = np.diag([0.6, 0.6, 0.6, 1.0]).astype(np.float32)
    cutout = np.linalg.inv(box).astype(np.float32)

    both = np.asarray(render_instances(
        [(scene, None, cutout), (scene, m2)], cam, early_stop=0.0
    ))
    free = np.asarray(render_instances(
        [(scene, None), (scene, m2)], cam, early_stop=0.0
    ))
    # cutout reduces coverage; the untouched instance is unaffected where
    # the first instance contributes nothing
    assert (both[..., 3] > 0).sum() < (free[..., 3] > 0).sum()

    # exact ground truth: cull instance-1 splats on host with the worker's
    # Y-negation quirk (index.js:533-540), then reference-render the merge
    p = np.asarray(scene.means) * np.array([1.0, -1.0, 1.0], np.float32)
    h = p @ cutout[:3, :3].T + cutout[:3, 3]
    hw = p @ cutout[3, :3] + cutout[3, 3]
    q = h / np.where(np.abs(hw) < 1e-12, 1e-12, hw)[:, None]
    inside = np.all((q >= -0.5) & (q <= 0.5), axis=-1)
    kept = GaussianScene(
        means=scene.means[inside], scales=scene.scales[inside],
        quats=scene.quats[inside], colors=scene.colors[inside],
        opacities=scene.opacities[inside],
    )
    merged = _concat(kept, _transform_scene(scene, m2))
    ref = np.asarray(render_reference(merged, cam, pixel_chunk=512))
    assert np.abs(both - ref).max() < 1e-3
