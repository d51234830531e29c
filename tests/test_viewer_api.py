"""High-level API tests: SplatRenderer schema-like surface, pixel_ratio,
max_splats truncation, progressive feed, converter CLI round trip.
"""
import numpy as np
import jax
import pytest

from splatjax.camera import make_camera
from splatjax.io import (
    load_ply,
    load_splat,
    save_splat,
    scene_to_splat_bytes,
    synthetic_scene,
)
from splatjax.viewer import SplatRenderer
from splatjax.tools.convert import main as convert_main


def test_renderer_from_file(tmp_path):
    scene = synthetic_scene(200, seed=70, extent=0.6, scale_range=(0.02, 0.08))
    path = str(tmp_path / "s.splat")
    save_splat(path, scene)
    r = SplatRenderer(src=path)
    cam = make_camera((0, 0, 2.2), (0, 0, 0), width=64, height=48)
    img = np.asarray(r.render(cam))
    assert img.shape == (48, 64, 4)
    assert img[..., 3].max() > 0.1


def test_pixel_ratio_scales_resolution():
    scene = synthetic_scene(100, seed=71, extent=0.6, scale_range=(0.03, 0.1))
    r = SplatRenderer(scene=scene, pixel_ratio=0.5)
    cam = make_camera((0, 0, 2.2), (0, 0, 0), width=64, height=48)
    img = np.asarray(r.render(cam))
    assert img.shape == (24, 32, 4)  # index.js:10-12 behavior analogue


def test_max_splats_truncation():
    scene = synthetic_scene(100, seed=72)
    r = SplatRenderer(scene=scene, max_splats=40)
    assert r.scene.num_gaussians == 40  # index.js:30-36, 329-335


def test_progressive_feed_renders_partial():
    scene = synthetic_scene(120, seed=73, extent=0.6, scale_range=(0.03, 0.1))
    data = scene_to_splat_bytes(scene)
    r = SplatRenderer()
    cam = make_camera((0, 0, 2.2), (0, 0, 0), width=32, height=32)
    covered = []
    # feed in awkward chunks straddling row boundaries (index.js:279-298)
    for i in range(0, len(data), 1000):
        n = r.feed(data[i:i + 1000])
        if n > 0:
            img = np.asarray(r.render(cam))
            covered.append((img[..., 3] > 0).sum())
    assert r.scene.num_gaussians == 120
    assert covered[-1] >= covered[0]  # scene fills in as rows arrive


def test_cutout_through_renderer():
    scene = synthetic_scene(150, seed=74, extent=0.6, scale_range=(0.02, 0.08))
    box = np.diag([0.8, 0.8, 0.8, 1.0]).astype(np.float32)
    cutout = np.linalg.inv(box).astype(np.float32)
    cam = make_camera((0, 0, 2.2), (0, 0, 0), width=48, height=48)
    full = np.asarray(SplatRenderer(scene=scene).render(cam))
    cut = np.asarray(SplatRenderer(scene=scene, cutout=cutout).render(cam))
    assert (cut[..., 3] > 0).sum() < (full[..., 3] > 0).sum()


def test_convert_cli_round_trip(tmp_path):
    scene = synthetic_scene(50, seed=75)
    splat_in = str(tmp_path / "a.splat")
    ply_out = str(tmp_path / "a.ply")
    splat_back = str(tmp_path / "b.splat")
    save_splat(splat_in, scene)
    assert convert_main([splat_in, ply_out]) == 0
    assert convert_main([ply_out, splat_back, "--no-importance-sort"]) == 0
    a = load_splat(splat_in)
    b = load_splat(splat_back)
    np.testing.assert_allclose(
        np.asarray(a.means), np.asarray(b.means), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(a.opacities), np.asarray(b.opacities), atol=1.5 / 255
    )


def test_no_scene_raises():
    r = SplatRenderer()
    cam = make_camera((0, 0, 2.0), (0, 0, 0), width=16, height=16)
    with pytest.raises(ValueError):
        r.render(cam)


def test_xr_pixel_ratio_scales_resolution():
    # xrPixelRatio defaults to 0.5 (index.js:6, README.md:19): XR renders
    # at half the framebuffer resolution
    scene = synthetic_scene(40, seed=8, extent=0.5, scale_range=(0.05, 0.1))
    r = SplatRenderer(scene=scene)
    cam = make_camera((0, 0, 2.0), (0, 0, 0), width=64, height=48)
    assert r.render(cam).shape == (48, 64, 4)
    assert r.render(cam, xr=True).shape == (24, 32, 4)
    r2 = SplatRenderer(scene=scene, xr_pixel_ratio=0.25)
    assert r2.render(cam, xr=True).shape == (12, 16, 4)


def test_feed_is_incremental_and_caps(tmp_path):
    # feed() must not re-concatenate per chunk (parts fold lazily at render)
    # and must discard bytes past max_splats instead of retaining them.
    scene = synthetic_scene(300, seed=76)
    data = scene_to_splat_bytes(scene)
    r = SplatRenderer(max_splats=100)
    for i in range(0, len(data), 640):  # 20-row chunks
        n = r.feed(data[i:i + 640])
    assert n == 100
    assert len(r._parts) >= 2          # parts accumulated, not merged eagerly
    cam = make_camera((0, 0, 2.2), (0, 0, 0), width=32, height=32)
    r.render(cam)
    assert r._parts == [] and r.scene.num_gaussians == 100
    # further feeding past the cap is a no-op
    assert r.feed(data[:640]) == 100
    assert r._parts == []


def test_exact_depth_sort_reachable():
    from splatjax.render import render

    scene = synthetic_scene(150, seed=77, extent=0.6, scale_range=(0.02, 0.08))
    cam = make_camera((0, 0, 2.2), (0, 0, 0), width=48, height=48)
    a = np.asarray(render(scene, cam, early_stop=0.0))
    b = np.asarray(render(scene, cam, early_stop=0.0, exact_depth_sort=True))
    # quantized-key order (>= 2^14 depth buckets) vs exact f32 order: same
    # image up to tie-order blending noise
    assert np.abs(a - b).max() < 1e-3
    r = SplatRenderer(scene=scene, exact_depth_sort=True)
    assert r.render(cam).shape == (48, 48, 4)
