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


def test_exact_depth_sort_removed():
    # the deprecated no-op knob was kept one release (round 2-3) and is
    # now gone: passing it must fail loudly, not silently change nothing
    import pytest

    from splatjax.render import render

    scene = synthetic_scene(50, seed=77, extent=0.6, scale_range=(0.02, 0.08))
    cam = make_camera((0, 0, 2.2), (0, 0, 0), width=32, height=32)
    with pytest.raises(TypeError):
        render(scene, cam, exact_depth_sort=True)


def test_render_overrides_warn_and_bypass_cache():
    # SplatRenderer.render(**overrides) cannot honor the cached stale-order
    # index; the semantics change must be surfaced as a warning
    import warnings

    scene = synthetic_scene(120, seed=78, extent=0.6, scale_range=(0.02, 0.08))
    cam = make_camera((0, 0, 2.2), (0, 0, 0), width=32, height=32)
    r = SplatRenderer(scene=scene, resort_interval=4)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        img = r.render(cam, early_stop=0.0)
        assert any("resort_interval" in str(x.message) for x in w)
    assert img.shape == (32, 32, 4)
    # no overrides -> cached path, no warning
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        r.render(cam)
        assert not any("resort_interval" in str(x.message) for x in w)


def test_renderer_feature_bytes_16():
    # the interactive fast-row configuration is reachable from the
    # SplatRenderer surface on both the exact and stale-order paths
    scene = synthetic_scene(150, seed=79, extent=0.6, scale_range=(0.02, 0.08))
    cam = make_camera((0, 0, 2.2), (0, 0, 0), width=48, height=48)
    a = np.asarray(SplatRenderer(scene=scene).render(cam))
    b = np.asarray(
        SplatRenderer(scene=scene, feature_bytes=16).render(cam)
    )
    c = np.asarray(
        SplatRenderer(
            scene=scene, feature_bytes=16, resort_interval=4
        ).render(cam)
    )
    def psnr_vs_exact(x):
        mse = float(np.mean((x - a) ** 2))
        return 10.0 * np.log10(1.0 / max(mse, 1e-12))

    assert psnr_vs_exact(b) >= 40.0
    # the stale-order redraw takes the FUSED cached kernel (full-f32
    # in-kernel projection): not bitwise vs the packed-row exact-path
    # render, but at least as close to it (quality >= the packed rows')
    assert psnr_vs_exact(c) >= psnr_vs_exact(b) - 0.5
    assert psnr_vs_exact(c) >= 40.0


def test_render_stereo_pair():
    # WebXR analogue: per-eye render at xrPixelRatio-scaled resolution
    # (index.js:13-15); shared_bins reuses the left eye's tile index like
    # the reference's single per-frame sort order
    from splatjax.camera import make_camera as mc
    from splatjax.render import render, render_stereo

    scene = synthetic_scene(200, seed=81, extent=0.6, scale_range=(0.02, 0.08))
    baseline = 0.01
    cl = mc((-baseline, 0, 2.4), (0, 0, 0), width=64, height=48)
    cr = mc((+baseline, 0, 2.4), (0, 0, 0), width=64, height=48)
    il, ir = render_stereo(scene, cl, cr, xr_pixel_ratio=0.5)
    assert il.shape == (24, 32, 4) and ir.shape == (24, 32, 4)
    # left eye equals a plain render at the scaled resolution
    cl_s = mc((-baseline, 0, 2.4), (0, 0, 0), width=32, height=24)
    np.testing.assert_allclose(
        np.asarray(il), np.asarray(render(scene, cl_s)), atol=1e-6
    )
    # eyes see a (slightly) different image
    assert np.abs(np.asarray(il) - np.asarray(ir)).max() > 1e-4
    # shared-bins approximation stays close at a small baseline
    sl, sr = render_stereo(
        scene, cl, cr, xr_pixel_ratio=0.5, shared_bins=True
    )
    # (1e-4: render() and render_binned() fuse image assembly differently)
    np.testing.assert_allclose(np.asarray(sl), np.asarray(il), atol=1e-4)
    mse = float(np.mean((np.asarray(sr) - np.asarray(ir)) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr >= 30.0, psnr


def test_select_important_lod():
    """The LOD knob mirrors the reference's importance truncation
    (volume x opacity sort, index.js:653-669 + capacity keep at
    329-335): the kept subset is the top-importance fraction, renders a
    close approximation of the full scene, and scales down the
    duplicated-instance count (the measured fps lever)."""
    from splatjax import importance, select_important
    from splatjax.render import bin_scene, render

    scene = synthetic_scene(400, seed=91, extent=0.6,
                            scale_range=(0.01, 0.09))
    cam = make_camera((0, 0, 2.3), (0, 0, 0), width=96, height=64)
    half = select_important(scene, 0.5)
    assert half.num_gaussians == 200
    imp = np.asarray(importance(scene))
    kept_min = np.asarray(importance(half)).min()
    # every kept gaussian is at least as important as every dropped one
    assert kept_min >= np.sort(imp)[199] - 1e-12
    # instances drop (big-splat subsets keep more than half, but less
    # than the full count)
    k_full = int(bin_scene(scene, cam, capacity=1024).num_instances)
    k_half = int(bin_scene(half, cam, capacity=1024).num_instances)
    assert k_half < k_full
    # the top-importance half carries most of the image energy
    full = np.asarray(render(scene, cam))
    part = np.asarray(render(half, cam))
    assert np.mean(np.abs(full - part)) < 0.2 * max(np.mean(full), 1e-6)

    import pytest

    with pytest.raises(ValueError):
        select_important(scene, 0.0)
