"""Cached-binning (stale-order) rendering: bin_scene/render_binned and the
SplatRenderer.resort_interval knob — the analogue of the reference viewer
reusing the worker's previous sorted order between sorts (index.js:439-453,
206: sortReady backpressure makes rendering use an order that lags the
camera by >= 1 frame)."""
import numpy as np
import jax.numpy as jnp

from splatjax.camera import make_camera
from splatjax.io import synthetic_scene
from splatjax.render import bin_scene, render, render_binned
from splatjax.viewer import SplatRenderer


def _setup():
    scene = synthetic_scene(150, seed=9, extent=0.7, scale_range=(0.02, 0.08))
    cam = make_camera((0.1, -0.2, 2.4), (0, 0, 0), width=64, height=48)
    return scene, cam


def test_binned_render_matches_full_render_same_camera():
    scene, cam = _setup()
    full = np.asarray(render(scene, cam, early_stop=0.0))
    bins = bin_scene(scene, cam)
    cached = np.asarray(render_binned(scene, cam, bins, early_stop=0.0))
    # separate jit programs reassociate projection float ops (~1e-5)
    np.testing.assert_allclose(cached, full, atol=5e-5)


def test_binned_render_moved_camera_is_finite_and_close():
    scene, cam = _setup()
    bins = bin_scene(scene, cam)
    cam2 = make_camera((0.11, -0.2, 2.4), (0, 0, 0), width=64, height=48)
    stale = np.asarray(render_binned(scene, cam2, bins))
    fresh = np.asarray(render(scene, cam2))
    assert np.all(np.isfinite(stale))
    # small motion: the stale tile lists still cover almost everything
    assert np.abs(stale - fresh).mean() < 0.02


def test_splat_renderer_resort_interval_static_camera_exact():
    scene, cam = _setup()
    r_exact = SplatRenderer(scene=scene)
    r_stale = SplatRenderer(scene=scene, resort_interval=3)
    ref = np.asarray(r_exact.render(cam))
    for _ in range(5):  # crosses a resort boundary
        frame = np.asarray(r_stale.render(cam))
        np.testing.assert_allclose(frame, ref, atol=5e-5)


def test_splat_renderer_resort_cache_invalidated_on_viewport_change():
    scene, cam = _setup()
    r = SplatRenderer(scene=scene, resort_interval=10)
    a = np.asarray(r.render(cam))
    cam_small = make_camera((0.1, -0.2, 2.4), (0, 0, 0), width=32, height=24)
    b = np.asarray(r.render(cam_small))
    assert a.shape == (48, 64, 4) and b.shape == (24, 32, 4)
    assert np.all(np.isfinite(b))


def test_splat_renderer_resort_cache_invalidated_on_scene_mutation():
    """feed()ing more splats mid-sequence must invalidate the cached tile
    index immediately (round-2 verdict: the cache was keyed on id(scene),
    which CPython can recycle; it now holds the scene object itself)."""
    from splatjax.io.splat_format import scene_to_splat_bytes

    scene, cam = _setup()
    extra = synthetic_scene(40, seed=10, extent=0.4,
                            scale_range=(0.05, 0.12))
    r = SplatRenderer(scene=scene, resort_interval=10)
    before = np.asarray(r.render(cam))

    r.feed(scene_to_splat_bytes(extra))
    after = np.asarray(r.render(cam))  # must NOT reuse the stale bins
    combined = SplatRenderer(scene=r.scene)
    fresh = np.asarray(combined.render(cam))
    np.testing.assert_allclose(after, fresh, atol=5e-5)
    assert np.abs(after - before).max() > 1e-3  # new splats visible


def test_cached_param_bins_match_gather_path():
    """bin_scene(cache_params=True) redraws project pre-gathered
    per-instance parameters directly (no per-frame feature gather) and
    must match the gather-path redraw bit-for-bit-close on the same
    camera, in both row widths, and under small camera motion."""
    import numpy as np

    from splatjax.camera import make_camera
    from splatjax.io import synthetic_scene
    from splatjax.render import CachedBins, bin_scene, render_binned

    scene = synthetic_scene(400, seed=31, extent=0.7,
                            scale_range=(0.02, 0.07))
    cam = make_camera((0.1, -0.1, 2.4), (0, 0, 0), width=96, height=64)
    plain = bin_scene(scene, cam)
    cached = bin_scene(scene, cam, cache_params=True)
    assert isinstance(cached, CachedBins)
    # 32-byte parity mode: the cached path re-projects the pre-gathered
    # params through the SAME exact pipeline — bit-for-bit-close
    a32 = np.asarray(render_binned(scene, cam, plain, feature_bytes=32))
    b32 = np.asarray(render_binned(scene, cam, cached, feature_bytes=32))
    np.testing.assert_allclose(b32, a32, atol=1e-6)
    # 16-byte speed mode: the cached path runs the FUSED kernel
    # (projection inside the rasterizer, full-f32 — no 16-byte row
    # quantization), so it is NOT bitwise vs the packed gather path; it
    # must instead sit at least as close to the exact render as the
    # packed path does (its documented quality improvement)
    a16 = np.asarray(render_binned(scene, cam, plain, feature_bytes=16))
    b16 = np.asarray(render_binned(scene, cam, cached, feature_bytes=16))

    def psnr_vs(x):
        mse = float(np.mean((x - a32) ** 2))
        return 10.0 * np.log10(1.0 / max(mse, 1e-12))

    assert psnr_vs(b16) >= psnr_vs(a16) - 0.5, (psnr_vs(b16), psnr_vs(a16))
    assert psnr_vs(b16) >= 40.0
    np.testing.assert_allclose(b16, a32, atol=2e-2)
    # small camera motion: both paths shade fresh against stale bins
    cam2 = make_camera((0.12, -0.1, 2.4), (0, 0, 0), width=96, height=64)
    a = np.asarray(render_binned(scene, cam2, plain))
    b = np.asarray(render_binned(scene, cam2, cached))
    np.testing.assert_allclose(b, a, atol=1e-6)
