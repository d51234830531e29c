"""Tiled Pallas pipeline tests: image parity vs ground truth, gradient
parity vs jax-autodiff of the pure-JAX reference renderer (BASELINE.json
configs 1-2), binning invariants, overflow/empty-scene edges.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from splatjax.camera import make_camera
from splatjax.io import synthetic_scene
from splatjax.ops.binning import TileConfig, bin_gaussians
from splatjax.ops.projection import project_gaussians
from splatjax.reference import render_reference
from splatjax.render import render
from splatjax.scene import TrainableGaussians, build_covariances

W, H = 80, 64


def _scene_cam(n=300, seed=21, w=W, h=H):
    scene = synthetic_scene(n, seed=seed, extent=0.6, scale_range=(0.02, 0.08))
    cam = make_camera((0, 0, 2.2), (0, 0, 0), width=w, height=h)
    return scene, cam


def test_tiled_matches_reference_image():
    scene, cam = _scene_cam()
    ref = np.asarray(render_reference(scene, cam, pixel_chunk=512))
    ours = np.asarray(render(scene, cam, early_stop=0.0))
    assert np.abs(ours - ref).max() < 1e-3  # north-star bound


def test_tiled_early_stop_close():
    scene, cam = _scene_cam(seed=22)
    exact = np.asarray(render(scene, cam, early_stop=0.0))
    fast = np.asarray(render(scene, cam, early_stop=1e-4))
    assert np.abs(exact - fast).max() < 2e-4


def test_tiled_non_square_image_and_tiles():
    scene, cam = _scene_cam(seed=23, w=72, h=40)  # 72 = 4.5 tiles of 16
    ref = np.asarray(render_reference(scene, cam, pixel_chunk=512))
    ours = np.asarray(render(scene, cam, early_stop=0.0))
    assert ours.shape == (40, 72, 4)
    assert np.abs(ours - ref).max() < 1e-3


def test_tiled_viewer_exact_mode():
    scene, cam = _scene_cam(seed=24)
    ref = np.asarray(
        render_reference(scene, cam, viewer_exact=True, pixel_chunk=512)
    )
    ours = np.asarray(render(scene, cam, viewer_exact=True, early_stop=0.0))
    assert np.abs(ours - ref).max() < 1e-3


def test_tiled_cutout_matches_reference():
    scene, cam = _scene_cam(seed=25)
    box = np.diag([1.0, 1.0, 1.0, 1.0]).astype(np.float32)
    box[:3, 3] = [0.2, 0.0, 0.1]
    cutout = jnp.asarray(np.linalg.inv(box).astype(np.float32))
    ref = np.asarray(
        render_reference(scene, cam, cutout=cutout, pixel_chunk=512)
    )
    ours = np.asarray(render(scene, cam, cutout=cutout, early_stop=0.0))
    assert np.abs(ours - ref).max() < 1e-3


def test_tiled_background_compositing():
    scene, cam = _scene_cam(seed=26)
    bg = jnp.asarray([0.1, 0.9, 0.2])
    with_bg = np.asarray(render(scene, cam, background=bg, early_stop=0.0))
    no_bg = np.asarray(render(scene, cam, early_stop=0.0))
    # under-compositing identity: rgb_bg = rgb + (1 - alpha) * bg
    expect = no_bg[..., :3] + (1.0 - no_bg[..., 3:]) * np.asarray(bg)
    np.testing.assert_allclose(with_bg[..., :3], expect, atol=1e-6)
    np.testing.assert_allclose(with_bg[..., 3], no_bg[..., 3], atol=0)


def test_gradients_match_reference_autodiff():
    """Full-chain gradient parity: custom-VJP tiled path vs autodiff of the
    ground-truth renderer, w.r.t. all 3D scene parameters."""
    scene, cam = _scene_cam(n=120, seed=27, w=48, h=32)
    params = TrainableGaussians.from_scene(scene)
    tgt = jax.random.normal(jax.random.PRNGKey(1), (32, 48, 4))

    def loss_tiled(p):
        return jnp.sum(render(p.to_scene(), cam, early_stop=0.0) * tgt)

    def loss_ref(p):
        return jnp.sum(
            render_reference(p.to_scene(), cam, pixel_chunk=256) * tgt
        )

    g1 = jax.grad(loss_tiled)(params)
    g2 = jax.grad(loss_ref)(params)
    f1, _ = ravel_pytree(g1)
    f2, _ = ravel_pytree(g2)
    f1, f2 = np.asarray(f1), np.asarray(f2)
    assert np.all(np.isfinite(f1))
    scale = np.abs(f2).max()
    assert scale > 0
    np.testing.assert_allclose(f1, f2, atol=2e-3 * scale, rtol=2e-3)


def test_binning_invariants():
    scene, cam = _scene_cam(seed=28)
    cov3d = build_covariances(scene.quats, scene.scales)
    proj = project_gaussians(
        scene.means, cov3d, scene.colors, scene.opacities,
        cam.modelview, cam.projection, W, H,
        max_scales=jnp.max(jnp.asarray(scene.scales), axis=-1),
    )
    cfg = TileConfig(W, H)
    b = bin_gaussians(proj, cfg, capacity=4096)
    starts, ends = np.asarray(b.starts), np.asarray(b.ends)
    tile_id = np.asarray(b.tile_id)
    gid = np.asarray(b.gauss_id)
    depth = np.asarray(proj.depth)
    total = int(b.num_instances)
    assert int(b.overflow) == 0
    # ranges partition [0, total)
    assert starts[0] == 0 and ends[-1] == total
    assert np.all(starts <= ends)
    assert np.all(starts[1:] == ends[:-1])
    # tile-major, front-to-back (descending camera-z depth) within each tile
    for t in range(cfg.num_tiles):
        s, e = starts[t], ends[t]
        assert np.all(tile_id[s:e] == t)
        d = depth[gid[s:e]]
        assert np.all(np.diff(d) <= 1e-12)


def test_capacity_overflow_drops_and_reports():
    scene, cam = _scene_cam(seed=29)
    img, overflow = render(
        scene, cam, capacity=256, early_stop=0.0, return_overflow=True
    )
    assert int(overflow) > 0
    assert np.all(np.isfinite(np.asarray(img)))


def test_empty_scene_renders_zeros():
    scene = synthetic_scene(0)
    cam = make_camera((0, 0, 2.0), (0, 0, 0), width=32, height=32)
    img = np.asarray(render(scene, cam))
    assert img.shape == (32, 32, 4)
    assert np.all(img == 0.0)


def test_all_culled_scene():
    scene, _ = _scene_cam(seed=30)
    cam = make_camera((0, 0, -3.0), (0, 0, -10.0), width=32, height=32)
    img = np.asarray(render(scene, cam))
    assert np.all(img[..., 3] == 0.0)


def _gather_vjp_case(n, cap, seed, force_truncation):
    # Simulate bin_gaussians' depth-compact expansion: gaussians with
    # counts + depths, depth-major instance order, capacity truncation
    # dropping the depth-farthest instances, arbitrary tile-sort shuffle,
    # sentinel tail gid n-1.
    from splatjax.ops.binning import gather_features

    rng = np.random.default_rng(seed)
    count = rng.integers(0, 5, size=n).astype(np.int32)
    depth = -rng.uniform(1.0, 9.0, size=n).astype(np.float32)
    cum = np.cumsum(count).astype(np.int32)
    total = int(cum[-1])
    if force_truncation:
        assert total > cap
    # depth-compact order: count>0 first, front-to-back (descending depth)
    key = np.where(count > 0, -depth, np.inf)
    perm = np.argsort(key, kind="stable").astype(np.int32)
    count_d = count[perm].astype(np.float32)
    cum_d = np.cumsum(count_d).astype(np.float32)

    # depth-major instance list, truncated at cap
    gid_depth = np.repeat(perm, count[perm])[:cap]
    valid = len(gid_depth)
    gid = np.full((cap,), n - 1, np.int32)
    gid[:valid] = gid_depth
    shuffle = rng.permutation(valid).astype(np.int32)  # stand-in tile sort
    gid[:valid] = gid[:valid][shuffle]

    feat = rng.normal(size=(n, 16)).astype(np.float32)
    cot = rng.normal(size=(16, cap)).astype(np.float32)
    cot[:, valid:] = 0.0  # sentinel slots never receive gradients
    overflow = max(total - cap, 0)

    def f(feat):
        return gather_features(
            jnp.asarray(feat), jnp.asarray(gid),
            jnp.asarray(cum), jnp.asarray(count),
            jnp.asarray(perm), jnp.asarray(cum_d), jnp.asarray(count_d),
            jnp.asarray(overflow, jnp.int32),
        )

    out, vjp = jax.vjp(f, feat)
    (got,) = vjp(jnp.asarray(cot))
    np.testing.assert_allclose(
        np.asarray(out), feat[gid].T, rtol=0, atol=0
    )

    expect = np.zeros_like(feat)
    np.add.at(expect, gid[:valid], cot.T[:valid])
    np.testing.assert_allclose(np.asarray(got), expect, rtol=2e-5, atol=2e-5)


def test_gather_features_vjp_matches_scatter_oracle(monkeypatch):
    # The segment-sum backward (sort + blocked cumsum + run-boundary
    # residuals, ops/binning.py) must equal the dense scatter-add transpose
    # of the row gather — including under capacity truncation, where the
    # depth-farthest instances are dropped (cutting runs mid-gaussian), and
    # with zero-count gaussians interleaved. Pinned to the f32 gather mode:
    # this test checks the run/truncation ALGEBRA exactly; the default i16
    # packing's rounding is bounded separately below.
    monkeypatch.setenv("SPLATJAX_GRAD_GATHER", "f32")
    _gather_vjp_case(n=37, cap=64, seed=3, force_truncation=True)
    _gather_vjp_case(n=23, cap=256, seed=4, force_truncation=False)


def test_gather_features_vjp_i16_default_rounding_bound():
    """The default int16-packed gradient gather (SPLATJAX_GRAD_GATHER=i16)
    must match the scatter-add oracle within its fixed-point error model:
    per gathered term, |err| <= channel_max / 65534 (round-to-nearest of
    g / (channel_max/32767)), summed over each gaussian's run."""
    from splatjax.ops.binning import gather_features

    assert os.environ.get("SPLATJAX_GRAD_GATHER", "i16") == "i16"
    rng = np.random.default_rng(11)
    n, cap = 40, 512
    count = rng.integers(0, 6, size=n).astype(np.int32)
    depth = -rng.uniform(1.0, 9.0, size=n).astype(np.float32)
    cum = np.cumsum(count).astype(np.int32)
    key = np.where(count > 0, -depth, np.inf)
    perm = np.argsort(key, kind="stable").astype(np.int32)
    count_d = count[perm].astype(np.float32)
    cum_d = np.cumsum(count_d).astype(np.float32)
    gid_depth = np.repeat(perm, count[perm])[:cap]
    valid = len(gid_depth)
    gid = np.full((cap,), n - 1, np.int32)
    gid[:valid] = gid_depth[rng.permutation(valid)]
    # heavy-tailed per-channel scales exercise the per-channel quantization
    feat = rng.normal(size=(n, 16)).astype(np.float32)
    cot = (rng.normal(size=(16, cap)) *
           (10.0 ** rng.integers(-2, 3, size=(16, 1)))).astype(np.float32)
    cot[:, valid:] = 0.0

    def f(feat):
        return gather_features(
            jnp.asarray(feat), jnp.asarray(gid),
            jnp.asarray(cum), jnp.asarray(count),
            jnp.asarray(perm), jnp.asarray(cum_d), jnp.asarray(count_d),
            jnp.zeros((), jnp.int32),
        )

    _, vjp = jax.vjp(f, feat)
    (got,) = vjp(jnp.asarray(cot))
    expect = np.zeros_like(feat)
    np.add.at(expect, gid[:valid], cot.T[:valid])
    cmax = np.abs(cot).max(axis=1)                      # (16,) channel max
    runs = np.bincount(gid[:valid], minlength=n)[:, None]
    bound = (runs + 1) * (cmax[None, :] / 65534.0) + 1e-7
    assert (np.abs(np.asarray(got) - expect) <= bound).all()


def test_sparse_tiles_block_jumps():
    """Ring-DMA stress: a scene whose splats cluster in a few far-apart
    tiles leaves most tile ranges empty, so the forward kernel's streaming
    ring takes its block-jump path (skipping never-issued blocks) many
    times. Must still match the ground-truth image."""
    from splatjax.scene import GaussianScene

    rng = np.random.default_rng(7)
    # three tight clusters widely separated on screen + empty space
    centers = np.array([[-0.9, -0.7, 0], [0.9, 0.8, 0], [0.0, 0.0, 0.4]])
    means = np.concatenate(
        [c + rng.normal(scale=0.02, size=(60, 3)) for c in centers]
    ).astype(np.float32)
    n = means.shape[0]
    scales = rng.uniform(0.005, 0.02, size=(n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    scene = GaussianScene(
        means=jnp.asarray(means), scales=jnp.asarray(scales),
        quats=jnp.asarray(quats),
        colors=jnp.asarray(rng.uniform(0.1, 1.0, (n, 3)).astype(np.float32)),
        opacities=jnp.asarray(
            rng.uniform(0.5, 1.0, size=n).astype(np.float32)
        ),
    )
    cam = make_camera((0, 0, 2.5), (0, 0, 0), width=160, height=112)
    ref = np.asarray(render_reference(scene, cam, pixel_chunk=512))
    ours = np.asarray(render(scene, cam, early_stop=0.0))
    assert np.abs(ours - ref).max() < 1e-3


def test_early_stop_opaque_wall_ring_drain():
    """Early termination mid-tile (an opaque near wall in every tile) makes
    the kernel abandon in-flight lookahead blocks; the grid-end drain must
    keep semaphores balanced and the image correct."""
    import dataclasses

    scene, cam = _scene_cam(n=800, seed=31)
    # crank opacity so tiles saturate after a few instances
    scene = dataclasses.replace(
        scene, opacities=jnp.full_like(scene.opacities, 0.98)
    )
    exact = np.asarray(render(scene, cam, early_stop=0.0))
    fast = np.asarray(render(scene, cam, early_stop=1e-3))
    assert np.abs(exact - fast).max() < 2e-3


def test_alpha_clip_rounding_to_one_stays_finite():
    """Regression (round-2 advisor): alpha_clip values whose f32 rounding
    is exactly 1.0 (e.g. 1 - 1e-8) must NOT skip the alpha==1 guards —
    the kernel clips in f32, so such a clip does not bound alpha and an
    opaque fragment would otherwise feed log1p(-1) = -inf into the MXU
    scan (NaN-poisoning the chunk) and divide by 1-alpha == 0 in the
    backward."""
    from splatjax.ops.binning import FEAT_DIM
    from splatjax.ops.rasterize import clip_bounds_alpha
    from splatjax.ops.rasterize_vjp import rasterize_tiles

    assert not clip_bounds_alpha(1.0 - 1e-8)   # rounds to 1.0f
    assert clip_bounds_alpha(1.0 - 2e-7)       # representable below 1
    assert not clip_bounds_alpha(None)

    cfg = TileConfig(16, 16, 16, 16)  # one tile
    k = 4
    feat = np.zeros((FEAT_DIM, k), np.float32)
    feat[0] = 8.5          # mean exactly at a pixel center -> power == 0
    feat[1] = 8.5
    feat[2] = 1.0          # conic a
    feat[4] = 1.0          # conic c
    feat[5:8] = 0.7        # color
    feat[8] = 1.0          # opacity 1.0 -> alpha reaches exactly 1.0
    feat[9] = -2.0         # depth
    starts = jnp.zeros((1,), jnp.int32)
    ends = jnp.full((1,), k, jnp.int32)

    for clip in (1.0 - 1e-8, 1.0 - 2e-7):
        def f(ft):
            out, _ = rasterize_tiles(
                ft, starts, ends, cfg, clip, 0.0
            )
            return jnp.sum(out[:, :4, :]), out

        (s, out), g = jax.value_and_grad(f, has_aux=True)(jnp.asarray(feat))
        assert np.isfinite(np.asarray(out)).all(), clip
        assert np.isfinite(np.asarray(g)).all(), clip
        # at the covered pixel (8.5, 8.5) the opaque splats drive
        # transmittance to ~0 (exactly 0 when the clip rounds to 1.0)
        t_final = np.asarray(out)[0, 3, 8 * 16 + 8]
        assert t_final <= 1e-6, (clip, t_final)


def test_packed16_training_rows_quality_and_grads():
    """The 16-byte training rows (fixed-point mean / bf16 conic / RGBA8
    color + fast fragment math) must stay within their documented
    quantization floor — >= 40 dB PSNR of the exact 32-byte render — and
    produce gradients consistent with the exact path (cos >= 0.999).
    Training (FitConfig.feature_bytes) defaults to this path; it is NOT a
    parity mode (max edge error ~3e-2, ops/rasterize.py PACKED16 docs)."""
    import pytest
    from splatjax.scene import TrainableGaussians

    scene, cam = _scene_cam(seed=33)
    i32 = np.asarray(render(scene, cam, feature_bytes=32, alpha_clip=0.999))
    i16 = np.asarray(render(scene, cam, feature_bytes=16, alpha_clip=0.999))
    mse = float(np.mean((i16 - i32) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr >= 40.0, psnr

    params = TrainableGaussians.from_scene(scene)

    def loss(p, fb):
        return jnp.mean(
            render(p.to_scene(), cam, feature_bytes=fb, alpha_clip=0.999)
            ** 2
        )

    g16 = jax.grad(lambda p: loss(p, 16))(params)
    g32 = jax.grad(lambda p: loss(p, 32))(params)
    for name in ("means", "log_scales", "quats", "logit_opacities",
                 "colors"):
        a = np.asarray(getattr(g16, name)).ravel()
        b = np.asarray(getattr(g32, name)).ravel()
        assert np.isfinite(a).all(), name
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
        assert cos > 0.999, (name, cos)

    # training rows carry f32 depth in lane 4: expected-depth output must
    # track the exact path; viewer_exact still refuses (not a parity mode)
    _, d16 = render(scene, cam, feature_bytes=16, alpha_clip=0.999,
                    return_depth=True)
    _, d32 = render(scene, cam, feature_bytes=32, alpha_clip=0.999,
                    return_depth=True)
    covered = np.abs(np.asarray(d32)) > 1e-3
    derr = np.abs(np.asarray(d16) - np.asarray(d32))[covered]
    assert derr.max() < 0.05 * np.abs(np.asarray(d32))[covered].max()
    with pytest.raises(ValueError, match="feature_bytes=16"):
        render(scene, cam, feature_bytes=16, viewer_exact=True)


def test_deep_stack_front_gradient_survives():
    """A pixel behind ~14 near-opaque clipped splats has T_final ~ 1e-42 —
    below the bf16 subnormal range the planar boundary flips can carry.
    The backward must recover the FRONT splat's O(1) gradient anyway:
    transmittance ships through the kernel boundary as log T (channel 6),
    which stays finite where T itself flushes to zero."""
    from splatjax.ops.binning import FEAT_DIM
    from splatjax.ops.rasterize_vjp import rasterize_tiles

    cfg = TileConfig(16, 16, 16, 16)  # one tile
    k = 16
    feat = np.zeros((FEAT_DIM, k), np.float32)
    feat[0] = 8.5
    feat[1] = 8.5
    feat[2] = 0.02          # wide conic: alpha ~ opacity over the tile
    feat[4] = 0.02
    feat[5:8] = 0.5
    feat[8] = 1.0           # alpha clips at 0.999 -> T_final ~ 1e-42
    feat[9] = -2.0
    starts = jnp.zeros((1,), jnp.int32)
    ends = jnp.full((1,), k, jnp.int32)

    def front_color_loss(ft):
        out, _ = rasterize_tiles(ft, starts, ends, cfg, 0.999, 0.0)
        return jnp.sum(out[:, :3, :])

    out, _ = rasterize_tiles(jnp.asarray(feat), starts, ends, cfg, 0.999, 0.0)
    t_center = float(np.asarray(out)[0, 3, 8 * 16 + 8])
    assert t_center < 1e-38, t_center   # genuinely sub-bf16-subnormal
    g = np.asarray(jax.grad(front_color_loss)(jnp.asarray(feat)))
    assert np.isfinite(g).all()
    # the FRONT splat (instance 0) is fully visible: its color gradient
    # is the pixel count times alpha*T_1 ~ 0.999 per covered pixel
    assert abs(g[5, 0]) > 100.0, g[5, 0]


def test_binning_bounds_match_searchsorted_under_overflow():
    """The per-tile bounds come from a truncation-aware separable
    rectangle histogram (two one-hot MXU contractions + cumsum) instead
    of a searchsorted over the K_cap array. They must equal the
    searchsorted result BIT-FOR-BIT — including when capacity truncates
    the expansion mid-gaussian (the kept depth-major prefix covers full
    tile rows plus a partial leading row)."""
    scene, cam = _scene_cam(seed=33)
    cov3d = build_covariances(scene.quats, scene.scales)
    proj = project_gaussians(
        scene.means, cov3d, scene.colors, scene.opacities,
        cam.modelview, cam.projection, W, H,
        max_scales=jnp.max(jnp.asarray(scene.scales), axis=-1),
    )
    cfg = TileConfig(W, H)
    for capacity in (4096, 1024, 512, 384):   # 3 of these overflow
        b = bin_gaussians(proj, cfg, capacity=capacity)
        tile_sorted = np.asarray(b.tile_id)
        want = np.searchsorted(
            tile_sorted, np.arange(cfg.num_tiles + 1), side="left"
        )
        np.testing.assert_array_equal(np.asarray(b.starts), want[:-1])
        np.testing.assert_array_equal(np.asarray(b.ends), want[1:])
