"""Multi-chip tests on the 8-device virtual CPU mesh (SURVEY.md §4 item 4):
band-sharded rendering matches the single-chip pipeline, and gradients
(all_gather transpose -> psum of splat grads) match single-chip autodiff.
"""
import os
import numpy as np
import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from splatjax.camera import make_camera
from splatjax.io import synthetic_scene
from splatjax.parallel import make_mesh, render_sharded
from splatjax.render import render
from splatjax.scene import TrainableGaussians

W, H = 64, 48


def _setup(n=256, seed=60):
    scene = synthetic_scene(n, seed=seed, extent=0.6, scale_range=(0.02, 0.08))
    cam = make_camera((0, 0, 2.2), (0, 0, 0), width=W, height=H)
    return scene, cam


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_render_matches_single_chip():
    scene, cam = _setup()
    mesh = make_mesh(8)
    img_s = np.asarray(render_sharded(scene, cam, mesh, early_stop=0.0))
    img_1 = np.asarray(render(scene, cam, early_stop=0.0))
    assert img_s.shape == img_1.shape
    # 1e-4: band-local vs global tile origins round the tile-local power
    # matmul differently (ops/rasterize._chunk_alpha); both stay far
    # inside the 1e-3 ground-truth parity budget.
    np.testing.assert_allclose(img_s, img_1, atol=1e-4)


def test_sharded_render_two_devices():
    scene, cam = _setup(seed=61)
    mesh = make_mesh(2)
    img_s = np.asarray(render_sharded(scene, cam, mesh, early_stop=0.0))
    img_1 = np.asarray(render(scene, cam, early_stop=0.0))
    # 1e-4: band-local vs global tile origins round the tile-local power
    # matmul differently (ops/rasterize._chunk_alpha); both stay far
    # inside the 1e-3 ground-truth parity budget.
    np.testing.assert_allclose(img_s, img_1, atol=1e-4)


def test_sharded_gradients_match_single_chip():
    scene, cam = _setup(n=128, seed=62)
    mesh = make_mesh(4)
    params = TrainableGaussians.from_scene(scene)
    tgt = jax.random.normal(jax.random.PRNGKey(5), (H, W, 4))

    def loss_sharded(p):
        return jnp.sum(
            render_sharded(p.to_scene(), cam, mesh, early_stop=0.0) * tgt
        )

    def loss_single(p):
        return jnp.sum(render(p.to_scene(), cam, early_stop=0.0) * tgt)

    g_s = jax.grad(loss_sharded)(params)
    g_1 = jax.grad(loss_single)(params)
    f_s, _ = ravel_pytree(g_s)
    f_1, _ = ravel_pytree(g_1)
    f_s, f_1 = np.asarray(f_s), np.asarray(f_1)
    assert np.all(np.isfinite(f_s))
    scale = np.abs(f_1).max()
    np.testing.assert_allclose(f_s, f_1, atol=2e-3 * scale, rtol=2e-3)


def test_sharded_render_uneven_height():
    """Height that does not divide into 8 equal tile bands gets padded."""
    scene, _ = _setup(seed=63)
    cam = make_camera((0, 0, 2.2), (0, 0, 0), width=W, height=40)
    mesh = make_mesh(8)
    img_s = np.asarray(render_sharded(scene, cam, mesh, early_stop=0.0))
    img_1 = np.asarray(render(scene, cam, early_stop=0.0))
    assert img_s.shape == (40, W, 4)
    # 1e-4: band-local vs global tile origins round the tile-local power
    # matmul differently (ops/rasterize._chunk_alpha); both stay far
    # inside the 1e-3 ground-truth parity budget.
    np.testing.assert_allclose(img_s, img_1, atol=1e-4)


def test_sharded_render_2d_mesh():
    """(host, chip) mesh: collectives ride the flattened axes; image parity
    must hold with the band axis split across both mesh dimensions."""
    from splatjax.parallel import make_mesh_2d

    scene, cam = _setup(seed=64)
    mesh = make_mesh_2d((2, 4))
    img_s = np.asarray(
        render_sharded(scene, cam, mesh, axis=("host", "chip"),
                       early_stop=0.0)
    )
    img_1 = np.asarray(render(scene, cam, early_stop=0.0))
    # 1e-4: band-local vs global tile origins round the tile-local power
    # matmul differently (ops/rasterize._chunk_alpha); both stay far
    # inside the 1e-3 ground-truth parity budget.
    np.testing.assert_allclose(img_s, img_1, atol=1e-4)


def test_all_to_all_matches_all_gather():
    """The fixed-capacity all_to_all redistribution (ships only the
    band-intersecting instances) must be pixel-identical to the O(N)
    all_gather correctness path."""
    scene, cam = _setup(seed=65)
    mesh = make_mesh(8)
    img_a2a = np.asarray(
        render_sharded(scene, cam, mesh, early_stop=0.0,
                       redistribute="all_to_all")
    )
    img_ag = np.asarray(
        render_sharded(scene, cam, mesh, early_stop=0.0,
                       redistribute="all_gather")
    )
    np.testing.assert_allclose(img_a2a, img_ag, atol=1e-6)


def test_all_to_all_pair_capacity_drop_counted():
    """Transfers over the per-(source, dest) cap must be surfaced in the
    overflow counters, never silently dropped."""
    scene, cam = _setup(n=256, seed=66)
    mesh = make_mesh(4)
    _, overflow = render_sharded(
        scene, cam, mesh, pair_capacity=128, return_overflow=True
    )
    assert int(np.sum(np.asarray(overflow))) == 0
    _, overflow2 = render_sharded(
        scene, cam, mesh, pair_capacity=4, return_overflow=True
    )
    assert int(np.sum(np.asarray(overflow2))) > 0


def test_sharded_overflow_surfaced():
    # A view concentrating all splats in one band must report overflow
    # rather than silently dropping instances (ADVICE r1).
    from splatjax.parallel.dist_render import render_sharded

    mesh = make_mesh()
    scene = synthetic_scene(64, seed=31, extent=0.05, scale_range=(0.1, 0.2))
    cam = make_camera((0, 0, 1.2), (0, 0, 0), width=64, height=64)
    img, overflow = render_sharded(
        scene, cam, mesh, capacity=1024, return_overflow=True
    )
    assert overflow.shape == (mesh.shape["dev"],)
    img2, overflow2 = render_sharded(
        scene, cam, mesh, capacity=64, return_overflow=True
    )
    assert int(np.sum(np.asarray(overflow2))) > 0


def test_dp_train_step_matches_averaged_single_chip():
    """A data-parallel train step (one view per device, grads psum'd) must
    equal a single-chip step on the mean gradient of the same views."""
    import optax
    from splatjax.camera import make_camera
    from splatjax.scene import TrainableGaussians
    from splatjax.train import FitConfig, make_dp_train_step
    from splatjax.train.fit import _optimizer
    from splatjax.train.loss import combined_loss
    from splatjax.render import render
    from splatjax.parallel import make_mesh

    scene, _ = _setup(seed=97)
    params = TrainableGaussians.from_scene(scene)
    cams = [
        make_camera(
            (0.5 * np.cos(a), 0.2, 2.0 + 0.3 * np.sin(a)), (0, 0, 0),
            width=48, height=32,
        )
        for a in np.linspace(0, 1.5, 8)
    ]
    rng = np.random.default_rng(3)
    targets = [
        jnp.asarray(rng.random((32, 48, 4)).astype(np.float32))
        for _ in cams
    ]
    # feature_bytes=32: this test checks the DP step ALGEBRA against
    # a single-chip reference on the exact path (the 16-byte training
    # default adds quantization noise orthogonal to what's tested)
    cfg = FitConfig(capacity=2048, early_stop=0.0, feature_bytes=32)
    mesh = make_mesh(8)
    step, opt = make_dp_train_step(cams, cfg, 2048, mesh)
    opt_state = opt.init(params)
    p_dp, _, loss_dp, _, _ = step(
        params, opt_state,
        jnp.stack([c.modelview for c in cams]),
        jnp.stack([c.projection for c in cams]),
        jnp.stack(targets),
    )

    # manual: mean gradient over the 8 views, same optimizer
    def one_loss(p, cam, t):
        img = render(p.to_scene(), cam, capacity=2048,
                     alpha_clip=cfg.alpha_clip, early_stop=0.0)
        return combined_loss(img, t, ssim_weight=cfg.ssim_weight)

    grads = None
    losses = []
    for cam, t in zip(cams, targets):
        l, g = jax.value_and_grad(one_loss)(params, cam, t)
        losses.append(float(l))
        grads = g if grads is None else jax.tree_util.tree_map(
            jnp.add, grads, g
        )
    grads = jax.tree_util.tree_map(lambda x: x / 8.0, grads)
    opt2 = _optimizer(cfg)
    st2 = opt2.init(params)
    upd, _ = opt2.update(grads, st2, params)
    p_ref = optax.apply_updates(params, upd)

    assert abs(float(loss_dp) - np.mean(losses)) < 1e-4
    # Adam turns f32 summation-order differences on near-zero gradients
    # into up-to-lr sign-flipped updates, so: almost all elements tight,
    # every element within one Adam step of the reference.
    for leaf, ref, lr in (
        (p_dp.means, p_ref.means, cfg.lr_means),
        (p_dp.log_scales, p_ref.log_scales, cfg.lr_scales),
        (p_dp.logit_opacities, p_ref.logit_opacities, cfg.lr_opacities),
    ):
        diff = np.abs(np.asarray(leaf) - np.asarray(ref))
        assert (diff < 1e-6).mean() > 0.98, (diff < 1e-6).mean()
        assert diff.max() <= 2.05 * lr, (diff.max(), lr)


def test_dp_band_train_step_matches_mean_loss_single_chip():
    """Composed 2-D step (views x bands) == single-chip step on the mean
    loss of the same views, within Adam's near-zero-gradient wobble."""
    import optax
    from splatjax.camera import make_camera
    from splatjax.scene import TrainableGaussians
    from splatjax.train import FitConfig
    from splatjax.train.fit import _optimizer
    from splatjax.train.loss import combined_loss
    from splatjax.render import render
    from splatjax.parallel import make_dp_band_train_step, make_mesh_2d

    scene, _ = _setup(seed=131)
    params = TrainableGaussians.from_scene(scene)
    cams = [
        make_camera(
            (0.4 * np.cos(a), 0.1, 2.0 + 0.2 * np.sin(a)), (0, 0, 0),
            width=64, height=48,
        )
        for a in np.linspace(0, 1.0, 2)
    ]
    rng = np.random.default_rng(9)
    targets = [
        jnp.asarray(rng.random((48, 64, 4)).astype(np.float32))
        for _ in cams
    ]
    cfg = FitConfig(early_stop=0.0, feature_bytes=32)  # exact-path algebra test
    mesh = make_mesh_2d((2, 4), axis_names=("view", "band"))
    step, opt = make_dp_band_train_step(
        cams, cfg, mesh, view_axis="view", band_axis="band",
        capacity=2048,
    )
    opt_state = opt.init(params)
    p_2d, _, loss_2d, _, gnorm_2d, drops_2d = step(
        params, opt_state,
        jnp.stack([c.modelview for c in cams]),
        jnp.stack([c.projection for c in cams]),
        jnp.stack(targets),
    )

    def mean_loss(p):
        losses = [
            combined_loss(
                render(p.to_scene(), cam, capacity=2048,
                       alpha_clip=cfg.alpha_clip, early_stop=0.0),
                t, ssim_weight=cfg.ssim_weight,
            )
            for cam, t in zip(cams, targets)
        ]
        return sum(losses) / len(losses)

    loss_ref, grads = jax.value_and_grad(mean_loss)(params)
    opt2 = _optimizer(cfg)
    upd, _ = opt2.update(grads, opt2.init(params), params)
    p_ref = optax.apply_updates(params, upd)

    assert abs(float(loss_2d) - float(loss_ref)) < 2e-4
    # densify signal + drop counter surfaced by the 2-D step
    assert gnorm_2d.shape == (params.means.shape[0],)
    assert int(drops_2d) == 0
    g_ref = np.linalg.norm(np.asarray(grads.means), axis=-1)
    np.testing.assert_allclose(
        np.asarray(gnorm_2d), g_ref, rtol=2e-2, atol=1e-7
    )
    # The band pipeline re-orders f32 math (band-local coordinates, tiled
    # assembly), so gradients differ at ~1e-3 relative and Adam maps that
    # to O(lr * eps) parameter wobble: require the UPDATE VECTORS to agree
    # in direction and every element to stay within one Adam step.
    for leaf, ref, base, lr in (
        (p_2d.means, p_ref.means, params.means, cfg.lr_means),
        (p_2d.log_scales, p_ref.log_scales, params.log_scales,
         cfg.lr_scales),
        (p_2d.colors, p_ref.colors, params.colors, cfg.lr_colors),
    ):
        u_2d = np.asarray(leaf) - np.asarray(base)
        u_ref = np.asarray(ref) - np.asarray(base)
        cos = float(
            (u_2d * u_ref).sum()
            / (np.linalg.norm(u_2d) * np.linalg.norm(u_ref) + 1e-30)
        )
        assert cos > 0.99, cos
        assert np.abs(u_2d - u_ref).max() <= 2.05 * lr


def test_sharded_render_with_sh_matches_single_chip():
    """SH view-dependent color is evaluated at projection time per device;
    the sharded image must match the single-chip SH render."""
    import dataclasses

    scene, cam = _setup(seed=141)
    rng = np.random.default_rng(4)
    sh = jnp.asarray(
        rng.normal(scale=0.2, size=(scene.num_gaussians, 3, 3)).astype(
            np.float32
        )
    )  # degree-1 bands
    scene = dataclasses.replace(scene, sh=sh)
    mesh = make_mesh(8)
    img_s = np.asarray(render_sharded(scene, cam, mesh, early_stop=0.0))
    img_1 = np.asarray(render(scene, cam, early_stop=0.0))
    assert np.abs(img_s - img_1).max() < 1e-4


def test_max_bands_span_exact_per_band_drop_accounting():
    """A splat spanning all 8 bands (> MAX_BANDS = 4) keeps the MAX_BANDS
    window CENTERED on its mean's band, and the cut bands each report
    exactly one dropped instance (round-2 verdict: drops used to be
    spread as span_drop // n_dev across all bands)."""
    from splatjax.parallel.dist_render import MAX_BANDS
    from splatjax.scene import GaussianScene

    assert MAX_BANDS == 4  # expectations below are for the default
    n = 8
    h = 8 * 16  # 8 devices x one 16-px tile row each
    # 7 tiny splats + one huge one at the view center whose projected
    # bbox covers the full image height (span = 8 bands)
    means = np.zeros((n, 3), np.float32)
    means[:7, 0] = np.linspace(-0.5, 0.5, 7)
    scales = np.full((n, 3), 0.01, np.float32)
    scales[7] = 5.0
    quats = np.tile(np.asarray([[1, 0, 0, 0]], np.float32), (n, 1))
    colors = np.full((n, 3), 0.5, np.float32)
    opac = np.full((n,), 0.9, np.float32)
    scene = GaussianScene(
        means=means, scales=scales, quats=quats, colors=colors,
        opacities=opac, sh=None,
    )
    cam = make_camera((0, 0, 2.2), (0, 0, 0), width=64, height=h)
    mesh = make_mesh(8)
    # balance="equal": this test pins the fixed-band span-cap accounting;
    # the default load-balanced mode doubles the window (max_bands=8 at 8
    # devices) so this 8-band splat would not be cut at all there
    img, overflow = render_sharded(
        scene, cam, mesh, early_stop=0.0, return_overflow=True,
        balance="equal",
    )
    overflow = np.asarray(overflow)
    # mean band = 4 (y = 64 px, y-up), window [3, 7) kept, bands
    # 0, 1, 2, 7 each lose exactly this one instance
    np.testing.assert_array_equal(overflow, [1, 1, 1, 0, 0, 0, 0, 1])
    # the kept window includes the densest band: the huge splat still
    # renders at the image center rows
    img = np.asarray(img)
    assert img[h // 2, 32, 3] > 0.1


def test_fit_routes_to_composed_2d_mesh():
    """Config-5-shaped training must be reachable from the USER-FACING
    fit() entry: fit(mesh=2d, dp_axis=view, band_axis=band) routes to
    make_dp_band_train_step, reduces the loss, and surfaces per-step
    drop counters in the history records."""
    from splatjax.parallel import make_mesh_2d
    from splatjax.train import FitConfig, fit

    scene, _ = _setup(n=64, seed=171)
    cams = [
        make_camera((0.3 * i - 0.3, 0.1, 2.1), (0, 0, 0),
                    width=48, height=32)
        for i in range(2)
    ]
    targets = [render(scene, c, early_stop=0.0) for c in cams]
    init = TrainableGaussians.from_scene(
        synthetic_scene(64, seed=172, extent=0.6,
                        scale_range=(0.03, 0.08))
    )
    mesh = make_mesh_2d((2, 4), axis_names=("view", "band"))
    params, hist = fit(
        init, cams, targets,
        FitConfig(steps=8, log_every=2, capacity=2048, lr_means=2e-3),
        mesh=mesh, dp_axis="view", band_axis="band",
    )
    assert hist[0]["loss"] > hist[-1]["loss"], hist
    assert all("drops" in h for h in hist)
    assert hist[-1]["drops"] == 0

    # gaussian counts that don't divide the band axis are rejected loudly
    bad = TrainableGaussians.from_scene(
        synthetic_scene(63, seed=173, extent=0.6)
    )
    import pytest

    with pytest.raises(ValueError, match="band-axis"):
        fit(bad, cams, targets, FitConfig(steps=1, capacity=2048),
            mesh=mesh, dp_axis="view", band_axis="band")


def test_band_render_trained_fixture_no_drops():
    """Real trained scenes load bands ~2x unevenly; the default per-pair
    transfer capacity must absorb that without drops (the round-3 3x
    default silently dropped ~3% of this fixture's instances). Parity vs
    the single-chip render is exact except possibly isolated pixels where
    EXACTLY-equal f32 depths tie-break differently between the global and
    band-local stable sorts."""
    import numpy as np

    from splatjax.camera import make_camera
    from splatjax.io import load_splat
    from splatjax.parallel import make_mesh, render_sharded
    from splatjax.render import render
    from splatjax.scene import GaussianScene

    from splatjax.io import tile_scene

    base = load_splat(
        os.path.join(os.path.dirname(__file__), "fixtures",
                     "trained_scene.splat")
    )
    n = 40_000
    scene = tile_scene(base, n)
    # 512 px: bands are 64 px (4 tile rows) — the narrowest realistic
    # band height (at 256 px the 32 px bands make MAX_BANDS=4 span cuts
    # legitimate, which return_overflow surfaces by design)
    cam = make_camera((0, 0, 2.8), (0, 0, 0), width=512, height=512)
    mesh = make_mesh(8)
    img_s, overflow = render_sharded(
        scene, cam, mesh, early_stop=0.0, return_overflow=True
    )
    assert int(np.asarray(overflow).sum()) == 0
    img_1 = render(scene, cam, early_stop=0.0)
    diff = np.abs(np.asarray(img_s) - np.asarray(img_1)).max(-1)
    assert int((diff > 1e-3).sum()) <= 3, (diff.max(), (diff > 1e-3).sum())


def test_band_train_trained_fixture_no_drops():
    """Round-4 residual (VERDICT weak #3): the 2-D TRAINING path must
    carry the same transport fix as render_sharded — round-robin dealing
    of gaussians to band shards + the 6x N/D^2 per-pair transfer
    capacity. Training on the (clustered, real-asset) trained fixture
    over two poses must drop ZERO instances; the old contiguous shards +
    3x capacity silently lost ~3%."""
    from splatjax.io import load_splat, tile_scene
    from splatjax.parallel import make_dp_band_train_step, make_mesh_2d
    from splatjax.train import FitConfig

    base = load_splat(
        os.path.join(os.path.dirname(__file__), "fixtures",
                     "trained_scene.splat")
    )
    n = 16_384
    scene = tile_scene(base, n)
    params = TrainableGaussians.from_scene(scene)
    cams = [
        make_camera((0.3 * i - 0.15, 0, 2.8), (0, 0, 0),
                    width=192, height=192)
        for i in range(2)
    ]
    rng = np.random.default_rng(3)
    targets = [
        jnp.asarray(rng.random((192, 192, 4)).astype(np.float32))
        for _ in cams
    ]
    cfg = FitConfig(early_stop=0.0, feature_bytes=32)
    mesh = make_mesh_2d((2, 4), axis_names=("view", "band"))
    step, opt = make_dp_band_train_step(
        cams, cfg, mesh, view_axis="view", band_axis="band",
    )
    _, _, loss, _, gnorm, drops = step(
        params, opt.init(params),
        jnp.stack([c.modelview for c in cams]),
        jnp.stack([c.projection for c in cams]),
        jnp.stack(targets),
    )
    assert int(drops) == 0, int(drops)
    assert np.isfinite(float(loss))
    # the densify signal is un-dealt back into the caller's row order
    assert gnorm.shape == (n,)


def test_band_train_steps_per_call_scan_matches_per_step():
    """steps_per_call > 1 on the 2-D mesh: the scanned dispatch runs the
    same views in the same order as per-step dispatches; results agree up
    to the documented fusion/reassociation noise (see
    FitConfig.steps_per_call). Also exercises fit()'s (k, D_view, ...)
    batch stacking through the user-facing entry."""
    from splatjax.parallel import make_mesh_2d
    from splatjax.train import FitConfig, fit

    scene, _ = _setup(n=64, seed=191)
    cams = [
        make_camera((0.3 * i - 0.3, 0.1, 2.1), (0, 0, 0),
                    width=48, height=32)
        for i in range(2)
    ]
    targets = [render(scene, c, early_stop=0.0) for c in cams]
    init = TrainableGaussians.from_scene(
        synthetic_scene(64, seed=192, extent=0.6, scale_range=(0.03, 0.08))
    )
    mesh = make_mesh_2d((2, 4), axis_names=("view", "band"))
    base = dict(steps=4, log_every=2, capacity=2048, lr_means=2e-3)
    p1, h1 = fit(init, cams, targets, FitConfig(**base, steps_per_call=1),
                 mesh=mesh, dp_axis="view", band_axis="band")
    p2, h2 = fit(init, cams, targets, FitConfig(**base, steps_per_call=2),
                 mesh=mesh, dp_axis="view", band_axis="band")
    np.testing.assert_allclose(
        np.asarray(p1.means), np.asarray(p2.means), rtol=0, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(p1.logit_opacities), np.asarray(p2.logit_opacities),
        rtol=0, atol=1e-3,
    )
    assert abs(h1[-1]["loss"] - h2[-1]["loss"]) < 1e-5
    assert h2[-1]["drops"] == 0


def test_dp_train_steps_per_call_scan_matches_per_step():
    """steps_per_call > 1 on the 1-D DP mesh (replicated params, one view
    per device): scanned vs per-step dispatch agree within the documented
    noise contract."""
    from splatjax.parallel import make_mesh
    from splatjax.train import FitConfig, fit

    scene, _ = _setup(n=96, seed=201)
    cams = [
        make_camera((0.2 * i - 0.4, 0.05 * i, 2.2), (0, 0, 0),
                    width=48, height=32)
        for i in range(8)
    ]
    targets = [render(scene, c, early_stop=0.0) for c in cams]
    init = TrainableGaussians.from_scene(
        synthetic_scene(96, seed=202, extent=0.6, scale_range=(0.03, 0.08))
    )
    mesh = make_mesh(8)
    base = dict(steps=4, log_every=2, capacity=2048, lr_means=2e-3)
    p1, h1 = fit(init, cams, targets, FitConfig(**base, steps_per_call=1),
                 mesh=mesh)
    p2, h2 = fit(init, cams, targets, FitConfig(**base, steps_per_call=2),
                 mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(p1.means), np.asarray(p2.means), rtol=0, atol=1e-5
    )
    assert abs(h1[-1]["loss"] - h2[-1]["loss"]) < 1e-5


def test_balanced_bands_parity_on_concentrated_scene():
    """Load-balanced band boundaries (VERDICT r4 item 3): a scene whose
    splats concentrate into the lower half of the image must (a) render
    identically to the single-chip pipeline with ZERO drops and (b) split
    the duplicated instances substantially more evenly than fixed
    equal-height bands (real trained scenes load equal bands ~2x
    unevenly, which cut the modeled 2-host efficiency to 0.913 —
    docs/SCALING_EVIDENCE.md; the 1080p-granularity evidence lives in
    benchmarks/scaling.py, this test checks the mechanism at 32 tile
    rows)."""
    import dataclasses

    from splatjax.ops.binning import TileConfig, gaussian_tile_span
    from splatjax.ops.projection import project_gaussians
    from splatjax.parallel.dist_render import (
        _balanced_boundaries, max_band_rows,
    )
    from splatjax.scene import build_covariances

    rng = np.random.default_rng(77)
    n = 2048
    w_px, h_px = 128, 512
    scene = synthetic_scene(n, seed=77, extent=0.6,
                            scale_range=(0.02, 0.05))
    # concentrate 85% of the splats into the lower half of the view
    means = np.asarray(scene.means).copy()
    hot = rng.random(n) < 0.85
    means[hot, 1] = -0.5 + 0.5 * rng.random(hot.sum())
    scene = dataclasses.replace(scene, means=jnp.asarray(means))
    cam = make_camera((0, 0, 2.2), (0, 0, 0), width=w_px, height=h_px)
    mesh = make_mesh(8)

    img_bal, ov = render_sharded(
        scene, cam, mesh, early_stop=0.0, return_overflow=True,
        balance="load",
    )
    # explicit capacity: the concentrated scene overflows the single-
    # chip default (8192) — the reference must not drop instances
    img_1 = render(scene, cam, early_stop=0.0, capacity=65536)
    assert int(np.asarray(ov).sum()) == 0
    np.testing.assert_allclose(
        np.asarray(img_bal), np.asarray(img_1), atol=1e-5
    )

    # equal-height mode must still work and agree too
    img_eq = render_sharded(scene, cam, mesh, early_stop=0.0,
                            balance="equal")
    np.testing.assert_allclose(
        np.asarray(img_eq), np.asarray(img_1), atol=1e-5
    )

    # measure the split quality with the SAME boundary function the
    # render used (single-device shard_map call -> psum over 1 device)
    cfg = TileConfig(w_px, h_px, 16, 16)
    proj = project_gaussians(
        scene.means, build_covariances(scene.quats, scene.scales),
        scene.colors, scene.opacities, cam.modelview, cam.projection,
        w_px, h_px,
        max_scales=jnp.max(jnp.asarray(scene.scales), axis=-1),
    )
    x0, x1, y0, y1, count = (
        np.asarray(v) for v in gaussian_tile_span(proj, cfg)
    )
    n_dev = 8
    n_rows = h_px // 16
    tile = 16
    my = np.asarray(proj.mean2d[:, 1])
    by = np.asarray(proj.bbox_half[:, 1])
    r0 = np.floor((my - by) / tile).astype(np.int32)
    r1 = np.floor((my + by) / tile).astype(np.int32)
    on = np.asarray(proj.mask) & (r1 >= 0) & (r0 <= n_rows - 1)

    single = jax.sharding.Mesh(np.asarray(jax.devices()[:1]), ("b",))
    from jax import shard_map
    from functools import partial
    from jax.sharding import PartitionSpec as P

    bounds = np.asarray(jax.jit(shard_map(
        partial(_balanced_boundaries, n_rows=n_rows, n_dev=n_dev,
                max_rows=max_band_rows(h_px, n_dev, tile), axis="b"),
        mesh=single, in_specs=(P(),) * 4, out_specs=P(),
        check_vma=False,
    ))(jnp.asarray(r0), jnp.asarray(r1),
       jnp.asarray((x1 - x0 + 1).astype(np.float32)), jnp.asarray(on)))
    assert bounds[0] == 0 and bounds[-1] == n_rows
    assert np.all(np.diff(bounds) >= 0)

    def split_dev(bnds):
        counts = []
        for b in range(len(bnds) - 1):
            ry0 = np.maximum(y0, bnds[b])
            ry1 = np.minimum(y1, bnds[b + 1] - 1)
            rows = np.maximum(ry1 - ry0 + 1, 0) * (count > 0)
            counts.append(float((rows * (x1 - x0 + 1)).sum()))
        return max(counts) * (len(bnds) - 1) / max(sum(counts), 1)

    dev_bal = split_dev(bounds)
    dev_eq = split_dev(np.arange(n_dev + 1) * (n_rows // n_dev))
    assert dev_eq > 1.4, dev_eq      # the scene really is concentrated
    assert dev_bal <= 1.35, (dev_bal, bounds)
    assert dev_bal < 0.75 * dev_eq, (dev_bal, dev_eq, bounds)
