"""Differential tests: vectorized JAX projection vs the scalar NumPy port of
the WebGL shader (splatjax.reference.viewer_math), full chain from raw .splat
bytes. SURVEY.md §4 items 1-2.
"""
import numpy as np
import jax.numpy as jnp

from splatjax.camera import Camera, make_camera, perspective
from splatjax.io import parse_splat_bytes, scene_to_splat_bytes, synthetic_scene
from splatjax.ops.projection import project_gaussians
from splatjax.reference import viewer_math as vm
from splatjax.scene import (
    build_covariances,
    covariance_upper,
    cov6_to_mat,
    dequantize_covariances_int16,
    quantize_covariances_int16,
)

W, H = 64, 48


def _setup(n=64, seed=0):
    scene = synthetic_scene(n, seed=seed, extent=0.8)
    raw = np.frombuffer(scene_to_splat_bytes(scene), np.uint8).reshape(n, 32)
    scene = parse_splat_bytes(raw.tobytes())  # quantized, like the viewer sees
    cam = make_camera((0.0, 0.0, 3.0), (0.0, 0.0, 0.0), width=W, height=H)
    return scene, raw, cam


def _viewer_quantized_cov(scene):
    cov3d = build_covariances(scene.quats, scene.scales)
    q, qs = quantize_covariances_int16(covariance_upper(cov3d))
    return cov6_to_mat(dequantize_covariances_int16(q, qs)), q, qs


def test_covariance_matches_three_construction():
    """Sigma = R S^2 R^T under the loader mapping == the viewer's
    R_three^T S^2 R_three from raw bytes (index.js:361-367)."""
    scene, raw, _ = _setup(128, seed=4)
    cov3d = np.asarray(build_covariances(scene.quats, scene.scales))
    # exact (unquantized) comparison: rebuild viewer sigma without quantization
    for i in range(0, 128, 17):
        b = raw[i]
        qx = (float(b[29]) - 128) / 128
        qy = (float(b[30]) - 128) / 128
        qz = -(float(b[31]) - 128) / 128
        qw = (float(b[28]) - 128) / 128
        rot = vm.three_quat_to_rotmat(qx, qy, qz, qw)
        floats = b[:24].copy().view("<f4")
        m = rot.T @ np.diag(floats[3:6].astype(np.float64))
        sigma_ref = m @ m.T
        np.testing.assert_allclose(cov3d[i], sigma_ref, atol=1e-5)


def test_int16_quantization_matches_viewer():
    scene, raw, _ = _setup(96, seed=5)
    _, q, qs = _viewer_quantized_cov(scene)
    viewer = vm.push_data_buffer_math(raw)
    np.testing.assert_allclose(
        np.asarray(qs), viewer["quant_scale"].astype(np.float32), rtol=1e-5
    )
    # allow +/-1 lsb from float32-vs-float64 rounding at the trunc boundary
    dq = np.abs(np.asarray(q, np.int32) - viewer["cov6_q"].astype(np.int32))
    assert dq.max() <= 1


def test_projection_matches_vertex_shader():
    scene, raw, cam = _setup(128, seed=6)
    cov3d, q, qs = _viewer_quantized_cov(scene)
    proj = project_gaussians(
        scene.means, cov3d, scene.colors, scene.opacities,
        cam.modelview, cam.projection, W, H,
        max_scales=jnp.max(scene.scales, axis=-1),
    )
    mv = np.asarray(cam.modelview, np.float64)
    pr = np.asarray(cam.projection, np.float64)
    focal = (H / 2.0) * abs(pr[1, 1])
    viewer = vm.push_data_buffer_math(raw)

    n_checked = 0
    for i in range(128):
        cov6_i = viewer["cov6_q"][i].astype(np.float64) * viewer["quant_scale"][i]
        # feed the *dequantized* cov so both sides see identical Vrk
        cov6_ours = np.asarray(
            dequantize_covariances_int16(q, qs)[i], np.float64
        )
        np.testing.assert_allclose(cov6_ours, cov6_i, rtol=2e-4, atol=1e-9)
        out = vm.vertex_shader_math(
            viewer["centers"][i], cov6_ours, mv, pr, (W, H), focal
        )
        if out is None:
            continue
        ndc_center, v1, v2, _ = out
        n_checked += 1
        # center pixel
        cx = (ndc_center[0] + 1) * W / 2
        cy = (ndc_center[1] + 1) * H / 2
        np.testing.assert_allclose(
            np.asarray(proj.mean2d[i]), [cx, cy], rtol=1e-4, atol=1e-3
        )
        # conic: compare via gaussian power at probe offsets
        A, B, C = np.asarray(proj.conic[i], np.float64)
        m = np.array([[v2[0], v1[0]], [v2[1], v1[1]]])
        for d in ([1.5, 0.3], [-0.7, 0.9], [0.2, -1.1]):
            d = np.array(d)
            power_ours = -0.5 * (
                A * d[0] ** 2 + 2 * B * d[0] * d[1] + C * d[1] ** 2
            )
            uv = np.linalg.solve(m, d)
            power_ref = -(uv[0] ** 2 + uv[1] ** 2)
            np.testing.assert_allclose(power_ours, power_ref, rtol=1e-3, atol=1e-5)
        # bbox must cover the full rendered support: sample the quad's
        # fragment lattice; any point with alpha > 0 (power >= -4,
        # index.js:172) must fall inside the bbox
        bb = np.asarray(proj.bbox_half[i])
        for su in np.linspace(-2, 2, 9):
            for sv in np.linspace(-2, 2, 9):
                d = su * v2 + sv * v1
                if su * su + sv * sv <= 4.0:  # inside exp(-4) support
                    assert abs(d[0]) <= bb[0] + 1e-3
                    assert abs(d[1]) <= bb[1] + 1e-3
    assert n_checked >= 20  # scene must actually exercise the math


def test_frustum_and_size_culls_match_worker():
    scene, raw, cam = _setup(256, seed=7)
    cov3d, _, _ = _viewer_quantized_cov(scene)
    proj = project_gaussians(
        scene.means, cov3d, scene.colors, scene.opacities,
        cam.modelview, cam.projection, W, H,
        max_scales=jnp.max(scene.scales, axis=-1),
    )
    viewer = vm.push_data_buffer_math(raw)
    order = vm.worker_sort_cull(
        viewer["centers"], viewer["sort_metric"], np.asarray(cam.modelview)
    )
    worker_keep = np.zeros(256, bool)
    worker_keep[np.asarray(order, np.int64)] = True
    mv = np.asarray(cam.modelview, np.float64)
    pr = np.asarray(cam.projection, np.float64)
    focal = (H / 2.0) * abs(pr[1, 1])
    for i in range(256):
        cov6_i = viewer["cov6_q"][i].astype(np.float64) * viewer["quant_scale"][i]
        shader_keep = (
            vm.vertex_shader_math(
                viewer["centers"][i], cov6_i, mv, pr, (W, H), focal
            )
            is not None
        )
        assert bool(proj.mask[i]) == (worker_keep[i] and shader_keep), i


def test_depth_matches_worker_metric():
    scene, raw, cam = _setup(64, seed=8)
    cov3d, _, _ = _viewer_quantized_cov(scene)
    proj = project_gaussians(
        scene.means, cov3d, scene.colors, scene.opacities,
        cam.modelview, cam.projection, W, H,
    )
    mv = np.asarray(cam.modelview, np.float64)
    viewer = vm.push_data_buffer_math(raw)
    expected = viewer["centers"] @ mv[2, :3] + mv[2, 3]
    np.testing.assert_allclose(np.asarray(proj.depth), expected, rtol=1e-5, atol=1e-6)


def test_cutout_box_matches_worker():
    scene, raw, cam = _setup(200, seed=9)
    cov3d, _, _ = _viewer_quantized_cov(scene)
    # a unit box scaled 1.2 and offset
    box_world = np.diag([1.2, 1.2, 1.2, 1.0]).astype(np.float32)
    box_world[:3, 3] = [0.2, -0.1, 0.3]
    cutout = np.linalg.inv(box_world).astype(np.float32)
    proj = project_gaussians(
        scene.means, cov3d, scene.colors, scene.opacities,
        cam.modelview, cam.projection, W, H,
        max_scales=jnp.max(scene.scales, axis=-1),
        cutout=jnp.asarray(cutout),
    )
    viewer = vm.push_data_buffer_math(raw)
    order = vm.worker_sort_cull(
        viewer["centers"], viewer["sort_metric"], np.asarray(cam.modelview),
        cutout=cutout,
    )
    keep = np.zeros(200, bool)
    keep[np.asarray(order, np.int64)] = True
    ours = np.asarray(proj.mask)
    mv = np.asarray(cam.modelview, np.float64)
    pr = np.asarray(cam.projection, np.float64)
    focal = (H / 2.0) * abs(pr[1, 1])
    for i in range(200):
        cov6_i = viewer["cov6_q"][i].astype(np.float64) * viewer["quant_scale"][i]
        shader_keep = (
            vm.vertex_shader_math(
                viewer["centers"][i], cov6_i, mv, pr, (W, H), focal
            )
            is not None
        )
        assert bool(ours[i]) == (keep[i] and shader_keep), i


def test_from_three_camera_equivalence():
    """Camera.from_three flip algebra == literal element-wise flips."""
    rng = np.random.default_rng(11)
    # random affine camera world (orthonormal rotation + translation)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    rot = vm.three_quat_to_rotmat(q[1], q[2], q[3], q[0])
    cw = np.eye(4)
    cw[:3, :3] = rot
    cw[:3, 3] = rng.normal(size=3)
    proj = perspective(70.0, 4 / 3, 0.2, 100.0)

    cam = Camera.from_three(cw, proj, width=W, height=H)

    # literal transcription of index.js:456-487
    pm = proj.astype(np.float64).copy()
    for e in (4, 5, 6, 7):  # column-major elements 4..7 = column 1
        pm[e % 4, e // 4] *= -1
    view = cw.astype(np.float64).copy()
    for e in (1, 4, 6, 9, 13):
        view[e % 4, e // 4] *= -1
    obj = np.eye(4)
    mtx = np.linalg.inv(obj)
    for e in (1, 4, 6, 9, 13):
        mtx[e % 4, e // 4] *= -1
    mv = np.linalg.inv(mtx @ view)
    np.testing.assert_allclose(np.asarray(cam.projection), pm, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam.modelview), mv, atol=1e-5)


def test_opacity_aware_support_bound():
    """support_eps tightens the binned bbox to the visibility ellipse
    exp(power)*opa >= eps (t_eff = min(4, ln(opa/eps)), projection.py):
    low-opacity splats span fewer tiles, opa <= eps splats are culled,
    and the rendered image moves by at most ~a few eps (every dropped
    fragment carries alpha < eps)."""
    import jax

    from splatjax.io import synthetic_scene
    from splatjax.ops.binning import TileConfig, gaussian_tile_span
    from splatjax.render import render as full_render

    n = 256
    scene = synthetic_scene(n, seed=21, extent=0.7, scale_range=(0.02, 0.08))
    # force a wide opacity range incl. below-eps and barely-above-eps
    opac = np.asarray(scene.opacities).copy()
    opac[:64] = 5e-5            # <= eps: bbox -> 0 (one instance, no cull)
    opac[64:128] = 2e-3         # t_eff = ln(20) ~ 3.0 -> bbox shrink
    scene = type(scene)(
        means=scene.means, scales=scene.scales, quats=scene.quats,
        colors=scene.colors, opacities=jnp.asarray(opac), sh=scene.sh,
    )
    cam = make_camera((0, 0, 2.4), (0, 0, 0), width=W, height=H)
    cov3d = build_covariances(scene.quats, scene.scales)
    # neutralize the worker's size*opacity cull (index.js:548) so the
    # projection-level assertions isolate the support-bound logic
    kw = dict(max_scales=jnp.full((n,), 10.0, jnp.float32))
    p_exact = project_gaussians(
        scene.means, cov3d, scene.colors, scene.opacities,
        cam.modelview, cam.projection, W, H, **kw,
    )
    p_eps = project_gaussians(
        scene.means, cov3d, scene.colors, scene.opacities,
        cam.modelview, cam.projection, W, H, support_eps=1e-4, **kw,
    )
    # below eps: bbox collapses to zero but the splat is NOT hard-culled
    # (training needs the opacity gradient through one center instance)
    assert bool(jnp.all(p_eps.mask[:64] == p_exact.mask[:64]))
    assert float(jnp.max(p_eps.bbox_half[:64])) == 0.0
    # bbox shrink factor sqrt(t_eff/4) for the low-opacity band
    t_eff = np.log(2e-3 / 1e-4)
    np.testing.assert_allclose(
        np.asarray(p_eps.bbox_half[64:128]),
        np.asarray(p_exact.bbox_half[64:128]) * np.sqrt(t_eff / 4.0),
        rtol=1e-5,
    )
    # full-opacity splats unchanged (ln(opa/eps) >= 4)
    hi = np.asarray(scene.opacities) >= np.exp(4.0) * 1e-4
    np.testing.assert_allclose(
        np.asarray(p_eps.bbox_half[hi]), np.asarray(p_exact.bbox_half[hi])
    )
    cfg = TileConfig(W, H, 16, 16)
    c_exact = int(jnp.sum(gaussian_tile_span(p_exact, cfg)[4]))
    c_eps = int(jnp.sum(gaussian_tile_span(p_eps, cfg)[4]))
    assert c_eps < c_exact
    # image error bounded: render() applies support_eps = early_stop
    a = np.asarray(full_render(scene, cam, early_stop=0.0, alpha_clip=None))
    b = np.asarray(full_render(scene, cam, early_stop=1e-4, alpha_clip=None))
    assert np.abs(a - b).max() < 2e-3
    # gradients stay finite through the shrink (stop_gradient + double-
    # where guard the sqrt at t_eff == 0)
    from splatjax.scene import TrainableGaussians

    params = TrainableGaussians.from_scene(scene)
    g = jax.grad(
        lambda p: jnp.sum(full_render(p.to_scene(), cam) ** 2)
    )(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
