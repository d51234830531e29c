"""Loader tests: .splat round-trip, .ply activations, streaming ingest.

Test strategy per SURVEY.md §4 item 1: synthesize bytes -> parse -> exact
floats; byte layouts per index.js:227, 676 (.splat) and 600-745 (.ply).
"""
import numpy as np
import pytest

from splatjax.io import (
    ROW_LENGTH,
    StreamingSplatReader,
    parse_ply_bytes,
    parse_splat_bytes,
    scene_to_splat_bytes,
    synthetic_scene,
)


def _hand_built_splat_row(pos, scale, rgba, quat_bytes):
    row = np.zeros(ROW_LENGTH, np.uint8)
    row[:12] = np.asarray(pos, "<f4").view(np.uint8)
    row[12:24] = np.asarray(scale, "<f4").view(np.uint8)
    row[24:28] = rgba
    row[28:32] = quat_bytes
    return row.tobytes()


def test_splat_parse_exact_fields():
    pos = [1.5, -2.25, 3.0]
    scale = [0.1, 0.2, 0.3]
    rgba = [255, 128, 0, 64]
    qb = [255, 128, 128, 128]  # w=(255-128)/128, identity-ish
    scene = parse_splat_bytes(_hand_built_splat_row(pos, scale, rgba, qb))
    assert scene.num_gaussians == 1
    # loader negates Z (index.js:350-354)
    np.testing.assert_allclose(scene.means[0], [1.5, -2.25, -3.0], rtol=0)
    np.testing.assert_allclose(scene.scales[0], scale, rtol=1e-6)
    np.testing.assert_allclose(scene.colors[0], np.array(rgba[:3]) / 255.0)
    assert scene.opacities[0] == pytest.approx(64 / 255.0)
    # quat: stored (w,x,y,z) = ((b-128)/128); framework = (w, -x, -y, z)
    np.testing.assert_allclose(
        scene.quats[0], [127 / 128.0, 0.0, 0.0, 0.0], atol=1e-7
    )


def test_splat_quat_mapping_signs():
    qb = [128 + 64, 128 + 32, 128 - 16, 128 + 8]  # (w,x,y,z)=(.5,.25,-.125,.0625)
    scene = parse_splat_bytes(
        _hand_built_splat_row([0, 0, 0], [1, 1, 1], [0, 0, 0, 255], qb)
    )
    np.testing.assert_allclose(
        scene.quats[0], [0.5, -0.25, 0.125, 0.0625], atol=1e-7
    )


def test_splat_round_trip():
    scene = synthetic_scene(257, seed=3)
    data = scene_to_splat_bytes(scene)
    assert len(data) == 257 * ROW_LENGTH
    back = parse_splat_bytes(data)
    np.testing.assert_allclose(back.means, scene.means, atol=1e-6)
    np.testing.assert_allclose(back.scales, scene.scales, atol=1e-6)
    # u8-quantized channels: 1/255 resolution
    np.testing.assert_allclose(back.colors, scene.colors, atol=0.5 / 255.0)
    np.testing.assert_allclose(back.opacities, scene.opacities, atol=0.5 / 255.0)
    # quats: 1/128 resolution, sign flip allowed is NOT expected here
    np.testing.assert_allclose(back.quats, scene.quats, atol=0.5 / 128.0)


def test_streaming_reader_partial_rows():
    scene = synthetic_scene(100, seed=1)
    data = scene_to_splat_bytes(scene)
    reader = StreamingSplatReader()
    got = []
    # feed awkward chunk sizes straddling row boundaries (index.js:279-298)
    for start in range(0, len(data), 777):
        part = reader.feed(data[start:start + 777])
        if part is not None:
            got.append(np.asarray(part.means))
    assert reader.rows_emitted == 100
    np.testing.assert_allclose(np.concatenate(got), scene.means, atol=1e-6)


def _make_ply(n, rng, with_sh_rest=0, with_scale=True):
    props = ["x", "y", "z"]
    if with_scale:
        props += (
            [f"f_dc_{i}" for i in range(3)]
            + [f"f_rest_{i}" for i in range(with_sh_rest)]
            + ["opacity"]
            + [f"scale_{i}" for i in range(3)]
            + [f"rot_{i}" for i in range(4)]
        )
    else:
        props += ["red", "green", "blue"]
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        + "".join(
            f"property {'uchar' if p in ('red', 'green', 'blue') else 'float'} {p}\n"
            for p in props
        )
        + "end_header\n"
    )
    cols = {}
    body = bytearray()
    for i in range(n):
        for p in props:
            if p in ("red", "green", "blue"):
                v = rng.integers(0, 256)
                body += np.uint8(v).tobytes()
            else:
                v = rng.normal()
                body += np.float32(v).tobytes()
            cols.setdefault(p, []).append(float(v))
    return header.encode() + bytes(body), {k: np.array(v) for k, v in cols.items()}


def test_ply_activations_exact():
    rng = np.random.default_rng(0)
    data, cols = _make_ply(50, rng)
    scene = parse_ply_bytes(data, importance_sort=False)
    sh_c0 = 0.28209479177387814
    np.testing.assert_allclose(
        scene.means[:, 0], cols["x"].astype(np.float32), rtol=1e-6
    )
    np.testing.assert_allclose(  # z negated into framework space
        scene.means[:, 2], -cols["z"].astype(np.float32), rtol=1e-6
    )
    np.testing.assert_allclose(
        scene.scales[:, 1],
        np.exp(cols["scale_1"].astype(np.float32)),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        scene.colors[:, 0],
        np.clip(0.5 + sh_c0 * cols["f_dc_0"].astype(np.float32), 0, None),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        scene.opacities,
        1.0 / (1.0 + np.exp(-cols["opacity"].astype(np.float32))),
        rtol=1e-5,
    )


def test_ply_importance_sort_descending():
    rng = np.random.default_rng(1)
    data, _ = _make_ply(64, rng)
    scene = parse_ply_bytes(data, importance_sort=True)
    imp = np.prod(scene.scales, axis=-1) * np.asarray(scene.opacities)
    assert np.all(np.diff(imp) <= 1e-12)


def test_ply_pointcloud_fallbacks():
    rng = np.random.default_rng(2)
    data, cols = _make_ply(10, rng, with_scale=False)
    scene = parse_ply_bytes(data)
    np.testing.assert_allclose(scene.scales, 0.01)  # index.js:712-714
    np.testing.assert_allclose(scene.opacities, 1.0)  # :740
    np.testing.assert_allclose(
        scene.colors[:, 0], cols["red"] / 255.0, atol=1e-6
    )
    # identity quaternion (rot bytes 255,0,0,0 -> w~1), :717-720
    assert abs(scene.quats[0, 0] - 1.0) < 1e-6


def test_ply_sh_rest_bands():
    rng = np.random.default_rng(3)
    data, _ = _make_ply(8, rng, with_sh_rest=9)  # degree-1: 3 coeffs x 3 ch
    scene = parse_ply_bytes(data, importance_sort=False)
    assert scene.sh is not None and scene.sh.shape == (8, 3, 3)


def test_ply_save_load_round_trip(tmp_path):
    from splatjax.io import load_ply, save_ply

    scene = synthetic_scene(40, seed=9)
    p = tmp_path / "t.ply"
    save_ply(p, scene)
    back = load_ply(p, importance_sort=False)
    np.testing.assert_allclose(back.means, scene.means, atol=1e-5)
    np.testing.assert_allclose(back.scales, scene.scales, rtol=1e-4)
    np.testing.assert_allclose(back.opacities, scene.opacities, atol=1e-5)
    np.testing.assert_allclose(back.colors, scene.colors, atol=1e-5)
    np.testing.assert_allclose(back.quats, scene.quats, atol=1e-5)


def test_ply_sh_z_reflection_parity():
    """View-dependent color of an imported 3DGS .ply must match evaluating
    the original coefficients in the source (un-reflected) space.

    The framework maps world z -> -z (index.js:350-354); z-odd SH basis
    functions flip sign under that reflection, so the loader negates their
    coefficients (ply_format._SH_Z_ODD). Property checked: for any view
    direction d, eval(loaded_sh, reflect(d)) == eval(original_sh, d).
    """
    import jax.numpy as jnp

    from splatjax.ops.projection import eval_sh

    rng = np.random.default_rng(4)
    n, n_rest = 16, 45  # degree 3: 15 coeffs x 3 channels
    data, cols = _make_ply(n, rng, with_sh_rest=n_rest)
    scene = parse_ply_bytes(data, importance_sort=False, max_sh_degree=3)
    assert scene.sh is not None and scene.sh.shape == (n, 15, 3)

    # original-space coefficients, channel-major in the ply -> (n, 15, 3)
    sh_orig = (
        np.stack([cols[f"f_rest_{i}"] for i in range(n_rest)], axis=-1)
        .astype(np.float32)
        .reshape(n, 3, 15)
        .transpose(0, 2, 1)
    )
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d_fw = d * np.array([1.0, 1.0, -1.0], np.float32)  # framework direction

    dc = jnp.full((n, 3), 0.5, jnp.float32)
    expect = eval_sh(jnp.asarray(sh_orig), dc, jnp.asarray(d))
    got = eval_sh(jnp.asarray(scene.sh), dc, jnp.asarray(d_fw))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-5)

    # and save_ply round-trips the flip exactly
    import tempfile, os
    from splatjax.io import load_ply, save_ply

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "t.ply")
        save_ply(p, scene)
        back = load_ply(p, importance_sort=False)
        np.testing.assert_allclose(back.sh, scene.sh, atol=1e-6)


def test_ply_large_header_native_and_python():
    """A header larger than any fixed probe window (long comments) must
    parse in both backends (the native parser scans the full buffer)."""
    rng = np.random.default_rng(5)
    data, _ = _make_ply(6, rng)
    head, body = data.split(b"end_header\n", 1)
    comments = b"".join(
        b"comment " + bytes([65 + (i % 26)]) * 120 + b"\n" for i in range(200)
    )  # ~24KB of header comments
    big = head + comments + b"end_header\n" + body
    a = parse_ply_bytes(big, importance_sort=False)
    from splatjax.io import native

    if native.available():
        b = native.parse_ply_bytes_native(big, importance_sort=False)
        np.testing.assert_allclose(a.means, b.means, rtol=1e-6)
