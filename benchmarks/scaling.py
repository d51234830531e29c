#!/usr/bin/env python
"""Scaling-efficiency harness for the sharded renderer (SURVEY.md §5).

Real multi-host hardware is not available in this environment, so this
measures what CAN be measured and models the rest:

  * per-device work balance on the 8-device virtual CPU mesh: instances
    binned per band (the rasterizer's work unit) and per-band overflow;
  * collective traffic per frame, counted from the sharded program:
    redistribution bytes (all_gather or all_to_all of projected features)
    and gradient psum bytes;
  * a roofline model of 2-host scaling efficiency: compute scales with
    max-band work, collectives ride ICI intra-host (fast) and DCN
    across hosts (slow) — efficiency = T(1 host) / (2 * T(2 hosts)).

Emits one JSON line (artifact for the driver / future rounds).

    python benchmarks/scaling.py [--n 200000] [--res 512x512]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# must run before any jax op (the container initializes the axon backend on
# first use, so configure the virtual CPU mesh immediately)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_num_cpu_devices", int(os.environ.get("SPLATJAX_SCALING_DEVS", "8"))
)

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--res", default="512x512")
    ap.add_argument("--devices", type=int,
                    default=int(os.environ.get("SPLATJAX_SCALING_DEVS", "8")))
    args = ap.parse_args()

    import jax.numpy as jnp

    from splatjax.camera import make_camera
    from splatjax.io import synthetic_scene
    from splatjax.ops.binning import TileConfig, gaussian_tile_span
    from splatjax.ops.projection import project_gaussians
    from splatjax.parallel import make_mesh, render_sharded
    from splatjax.parallel.dist_render import padded_band_height
    from splatjax.scene import build_covariances

    w, h = (int(v) for v in args.res.split("x"))
    d = args.devices
    scene = synthetic_scene(args.n, seed=7, extent=1.0,
                            scale_range=(0.002, 0.01))
    cam = make_camera((0, 0, 2.8), (0, 0, 0), width=w, height=h)
    mesh = make_mesh(d)

    # ---- per-band work balance (the tile-sharded rasterizer's work unit)
    proj = project_gaussians(
        scene.means, build_covariances(scene.quats, scene.scales),
        scene.colors, scene.opacities, cam.modelview, cam.projection, w, h,
        max_scales=jnp.max(jnp.asarray(scene.scales), axis=-1),
    )
    cfg = TileConfig(w, h, 16, 16)
    x0, x1, y0, y1, count = (np.asarray(v) for v in
                             gaussian_tile_span(proj, cfg))

    def band_split(n_bands):
        rows_per_band = padded_band_height(h, n_bands, 16) // 16
        counts = []
        for b in range(n_bands):
            lo, hi = b * rows_per_band, (b + 1) * rows_per_band - 1
            ry0 = np.maximum(y0, lo)
            ry1 = np.minimum(y1, hi)
            rows = np.maximum(ry1 - ry0 + 1, 0) * (count > 0)
            counts.append(int((rows * (x1 - x0 + 1)).sum()))
        total = max(sum(counts), 1)
        return counts, max(counts) * n_bands / total

    band_counts, balance = band_split(d)       # 1 "host" of d chips
    _, balance2 = band_split(2 * d)            # 2 "hosts"

    # ---- parity + overflow on the real sharded program
    img_s, overflow = render_sharded(
        scene, cam, mesh, early_stop=0.0, return_overflow=True
    )
    from splatjax.render import render

    img_1 = render(scene, cam, early_stop=0.0)
    parity = float(jnp.abs(img_s - img_1).max())

    # ---- collective bytes per frame (analytic, from the program's shapes)
    feat_row_bytes = 13 * 4              # packed projected features
    n = args.n
    allgather_bytes = n * feat_row_bytes * (d - 1) // d  # per device recv
    grad_row_bytes = 14 * 4              # means3+scales3+quats4+color3+opa1
    psum_bytes = n * grad_row_bytes      # ring all-reduce ~2x n/d * (d-1)

    # ---- 2-host roofline model (v5e DCN ~25 GB/s/host usable): the slowest
    # band bounds compute; the cross-host half of the grad psum rides DCN
    # and does NOT yet overlap the bwd sweep (VERDICT r1 item 3). Efficiency
    # = T(1 host) / (2 * T(2 hosts)) with a measured per-frame compute base
    # (BENCH r2: ~170 ms fwd+bwd at 1M splats) scaled to n.
    frame_ms = 170.0 * (n / 1e6)         # perfectly-balanced 1-host frame
    t1 = frame_ms * balance
    dcn_ms = (psum_bytes / 2) / 25e9 * 1e3
    t2 = frame_ms / 2.0 * balance2 + dcn_ms
    eff_2host = t1 / (2.0 * t2)

    result = {
        "metric": "modeled 2-host scaling efficiency",
        "value": round(min(eff_2host, 1.0), 3),
        "unit": "x",
        "devices": d,
        "band_instances": band_counts,
        "band_balance_maxdev": round(balance, 3),
        "overflow_per_band": [int(v) for v in np.asarray(overflow)],
        "parity_vs_single_chip": parity,
        "allgather_bytes_per_dev": int(allgather_bytes),
        "grad_psum_bytes": int(psum_bytes),
        "modeled_dcn_ms": round(dcn_ms, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
