"""Demo: interactive-style orbit redraw loop with a cached tile index.

The reference's RAF loop redraws every frame with the worker's most
recent sort order (index.js:438-455). This is that loop on TPU: bins are
built once per `resort_interval` frames (`cache_params=True` also
pre-gathers per-instance parameters so redraws skip the feature gather),
and every frame projects + shades fresh at display rate.

    python examples/demo_orbit.py [scene.splat] [--frames 24]

Writes an orbit strip PNG and prints measured redraw fps.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from splatjax.utils import write_png


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src", nargs="?", default=None)
    ap.add_argument("--out", default="/tmp/splatjax_orbit.png")
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--resort-interval", type=int, default=8)
    ap.add_argument("--res", default="640x480")
    args = ap.parse_args()

    import jax

    from splatjax import make_camera
    from splatjax.io import load_splat, synthetic_scene
    from splatjax.viewer import SplatRenderer

    if args.src:
        scene = load_splat(args.src)
    else:
        scene = synthetic_scene(20000, seed=9, extent=0.8,
                                scale_range=(0.01, 0.04))
    w, h = (int(v) for v in args.res.split("x"))
    r = SplatRenderer(
        scene=scene, resort_interval=args.resort_interval, feature_bytes=16
    )

    imgs = []
    t0 = None
    for i in range(args.frames):
        ang = 2.0 * np.pi * i / args.frames
        eye = (0.35 * np.sin(ang), 0.1 * np.sin(2 * ang),
               2.5 + 0.2 * np.cos(ang))
        cam = make_camera(eye, (0, 0, 0), width=w, height=h)
        img = r.render(cam)
        if i == 0:
            jax.block_until_ready(img)   # exclude compile time
            t0 = time.perf_counter()
        imgs.append(np.asarray(img))
    dt = time.perf_counter() - t0
    fps = (args.frames - 1) / max(dt, 1e-9)

    # strip of every 4th frame
    strip = np.concatenate(imgs[:: max(args.frames // 6, 1)][:6], axis=1)
    write_png(args.out, (np.clip(strip, 0, 1) * 255).astype(np.uint8))
    print(f"wrote {args.out}; {args.frames} frames at {w}x{h}, "
          f"resort_interval={args.resort_interval}: {fps:.1f} fps "
          f"(incl. host loop + readback)")


if __name__ == "__main__":
    main()
