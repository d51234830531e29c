"""Demo: load (or synthesize) a scene and render an orbit of frames.

The TPU-native analogue of the reference's index.html demo page
(index.html:8-14): a splat scene plus animated viewpoints. Writes PNG-like
.png frames (stdlib-only PNG writer, splatjax.utils.png) and prints per-frame timings.

    python examples/demo_render.py [scene.splat|scene.ply] [--frames 8]
"""
import argparse
import math
import time

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from splatjax.utils import write_png
import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src", nargs="?", default=None)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--out", default="/tmp/splatjax_demo")
    args = ap.parse_args()

    from splatjax import make_camera
    from splatjax.io import synthetic_scene
    from splatjax.viewer import SplatRenderer

    if args.src:
        renderer = SplatRenderer(src=args.src)
    else:
        print("no asset given; using a 100k synthetic scene")
        renderer = SplatRenderer(
            scene=synthetic_scene(100_000, seed=0, extent=0.8,
                                  scale_range=(0.005, 0.02))
        )
    print(f"scene: {renderer.scene.num_gaussians} gaussians")

    import os

    os.makedirs(args.out, exist_ok=True)
    for i in range(args.frames):
        a = 2 * math.pi * i / args.frames
        cam = make_camera(
            (3.0 * math.sin(a), 0.4, 3.0 * math.cos(a)), (0, 0, 0),
            width=args.width, height=args.height,
        )
        t0 = time.time()
        img = renderer.render(cam)
        img = np.asarray(jax.block_until_ready(img))
        # force full materialization for honest timing
        _ = float(img[0, 0, 0])
        dt = time.time() - t0
        path = f"{args.out}/frame_{i:03d}.png"
        write_png(path, img)
        print(f"frame {i}: {dt*1e3:.1f} ms  alpha_max={img[..., 3].max():.3f}"
              f"  -> {path}")


if __name__ == "__main__":
    main()
