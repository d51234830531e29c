"""Demo: WebXR-style stereo eye pair.

The reference renders per-eye inside the browser's XR session with the
framebuffer scaled by xrPixelRatio (default 0.5, index.js:13-15) and one
worker sort order shared by both eyes per frame (index.js:438-455). This
renders a left/right pair with render_stereo and writes them side by side.

    python examples/demo_stereo.py [scene.splat] [--shared-bins]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from splatjax.utils import write_png


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src", nargs="?", default=None)
    ap.add_argument("--out", default="/tmp/splatjax_stereo.png")
    ap.add_argument("--ipd", type=float, default=0.06,
                    help="inter-pupillary distance in scene units")
    ap.add_argument("--xr-pixel-ratio", type=float, default=0.5)
    ap.add_argument("--shared-bins", action="store_true",
                    help="reuse the left eye's tile index for the right "
                         "eye (the reference's shared per-frame order)")
    args = ap.parse_args()

    from splatjax import make_camera
    from splatjax.io import load_splat, synthetic_scene
    from splatjax.render import render_stereo

    if args.src:
        scene = load_splat(args.src)
    else:
        scene = synthetic_scene(5000, seed=3, extent=0.8,
                                scale_range=(0.01, 0.05))

    w, h = 640, 480
    half = args.ipd / 2.0
    cl = make_camera((-half, 0, 2.5), (0, 0, 0), width=w, height=h)
    cr = make_camera((+half, 0, 2.5), (0, 0, 0), width=w, height=h)
    il, ir = render_stereo(
        scene, cl, cr, xr_pixel_ratio=args.xr_pixel_ratio,
        shared_bins=args.shared_bins,
    )
    pair = np.concatenate([np.asarray(il), np.asarray(ir)], axis=1)
    write_png(args.out, (np.clip(pair, 0, 1) * 255).astype(np.uint8))
    print(f"wrote {args.out}  ({pair.shape[1]}x{pair.shape[0]}, "
          f"xr_pixel_ratio={args.xr_pixel_ratio}, "
          f"shared_bins={args.shared_bins})")


if __name__ == "__main__":
    main()
