"""Demo: cutout box culling — the analogue of cutout-demo.html.

The reference shows two instances of one asset, one clipped by an invisible
<a-box> (cutout-demo.html:23-25). Here: render the same scene twice, once
whole and once restricted to a unit box, and composite them side by side.

    python examples/demo_cutout.py [scene.splat]
"""
import argparse

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from splatjax.utils import write_png
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src", nargs="?", default=None)
    args = ap.parse_args()

    from splatjax import make_camera
    from splatjax.io import synthetic_scene
    from splatjax.viewer import SplatRenderer

    scene = None
    if not args.src:
        scene = synthetic_scene(50_000, seed=3, extent=0.8,
                                scale_range=(0.01, 0.03))

    # cutout box: scaled 0.8, offset +x — world->box = inv(box world matrix)
    box_world = np.diag([0.8, 0.8, 0.8, 1.0]).astype(np.float32)
    box_world[:3, 3] = [0.3, 0.0, 0.0]
    cutout = jnp.asarray(np.linalg.inv(box_world))

    full = SplatRenderer(src=args.src, scene=scene)
    clipped = SplatRenderer(src=args.src, scene=scene, cutout=cutout)

    cam = make_camera((0, 0.3, 2.6), (0, 0, 0), width=640, height=480)
    img_full = np.asarray(jax.block_until_ready(full.render(cam)))
    img_cut = np.asarray(jax.block_until_ready(clipped.render(cam)))
    side = np.concatenate([img_full, img_cut], axis=1)
    write_png("/tmp/splatjax_cutout_demo.png", side)
    kept = (img_cut[..., 3] > 0).sum() / max((img_full[..., 3] > 0).sum(), 1)
    print(f"cutout kept {kept*100:.1f}% of covered pixels "
          f"-> /tmp/splatjax_cutout_demo.png")


if __name__ == "__main__":
    main()
