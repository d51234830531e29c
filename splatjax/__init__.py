"""splatjax — a TPU-native differentiable 3D Gaussian splatting framework.

Re-implements (from scratch, in JAX/XLA/Pallas) the capabilities of the
quadjr/aframe-gaussian-splatting WebGL viewer — .splat/.ply assets, its exact
projection/compositing math, culls, cutouts — and adds what a viewer cannot
have: full differentiability (custom-VJP tiled rasterizer), on-device sorting
and tile binning, multi-chip sharding, and a training loop.
"""
from splatjax.scene import (
    GaussianScene,
    TrainableGaussians,
    build_covariances,
    importance,
    select_important,
)
from splatjax.camera import Camera, make_camera, perspective, look_at
from splatjax.render import (
    CachedBins,
    bin_scene,
    composite_over,
    render,
    render_binned,
    render_instances,
    render_stereo,
)
from splatjax.compose import OpaqueLayer, compose_scene, merge_opaque_layers
from splatjax import io

__version__ = "0.1.0"

__all__ = [
    "GaussianScene",
    "importance",
    "select_important",
    "TrainableGaussians",
    "build_covariances",
    "Camera",
    "render",
    "render_binned",
    "render_stereo",
    "bin_scene",
    "CachedBins",
    "render_instances",
    "composite_over",
    "OpaqueLayer",
    "compose_scene",
    "merge_opaque_layers",
    "make_camera",
    "perspective",
    "look_at",
    "io",
]
