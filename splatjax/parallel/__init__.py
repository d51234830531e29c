from splatjax.parallel.mesh import init_distributed, make_mesh, make_mesh_2d
from splatjax.parallel.dist_render import padded_band_height, render_sharded
from splatjax.parallel.dist_train import make_dp_band_train_step

__all__ = [
    "init_distributed",
    "make_mesh",
    "make_mesh_2d",
    "padded_band_height",
    "render_sharded",
    "make_dp_band_train_step",
]
