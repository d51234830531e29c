from splatjax.parallel.mesh import init_distributed, make_mesh, make_mesh_2d
from splatjax.parallel.dist_render import padded_band_height, render_sharded

__all__ = [
    "init_distributed",
    "make_mesh",
    "make_mesh_2d",
    "padded_band_height",
    "render_sharded",
]
