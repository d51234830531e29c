from splatjax.parallel.mesh import make_mesh, make_mesh_2d
from splatjax.parallel.dist_render import padded_band_height, render_sharded

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "padded_band_height",
    "render_sharded",
]
