from splatjax.io.splat_format import (
    ROW_LENGTH,
    StreamingSplatReader,
    load_splat,
    parse_splat_bytes,
    save_splat,
    scene_to_splat_bytes,
)
from splatjax.io.ply_format import load_ply, parse_ply_bytes, save_ply
from splatjax.io.synthetic import (
    synthetic_scene,
    synthetic_splat_bytes,
    tile_scene,
)

__all__ = [
    "ROW_LENGTH",
    "StreamingSplatReader",
    "load_splat",
    "parse_splat_bytes",
    "save_splat",
    "scene_to_splat_bytes",
    "load_ply",
    "parse_ply_bytes",
    "save_ply",
    "synthetic_scene",
    "tile_scene",
    "synthetic_splat_bytes",
]
