from splatjax.reference.rasterizer import (
    composite_pixels,
    render_projected_reference,
    render_reference,
)

__all__ = [
    "composite_pixels",
    "render_projected_reference",
    "render_reference",
]
