from .dist import (
    make_mesh,
    make_render_fn_dist,
    render_distributed,
)

__all__ = ["make_mesh", "make_render_fn_dist", "render_distributed"]
