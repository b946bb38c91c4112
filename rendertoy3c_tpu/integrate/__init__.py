from .config import RenderConfig
from .path import render_subframe, render_frame, make_render_fn, RenderStats
