"""Profile one walkpool subframe on the 49k bench workload (per-op table).

Usage: python exp/exp_wp_prof.py [K=16] [W=32768]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import jax

_cache = os.path.expanduser("~/.cache/rendertoy3c_jax")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench_tracers import box_field


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    res = int(sys.argv[3]) if len(sys.argv) > 3 else 768

    from rendertoy3c_tpu.accel.lbvh import split_order_scene
    from rendertoy3c_tpu.film.film import film_create
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import make_render_fn
    from rendertoy3c_tpu.integrate.walkpool import make_walkpool_pipeline
    from rendertoy3c_tpu.scene.camera import Camera
    from rendertoy3c_tpu.trace.hierwalk import HIER_LEAF
    from rendertoy3c_tpu.utils.profiling import profile_step

    scene = split_order_scene(box_field(64), leaf=HIER_LEAF)
    cam = Camera(eye=(0.0, 20.0, 45.0), lookat=(0.0, 0.0, 0.0),
                 up=(0.0, 1.0, 0.0), fov_y=50.0, aspect_ratio=1.0)
    cfg = RenderConfig(width=res, height=res, samples_per_launch=8,
                       max_depth=16, ray_block=w, integrator="pool",
                       pool_pixel_major=True, walk_phase_every=k)
    wp = make_walkpool_pipeline(scene, cfg)
    step = make_render_fn(scene, cfg, tracer=wp)
    cp = cam.params()
    rows = profile_step(
        lambda f: step(cp, f), top=55,
        rearm=lambda: (film_create(cfg.height, cfg.width),))
    for r in rows:
        print(r, flush=True)


if __name__ == "__main__":
    main()
