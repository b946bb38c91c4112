"""Walk-pool utilization counters on CPU (axon TPU lacks debug.print).

Utilization/visit stats depend only on the pool mechanics, not the
platform, so a small CPU frame is representative of the bench config.

Usage: RT3C_WP_STATS=1 python exp/exp_wp_stats.py [49k|200k] [K] [W] [res] [spp]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "49k"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
    res = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    spp = int(sys.argv[5]) if len(sys.argv) > 5 else 2

    from exp_sim_hier import town_scene
    from exp_trav import build_big_scene

    from rendertoy3c_tpu.accel.lbvh import split_order_scene
    from rendertoy3c_tpu.film.film import film_create
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import make_render_fn
    from rendertoy3c_tpu.integrate.walkpool import make_walkpool_pipeline
    from rendertoy3c_tpu.scene.camera import Camera
    from rendertoy3c_tpu.trace.hierwalk import HIER_LEAF

    scene = build_big_scene() if which == "49k" else town_scene(
        {"200k": 200_000, "1M": 1_000_000}[which])
    scene = split_order_scene(scene, leaf=HIER_LEAF)
    cam = Camera(eye=(0.0, 20.0, 45.0), lookat=(0.0, 0.0, 0.0),
                 up=(0.0, 1.0, 0.0), fov_y=50.0, aspect_ratio=1.0)
    cfg = RenderConfig(width=res, height=res, samples_per_launch=spp,
                       max_depth=16, ray_block=w, integrator="pool",
                       pool_pixel_major=True, walk_phase_every=k)
    wp = make_walkpool_pipeline(scene, cfg)
    step = make_render_fn(scene, cfg, tracer=wp)
    film = film_create(cfg.height, cfg.width)
    t0 = time.perf_counter()
    film, stats = step(cam.params(), film)
    jax.block_until_ready(film.accum)
    print(f"done in {time.perf_counter() - t0:.1f}s stats={stats}",
          flush=True)


if __name__ == "__main__":
    main()
