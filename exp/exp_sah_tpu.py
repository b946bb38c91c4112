"""SAH ordering end-to-end on the TPU: 49k/200k/1M x K sweep.

Usage: python exp/exp_sah_tpu.py [scenes=49k,200k,1M] [ks=0,12]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import jax

_cache = os.path.expanduser("~/.cache/rendertoy3c_jax")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench_tracers import box_field


def bench_step(step, cam, film0_fn, reps=3):
    film, stats = step(cam, film0_fn())
    jax.block_until_ready(film.accum)
    n_rays = int(stats.radiance_rays) + int(stats.shadow_rays)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        film, stats = step(cam, film)
        jax.block_until_ready(film.accum)
        best = min(best, time.perf_counter() - t0)
    return n_rays / best / 1e6, best


def main():
    scenes = (sys.argv[1] if len(sys.argv) > 1 else "49k,200k").split(",")
    ks = [int(x) for x in
          (sys.argv[2] if len(sys.argv) > 2 else "0,12").split(",")]

    from exp_sim_hier import town_scene

    from rendertoy3c_tpu.accel.lbvh import split_order_scene
    from rendertoy3c_tpu.film.film import film_create
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import make_render_fn
    from rendertoy3c_tpu.integrate.walkpool import make_walkpool_pipeline
    from rendertoy3c_tpu.scene.camera import Camera
    from rendertoy3c_tpu.trace.auto import POOL_BLOCK_LARGE
    from rendertoy3c_tpu.trace.hierwalk import HIER_LEAF

    cam = Camera(eye=(0.0, 20.0, 45.0), lookat=(0.0, 0.0, 0.0),
                 up=(0.0, 1.0, 0.0), fov_y=50.0, aspect_ratio=1.0)

    for which in scenes:
        t0 = time.perf_counter()
        raw = box_field(64) if which == "49k" else town_scene(
            {"200k": 200_000, "1M": 1_000_000}[which])
        scene = split_order_scene(raw, leaf=HIER_LEAF)
        print(f"{which}: faces={scene.num_faces} "
              f"order+build={time.perf_counter() - t0:.1f}s", flush=True)
        for k in ks:
            cfg = RenderConfig(width=768, height=768, samples_per_launch=8,
                               max_depth=16, ray_block=POOL_BLOCK_LARGE,
                               integrator="pool", pool_pixel_major=True,
                               walk_phase_every=k)
            wp = make_walkpool_pipeline(scene, cfg)
            step = make_render_fn(scene, cfg, tracer=wp)
            r, dt = bench_step(step, cam.params(),
                               lambda: film_create(cfg.height, cfg.width))
            print(f"  K={k:2d}: {r:7.2f} Mray/s ({dt*1e3:.0f} ms)",
                  flush=True)


if __name__ == "__main__":
    main()
