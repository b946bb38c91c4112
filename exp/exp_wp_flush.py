"""Sweep walkpool _FLUSH_N (flush cadence in boundaries) on the 49k bench
workload, plus a K/W spot-check at 197k.

Usage: python exp/exp_wp_flush.py
"""
from __future__ import annotations

import dataclasses
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
    from rendertoy3c_tpu.accel.lbvh import split_order_scene
    from rendertoy3c_tpu.film.film import film_create
    from rendertoy3c_tpu.integrate import walkpool
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import make_render_fn
    from rendertoy3c_tpu.scene.camera import Camera
    from rendertoy3c_tpu.trace.hierwalk import HIER_LEAF

    cam = Camera(eye=(0.0, 20.0, 45.0), lookat=(0.0, 0.0, 0.0),
                 up=(0.0, 1.0, 0.0), fov_y=50.0, aspect_ratio=1.0)

    def run(scene, k, w, flush_n, label):
        walkpool._FLUSH_N = flush_n
        cfg = RenderConfig(width=768, height=768, samples_per_launch=8,
                           max_depth=16, ray_block=w, integrator="pool",
                           pool_pixel_major=True, walk_phase_every=k)
        wp = walkpool.make_walkpool_pipeline(scene, cfg)
        step = make_render_fn(scene, cfg, tracer=wp)
        r, dt = bench_step(step, cam.params(),
                           lambda: film_create(cfg.height, cfg.width))
        print(f"  {label}: {r:7.2f} Mray/s ({dt*1e3:.0f} ms)", flush=True)

    s49 = split_order_scene(box_field(64), leaf=HIER_LEAF)
    print("49k flush sweep (K=16 W=16k):", flush=True)
    for fn in (2, 4, 8, 16):
        run(s49, 16, 16384, fn, f"flush_n={fn:2d}")

    s197 = split_order_scene(box_field(128), leaf=HIER_LEAF)
    print("197k K/W spot (flush_n=4):", flush=True)
    for k, w in ((12, 16384), (16, 16384), (16, 32768), (24, 32768)):
        run(s197, k, w, 4, f"K={k:2d} W={w}")


if __name__ == "__main__":
    main()
