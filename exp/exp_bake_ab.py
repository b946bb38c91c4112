"""On-chip A/B for the baked world-space instanced table (VERDICT r5 #4).

One process (tunnel rule): the 562k tower field through the bench path
with the space-switching instanced walk (RT3C_INST_BAKE=0) vs the baked
world table, plus schedule variants (sort, width, cadence).

Usage: python exp/exp_bake_ab.py [quick|full]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_cache = os.path.expanduser("~/.cache/rendertoy3c_jax")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses

from bench import _bench_step, _instance_field_scene

from rendertoy3c_tpu.film.film import film_create
from rendertoy3c_tpu.integrate.config import RenderConfig
from rendertoy3c_tpu.integrate.path import make_render_fn
from rendertoy3c_tpu.trace.auto import choose_tracer, tune_config


def run(name, cfg, env=None, timed=2, tune=True):
    saved = {}
    env = env or {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        scene, cam = _instance_field_scene()
        cfg_c = tune_config(scene, cfg, on_tpu=True) if tune else cfg
        sc, tracer = choose_tracer(scene, cfg_c, on_tpu=True)
        stride = getattr(tracer, "inst_stride", 0)
        step = make_render_fn(sc, cfg_c, tracer=tracer)
        cam.aspect_ratio = cfg_c.width / cfg_c.height
        t0 = time.perf_counter()
        best, med, _bt, _mt, stats = _bench_step(
            step, cam.params(),
            lambda: film_create(cfg_c.height, cfg_c.width), 1, timed)
        print(f"{name:34s}: best {best:6.2f} / med {med:6.2f} Mray/s "
              f"(stride={stride}, W={cfg_c.ray_block}, "
              f"{time.perf_counter()-t0:.0f}s) env={env}", flush=True)
        return best
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "quick"
    cfg = RenderConfig(width=768, height=768, samples_per_launch=8,
                       max_depth=16, ray_block=65536, integrator="pool",
                       pool_pixel_major=True)

    run("inst BAKE=0 (space-switch walk)", cfg, {"RT3C_INST_BAKE": "0"})
    run("inst BAKE=1 (world baked)", cfg, {"RT3C_INST_BAKE": "1"})
    if which == "full":
        # schedule variants bypass tune_config (it pins W=8192/sort off
        # for instanced scenes); flush cadence matches the bench default
        base = dataclasses.replace(cfg, ray_block=8192, flush_every=8)
        run("inst baked + sort",
            dataclasses.replace(base, sort_rays=True),
            {"RT3C_INST_BAKE": "1"}, tune=False)
        run("inst baked W=16384",
            dataclasses.replace(base, ray_block=16384),
            {"RT3C_INST_BAKE": "1"}, tune=False)
        run("inst baked K=12",
            dataclasses.replace(base, walk_phase_every=12),
            {"RT3C_INST_BAKE": "1"}, tune=False)
        run("inst baked K=20",
            dataclasses.replace(base, walk_phase_every=20),
            {"RT3C_INST_BAKE": "1"}, tune=False)


if __name__ == "__main__":
    main()
