"""Round-5 batch B: flush cadence + attr-pack width on the walk band.

The 49k profile (exp_wp_prof, r5) splits the 842ms subframe into rounds
503ms / boundary 236ms / flush 99ms; the flush scatter is 1.33ms every
8th boundary and the boundary's attr sub-row select tree ~35us/path.
A/B both levers at the real bench shapes in ONE process (tunnel rule).

Usage: python exp/exp_r5b_ab.py [quick|full]
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

from bench import _bench_step, _box_field_scene, _instance_field_scene, \
    _town_scene

from rendertoy3c_tpu.film.film import film_create
from rendertoy3c_tpu.integrate.config import RenderConfig
from rendertoy3c_tpu.integrate.path import make_render_fn
from rendertoy3c_tpu.scene.camera import Camera
from rendertoy3c_tpu.trace.auto import choose_tracer, tune_config

_SCENES = {}


def _get_scene(name):
    if name not in _SCENES:
        if name == "49k":
            scene = _box_field_scene()
            cam = Camera(eye=(0.0, 20.0, 45.0), lookat=(0.0, 0.0, 0.0),
                         up=(0.0, 1.0, 0.0), fov_y=50.0, aspect_ratio=1.0)
        elif name == "200k":
            scene, cam = _town_scene(200000, untextured=True)
        elif name == "1M":
            scene, cam = _town_scene(1000000, untextured=True)
        elif name == "tex":
            scene, cam = _town_scene(50000)
        elif name == "instm":
            scene, cam = _instance_field_scene(motion=True)
        elif name == "inst":
            scene, cam = _instance_field_scene()
        else:
            raise ValueError(f"unknown scene {name!r}")
        _SCENES[name] = (scene, cam)
    return _SCENES[name]


def run(name, cfgname, env=None, timed=2):
    saved = {}
    env = env or {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        scene, cam = _get_scene(cfgname)
        cfg = RenderConfig(width=768, height=768, samples_per_launch=8,
                           max_depth=16, ray_block=65536, integrator="pool",
                           pool_pixel_major=True,
                           sort_rays=cfgname in ("200k", "1M", "tex"))
        cfg = tune_config(scene, cfg, on_tpu=True)
        sc, tracer = choose_tracer(scene, cfg, on_tpu=True)
        step = make_render_fn(sc, cfg, tracer=tracer)
        cam.aspect_ratio = cfg.width / cfg.height
        t0 = time.perf_counter()
        best, med, _bt, _mt, stats = _bench_step(
            step, cam.params(),
            lambda: film_create(cfg.height, cfg.width), 1, timed)
        print(f"{name:30s}: best {best:6.2f} / med {med:6.2f} Mray/s "
              f"({time.perf_counter()-t0:.0f}s) env={env}", flush=True)
        return best
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "full"

    run("49k base", "49k")
    run("49k FLUSH=16", "49k", {"RT3C_FLUSH_N": "16"})
    run("49k PACK_K=2", "49k", {"RT3C_ATTR_PACK_K": "2"})
    run("49k FLUSH=16+PACK2", "49k",
        {"RT3C_FLUSH_N": "16", "RT3C_ATTR_PACK_K": "2"})
    if which == "full":
        run("49k FLUSH=24+PACK2", "49k",
            {"RT3C_FLUSH_N": "24", "RT3C_ATTR_PACK_K": "2"})
        run("200k base", "200k")
        run("200k FLUSH=16+PACK2", "200k",
            {"RT3C_FLUSH_N": "16", "RT3C_ATTR_PACK_K": "2"})
        run("1M FLUSH=16+PACK2", "1M",
            {"RT3C_FLUSH_N": "16", "RT3C_ATTR_PACK_K": "2"})
        run("tex FLUSH=16+PACK2", "tex",
            {"RT3C_FLUSH_N": "16", "RT3C_ATTR_PACK_K": "2"})
        run("instm FLUSH=16+PACK2", "instm",
            {"RT3C_FLUSH_N": "16", "RT3C_ATTR_PACK_K": "2"})
        run("inst(baked) FLUSH=16+PACK2", "inst",
            {"RT3C_FLUSH_N": "16", "RT3C_ATTR_PACK_K": "2"})


if __name__ == "__main__":
    main()
