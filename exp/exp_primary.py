"""Primary-ray (coherent) tracer shootout on the 49k field: hierwalk vs
the VMEM-resident tile-cull sweep (pallas_mt). If the sweep is >=3x
faster on camera rays, a hybrid integrator (pre-traced primaries feeding
the walk pool) is worth building.

Usage: python exp/exp_primary.py [49k|200k]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import jax
import jax.numpy as jnp
import numpy as np

_cache = os.path.expanduser("~/.cache/rendertoy3c_jax")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench_tracers import box_field

R = 32768


def marginal(fn, o, d, label):
    f = jax.jit(fn, static_argnums=(2,))
    for reps in (2, 10):
        float(f(o, d, reps))
    ts = {}
    for reps in (2, 10):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(o, d, reps))
            best = min(best, time.perf_counter() - t0)
        ts[reps] = best
    dt = (ts[10] - ts[2]) / 8
    print(f"{label}: {dt*1e3:8.2f} ms/call {R/dt/1e6:8.2f} Mray/s",
          flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "49k"
    from exp_sim_hier import town_scene

    from rendertoy3c_tpu.accel.lbvh import morton_order_scene, \
        split_order_scene
    from rendertoy3c_tpu.integrate.path import _camera_ray
    from rendertoy3c_tpu.scene.camera import Camera
    from rendertoy3c_tpu.trace.hierwalk import HIER_LEAF, \
        make_hierwalk_tracer
    from rendertoy3c_tpu.trace.pallas_mt import make_pallas_mt_tracer

    scene = box_field(64) if which == "49k" else town_scene(200_000)
    cam = Camera(eye=(0.0, 20.0, 45.0), lookat=(0.0, 0.0, 0.0),
                 up=(0.0, 1.0, 0.0), fov_y=50.0, aspect_ratio=1.0)
    cp = cam.params()

    # camera rays for a 768x768 frame (first R pixels, jittered)
    pix = jnp.arange(R, dtype=jnp.int32)
    px = pix % 768
    py = pix // 768
    from rendertoy3c_tpu.math import rng as _rng

    st = _rng.tea(pix.astype(jnp.uint32), jnp.uint32(0))
    st, jx = _rng.rnd(st)
    st, jy = _rng.rnd(st)
    o, d = _camera_ray(cp, px, py, jx, jy, jnp.float32(768), jnp.float32(768))

    sc_h = split_order_scene(scene, leaf=HIER_LEAF)
    hc, _ = make_hierwalk_tracer(sc_h)
    sc_m = morton_order_scene(scene)
    mc, _ = make_pallas_mt_tracer(sc_m)

    def run(tracer):
        def fn(o, d, reps):
            def body(i, acc):
                oo = o + acc * 1e-7
                h = tracer(oo, d, 1e-3, 1e16, None, None)
                return acc + jnp.sum(h.t) * 1e-20
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return fn

    # parity spot-check first
    h1 = hc(o, d, 1e-3, 1e16, None, None)
    h2 = mc(o, d, 1e-3, 1e16, None, None)
    agree = float(jnp.mean((jnp.abs(h1.t - h2.t) < 1e-3).astype(jnp.float32)))
    print(f"scene={which} faces={scene.num_faces} t-agreement={agree:.4f}",
          flush=True)
    marginal(run(hc), o, d, "  hier  closest primary")
    marginal(run(mc), o, d, "  tile  closest primary")


if __name__ == "__main__":
    main()
