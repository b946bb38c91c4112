"""Per-ray-class tracer costs on large scenes: hierwalk vs tile-cull MT.

The pool mixes ray classes; this measures each class in isolation on the
49k/197k box fields to decide whether per-class backend dispatch (coherent
wavefronts -> pallas_mt tile-cull, incoherent -> hierwalk) is worth the
integrator surgery.

Classes (R rays each):
  primary   camera rays, pixel-major (max coherence)          closest
  bounce    cosine-hemisphere from primary hits, pool-sorted  closest
  incoh     random origins/dirs in the scene volume           closest
  shadow    primary hits -> random lamp point, pool-sorted    any

Usage: python exp/exp_coherent.py [49|197] [R]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_cache = os.path.expanduser("~/.cache/rendertoy3c_jax")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
from bench_tracers import box_field  # n_side x n_side box field

LO, HI = 4, 12


def camera_rays(r, width=768):
    """Pixel-major pinhole rays matching the bench 49k config camera."""
    from rendertoy3c_tpu.scene.camera import Camera

    cam = Camera(eye=(18.0, 14.0, 18.0), lookat=(0.0, 0.5, 0.0),
                 up=(0.0, 1.0, 0.0), fov_y=45.0, aspect_ratio=1.0)
    p = cam.params()
    u, v, w = np.asarray(p.u), np.asarray(p.v), np.asarray(p.w)
    idx = np.arange(r)
    px = (idx % width + 0.5) / width * 2.0 - 1.0
    py = (idx // width + 0.5) / width * 2.0 - 1.0
    d = px[:, None] * u + py[:, None] * v + w
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to(np.asarray(p.eye), (r, 3)).copy()
    return (jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))


def pool_sort(o, d, lo, inv):
    from rendertoy3c_tpu.accel.morton import morton3d

    oct_key = ((d[:, 0] >= 0).astype(jnp.uint32)
               + 2 * (d[:, 1] >= 0).astype(jnp.uint32)
               + 4 * (d[:, 2] >= 0).astype(jnp.uint32))
    om = morton3d((o - lo) * inv)
    key = (oct_key << jnp.uint32(27)) | (om >> jnp.uint32(3))
    order = jnp.argsort(key)
    return o[order], d[order], order


def marginal(fn, args, label, r):
    f = jax.jit(fn, static_argnums=(len(args),))
    ts = {}
    for reps in (LO, HI):
        float(f(*args, reps))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(*args, reps))
            best = min(best, time.perf_counter() - t0)
        ts[reps] = best
    dt = (ts[HI] - ts[LO]) / (HI - LO)
    print(f"{label}: {dt*1e3:8.2f} ms/call  {r/dt/1e6:7.2f} Mray/s",
          flush=True)
    return dt


def run_closest(tracer):
    def fn(o, d, reps):
        def body(i, acc):
            h = tracer(o + acc * 1e-7, d, 1e-3, 1e16, None, None)
            return acc + jnp.sum(h.t) * 1e-20
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
    return fn


def run_any(tracer):
    def fn(o, d, tmax, reps):
        def body(i, acc):
            occ = tracer(o + acc * 1e-7, d, 1e-3, tmax, None, None)
            return acc + jnp.sum(occ) * 1e-9
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
    return fn


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 49
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    n_side = 64 if side == 49 else 128
    scene = box_field(n_side)
    print(f"devices: {jax.devices()}  faces={scene.num_faces}  R={r}",
          flush=True)

    from rendertoy3c_tpu.accel.lbvh import morton_order_scene, split_order_scene
    from rendertoy3c_tpu.trace.hierwalk import HIER_LEAF, make_hierwalk_tracer
    from rendertoy3c_tpu.trace.pallas_mt import make_pallas_mt_tracer

    sc_h = split_order_scene(scene, leaf=HIER_LEAF)
    sc_m = morton_order_scene(scene)
    hc, ha = make_hierwalk_tracer(sc_h)
    mc, ma = make_pallas_mt_tracer(sc_m)

    g = scene.geom
    v0 = np.asarray(g.v0[0][: scene.num_faces])
    lo, hi = v0.min(axis=0), v0.max(axis=0)
    inv = 1.0 / np.maximum(hi - lo, 1e-6)

    # --- build wavefronts ---
    rng = np.random.default_rng(7)
    o_p, d_p = camera_rays(r)

    h = jax.jit(lambda o, d: hc(o, d, 1e-3, 1e16, None, None))(o_p, d_p)
    hp = np.asarray(o_p + h.t[:, None] * d_p)
    hit_mask = np.asarray(h.prim) >= 0
    # bounce: cosine hemisphere around up (close enough for cost purposes)
    z = rng.uniform(size=(r,)).astype(np.float32)
    phi = rng.uniform(0, 2 * np.pi, size=(r,)).astype(np.float32)
    sq = np.sqrt(1 - z)
    d_b = np.stack([sq * np.cos(phi), np.sqrt(z), sq * np.sin(phi)], axis=1)
    o_b = np.where(hit_mask[:, None], hp, rng.uniform(lo, hi, (r, 3)))
    o_b = o_b.astype(np.float32) + 1e-3 * d_b
    o_bs, d_bs, _ = pool_sort(jnp.asarray(o_b), jnp.asarray(d_b),
                              jnp.asarray(lo), jnp.asarray(inv))

    # shadow: hit points -> random point on the y=25 lamp quad
    lp = np.stack([rng.uniform(-6, 6, r), np.full(r, 25.0),
                   rng.uniform(-6, 6, r)], axis=1).astype(np.float32)
    dv = lp - o_b
    dist = np.linalg.norm(dv, axis=1, keepdims=True)
    d_s = (dv / np.maximum(dist, 1e-6)).astype(np.float32)
    o_ss, d_ss, order = pool_sort(jnp.asarray(o_b), jnp.asarray(d_s),
                                  jnp.asarray(lo), jnp.asarray(inv))
    tmax_s = jnp.asarray(dist[:, 0], jnp.float32)[order] - 0.01

    # incoherent: random
    o_i = jnp.asarray(rng.uniform(lo, hi, (r, 3)), jnp.float32)
    di = rng.normal(size=(r, 3)).astype(np.float32)
    di /= np.linalg.norm(di, axis=1, keepdims=True)
    d_i = jnp.asarray(di)

    for name, (oo, dd) in [("primary", (o_p, d_p)), ("bounce", (o_bs, d_bs)),
                           ("incoh  ", (o_i, d_i))]:
        marginal(run_closest(hc), (oo, dd), f"  hier closest {name}", r)
        marginal(run_closest(mc), (oo, dd), f"  mtcl closest {name}", r)
    marginal(run_any(ha), (o_ss, d_ss, tmax_s), "  hier any     shadow ", r)
    marginal(run_any(ma), (o_ss, d_ss, tmax_s), "  mtcl any     shadow ", r)


if __name__ == "__main__":
    main()
