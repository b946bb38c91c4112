"""Tracer-only TPU bench: hierwalk vs leafwalk on large scenes.

Incoherent bounce-style wavefronts (random origins in the scene volume,
uniform sphere directions) and coherent camera wavefronts; closest + any.
Timing: REPS chained calls inside one jit (ray origins perturbed per rep so
nothing collapses), host-fetch to close the timing, marginal over reps.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from rendertoy3c_tpu.accel.lbvh import split_order_scene
from rendertoy3c_tpu.scene.builtin import box_mesh, quad
from rendertoy3c_tpu.scene.material import Material
from rendertoy3c_tpu.scene.mesh import Mesh
from rendertoy3c_tpu.scene.scene import build_scene

R = 32768
LO, HI = 4, 12


def box_field(n_side, seed=0):
    rng = np.random.default_rng(seed)
    white = Material(diffuse=(0.7, 0.7, 0.7))
    v_all, f_all, off = [], [], 0
    for gx in range(n_side):
        for gz in range(n_side):
            m = box_mesh([gx - n_side / 2, 0, gz - n_side / 2],
                         [gx - n_side / 2 + 0.8, rng.uniform(0.3, 2.0),
                          gz - n_side / 2 + 0.8], white)
            v_all.append(m.vertices[0])
            f_all.append(m.indices + off)
            off += m.vertices.shape[1]
    big = Mesh(vertices=np.concatenate(v_all)[None],
               indices=np.concatenate(f_all), material=white)
    lv, lf = quad([-6, 25, -6], [-6, 25, 6], [6, 25, 6], [6, 25, -6])
    lamp = Mesh(vertices=lv[None], indices=lf,
                material=Material(emissive=(40.0, 40.0, 40.0)))
    return build_scene([big, lamp])


def incoherent_rays(scene, n, seed=1):
    rng = np.random.default_rng(seed)
    g = scene.geom
    v0 = np.asarray(g.v0[0][: scene.num_faces])
    lo, hi = v0.min(axis=0), v0.max(axis=0)
    o = rng.uniform(lo, hi, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def marginal_rate(fn, o, d, label):
    """fn(o, d, reps) -> scalar; prints Mray/s from marginal cost/rep."""
    ts = {}
    for reps in (LO, HI):
        f = jax.jit(fn, static_argnums=(2,))
        float(f(o, d, reps))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(o, d, reps))
            best = min(best, time.perf_counter() - t0)
        ts[reps] = best
    dt = (ts[HI] - ts[LO]) / (HI - LO)
    print(f"{label}: {dt*1e3:8.2f} ms/call  {R/dt/1e6:7.2f} Mray/s",
          flush=True)
    return dt


def bench_scene(name, scene):
    from rendertoy3c_tpu.trace.hierwalk import HIER_LEAF, make_hierwalk_tracer
    from rendertoy3c_tpu.trace.leafwalk import make_leafwalk_tracer

    print(f"== {name}: {scene.num_faces} faces ==", flush=True)
    sc_h = split_order_scene(scene, leaf=HIER_LEAF)
    sc_l = split_order_scene(scene)
    hc, ha = make_hierwalk_tracer(sc_h)
    lc, la = make_leafwalk_tracer(sc_l)
    o, d = incoherent_rays(scene, R)

    def run_c(tracer):
        def fn(o, d, reps):
            def body(i, acc):
                oo = o + acc * 1e-7
                h = tracer(oo, d, 1e-3, 1e16, None, None)
                return acc + jnp.sum(h.t) * 1e-20
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return fn

    def run_a(tracer):
        def fn(o, d, reps):
            def body(i, acc):
                oo = o + acc * 1e-7
                occ = tracer(oo, d, 1e-3, 8.0, None, None)
                return acc + jnp.sum(occ) * 1e-9
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return fn

    marginal_rate(run_c(hc), o, d, "  hier closest incoh")
    marginal_rate(run_c(lc), o, d, "  leaf closest incoh")
    marginal_rate(run_a(ha), o, d, "  hier any     incoh")
    marginal_rate(run_a(la), o, d, "  leaf any     incoh")


def main():
    print("devices:", jax.devices(), flush=True)
    bench_scene("49k box field", box_field(64))
    bench_scene("197k box field", box_field(128))


if __name__ == "__main__":
    main()
