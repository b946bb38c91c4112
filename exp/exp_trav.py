"""Traversal experiments on the 49k-box-field scene (real TPU).

Measures tracer-only Mray/s for each traversal backend on wavefront shapes:
primary (coherent), sorted-bounce (pool-realistic incoherent), shadow-like.
On-device fori_loop repetition per CLAUDE.md; ONE jit per tracer (waves are
just different input arrays).

Run: python exp/exp_trav.py [backends...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

_cache = os.path.expanduser("~/.cache/rendertoy3c_jax")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPS = 20
R = 32768


def build_big_scene():
    from rendertoy3c_tpu.scene.builtin import box_mesh, quad
    from rendertoy3c_tpu.scene.material import Material
    from rendertoy3c_tpu.scene.mesh import Mesh
    from rendertoy3c_tpu.scene.scene import build_scene
    from rendertoy3c_tpu.accel.lbvh import split_order_scene

    rng = np.random.default_rng(0)
    v_all, f_all = [], []
    off = 0
    white = Material(diffuse=(0.7, 0.7, 0.7))
    for gx in range(64):
        for gz in range(64):
            m = box_mesh([gx - 32, 0, gz - 32],
                         [gx - 31.2, rng.uniform(0.3, 2.0), gz - 31.2], white)
            v_all.append(m.vertices[0])
            f_all.append(m.indices + off)
            off += m.vertices.shape[1]
    bigm = Mesh(vertices=np.concatenate(v_all)[None],
                indices=np.concatenate(f_all), material=white)
    lv, lf = quad([-6, 25, -6], [-6, 25, 6], [6, 25, 6], [6, 25, -6])
    lampm = Mesh(vertices=lv[None], indices=lf,
                 material=Material(emissive=(40.0, 40.0, 40.0)))
    return split_order_scene(build_scene([bigm, lampm]))


def make_wavefronts(scene):
    """primary / bounce(sorted) / shadow(sorted) wavefronts, numpy."""
    from rendertoy3c_tpu.scene.camera import Camera
    from rendertoy3c_tpu.accel.morton import morton3d

    rng = np.random.default_rng(1)
    cam = Camera(eye=(0, 20, 45), lookat=(0, 0, 0), fov_y=50.0)
    cam.aspect_ratio = 1.0
    p = cam.params()
    U, V, W = np.asarray(p.u), np.asarray(p.v), np.asarray(p.w)
    eye = np.asarray(p.eye)
    n_side = 181
    px, py = np.meshgrid(np.arange(n_side), np.arange(n_side))
    sx = (px.ravel() + 0.5) / 768 * 2 - 1
    sy = (py.ravel() + 0.5) / 768 * 2 - 1
    d = sx[:, None] * U + sy[:, None] * V + W
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    n_p = n_side * n_side
    prim_o = np.broadcast_to(eye, (n_p, 3)).copy()
    prim_o = np.concatenate([prim_o, prim_o[: R - n_p]], axis=0)
    prim_d = np.concatenate([d, d[: R - n_p]], axis=0)

    v0 = np.asarray(scene.geom.v0[0])
    e1 = np.asarray(scene.geom.e1[0])
    e2 = np.asarray(scene.geom.e2[0])
    f = scene.num_faces
    fi = rng.integers(0, f, R)
    b1 = rng.random(R)
    b2 = rng.random(R)
    sw = b1 + b2 > 1
    b1[sw] = 1 - b1[sw]
    b2[sw] = 1 - b2[sw]
    org = v0[fi] + b1[:, None] * e1[fi] + b2[:, None] * e2[fi]
    n = np.cross(e1[fi], e2[fi])
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-20)
    r1, r2 = rng.random(R), rng.random(R)
    st = np.sqrt(r1)
    local = np.stack([st * np.cos(2 * np.pi * r2), st * np.sin(2 * np.pi * r2),
                      np.sqrt(1 - r1)], axis=1)
    up = np.where(np.abs(n[:, 1:2]) < 0.9, [0, 1, 0], [1, 0, 0])
    t1 = np.cross(up, n)
    t1 /= np.maximum(np.linalg.norm(t1, axis=1, keepdims=True), 1e-20)
    t2 = np.cross(n, t1)
    bd = local[:, 0:1] * t1 + local[:, 1:2] * t2 + local[:, 2:3] * n
    borg = org + 1e-3 * n

    def sort_like_pool(o, dd):
        lo = np.array([v0.min(0), (v0 + e1).min(0), (v0 + e2).min(0)]).min(0)
        hi = np.array([v0.max(0), (v0 + e1).max(0), (v0 + e2).max(0)]).max(0)
        octk = ((dd[:, 0] >= 0).astype(np.uint32)
                + 2 * (dd[:, 1] >= 0).astype(np.uint32)
                + 4 * (dd[:, 2] >= 0).astype(np.uint32))
        om = np.asarray(morton3d(jnp.asarray(
            (o - lo) / np.maximum(hi - lo, 1e-6), jnp.float32)))
        key = (octk.astype(np.uint64) << np.uint64(27)) | \
            (om.astype(np.uint64) >> np.uint64(3))
        order = np.argsort(key, kind="stable")
        return o[order], dd[order]

    b_o, b_d = sort_like_pool(borg, bd)
    lamp = np.array([0, 25, 0]) + np.stack(
        [rng.uniform(-6, 6, R), np.zeros(R), rng.uniform(-6, 6, R)], axis=1)
    sd = lamp - borg
    sd /= np.linalg.norm(sd, axis=1, keepdims=True)
    s_o, s_d = sort_like_pool(borg, sd)

    return {
        "primary": (prim_o.astype(np.float32), prim_d.astype(np.float32)),
        "bounce_sorted": (b_o.astype(np.float32), b_d.astype(np.float32)),
        "shadow_sorted": (s_o.astype(np.float32), s_d.astype(np.float32)),
    }


def make_run(fn, reps=REPS):
    """fn(o, d) -> Hit or bool array; returns jitted chained-reps runner."""

    @jax.jit
    def run(o, d):
        def body(i, acc):
            h = fn(o + acc * 1e-30, d)
            lead = h.t if hasattr(h, "t") else h.astype(jnp.float32)
            return acc + jnp.sum(lead) * 1e-30

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    return run


def time_run(name, run, o, d, reps=REPS):
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    t0 = time.perf_counter()
    run(o, d).block_until_ready()
    print(f"    (warm {time.perf_counter() - t0:.1f}s)", flush=True)
    t0 = time.perf_counter()
    run(o, d).block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    mrays = o.shape[0] / dt / 1e6
    print(f"  {name:28s} {dt * 1e3:8.3f} ms  {mrays:8.2f} Mray/s", flush=True)
    return mrays


def main():
    which = sys.argv[1:] or ["leafwalk", "pallas_mt"]
    scene = build_big_scene()
    print(f"scene: {scene.num_faces} faces", flush=True)
    waves = make_wavefronts(scene)

    runs = {}
    if "leafwalk" in which:
        from rendertoy3c_tpu.trace.leafwalk import make_leafwalk_tracer

        lw_c, lw_a = make_leafwalk_tracer(scene)
        runs["leafwalk_closest"] = make_run(
            lambda o, d: lw_c(o, d, 1e-3, 1e4, 0.0))
        runs["leafwalk_any"] = make_run(
            lambda o, d: lw_a(o, d, 1e-3, 30.0, 0.0))
    if "pallas_mt" in which:
        from rendertoy3c_tpu.trace.pallas_mt import make_pallas_mt_tracer

        mt_c, mt_a = make_pallas_mt_tracer(scene)
        runs["pallas_mt_closest"] = make_run(
            lambda o, d: mt_c(o, d, 1e-3, 1e4, 0.0))
        runs["pallas_mt_any"] = make_run(
            lambda o, d: mt_a(o, d, 1e-3, 30.0, 0.0))
    for spec in which:
        if not spec.startswith("walk"):
            continue
        # walk:rt,leaf e.g. walk:32,128
        rt, leaf = (int(x) for x in spec.split(":")[1].split(","))
        from rendertoy3c_tpu.trace.pallas_walk import make_walk_tracer

        w_c, w_a = make_walk_tracer(scene, rt=rt, leaf=leaf)
        runs[f"{spec}_closest"] = make_run(
            lambda o, d, c=w_c: c(o, d, 1e-3, 1e4, 0.0))
        runs[f"{spec}_any"] = make_run(
            lambda o, d, a=w_a: a(o, d, 1e-3, 30.0, 0.0))

    for wname, (o, d) in waves.items():
        print(f"[{wname}]", flush=True)
        for rname, run in runs.items():
            time_run(rname, run, o, d)


if __name__ == "__main__":
    main()
