"""Traversal statistics simulation (CPU): visited-leaf distributions.

For the 49k box-field bounce wavefront: per-ray visited leaf counts under a
nearest-first walk with closest pruning (= leaves with entry <= t_hit), for
several leaf sizes; plus block-union redundancy for candidate block sizes.
Informs the round count K, LEAF, and expected traffic of a fixed-round
gather walk, without touching the TPU.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from exp_trav import build_big_scene, make_wavefronts

R = 32768
BIG = 1e30


def true_hits(scene, o, d):
    """Reference closest-hit t via the jnp brute tracer, chunked."""
    from rendertoy3c_tpu.trace.intersect import make_bruteforce_tracer

    closest, _ = make_bruteforce_tracer(scene)
    ts = []
    for s in range(0, o.shape[0], 4096):
        h = closest(jnp.asarray(o[s:s + 4096]), jnp.asarray(d[s:s + 4096]),
                    1e-3, 1e4, 0.0)
        ts.append(np.asarray(h.t))
    return np.concatenate(ts)


def leaf_aabbs(scene, leaf):
    v0 = np.asarray(scene.geom.v0[0])[: scene.num_faces]
    e1 = np.asarray(scene.geom.e1[0])[: scene.num_faces]
    e2 = np.asarray(scene.geom.e2[0])[: scene.num_faces]
    f = v0.shape[0]
    n_l = -(-f // leaf)
    pts = np.stack([v0, v0 + e1, v0 + e2], 1)  # [F,3,3]
    lo = np.full((n_l * leaf, 3), BIG, np.float32)
    hi = np.full((n_l * leaf, 3), -BIG, np.float32)
    lo[:f] = pts.min(1)
    hi[:f] = pts.max(1)
    return (lo.reshape(n_l, leaf, 3).min(1), hi.reshape(n_l, leaf, 3).max(1))


def entries(o, d, lo, hi):
    """[R, L] slab entry distances (BIG on miss). Chunked numpy."""
    inv = np.where(np.abs(d) > 1e-20, 1.0 / d, BIG).astype(np.float32)
    out = np.empty((o.shape[0], lo.shape[0]), np.float32)
    for s in range(0, o.shape[0], 4096):
        oc = o[s:s + 4096, None, :]
        ic = inv[s:s + 4096, None, :]
        t0 = (lo[None] - oc) * ic
        t1 = (hi[None] - oc) * ic
        tn = np.minimum(t0, t1).max(-1)
        tf = np.maximum(t0, t1).min(-1)
        ok = (tn <= tf) & (tf > 1e-3)
        out[s:s + 4096] = np.where(ok, np.maximum(tn, 1e-3), BIG)
    return out


def main():
    scene = build_big_scene()
    waves = make_wavefronts(scene)
    o, d = waves["bounce_sorted"]
    print("computing true hit t (brute, cpu)...", flush=True)
    t_hit = true_hits(scene, o, d)
    print(f"hit fraction: {(t_hit < 1e4).mean():.3f}", flush=True)

    for leaf in (32, 64, 128, 256):
        lo, hi = leaf_aabbs(scene, leaf)
        ent = entries(o, d, lo, hi)
        visited = ent <= (t_hit[:, None] + 1e-4)  # walk visits these
        per_ray = visited.sum(1)
        overlap = (ent < BIG).sum(1)  # no-pruning candidate count
        print(f"LEAF={leaf:4d} L={lo.shape[0]:5d} | visited/ray "
              f"mean={per_ray.mean():6.2f} p50={np.percentile(per_ray, 50):4.0f} "
              f"p90={np.percentile(per_ray, 90):4.0f} "
              f"p99={np.percentile(per_ray, 99):4.0f} "
              f"max={per_ray.max():4d} | overlap mean={overlap.mean():6.2f} "
              f"p99={np.percentile(overlap, 99):5.0f}", flush=True)
        # block-union redundancy (rays sorted as the pool sorts them)
        for g in (8, 32, 256):
            u = visited.reshape(-1, g, lo.shape[0]).any(1).sum(1)  # [R/g]
            tris_per_ray = u.mean() * leaf  # tested tris per ray in block mode
            print(f"    block={g:4d}: union mean={u.mean():7.2f} leaves "
                  f"-> {tris_per_ray:8.0f} tris tested/ray "
                  f"(ideal {per_ray.mean() * leaf:6.0f})", flush=True)


if __name__ == "__main__":
    main()
