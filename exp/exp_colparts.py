"""Partial round-state columnization + the gather floor.

exp_cmajor_round showed FULL C-major (rows transposed per round) loses.
This isolates the pieces that don't need the row transpose:

  floor    gather-only round (take + 1 cheap reduce) — the irreducible
           row-fetch cost per round at this W
  base     hierwalk round as-is (rays [W,8], ents [W,16] lanes-minor)
  rayscol  rays as 8 separate [W] columns (o/d broadcasts from 1-D);
           rows/ents/MT unchanged
  entsT    rayscol + ents held [FAN, W] sublane-major (ent transposed
           once per round after the lanes-major slab test)

Usage: python exp/exp_colparts.py [faces_side=64] [W=8192]
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

from bench_tracers import box_field, incoherent_rays

LO, HI = 40, 120


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    scene = box_field(n_side)

    from rendertoy3c_tpu.accel.lbvh import split_order_scene
    from rendertoy3c_tpu.trace import hierwalk as hw

    sc = split_order_scene(scene, leaf=hw.HIER_LEAF)
    tab = hw.build_hier_table(sc.geom, sc.num_faces)
    n_levels = len(tab.level_starts)
    print(f"faces={sc.num_faces} W={w} levels={n_levels} "
          f"rows={tab.table.shape[0]}", flush=True)

    o_h, d_h = incoherent_rays(scene, w)
    o = jnp.asarray(o_h, jnp.float32)
    d = jnp.asarray(d_h, jnp.float32)
    tmin = jnp.full((w,), 1e-3)
    tmax = jnp.full((w,), 1e16)
    bounds = tuple(tab.level_starts[1:]) + (tab.leaf_start,)
    cap = hw.HIER_LEAF
    FAN = hw.FANOUT
    lane16 = jax.lax.iota(jnp.int32, FAN)[None, :]
    lane16s = jax.lax.iota(jnp.int32, FAN)[:, None]

    def common_state():
        return dict(
            cur=jnp.zeros((w,), jnp.int32),
            best_t=tmax,
            best_prim=jnp.full((w,), -1, jnp.int32),
            bases=[jnp.zeros((w,), jnp.int32) for _ in range(n_levels)],
        )

    # ---------------- floor: gather + cheap consume -----------------------
    def floor_walk(budget):
        @jax.jit
        def run(o, d):
            def body(i, s):
                rows = jnp.take(tab.table, s["cur"] & 2047, axis=0)
                m = jnp.max(rows, axis=1)
                return dict(cur=s["cur"] + m.astype(jnp.int32) + 1,
                            acc=s["acc"] + m)
            s = jax.lax.fori_loop(
                0, budget, body,
                dict(cur=jnp.arange(w, dtype=jnp.int32),
                     acc=jnp.zeros((w,), jnp.float32)))
            return s["acc"], s["cur"]
        return run

    # ---------------- base ------------------------------------------------
    def base_walk(budget):
        @jax.jit
        def run(o, d):
            inv = hw._safe_inv(d)
            tmin_c = tmin[:, None]
            state = dict(
                common_state(),
                ents=[jnp.full((w, FAN), jnp.float32(hw._BIG))
                      for _ in range(n_levels)],
            )

            def body(i, s):
                cur = s["cur"]
                valid = cur >= 0
                rows = jnp.take(tab.table, jnp.maximum(cur, 0), axis=0)
                is_leaf = rows[:, hw._L_TYPE] > 0.5
                first = rows[:, hw._L_FIRST]
                t, u, v, hit = hw._leaf_mt(rows, o, d, tmin_c,
                                           s["best_t"][:, None])
                hit = hit & (is_leaf & valid)[:, None]
                tt = jnp.where(hit, t, jnp.float32(hw._BIG))
                t_leaf = jnp.min(tt, axis=1)
                better = t_leaf < s["best_t"]
                best_t = jnp.where(better, t_leaf, s["best_t"])
                lane = jax.lax.iota(jnp.int32, cap)[None, :]
                at_min = tt <= t_leaf[:, None]
                lane_sel = jnp.min(jnp.where(at_min, lane, cap), axis=1)
                best_prim = jnp.where(
                    better, first.astype(jnp.int32) + lane_sel,
                    s["best_prim"])
                cut = hw._prune_cut(best_t)[:, None]
                ent = hw._dir_entries(rows, o, inv, tmin_c, cut)
                is_dir = valid & ~is_leaf
                ents = list(s["ents"])
                bases = list(s["bases"])
                for lv in range(n_levels):
                    at_lv = (is_dir & (cur >= tab.level_starts[lv])
                             & (cur < bounds[lv]))
                    ents[lv] = jnp.where(at_lv[:, None], ent, ents[lv])
                    bases[lv] = jnp.where(at_lv, first.astype(jnp.int32),
                                          bases[lv])
                nxt = jnp.full((w,), -1, jnp.int32)
                for lv in reversed(range(n_levels)):
                    e = ents[lv]
                    ee = jnp.where(e < cut, e, jnp.float32(hw._BIG))
                    e_min = jnp.min(ee, axis=1)
                    has = (e_min < hw._BIG) & valid & (nxt < 0)
                    at2 = ee <= e_min[:, None]
                    j = jnp.min(jnp.where(at2, lane16, FAN), axis=1)
                    nxt = jnp.where(has, bases[lv] + j, nxt)
                    taken = has[:, None] & (lane16 == j[:, None])
                    ents[lv] = jnp.where(taken, jnp.float32(hw._BIG),
                                         ents[lv])
                return dict(s, cur=jnp.where(valid, nxt, cur),
                            best_t=best_t, best_prim=best_prim,
                            ents=ents, bases=bases)

            s = jax.lax.fori_loop(0, budget, body, state)
            return s["best_t"], s["best_prim"]
        return run

    # ---------------- rayscol: 1-D ray columns ---------------------------
    def rayscol_walk(budget, ents_T=False):
        @jax.jit
        def run(o, d):
            ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
            dx1, dy1, dz1 = d[:, 0], d[:, 1], d[:, 2]
            inv = hw._safe_inv(d)
            ix, iy, iz = inv[:, 0], inv[:, 1], inv[:, 2]
            state = dict(
                common_state(),
                ents=[jnp.full((FAN, w) if ents_T else (w, FAN),
                               jnp.float32(hw._BIG))
                      for _ in range(n_levels)],
            )

            def body(i, s):
                cur = s["cur"]
                valid = cur >= 0
                rows = jnp.take(tab.table, jnp.maximum(cur, 0), axis=0)
                is_leaf = rows[:, hw._L_TYPE] > 0.5
                first = rows[:, hw._L_FIRST]

                # leaf MT with 1-D ray columns broadcast to [W, cap]
                tri = rows[:, :9 * cap].reshape(w, 9, cap)
                v0x, v0y, v0z = tri[:, 0], tri[:, 1], tri[:, 2]
                e1x, e1y, e1z = tri[:, 3], tri[:, 4], tri[:, 5]
                e2x, e2y, e2z = tri[:, 6], tri[:, 7], tri[:, 8]
                oxc, oyc, ozc = ox[:, None], oy[:, None], oz[:, None]
                dxc, dyc, dzc = dx1[:, None], dy1[:, None], dz1[:, None]
                px = dyc * e2z - dzc * e2y
                py = dzc * e2x - dxc * e2z
                pz = dxc * e2y - dyc * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = jnp.where(jnp.abs(det) > hw._DET_EPS,
                                    1.0 / det, 0.0)
                tx, ty, tz = oxc - v0x, oyc - v0y, ozc - v0z
                u = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                v = (dxc * qx + dyc * qy + dzc * qz) * inv_det
                t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                hit = ((jnp.abs(det) > hw._DET_EPS)
                       & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                       & (t > tmin[:, None])
                       & (t < s["best_t"][:, None]))
                hit = hit & (is_leaf & valid)[:, None]
                tt = jnp.where(hit, t, jnp.float32(hw._BIG))
                t_leaf = jnp.min(tt, axis=1)
                better = t_leaf < s["best_t"]
                best_t = jnp.where(better, t_leaf, s["best_t"])
                lane = jax.lax.iota(jnp.int32, cap)[None, :]
                at_min = tt <= t_leaf[:, None]
                lane_sel = jnp.min(jnp.where(at_min, lane, cap), axis=1)
                best_prim = jnp.where(
                    better, first.astype(jnp.int32) + lane_sel,
                    s["best_prim"])

                # slab (lanes-major from row slices, 1-D ray columns)
                cut1 = hw._prune_cut(best_t)
                tn = jnp.full((w, FAN), -jnp.float32(hw._BIG))
                tf = jnp.full((w, FAN), jnp.float32(hw._BIG))
                for (oc, ic, c) in ((ox, ix, 0), (oy, iy, 1), (oz, iz, 2)):
                    lo = rows[:, c * FAN:(c + 1) * FAN]
                    hi = rows[:, (c + 3) * FAN:(c + 4) * FAN]
                    t0 = (lo - oc[:, None]) * ic[:, None]
                    t1 = (hi - oc[:, None]) * ic[:, None]
                    tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                    tf = jnp.minimum(tf, jnp.maximum(t0, t1))
                ok = ((tn <= tf) & (tf > tmin[:, None])
                      & (tn < cut1[:, None]))
                ent = jnp.where(ok, jnp.maximum(tn, tmin[:, None]),
                                jnp.float32(hw._BIG))

                is_dir = valid & ~is_leaf
                ents = list(s["ents"])
                bases = list(s["bases"])
                if ents_T:
                    entT = jnp.transpose(ent, (1, 0))  # [FAN, W] once/round
                    for lv in range(n_levels):
                        at_lv = (is_dir & (cur >= tab.level_starts[lv])
                                 & (cur < bounds[lv]))
                        ents[lv] = jnp.where(at_lv[None, :], entT, ents[lv])
                        bases[lv] = jnp.where(
                            at_lv, first.astype(jnp.int32), bases[lv])
                    nxt = jnp.full((w,), -1, jnp.int32)
                    for lv in reversed(range(n_levels)):
                        e = ents[lv]
                        ee = jnp.where(e < cut1[None, :], e,
                                       jnp.float32(hw._BIG))
                        e_min = jnp.min(ee, axis=0)
                        has = (e_min < hw._BIG) & valid & (nxt < 0)
                        at2 = ee <= e_min[None, :]
                        j = jnp.min(jnp.where(at2, lane16s, FAN), axis=0)
                        nxt = jnp.where(has, bases[lv] + j, nxt)
                        taken = has[None, :] & (lane16s == j[None, :])
                        ents[lv] = jnp.where(taken, jnp.float32(hw._BIG),
                                             ents[lv])
                else:
                    for lv in range(n_levels):
                        at_lv = (is_dir & (cur >= tab.level_starts[lv])
                                 & (cur < bounds[lv]))
                        ents[lv] = jnp.where(at_lv[:, None], ent, ents[lv])
                        bases[lv] = jnp.where(
                            at_lv, first.astype(jnp.int32), bases[lv])
                    nxt = jnp.full((w,), -1, jnp.int32)
                    for lv in reversed(range(n_levels)):
                        e = ents[lv]
                        ee = jnp.where(e < cut1[:, None], e,
                                       jnp.float32(hw._BIG))
                        e_min = jnp.min(ee, axis=1)
                        has = (e_min < hw._BIG) & valid & (nxt < 0)
                        at2 = ee <= e_min[:, None]
                        j = jnp.min(jnp.where(at2, lane16, FAN), axis=1)
                        nxt = jnp.where(has, bases[lv] + j, nxt)
                        taken = has[:, None] & (lane16 == j[:, None])
                        ents[lv] = jnp.where(taken, jnp.float32(hw._BIG),
                                             ents[lv])
                return dict(s, cur=jnp.where(valid, nxt, cur),
                            best_t=best_t, best_prim=best_prim,
                            ents=ents, bases=bases)

            s = jax.lax.fori_loop(0, budget, body, state)
            return s["best_t"], s["best_prim"]
        return run

    def marginal(make, label, check_vs=None):
        ts = {}
        out_hi = None
        for reps in (LO, HI):
            run = make(reps)
            r0 = jax.block_until_ready(run(o, d))
            if reps == HI:
                out_hi = r0
            best = 1e9
            for _ in range(4):
                t0 = time.perf_counter()
                out = run(o, d)
                jax.block_until_ready(out)
                best = min(best, time.perf_counter() - t0)
            ts[reps] = best
        dt = (ts[HI] - ts[LO]) / (HI - LO)
        extra = ""
        if check_vs is not None:
            same = int(jnp.sum(check_vs[1] == out_hi[1]))
            extra = f"  same_prim={same}/{w}"
        print(f"{label}: {dt*1e6:8.1f} us/round{extra}", flush=True)
        return out_hi

    ref = marginal(base_walk, "base   ")
    marginal(floor_walk, "floor  ")
    marginal(lambda b: rayscol_walk(b, ents_T=False), "rayscol", ref)
    marginal(lambda b: rayscol_walk(b, ents_T=True), "entsT  ", ref)


if __name__ == "__main__":
    main()
