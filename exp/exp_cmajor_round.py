"""C-major walk round vs the current lanes-major round: marginal us/round.

Hypothesis from the walkpool profile (49k field, W=8192, K=16): 45% of the
subframe is per-op launch gap and a further chunk is lane-padding traffic —
[W, 8] rays and [W, 16] ents physically pad to [W, 128] (8-16x traffic on
every select), while [k, W] sublane-major arrays tile dense. This times a
fori-budgeted CLOSEST walk round in both layouts on the 49k box field:

  base    hierwalk._walk body as-is (state [W, k] lanes-minor)
  cmajor  gathered rows transposed once per round ([128, W]); ALL state
          held as [W] columns / [k, W] stacks; identical arithmetic

Usage: python exp/exp_cmajor_round.py [faces_side=64] [W=8192]
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

    o, d = incoherent_rays(scene, w)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    tmin = jnp.full((w,), 1e-3)
    tmax = jnp.full((w,), 1e16)
    bounds = tuple(tab.level_starts[1:]) + (tab.leaf_start,)
    cap = hw.HIER_LEAF
    FAN = hw.FANOUT

    # ---------------- baseline: lanes-major round (hierwalk body) --------
    def base_walk(budget):
        lane16 = jax.lax.iota(jnp.int32, FAN)[None, :]

        @jax.jit
        def run(o, d):
            inv = hw._safe_inv(d)
            tmin_c = tmin[:, None]
            state = dict(
                cur=jnp.zeros((w,), jnp.int32),
                best_t=tmax,
                best_prim=jnp.full((w,), -1, jnp.int32),
                best_u=jnp.zeros((w,), jnp.float32),
                best_v=jnp.zeros((w,), jnp.float32),
                ents=[jnp.full((w, FAN), jnp.float32(hw._BIG))
                      for _ in range(n_levels)],
                bases=[jnp.zeros((w,), jnp.int32) for _ in range(n_levels)],
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
                lane = jax.lax.iota(jnp.int32, cap)[None, :]
                at_min = tt <= t_leaf[:, None]
                lane_sel = jnp.min(jnp.where(at_min, lane, cap), axis=1)
                one = at_min & (lane == lane_sel[:, None])
                better = t_leaf < s["best_t"]
                best_t = jnp.where(better, t_leaf, s["best_t"])
                best_prim = jnp.where(
                    better, first.astype(jnp.int32) + lane_sel,
                    s["best_prim"])
                best_u = jnp.where(
                    better, jnp.sum(jnp.where(one, u, 0.0), axis=1),
                    s["best_u"])
                best_v = jnp.where(
                    better, jnp.sum(jnp.where(one, v, 0.0), axis=1),
                    s["best_v"])
                ent = hw._dir_entries(rows, o, inv, tmin_c,
                                      hw._prune_cut(best_t)[:, None])
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
                cut = hw._prune_cut(best_t)[:, None]
                for lv in reversed(range(n_levels)):
                    e = ents[lv]
                    alive = e < cut
                    ee = jnp.where(alive, e, jnp.float32(hw._BIG))
                    e_min = jnp.min(ee, axis=1)
                    has = (e_min < hw._BIG) & valid & (nxt < 0)
                    at_min2 = ee <= e_min[:, None]
                    j = jnp.min(jnp.where(at_min2, lane16, FAN), axis=1)
                    nxt = jnp.where(has, bases[lv] + j, nxt)
                    taken = has[:, None] & (lane16 == j[:, None])
                    ents[lv] = jnp.where(taken, jnp.float32(hw._BIG),
                                         ents[lv])
                return dict(cur=jnp.where(valid, nxt, cur), best_t=best_t,
                            best_prim=best_prim, best_u=best_u,
                            best_v=best_v, ents=ents, bases=bases)

            s = jax.lax.fori_loop(0, budget, body, state)
            return s["best_t"], s["best_prim"]

        return run

    # ---------------- cmajor: transposed rows + column state -------------
    tabT = jnp.asarray(np.asarray(tab.table))  # same table; transpose/round

    def cmajor_walk(budget):
        lane16s = jax.lax.iota(jnp.int32, FAN)[:, None]
        lane_cap = jax.lax.iota(jnp.int32, cap)[:, None]

        @jax.jit
        def run(o, d):
            ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
            dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
            inv = hw._safe_inv(d)
            ix, iy, iz = inv[:, 0], inv[:, 1], inv[:, 2]
            state = dict(
                cur=jnp.zeros((w,), jnp.int32),
                best_t=tmax,
                best_prim=jnp.full((w,), -1, jnp.int32),
                best_u=jnp.zeros((w,), jnp.float32),
                best_v=jnp.zeros((w,), jnp.float32),
                ents=[jnp.full((FAN, w), jnp.float32(hw._BIG))
                      for _ in range(n_levels)],
                bases=[jnp.zeros((w,), jnp.int32) for _ in range(n_levels)],
            )

            def body(i, s):
                cur = s["cur"]
                valid = cur >= 0
                rT = jnp.take(tabT, jnp.maximum(cur, 0), axis=0).T  # [128,W]
                is_leaf = rT[hw._L_TYPE] > 0.5
                first = rT[hw._L_FIRST]

                # leaf MT, [cap, W]
                tri = rT[:9 * cap].reshape(9, cap, w)
                v0x, v0y, v0z = tri[0], tri[1], tri[2]
                e1x, e1y, e1z = tri[3], tri[4], tri[5]
                e2x, e2y, e2z = tri[6], tri[7], tri[8]
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = jnp.where(jnp.abs(det) > hw._DET_EPS,
                                    1.0 / det, 0.0)
                tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
                u = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                v = (dx * qx + dy * qy + dz * qz) * inv_det
                t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                hit = ((jnp.abs(det) > hw._DET_EPS)
                       & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                       & (t > tmin) & (t < s["best_t"]))
                hit = hit & (is_leaf & valid)[None, :]
                tt = jnp.where(hit, t, jnp.float32(hw._BIG))
                t_leaf = jnp.min(tt, axis=0)
                at_min = tt <= t_leaf[None, :]
                lane_sel = jnp.min(jnp.where(at_min, lane_cap, cap), axis=0)
                one = at_min & (lane_cap == lane_sel[None, :])
                better = t_leaf < s["best_t"]
                best_t = jnp.where(better, t_leaf, s["best_t"])
                best_prim = jnp.where(
                    better, first.astype(jnp.int32) + lane_sel,
                    s["best_prim"])
                best_u = jnp.where(
                    better, jnp.sum(jnp.where(one, u, 0.0), axis=0),
                    s["best_u"])
                best_v = jnp.where(
                    better, jnp.sum(jnp.where(one, v, 0.0), axis=0),
                    s["best_v"])

                # slab entries, [FAN, W]
                cut = hw._prune_cut(best_t)[None, :]
                tn = jnp.full((FAN, w), -jnp.float32(hw._BIG))
                tf = jnp.full((FAN, w), jnp.float32(hw._BIG))
                for (oc, ic, c) in ((ox, ix, 0), (oy, iy, 1), (oz, iz, 2)):
                    lo = rT[c * FAN:(c + 1) * FAN]
                    hi = rT[(c + 3) * FAN:(c + 4) * FAN]
                    t0 = (lo - oc[None, :]) * ic[None, :]
                    t1 = (hi - oc[None, :]) * ic[None, :]
                    tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                    tf = jnp.minimum(tf, jnp.maximum(t0, t1))
                ok = (tn <= tf) & (tf > tmin[None, :]) & (tn < cut)
                ent = jnp.where(ok, jnp.maximum(tn, tmin[None, :]),
                                jnp.float32(hw._BIG))

                is_dir = valid & ~is_leaf
                ents = list(s["ents"])
                bases = list(s["bases"])
                for lv in range(n_levels):
                    at_lv = (is_dir & (cur >= tab.level_starts[lv])
                             & (cur < bounds[lv]))
                    ents[lv] = jnp.where(at_lv[None, :], ent, ents[lv])
                    bases[lv] = jnp.where(at_lv, first.astype(jnp.int32),
                                          bases[lv])
                nxt = jnp.full((w,), -1, jnp.int32)
                for lv in reversed(range(n_levels)):
                    e = ents[lv]
                    alive = e < cut
                    ee = jnp.where(alive, e, jnp.float32(hw._BIG))
                    e_min = jnp.min(ee, axis=0)
                    has = (e_min < hw._BIG) & valid & (nxt < 0)
                    at_min2 = ee <= e_min[None, :]
                    j = jnp.min(jnp.where(at_min2, lane16s, FAN), axis=0)
                    nxt = jnp.where(has, bases[lv] + j, nxt)
                    taken = has[None, :] & (lane16s == j[None, :])
                    ents[lv] = jnp.where(taken, jnp.float32(hw._BIG),
                                         ents[lv])
                return dict(cur=jnp.where(valid, nxt, cur), best_t=best_t,
                            best_prim=best_prim, best_u=best_u,
                            best_v=best_v, ents=ents, bases=bases)

            s = jax.lax.fori_loop(0, budget, body, state)
            return s["best_t"], s["best_prim"]

        return run

    def marginal(make, label):
        ts = {}
        for reps in (LO, HI):
            run = make(reps)
            r0 = run(o, d)
            jax.block_until_ready(r0)
            best = 1e9
            for _ in range(4):
                t0 = time.perf_counter()
                out = run(o, d)
                float(jnp.sum(out[0]))
                best = min(best, time.perf_counter() - t0)
            ts[reps] = best
        dt = (ts[HI] - ts[LO]) / (HI - LO)
        print(f"{label}: {dt*1e6:8.1f} us/round  "
              f"(T{LO}={ts[LO]*1e3:.1f}ms T{HI}={ts[HI]*1e3:.1f}ms)",
              flush=True)
        return ts

    # correctness cross-check at full budget
    rb = base_walk(200)(o, d)
    rc = cmajor_walk(200)(o, d)
    nb = int(jnp.sum(rb[1] >= 0))
    nc = int(jnp.sum(rc[1] >= 0))
    same = int(jnp.sum(rb[1] == rc[1]))
    print(f"hits base={nb} cmajor={nc} same_prim={same}/{w}", flush=True)

    marginal(base_walk, "base  ")
    marginal(cmajor_walk, "cmajor")


if __name__ == "__main__":
    main()
