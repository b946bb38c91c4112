"""Marginal cost of pipelined-pool add-ons inside the walk round.

Motivation: the walk round is gather-floor-bound (~26 us live at W=8192,
exp_colparts) and lane utilization is ~50% (lanes whose walk finished idle
until the next phase boundary). A pipelined pool (P=2 paths per lane, one
walk scratch; a finishing walk stashes its result and immediately launches
the sibling path's pending ray) would lift utilization toward 1 — IF the
per-round stash+relaunch ops are cheap. This measures them in an
ALWAYS-LIVE regime: finished lanes restart the same walk (best_t reset),
so every variant does identical gather work forever.

  base       hierwalk round + restart-on-finish
  relaunch2d base + per-round [W,8] select of a replacement ray (the 2-D
             layout cost CLAUDE.md warns about)
  relaunch1d ray state as 8 x [W] columns; per-round 1-D selects
  pipe2      relaunch1d + full P=2 add-on: 5-col hit stash to the owning
             path, wslot bookkeeping, pending-ray pick + launch

Usage: python exp/exp_pipecost.py [faces_side=64] [W=8192]
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

    def walk_core(s, o3, d3, inv3, tmin1):
        """One hierwalk round (lanes-major rows); returns updates + nxt."""
        cur = s["cur"]
        valid = cur >= 0
        rows = jnp.take(tab.table, jnp.maximum(cur, 0), axis=0)
        is_leaf = rows[:, hw._L_TYPE] > 0.5
        first = rows[:, hw._L_FIRST]
        t, u, v, hit = hw._leaf_mt(rows, o3, d3, tmin1[:, None],
                                   s["best_t"][:, None])
        hit = hit & (is_leaf & valid)[:, None]
        tt = jnp.where(hit, t, jnp.float32(hw._BIG))
        t_leaf = jnp.min(tt, axis=1)
        better = t_leaf < s["best_t"]
        best_t = jnp.where(better, t_leaf, s["best_t"])
        lane = jax.lax.iota(jnp.int32, cap)[None, :]
        at_min = tt <= t_leaf[:, None]
        lane_sel = jnp.min(jnp.where(at_min, lane, cap), axis=1)
        best_prim = jnp.where(better, first.astype(jnp.int32) + lane_sel,
                              s["best_prim"])
        cut = hw._prune_cut(best_t)[:, None]
        ent = hw._dir_entries(rows, o3, inv3, tmin1[:, None], cut)
        is_dir = valid & ~is_leaf
        ents = list(s["ents"])
        bases = list(s["bases"])
        for lv in range(n_levels):
            at_lv = (is_dir & (cur >= tab.level_starts[lv])
                     & (cur < bounds[lv]))
            ents[lv] = jnp.where(at_lv[:, None], ent, ents[lv])
            bases[lv] = jnp.where(at_lv, first.astype(jnp.int32), bases[lv])
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
            ents[lv] = jnp.where(taken, jnp.float32(hw._BIG), ents[lv])
        return dict(best_t=best_t, best_prim=best_prim, ents=ents,
                    bases=bases), nxt, valid

    def base_state():
        return dict(
            cur=jnp.zeros((w,), jnp.int32),
            best_t=tmax,
            best_prim=jnp.full((w,), -1, jnp.int32),
            ents=[jnp.full((w, FAN), jnp.float32(hw._BIG))
                  for _ in range(n_levels)],
            bases=[jnp.zeros((w,), jnp.int32) for _ in range(n_levels)],
        )

    # ---------------- base + restart -------------------------------------
    def base_walk(budget):
        @jax.jit
        def run(o, d):
            inv = hw._safe_inv(d)

            def body(i, s):
                upd, nxt, valid = walk_core(s, o, d, inv, tmin)
                fin = valid & (nxt < 0)
                out = dict(s, **upd)
                out["cur"] = jnp.where(fin, 0, nxt)
                out["best_t"] = jnp.where(fin, tmax, upd["best_t"])
                return out

            s = jax.lax.fori_loop(0, budget, body, base_state())
            return s["best_t"], s["best_prim"]
        return run

    # ---------------- base + per-round [W,8] ray select -------------------
    def relaunch2d_walk(budget):
        @jax.jit
        def run(o, d):
            rays0 = jnp.concatenate(
                [o, d, tmin[:, None], tmax[:, None]], axis=1)
            alt = jnp.concatenate(
                [o + 0.01, d, tmin[:, None], tmax[:, None]], axis=1)

            def body(i, s):
                rays = s["rays"]
                o3, d3 = rays[:, 0:3], rays[:, 3:6]
                inv3 = hw._safe_inv(d3)
                upd, nxt, valid = walk_core(s, o3, d3, inv3, rays[:, 6])
                fin = valid & (nxt < 0)
                out = dict(s, **upd)
                out["rays"] = jnp.where(fin[:, None], alt, rays)
                out["cur"] = jnp.where(fin, 0, nxt)
                out["best_t"] = jnp.where(fin, tmax, upd["best_t"])
                return out

            s = jax.lax.fori_loop(0, budget, body,
                                  dict(base_state(), rays=rays0))
            return s["best_t"], s["best_prim"]
        return run

    # ---------------- 1-D ray columns + per-round relaunch ----------------
    def relaunch1d_walk(budget):
        @jax.jit
        def run(o, d):
            cols0 = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]]
            alt = [o[:, 0] + 0.01, o[:, 1], o[:, 2],
                   d[:, 0], d[:, 1], d[:, 2]]

            def body(i, s):
                rc = s["rc"]
                o3 = jnp.stack(rc[0:3], axis=1)
                d3 = jnp.stack(rc[3:6], axis=1)
                inv3 = hw._safe_inv(d3)
                upd, nxt, valid = walk_core(s, o3, d3, inv3, tmin)
                fin = valid & (nxt < 0)
                out = dict(s, **upd)
                out["rc"] = [jnp.where(fin, a, c) for a, c in zip(alt, rc)]
                out["cur"] = jnp.where(fin, 0, nxt)
                out["best_t"] = jnp.where(fin, tmax, upd["best_t"])
                return out

            s = jax.lax.fori_loop(0, budget, body,
                                  dict(base_state(), rc=cols0))
            return s["best_t"], s["best_prim"]
        return run

    # ---------------- full P=2 pipelined add-on ---------------------------
    def pipe2_walk(budget):
        @jax.jit
        def run(o, d):
            cols0 = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]]
            pray = [c + 0.02 for c in cols0]  # path B's pending ray

            def body(i, s):
                rc = s["rc"]
                o3 = jnp.stack(rc[0:3], axis=1)
                d3 = jnp.stack(rc[3:6], axis=1)
                inv3 = hw._safe_inv(d3)
                upd, nxt, valid = walk_core(s, o3, d3, inv3, tmin)
                fin = valid & (nxt < 0)
                # stash the finished walk's result into the owning path's
                # columns (P=2: one select per column per path)
                wslot = s["wslot"]
                fA = fin & (wslot == 0)
                fB = fin & (wslot == 1)
                hitA = [jnp.where(fA, x, y) for x, y in
                        zip((upd["best_t"],
                             upd["best_prim"].astype(jnp.float32)),
                            s["hitA"])]
                hitB = [jnp.where(fB, x, y) for x, y in
                        zip((upd["best_t"],
                             upd["best_prim"].astype(jnp.float32)),
                            s["hitB"])]
                # pending pick: B if it has a ready ray, else park
                readyB = s["readyB"] & fin
                rc2 = [jnp.where(readyB, p, c) for p, c in zip(s["prayB"],
                                                               rc)]
                wslot = jnp.where(readyB, 1, jnp.where(fin, wslot, wslot))
                readyB_n = s["readyB"] & ~readyB
                out = dict(s, **upd)
                out.update(rc=rc2, wslot=wslot, readyB=readyB_n,
                           hitA=hitA, hitB=hitB)
                out["cur"] = jnp.where(fin, 0, nxt)
                out["best_t"] = jnp.where(fin, tmax, upd["best_t"])
                return out

            s = jax.lax.fori_loop(
                0, budget, body,
                dict(base_state(), rc=cols0,
                     wslot=jnp.zeros((w,), jnp.int32),
                     readyB=jnp.ones((w,), bool),
                     prayB=pray,
                     hitA=[tmax, jnp.zeros((w,), jnp.float32)],
                     hitB=[tmax, jnp.zeros((w,), jnp.float32)]))
            return s["best_t"], s["best_prim"]
        return run

    def marginal(make, label):
        ts = {}
        for reps in (LO, HI):
            run = make(reps)
            jax.block_until_ready(run(o, d))
            best = 1e9
            for _ in range(4):
                t0 = time.perf_counter()
                out = run(o, d)
                jax.block_until_ready(out)
                best = min(best, time.perf_counter() - t0)
            ts[reps] = best
        dt = (ts[HI] - ts[LO]) / (HI - LO)
        print(f"{label}: {dt*1e6:8.1f} us/round  "
              f"(T{LO}={ts[LO]*1e3:.2f}ms T{HI}={ts[HI]*1e3:.2f}ms)",
              flush=True)

    marginal(base_walk, "base      ")
    marginal(relaunch2d_walk, "relaunch2d")
    marginal(relaunch1d_walk, "relaunch1d")
    marginal(pipe2_walk, "pipe2     ")


if __name__ == "__main__":
    main()
