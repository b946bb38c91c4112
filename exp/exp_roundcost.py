"""Measure the hierwalk ROUND cost directly: fori-bounded walk at width W.

The walkpool premise: throughput ceiling = W / (mean_visits x round_cost).
This times a fixed-round-budget variant of the walk body (same gather +
leaf MT + slab + pop work per round, fori instead of while) at several
widths and budgets, so round cost = marginal ms/round.

Usage: python exp/exp_roundcost.py [faces_side=64] [W=16384]
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


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    scene = box_field(n_side)
    print(f"faces={scene.num_faces} W={w}", flush=True)

    from rendertoy3c_tpu.accel.lbvh import split_order_scene
    from rendertoy3c_tpu.trace import hierwalk as hw

    sc = split_order_scene(scene, leaf=hw.HIER_LEAF)
    tab = hw.build_hier_table(sc.geom, sc.num_faces)
    n_levels = len(tab.level_starts)
    print(f"levels={n_levels} leaf_start={tab.leaf_start} "
          f"rows={tab.table.shape[0]}", flush=True)

    o, d = incoherent_rays(scene, w)
    tmin = jnp.full((w,), 1e-3)
    tmax = jnp.full((w,), 1e16)

    # fori-budgeted walk: same body as hierwalk._walk, fixed B rounds
    def budget_walk(o, d, budget):
        inv = hw._safe_inv(d)
        tmin_c = tmin[:, None]
        lane16 = jax.lax.iota(jnp.int32, hw.FANOUT)[None, :]
        bounds = tuple(tab.level_starts[1:]) + (tab.leaf_start,)
        r = w
        state = dict(
            cur=jnp.zeros((r,), jnp.int32),
            best_t=tmax,
            best_prim=jnp.full((r,), -1, jnp.int32),
            best_u=jnp.zeros((r,), jnp.float32),
            best_v=jnp.zeros((r,), jnp.float32),
            ents=[jnp.full((r, hw.FANOUT), jnp.float32(hw._BIG))
                  for _ in range(n_levels)],
            bases=[jnp.zeros((r,), jnp.int32) for _ in range(n_levels)],
            visits=jnp.zeros((r,), jnp.int32),
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
            cap = hit.shape[1]
            tt = jnp.where(hit, t, jnp.float32(hw._BIG))
            t_leaf = jnp.min(tt, axis=1)
            lane = jax.lax.iota(jnp.int32, cap)[None, :]
            at_min = tt <= t_leaf[:, None]
            lane_sel = jnp.min(jnp.where(at_min, lane, cap), axis=1)
            one = at_min & (lane == lane_sel[:, None])
            better = t_leaf < s["best_t"]
            best_t = jnp.where(better, t_leaf, s["best_t"])
            best_prim = jnp.where(
                better, first.astype(jnp.int32) + lane_sel, s["best_prim"])
            best_u = jnp.where(
                better, jnp.sum(jnp.where(one, u, 0.0), axis=1), s["best_u"])
            best_v = jnp.where(
                better, jnp.sum(jnp.where(one, v, 0.0), axis=1), s["best_v"])

            ent = hw._dir_entries(rows, o, inv, tmin_c,
                                  hw._prune_cut(best_t)[:, None])
            is_dir = valid & ~is_leaf
            ents = list(s["ents"])
            bases = list(s["bases"])
            for lv in range(n_levels):
                lo_b = tab.level_starts[lv]
                hi_b = bounds[lv]
                at_lv = is_dir & (cur >= lo_b) & (cur < hi_b)
                ents[lv] = jnp.where(at_lv[:, None], ent, ents[lv])
                bases[lv] = jnp.where(at_lv, first.astype(jnp.int32),
                                      bases[lv])
            nxt = jnp.full((r,), -1, jnp.int32)
            cut = hw._prune_cut(best_t)[:, None]
            for lv in reversed(range(n_levels)):
                e = ents[lv]
                alive_e = e < cut
                ee = jnp.where(alive_e, e, jnp.float32(hw._BIG))
                e_min = jnp.min(ee, axis=1)
                has = (e_min < hw._BIG) & valid & (nxt < 0)
                at_min2 = ee <= e_min[:, None]
                j = jnp.min(jnp.where(at_min2, lane16, hw.FANOUT), axis=1)
                nxt = jnp.where(has, bases[lv] + j, nxt)
                taken = has[:, None] & (lane16 == j[:, None])
                ents[lv] = jnp.where(taken, jnp.float32(hw._BIG), ents[lv])
            return dict(
                cur=jnp.where(valid, nxt, cur),
                best_t=best_t, best_prim=best_prim,
                best_u=best_u, best_v=best_v, ents=ents, bases=bases,
                visits=s["visits"] + valid.astype(jnp.int32),
            )

        s = jax.lax.fori_loop(0, budget, body, state)
        return s

    # visit stats
    f = jax.jit(lambda o, d: budget_walk(o, d, 64)["visits"])
    vis = np.asarray(f(o, d))
    print(f"visits: mean {vis.mean():.1f} p50 {np.percentile(vis,50):.0f} "
          f"p90 {np.percentile(vis,90):.0f} max {vis.max()}", flush=True)

    # marginal round cost
    def timed(budget):
        g = jax.jit(lambda o, d: budget_walk(o, d, budget)["best_t"].sum(),
                    )
        float(g(o, d))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            float(g(o, d))
            best = min(best, time.perf_counter() - t0)
        return best

    t8, t40 = timed(8), timed(40)
    per_round = (t40 - t8) / 32
    print(f"B=8 {t8*1e3:.2f} ms   B=40 {t40*1e3:.2f} ms   "
          f"round {per_round*1e6:.1f} us", flush=True)
    ceiling = w / (vis.mean() * per_round)
    print(f"walkpool trace ceiling ~ {ceiling/1e6:.1f} Mray/s "
          f"(W/(mean_visits*round))", flush=True)


if __name__ == "__main__":
    main()
