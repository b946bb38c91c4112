"""2-wide leaf-paired pop: process two nodes per walk round when legal.

The walk round's cost is ~25us op + ~21us launch gap at W=8192 (profile in
ROADMAP item 1); rounds, not arithmetic, are the currency. The ordered-DFS
pop is sequential (round k+1's node depends on round k's pushes) EXCEPT
when the popped node is a leaf: leaves push nothing, so a second pending
node can pop in the same round without breaking the one-slot-per-level
stack invariant (deepest-first scan guarantees every slot deeper than the
second node's push target is already spent). Rule:

  n1 = nearest pending at the deepest non-empty level (as today)
  leaf(n1) = n1 >= leaf_start (static id compare, no gather needed)
  n2 = next nearest pending (same level's 2nd min, else shallower levels'
       min), only where leaf(n1)

Round then gathers BOTH rows, runs one [W, 2*cap] MT over the two leaf
halves, and slab/pushes the at-most-one directory row among them.

Measures on the 49k box field (32k incoherent rays): rounds-to-completion,
marginal us/round, and hit parity vs the 1-wide walk.

Usage: python exp/exp_pop2.py [faces_side=64] [W=32768]
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
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    scene = box_field(n_side)

    from rendertoy3c_tpu.accel.lbvh import split_order_scene
    from rendertoy3c_tpu.trace import hierwalk as hw

    sc = split_order_scene(scene, leaf=hw.HIER_LEAF)
    tab = hw.build_hier_table(sc.geom, sc.num_faces)
    n_levels = len(tab.level_starts)
    print(f"faces={sc.num_faces} W={w} levels={n_levels} "
          f"rows={tab.table.shape[0]} leaf_start={tab.leaf_start}",
          flush=True)

    o, d = incoherent_rays(scene, w)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    tmin = jnp.full((w,), 1e-3)
    tmax = jnp.full((w,), 1e16)
    bounds = tuple(tab.level_starts[1:]) + (tab.leaf_start,)
    cap = hw.HIER_LEAF
    FAN = hw.FANOUT
    lane16 = jax.lax.iota(jnp.int32, FAN)[None, :]
    lane2c = jax.lax.iota(jnp.int32, 2 * cap)[None, :]

    # ---------------- baseline: 1-wide round (hierwalk body) -------------
    def base_round(s):
        cur = s["cur"]
        valid = cur >= 0
        rows = jnp.take(tab.table, jnp.maximum(cur, 0), axis=0)
        is_leaf = rows[:, hw._L_TYPE] > 0.5
        first = rows[:, hw._L_FIRST]
        t, u, v, hit = hw._leaf_mt(rows, o, d, tmin[:, None],
                                   s["best_t"][:, None])
        hit = hit & (is_leaf & valid)[:, None]
        tt = jnp.where(hit, t, jnp.float32(hw._BIG))
        t_leaf = jnp.min(tt, axis=1)
        lane = jax.lax.iota(jnp.int32, cap)[None, :]
        at_min = tt <= t_leaf[:, None]
        lane_sel = jnp.min(jnp.where(at_min, lane, cap), axis=1)
        better = t_leaf < s["best_t"]
        best_t = jnp.where(better, t_leaf, s["best_t"])
        best_prim = jnp.where(better, first.astype(jnp.int32) + lane_sel,
                              s["best_prim"])
        cut = hw._prune_cut(best_t)[:, None]
        ent = hw._dir_entries(rows, o, s["inv"], tmin[:, None], cut)
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
        return dict(s, cur=jnp.where(valid, nxt, cur), best_t=best_t,
                    best_prim=best_prim, ents=ents, bases=bases,
                    visits=s["visits"] + jnp.sum(valid.astype(jnp.int32)))

    # ---------------- 2-wide: leaf-paired pop ----------------------------
    def pop2_round(s):
        cur = s["cur"]        # n1 (may be leaf or dir)
        cur2 = s["cur2"]      # n2 (only set when n1 was a leaf)
        v1 = cur >= 0
        v2 = cur2 >= 0
        rows1 = jnp.take(tab.table, jnp.maximum(cur, 0), axis=0)
        rows2 = jnp.take(tab.table, jnp.maximum(cur2, 0), axis=0)
        leaf1 = (rows1[:, hw._L_TYPE] > 0.5) & v1
        leaf2 = (rows2[:, hw._L_TYPE] > 0.5) & v2
        first1 = rows1[:, hw._L_FIRST].astype(jnp.int32)
        first2 = rows2[:, hw._L_FIRST].astype(jnp.int32)

        # --- one MT over both leaf halves: [W, 2*cap] ---
        tri = jnp.concatenate(
            [rows1[:, :9 * cap].reshape(w, 9, cap),
             rows2[:, :9 * cap].reshape(w, 9, cap)], axis=2)
        v0x, v0y, v0z = tri[:, 0], tri[:, 1], tri[:, 2]
        e1x, e1y, e1z = tri[:, 3], tri[:, 4], tri[:, 5]
        e2x, e2y, e2z = tri[:, 6], tri[:, 7], tri[:, 8]
        ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
        dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv_det = jnp.where(jnp.abs(det) > hw._DET_EPS, 1.0 / det, 0.0)
        tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
        uu = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        vv = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        half = jnp.where(lane2c < cap, leaf1[:, None], leaf2[:, None])
        hit = ((jnp.abs(det) > hw._DET_EPS)
               & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
               & (t > tmin[:, None]) & (t < s["best_t"][:, None]) & half)
        tt = jnp.where(hit, t, jnp.float32(hw._BIG))
        t_leaf = jnp.min(tt, axis=1)
        at_min = tt <= t_leaf[:, None]
        lane_sel = jnp.min(jnp.where(at_min, lane2c, 2 * cap), axis=1)
        prim_base = jnp.where(lane_sel < cap, first1, first2)
        prim_lane = jnp.where(lane_sel < cap, lane_sel, lane_sel - cap)
        better = t_leaf < s["best_t"]
        best_t = jnp.where(better, t_leaf, s["best_t"])
        best_prim = jnp.where(better, prim_base + prim_lane, s["best_prim"])

        # --- the at-most-one directory row among (n1, n2) ---
        dir1 = v1 & ~leaf1          # implies v2 == False by construction
        dir2 = v2 & ~leaf2
        any_dir = dir1 | dir2
        dir_row = jnp.where(dir1[:, None], rows1, rows2)
        dir_cur = jnp.where(dir1, cur, cur2)
        dir_first = jnp.where(dir1, first1, first2)
        cut = hw._prune_cut(best_t)[:, None]
        ent = hw._dir_entries(dir_row, o, s["inv"], tmin[:, None], cut)
        ents = list(s["ents"])
        bases = list(s["bases"])
        for lv in range(n_levels):
            at_lv = (any_dir & (dir_cur >= tab.level_starts[lv])
                     & (dir_cur < bounds[lv]))
            ents[lv] = jnp.where(at_lv[:, None], ent, ents[lv])
            bases[lv] = jnp.where(at_lv, dir_first, bases[lv])

        # --- 2-wide pop: n1 deepest-first; n2 only where n1 is a leaf ---
        nxt1 = jnp.full((w,), -1, jnp.int32)
        nxt2 = jnp.full((w,), -1, jnp.int32)
        e1l, j1l, e2l, j2l, took1 = [], [], [], [], []
        for lv in range(n_levels):
            e = ents[lv]
            ee = jnp.where(e < cut, e, jnp.float32(hw._BIG))
            em1 = jnp.min(ee, axis=1)
            at1 = ee <= em1[:, None]
            jj1 = jnp.min(jnp.where(at1, lane16, FAN), axis=1)
            ee2 = jnp.where(lane16 == jj1[:, None], jnp.float32(hw._BIG), ee)
            em2 = jnp.min(ee2, axis=1)
            jj2 = jnp.min(jnp.where(ee2 <= em2[:, None], lane16, FAN),
                          axis=1)
            e1l.append(em1)
            j1l.append(jj1)
            e2l.append(em2)
            j2l.append(jj2)
        valid_any = v1
        for lv in reversed(range(n_levels)):
            has = (e1l[lv] < hw._BIG) & valid_any & (nxt1 < 0)
            nxt1 = jnp.where(has, bases[lv] + j1l[lv], nxt1)
            took1.append(has)
        took1 = took1[::-1]
        leaf_n1 = nxt1 >= tab.leaf_start
        for lv in reversed(range(n_levels)):
            cand_e = jnp.where(took1[lv], e2l[lv], e1l[lv])
            cand_j = jnp.where(took1[lv], j2l[lv], j1l[lv])
            has = (cand_e < hw._BIG) & leaf_n1 & valid_any & (nxt2 < 0)
            nxt2 = jnp.where(has, bases[lv] + cand_j, nxt2)
            # clear both popped entries at this level
            cj1 = jnp.where(took1[lv], j1l[lv], FAN)
            cj2 = jnp.where(has, cand_j, FAN)
            clear = (lane16 == cj1[:, None]) | (lane16 == cj2[:, None])
            ents[lv] = jnp.where(clear, jnp.float32(hw._BIG), ents[lv])
        n_vis = (v1.astype(jnp.int32) + v2.astype(jnp.int32))
        return dict(s, cur=jnp.where(valid_any, nxt1, cur),
                    cur2=jnp.where(valid_any, nxt2, jnp.int32(-1)),
                    best_t=best_t, best_prim=best_prim,
                    ents=ents, bases=bases,
                    visits=s["visits"] + jnp.sum(n_vis))

    def make_state(two):
        st = dict(
            cur=jnp.zeros((w,), jnp.int32),
            best_t=tmax,
            best_prim=jnp.full((w,), -1, jnp.int32),
            inv=hw._safe_inv(d),
            ents=[jnp.full((w, FAN), jnp.float32(hw._BIG))
                  for _ in range(n_levels)],
            bases=[jnp.zeros((w,), jnp.int32) for _ in range(n_levels)],
            visits=jnp.zeros((), jnp.int32),
        )
        if two:
            st["cur2"] = jnp.full((w,), -1, jnp.int32)
        return st

    def run_while(rnd, two):
        @jax.jit
        def f():
            def cond(s):
                return jnp.any(s["cur"] >= 0)
            s = jax.lax.while_loop(
                cond, lambda s: dict(rnd(s), rounds=s["rounds"] + 1),
                dict(make_state(two), rounds=jnp.zeros((), jnp.int32)))
            return s["best_t"], s["best_prim"], s["rounds"], s["visits"]
        return f

    def run_fori(rnd, two, budget):
        @jax.jit
        def f(oo):
            del oo
            s = jax.lax.fori_loop(0, budget, lambda i, s: rnd(s),
                                  make_state(two))
            return s["best_t"], s["best_prim"]
        return f

    # correctness + rounds
    fb = run_while(base_round, False)
    f2 = run_while(pop2_round, True)
    tb, pb, rb, vb = map(np.asarray, jax.block_until_ready(fb()))
    t2, p2, r2, v2_ = map(np.asarray, jax.block_until_ready(f2()))
    nb, n2 = int((pb >= 0).sum()), int((p2 >= 0).sum())
    same = int((pb == p2).sum())
    print(f"hits base={nb} pop2={n2} same_prim={same}/{w}", flush=True)
    print(f"rounds base={int(rb)} pop2={int(r2)}  "
          f"visits base={int(vb)} pop2={int(v2_)} "
          f"(mean/ray {vb / w:.2f} vs {v2_ / w:.2f})", flush=True)

    # wall time of the full while walk
    for name, f in (("base ", fb), ("pop2 ", f2)):
        jax.block_until_ready(f())
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(f())
            best = min(best, time.perf_counter() - t0)
        print(f"{name} full walk: {best*1e3:7.2f} ms", flush=True)

    # marginal us/round
    for name, rnd, two in (("base ", base_round, False),
                           ("pop2 ", pop2_round, True)):
        ts = {}
        for reps in (LO, HI):
            f = run_fori(rnd, two, reps)
            jax.block_until_ready(f(0))
            best = 1e9
            for _ in range(4):
                t0 = time.perf_counter()
                jax.block_until_ready(f(0))
                best = min(best, time.perf_counter() - t0)
            ts[reps] = best
        dt = (ts[HI] - ts[LO]) / (HI - LO)
        print(f"{name} marginal: {dt*1e6:8.1f} us/round", flush=True)


if __name__ == "__main__":
    main()
