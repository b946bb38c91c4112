"""Variable directory grouping prototype (CPU sim): DP-chosen group
boundaries over the ordered leaf sequence vs the fixed stride-F blocks.

Motivation (r4): the 200k-town sim says DIRECTORY visits dominate 6:1
(13.5 dir + 2.3 leaf per bounce walk at F=16) — fixed stride-F grouping
cuts across buildings, so sibling directory boxes overlap and ordered DFS
pops many of them. Choosing boundaries by DP (minimize sum of group
half-areas + lambda per group, group size <= F) keeps pointers/run order
valid (groups stay consecutive) while aligning boxes with the geometry.

Usage: python exp/exp_vardir.py [scene=200k] [lambda=0.5]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "exp"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

BIG = 1e30


def half_area(lo, hi):
    d = np.maximum(hi - lo, 0.0)
    return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] \
        + d[..., 2] * d[..., 0]


def window_union(lo, hi, fanout):
    """[n, fanout] HA of the union of the k+1 boxes ending at i
    (k = 0..fanout-1; BIG where the window precedes the start)."""
    n = lo.shape[0]
    ha = np.full((n, fanout), np.float32(BIG))
    run_lo = lo.copy()
    run_hi = hi.copy()
    ha[:, 0] = half_area(run_lo, run_hi)
    for k in range(1, fanout):
        run_lo[k:] = np.minimum(run_lo[k:], lo[:-k])
        run_hi[k:] = np.maximum(run_hi[k:], hi[:-k])
        ha[k:, k] = half_area(run_lo[k:], run_hi[k:])
    return ha


def dp_groups(lo, hi, fanout, lam):
    """Boundary DP: minimize sum(HA(group)) + lam * n_groups.

    Returns group sizes (list, each <= fanout, covering 0..n-1 in order).
    lam is in units of the MEAN single-box HA (scene-scale-free)."""
    n = lo.shape[0]
    real = lo[:, 0] < BIG
    lam_abs = lam * float(half_area(lo[real], hi[real]).mean()) \
        if real.any() else 0.0
    wha = window_union(lo, hi, fanout)  # [n, k] window ending at i, size k+1
    cost = np.full(n + 1, np.inf)
    cost[0] = 0.0
    back = np.zeros(n + 1, np.int32)
    for i in range(1, n + 1):
        kmax = min(fanout, i)
        c = cost[i - kmax:i][::-1] + wha[i - 1, :kmax] + lam_abs
        k = int(np.argmin(c))
        cost[i] = c[k]
        back[i] = k + 1
    sizes = []
    i = n
    while i > 0:
        sizes.append(int(back[i]))
        i -= back[i]
    return sizes[::-1]


def build_var_tree(leaf_lo, leaf_hi, fanout, lam):
    """Bottom-up variable-group levels. Returns top-down list of
    (clo [M,F,3], chi [M,F,3], first_child [M]) with degenerate far pads."""
    levels = []
    lo, hi = leaf_lo, leaf_hi
    while lo.shape[0] > 1:
        sizes = dp_groups(lo, hi, fanout, lam)
        m = len(sizes)
        clo = np.full((m, fanout, 3), BIG, np.float32)
        chi = np.full((m, fanout, 3), BIG, np.float32)
        first = np.zeros(m, np.int64)
        pos = 0
        for gi, sz in enumerate(sizes):
            clo[gi, :sz] = lo[pos:pos + sz]
            chi[gi, :sz] = hi[pos:pos + sz]
            first[gi] = pos
            pos += sz
        levels.insert(0, (clo, chi, first))
        real = (clo[:, :, 0] < BIG)[:, :, None]
        lo = np.where(real, clo, BIG).min(1).astype(np.float32)
        hi = np.where(real, chi, -BIG).max(1).astype(np.float32)
        hi = np.where(lo < BIG, hi, BIG)
    return levels


def sim_walk_var(scene, cap, levels, o, d, fanout, tmin=1e-3, tmax=1e16):
    """exp_sim_hier.sim_walk generalized to explicit first_child levels."""
    f = scene.num_faces
    v0 = np.asarray(scene.geom.v0[0])[:f]
    e1 = np.asarray(scene.geom.e1[0])[:f]
    e2 = np.asarray(scene.geom.e2[0])[:f]
    n_leaf = -(-f // cap)
    v0p = np.zeros((n_leaf * cap, 3), np.float32)
    e1p = np.zeros((n_leaf * cap, 3), np.float32)
    e2p = np.zeros((n_leaf * cap, 3), np.float32)
    v0p[:f], e1p[:f], e2p[:f] = v0, e1, e2
    n_lvl = len(levels)
    r = o.shape[0]
    inv = np.where(np.abs(d) > 1e-20, 1.0 / d, BIG).astype(np.float32)

    cur_lvl = np.zeros(r, np.int32)
    cur_idx = np.zeros(r, np.int32)
    alive = np.ones(r, bool)
    best_t = np.full(r, tmax, np.float32)
    ents = [np.full((r, fanout), BIG, np.float32) for _ in range(n_lvl)]
    bases = [np.zeros(r, np.int64) for _ in range(n_lvl)]
    n_dirv = np.zeros(r, np.int64)
    n_leafv = np.zeros(r, np.int64)

    while alive.any():
        at_leaf = alive & (cur_lvl == n_lvl)
        is_dir = alive & ~at_leaf

        li = np.where(at_leaf, cur_idx, 0)
        fidx = li[:, None] * cap + np.arange(cap)[None, :]
        tv0, te1, te2 = v0p[fidx], e1p[fidx], e2p[fidx]
        dv = d[:, None, :]
        ov = o[:, None, :]
        p = np.cross(dv, te2)
        det = (te1 * p).sum(-1)
        iv = np.where(np.abs(det) > 1e-10, 1.0 / np.where(det == 0, 1, det),
                      0.0)
        tvec = ov - tv0
        u = (tvec * p).sum(-1) * iv
        q = np.cross(tvec, te1)
        vv = (dv * q).sum(-1) * iv
        t = (te2 * q).sum(-1) * iv
        hit = ((np.abs(det) > 1e-10) & (u >= 0) & (vv >= 0) & (u + vv <= 1)
               & (t > tmin) & (t < best_t[:, None]) & at_leaf[:, None])
        tt = np.where(hit, t, BIG)
        t_leaf = tt.min(1)
        best_t = np.where(at_leaf & (t_leaf < best_t), t_leaf, best_t)
        n_leafv += at_leaf

        cut = (best_t * 1.00001 + 1e-6)[:, None]
        for lv in range(n_lvl):
            sel = is_dir & (cur_lvl == lv)
            if not sel.any():
                continue
            ni = cur_idx[sel]
            clo, chi, first = levels[lv]
            lo_s, hi_s = clo[ni], chi[ni]
            oc = o[sel][:, None, :]
            ic = inv[sel][:, None, :]
            t0 = (lo_s - oc) * ic
            t1 = (hi_s - oc) * ic
            tn = np.minimum(t0, t1).max(-1)
            tf = np.maximum(t0, t1).min(-1)
            ok = (tn <= tf) & (tf > tmin) & (tn < cut[sel])
            ents[lv][sel] = np.where(ok, np.maximum(tn, tmin), BIG)
            bases[lv][sel] = first[ni]
        n_dirv += is_dir

        nxt_lvl = np.full(r, -1, np.int32)
        nxt_idx = np.zeros(r, np.int64)
        for lv in range(n_lvl - 1, -1, -1):
            e = ents[lv]
            e_eff = np.where(e < cut, e, BIG)
            e_min = e_eff.min(1)
            has = (e_min < BIG) & alive & (nxt_lvl < 0)
            j = e_eff.argmin(1)
            nxt_lvl = np.where(has, lv + 1, nxt_lvl)
            nxt_idx = np.where(has, bases[lv] + j, nxt_idx)
            e[has, j[has]] = BIG
        alive = alive & (nxt_lvl >= 0)
        cur_lvl = np.where(alive, nxt_lvl, cur_lvl)
        cur_idx = np.where(alive, nxt_idx, cur_idx)

    return n_dirv, n_leafv


def leaf_boxes(scene, cap):
    f = scene.num_faces
    v0 = np.asarray(scene.geom.v0[0])[:f]
    e1 = np.asarray(scene.geom.e1[0])[:f]
    e2 = np.asarray(scene.geom.e2[0])[:f]
    n_leaf = -(-f // cap)
    lo = np.full((n_leaf * cap, 3), BIG, np.float32)
    hi = np.full((n_leaf * cap, 3), -BIG, np.float32)
    lo[:f] = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
    hi[:f] = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)
    fake = ((np.abs(v0).sum(1) == 0) & (np.abs(e1).sum(1) == 0)
            & (np.abs(e2).sum(1) == 0))
    lo[:f][fake] = BIG
    hi[:f][fake] = -BIG
    llo = lo.reshape(n_leaf, cap, 3).min(1)
    lhi = hi.reshape(n_leaf, cap, 3).max(1)
    lhi = np.where(llo < BIG, lhi, BIG)
    return llo, lhi


def fixed_levels(llo, lhi, fanout):
    levels = []
    lo, hi = llo, lhi
    while lo.shape[0] > 1:
        m = lo.shape[0]
        nd = -(-m // fanout)
        glo = np.full((nd * fanout, 3), BIG, np.float32)
        ghi = np.full((nd * fanout, 3), BIG, np.float32)
        glo[:m] = lo
        ghi[:m] = hi
        clo = glo.reshape(nd, fanout, 3)
        chi = ghi.reshape(nd, fanout, 3)
        first = np.arange(nd, dtype=np.int64) * fanout
        levels.insert(0, (clo, chi, first))
        real = (clo[:, :, 0] < BIG)[:, :, None]
        lo = np.where(real, clo, BIG).min(1).astype(np.float32)
        hi = np.where(real, chi, -BIG).max(1).astype(np.float32)
        hi = np.where(lo < BIG, hi, BIG)
    return levels


def main():
    from exp_sim_hier import town_scene
    from exp_trav import build_big_scene, make_wavefronts

    from rendertoy3c_tpu.accel.lbvh import split_order_scene

    which = sys.argv[1] if len(sys.argv) > 1 else "200k"
    lams = ([float(x) for x in sys.argv[2].split(",")]
            if len(sys.argv) > 2 else [0.25, 0.5, 1.0, 2.0])
    scene = (build_big_scene() if which == "49k"
             else town_scene({"200k": 200000, "1M": 1000000,
                              "town50": 50000}[which]))
    sc = split_order_scene(scene, leaf=14)
    waves = make_wavefronts(sc)
    llo, lhi = leaf_boxes(sc, 14)
    print(f"{which}: faces={sc.num_faces} leaves={llo.shape[0]}", flush=True)

    for fanout in (16, 20):
        base = fixed_levels(llo, lhi, fanout)
        rows_b = sum(l[0].shape[0] for l in base)
        for wname in ("bounce_sorted", "shadow_sorted"):
            o, d = waves[wname]
            o = o[:8192].astype(np.float32)
            d = d[:8192].astype(np.float32)
            dv, lv_ = sim_walk_var(sc, 14, base, o, d, fanout)
            print(f"  F={fanout} fixed  {wname:14s}: visits "
                  f"{(dv+lv_).mean():6.2f} (dir {dv.mean():5.2f}) "
                  f"dir-rows {rows_b}", flush=True)
        for lam in lams:
            var = build_var_tree(llo, lhi, fanout, lam)
            rows_v = sum(l[0].shape[0] for l in var)
            for wname in ("bounce_sorted", "shadow_sorted"):
                o, d = waves[wname]
                o = o[:8192].astype(np.float32)
                d = d[:8192].astype(np.float32)
                dv, lv_ = sim_walk_var(sc, 14, var, o, d, fanout)
                print(f"  F={fanout} lam={lam:4.2f} {wname:14s}: visits "
                      f"{(dv+lv_).mean():6.2f} (dir {dv.mean():5.2f}) "
                      f"dir-rows {rows_v} ({rows_v/rows_b:4.2f}x) "
                      f"levels {len(var)}", flush=True)


if __name__ == "__main__":
    main()
