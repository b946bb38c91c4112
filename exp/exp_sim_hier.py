"""Ordered-DFS hier-walk visit simulation (CPU): fanout / leaf-cap sweep.

The walk round is gather-descriptor-bound (~3 ns/row/lane), so Mray/s is
set by ROWS GATHERED PER WALK = nodes visited. This simulates the exact
ordered-DFS + best_t-prune walk (trace/hierwalk.py semantics) in numpy
over the 49k-field / town bounce wavefronts and reports per-ray visit
counts for candidate table shapes:

  cap=14, F=16   current production row (f32: 9*14 tris / 6*16 boxes)
  cap=14, F=32   bf16-packed directory rows (6*32 bf16 = 96 f32 lanes)
  cap=28, F=32   bf16 dirs + two-leaf-row pairs (hypothetical)
  quantized boxes measure the conservative-bf16 cull slack.

Usage: python exp/exp_sim_hier.py [scene=49k|200k] [wave=bounce|primary]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from exp_trav import build_big_scene, make_wavefronts

BIG = 1e30
R_SIM = 16384


def bf16_conservative(lo, hi):
    """Round lo down / hi up to bf16-representable values (conservative:
    the quantized box contains the exact one). ~1 ulp of slack via a
    relative inflation before the round-to-nearest cast."""
    import ml_dtypes

    eps = np.float32(2 ** -7)
    lo_q = (lo - np.abs(lo) * eps - 1e-30).astype(ml_dtypes.bfloat16)
    hi_q = (hi + np.abs(hi) * eps + 1e-30).astype(ml_dtypes.bfloat16)
    return lo_q.astype(np.float32), hi_q.astype(np.float32)


def build_tree(scene, cap, fanout, bf16=False):
    """Leaf AABBs over consecutive cap-face runs + bottom-up F-ary levels.

    Returns (levels, leaf_lo, leaf_hi): levels is a top-down list of
    (clo [M, F, 3], chi [M, F, 3]); level i node j's children are level
    i+1 nodes j*F..j*F+F-1 (leaves for the last level)."""
    f = scene.num_faces
    v0 = np.asarray(scene.geom.v0[0])[:f]
    e1 = np.asarray(scene.geom.e1[0])[:f]
    e2 = np.asarray(scene.geom.e2[0])[:f]
    n_leaf = -(-f // cap)
    pts_lo = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
    pts_hi = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)
    # all-zero faces = variable-leaf padding: unhittable, keep out of boxes
    fake = ((np.abs(v0).sum(1) == 0) & (np.abs(e1).sum(1) == 0)
            & (np.abs(e2).sum(1) == 0))
    pts_lo[fake] = BIG
    pts_hi[fake] = -BIG
    lo = np.full((n_leaf * cap, 3), BIG, np.float32)
    hi = np.full((n_leaf * cap, 3), -BIG, np.float32)
    lo[:f] = pts_lo
    hi[:f] = pts_hi
    leaf_lo = lo.reshape(n_leaf, cap, 3).min(1)
    leaf_hi = hi.reshape(n_leaf, cap, 3).max(1)
    leaf_hi = np.where(leaf_lo < BIG, leaf_hi, BIG)  # degenerate far pad

    levels = []
    clo, chi = leaf_lo, leaf_hi
    while clo.shape[0] > 1:
        m = clo.shape[0]
        n_dir = -(-m // fanout)
        glo = np.full((n_dir * fanout, 3), BIG, np.float32)
        ghi = np.full((n_dir * fanout, 3), BIG, np.float32)
        glo[:m] = clo
        ghi[:m] = chi
        g_lo = glo.reshape(n_dir, fanout, 3)
        g_hi = ghi.reshape(n_dir, fanout, 3)
        if bf16:
            q_lo, q_hi = bf16_conservative(g_lo, g_hi)
            pad = g_lo[..., 0] >= BIG
            q_lo[pad] = BIG
            q_hi[pad] = BIG
            g_lo, g_hi = q_lo, q_hi
        levels.insert(0, (g_lo, g_hi))
        real = (g_lo[:, :, 0] < BIG)[:, :, None]
        clo = np.where(real, g_lo, BIG).min(1).astype(np.float32)
        chi = np.where(real, g_hi, -BIG).max(1).astype(np.float32)
        chi = np.where(clo < BIG, chi, BIG)
    return levels, leaf_lo, leaf_hi


def sim_walk(scene, cap, fanout, o, d, tmin=1e-3, tmax=1e16, bf16=False):
    """Vectorized numpy replica of hierwalk._walk (closest mode): per-ray
    (dir_visits, leaf_visits, rounds)."""
    f = scene.num_faces
    v0 = np.asarray(scene.geom.v0[0])[:f]
    e1 = np.asarray(scene.geom.e1[0])[:f]
    e2 = np.asarray(scene.geom.e2[0])[:f]
    n_leaf = -(-f // cap)
    v0p = np.zeros((n_leaf * cap, 3), np.float32)
    e1p = np.zeros((n_leaf * cap, 3), np.float32)
    e2p = np.zeros((n_leaf * cap, 3), np.float32)
    v0p[:f], e1p[:f], e2p[:f] = v0, e1, e2

    levels, _, _ = build_tree(scene, cap, fanout, bf16=bf16)
    n_lvl = len(levels)
    r = o.shape[0]
    inv = np.where(np.abs(d) > 1e-20, 1.0 / d, BIG).astype(np.float32)

    # cur: (level, idx); level == n_lvl means leaf idx
    cur_lvl = np.zeros(r, np.int32)   # start at root (level 0 node 0)
    cur_idx = np.zeros(r, np.int32)
    alive = np.ones(r, bool)
    best_t = np.full(r, tmax, np.float32)
    ents = [np.full((r, fanout), BIG, np.float32) for _ in range(n_lvl)]
    bases = [np.zeros(r, np.int32) for _ in range(n_lvl)]
    n_dirv = np.zeros(r, np.int64)
    n_leafv = np.zeros(r, np.int64)
    rounds = 0

    while alive.any():
        rounds += 1
        at_leaf = alive & (cur_lvl == n_lvl)
        is_dir = alive & ~at_leaf

        # --- leaf MT ---
        li = np.where(at_leaf, cur_idx, 0)
        fidx = li[:, None] * cap + np.arange(cap)[None, :]
        tv0 = v0p[fidx]
        te1 = e1p[fidx]
        te2 = e2p[fidx]
        dv = d[:, None, :]
        ov = o[:, None, :]
        p = np.cross(dv, te2)
        det = (te1 * p).sum(-1)
        iv = np.where(np.abs(det) > 1e-10, 1.0 / det, 0.0)
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

        # --- directory slab ---
        cut = (best_t * 1.00001 + 1e-6)[:, None]
        for lv in range(n_lvl):
            sel = is_dir & (cur_lvl == lv)
            if not sel.any():
                continue
            ni = cur_idx[sel]
            clo, chi = levels[lv]
            lo_s = clo[ni]    # [S, F, 3]
            hi_s = chi[ni]
            oc = o[sel][:, None, :]
            ic = inv[sel][:, None, :]
            t0 = (lo_s - oc) * ic
            t1 = (hi_s - oc) * ic
            tn = np.minimum(t0, t1).max(-1)
            tf = np.maximum(t0, t1).min(-1)
            ok = (tn <= tf) & (tf > tmin) & (tn < cut[sel])
            ents[lv][sel] = np.where(ok, np.maximum(tn, tmin), BIG)
            bases[lv][sel] = ni * fanout
        n_dirv += is_dir

        # --- ordered pop (deepest level first) ---
        nxt_lvl = np.full(r, -1, np.int32)
        nxt_idx = np.zeros(r, np.int32)
        for lv in range(n_lvl - 1, -1, -1):
            e = ents[lv]
            e_eff = np.where(e < cut, e, BIG)
            e_min = e_eff.min(1)
            has = (e_min < BIG) & alive & (nxt_lvl < 0)
            j = e_eff.argmin(1)
            tk = has
            nxt_lvl = np.where(tk, lv + 1, nxt_lvl)
            nxt_idx = np.where(tk, bases[lv] + j, nxt_idx)
            e[tk, j[tk]] = BIG
        alive = alive & (nxt_lvl >= 0)
        cur_lvl = np.where(alive, nxt_lvl, cur_lvl)
        cur_idx = np.where(alive, nxt_idx, cur_idx)

    return n_dirv, n_leafv, rounds, best_t


def town_scene(faces):
    from rendertoy3c_tpu.io.genassets import generate_town
    from rendertoy3c_tpu.io.obj import load_obj
    from rendertoy3c_tpu.scene.scene import build_scene

    asset = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets")
    paths, camkw = generate_town(asset, faces_target=faces)
    meshes, _ = load_obj(paths[:1])
    return build_scene(meshes)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "49k"
    wave = sys.argv[2] if len(sys.argv) > 2 else "bounce"

    from rendertoy3c_tpu.accel.lbvh import split_order_scene

    scene = build_big_scene() if which == "49k" else town_scene(
        200000 if which == "200k" else 1000000)
    waves = make_wavefronts(scene)
    key = {"bounce": "bounce_sorted", "primary": "primary",
           "shadow": "shadow_sorted"}[wave]
    o, d = waves[key]
    o = o[:R_SIM].astype(np.float32)
    d = d[:R_SIM].astype(np.float32)
    print(f"scene={which} faces={scene.num_faces} wave={key} R={R_SIM}",
          flush=True)

    ref_t = None
    for cap, fanout, bf16 in ((14, 16, False), (14, 16, True),
                              (14, 32, False), (14, 32, True),
                              (14, 64, True), (28, 32, True),
                              (13, 16, False)):
        sc = split_order_scene(scene, leaf=cap)
        dv, lv_, rounds, bt = sim_walk(sc, cap, fanout, o, d, bf16=bf16)
        tot = dv + lv_
        if ref_t is None:
            ref_t = bt
            par = ""
        else:
            par = f" dt_max={np.abs(bt - ref_t).max():.2e}"
        print(f"cap={cap:3d} F={fanout:3d} bf16={int(bf16)}: visits "
              f"mean={tot.mean():6.2f} (dir {dv.mean():5.2f} + leaf "
              f"{lv_.mean():5.2f}) p90={np.percentile(tot, 90):5.1f} "
              f"max={tot.max():4d} rounds={rounds}{par}", flush=True)


if __name__ == "__main__":
    main()
