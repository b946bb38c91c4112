"""Hybrid directory grouping sim: DP-grouped BOTTOM level (geometry
alignment) + fixed-20 upper levels (level-count control). Motivation (r5):
the 1M town's all-levels DP yields a 5-level table (bottom 6533 groups ->
DP upper levels shrink ~8x/level), which disables the walk pool's x4
round unroll AND the inline shadow gate (n_levels <= 4 gates); fixed
upper levels restore 4 levels while keeping the bottom DP win.

Usage: python exp/exp_hybrid_dp.py [1M|200k|49k]
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "exp"))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from exp_vardir import (BIG, dp_groups, fixed_levels, leaf_boxes,
                        sim_walk_var, build_var_tree)
from exp_sim_hier import town_scene
from exp_trav import build_big_scene, make_wavefronts
from rendertoy3c_tpu.accel.lbvh import split_order_scene


def build_hybrid_tree(leaf_lo, leaf_hi, fanout, lam):
    """DP at the bottom level only; fixed stride-fanout above."""
    sizes = dp_groups(leaf_lo, leaf_hi, fanout, lam)
    m = len(sizes)
    clo = np.full((m, fanout, 3), BIG, np.float32)
    chi = np.full((m, fanout, 3), BIG, np.float32)
    first = np.zeros(m, np.int64)
    pos = 0
    for gi, sz in enumerate(sizes):
        clo[gi, :sz] = leaf_lo[pos:pos + sz]
        chi[gi, :sz] = leaf_hi[pos:pos + sz]
        first[gi] = pos
        pos += sz
    bottom = (clo, chi, first)
    real = (clo[:, :, 0] < BIG)[:, :, None]
    lo = np.where(real, clo, BIG).min(1).astype(np.float32)
    hi = np.where(real, chi, -BIG).max(1).astype(np.float32)
    hi = np.where(lo < BIG, hi, BIG)
    upper = fixed_levels(lo, hi, fanout)
    return upper + [bottom]


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "1M"
    scene = (build_big_scene() if which == "49k"
             else town_scene({"200k": 200000, "1M": 1000000,
                              "town50": 50000}[which]))
    sc = split_order_scene(scene, leaf=14)
    waves = make_wavefronts(sc)
    llo, lhi = leaf_boxes(sc, 14)
    print(f"{which}: faces={sc.num_faces} leaves={llo.shape[0]}", flush=True)
    fanout = 20
    variants = [
        ("fixed   ", fixed_levels(llo, lhi, fanout)),
        ("dp-all  ", build_var_tree(llo, lhi, fanout, 0.5)),
        ("hybrid.5", build_hybrid_tree(llo, lhi, fanout, 0.5)),
        ("hybrid1 ", build_hybrid_tree(llo, lhi, fanout, 1.0)),
        ("hybrid2 ", build_hybrid_tree(llo, lhi, fanout, 2.0)),
    ]
    for name, lv in variants:
        counts = [l[0].shape[0] for l in lv]
        for wname in ("bounce_sorted", "shadow_sorted"):
            o, d = waves[wname]
            o = o[:8192].astype(np.float32)
            d = d[:8192].astype(np.float32)
            dv, lfv = sim_walk_var(sc, 14, lv, o, d, fanout)
            print(f"  {name} {wname:14s}: visits {(dv+lfv).mean():6.2f} "
                  f"(dir {dv.mean():5.2f}) levels {len(lv)} counts {counts}",
                  flush=True)


if __name__ == "__main__":
    main()
