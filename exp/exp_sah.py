"""SAH-binned split ordering vs median split: visit counts in the sim.

split_order_scene splits every cluster at the balanced midpoint (snapped
to leaf multiples). Binned SAH picks axis AND position by minimal
surface-area cost, which should cut child-box overlap on irregular
tessellation (towns) more than on the uniform 49k box field. The split
position is snapped to a leaf-multiple so runs stay aligned; topology
stays the implicit complete F-ary tree, so a win here needs only a new
permutation, no table-format change.

Usage: python exp/exp_sah.py [49k|200k] [bounce|primary|shadow]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from exp_sim_hier import build_tree, sim_walk, town_scene
from exp_trav import build_big_scene, make_wavefronts

R_SIM = 16384
NBINS = 32


def sah_order(scene, cap: int) -> np.ndarray:
    """Recursive binned-SAH split permutation, leaf-multiple aligned.

    HISTORICAL: the prototype this experiment originally measured. The
    production implementation (with a variable-leaf mode and a native
    C++ twin) lives in accel.lbvh.sah_split_perm — rerun comparisons
    against THAT, not this; semantics here differ subtly (degenerate
    fallback skips the stable sort)."""
    g = scene.geom
    f = scene.num_faces
    v0 = np.asarray(g.v0[0][:f])
    e1 = np.asarray(g.e1[0][:f])
    e2 = np.asarray(g.e2[0][:f])
    lo = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
    hi = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)
    cent = (lo + hi) * 0.5

    def half_area(blo, bhi):
        d = np.maximum(bhi - blo, 0.0)
        return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] \
            + d[..., 2] * d[..., 0]

    out = []
    stack = [np.arange(f)]
    while stack:
        idx = stack.pop()
        n = len(idx)
        if n <= cap:
            out.append(idx)
            continue
        c = cent[idx]
        cmin = c.min(0)
        cmax = c.max(0)
        ext = cmax - cmin
        best = None  # (cost, axis, sorted_idx, split)
        for ax in range(3):
            if ext[ax] <= 0:
                continue
            # bin by centroid; prefix/suffix box areas at bin boundaries
            b = np.minimum(((c[:, ax] - cmin[ax]) * (NBINS / ext[ax]))
                           .astype(np.int32), NBINS - 1)
            cnt = np.bincount(b, minlength=NBINS)
            blo = np.full((NBINS, 3), 1e30, np.float32)
            bhi = np.full((NBINS, 3), -1e30, np.float32)
            np.minimum.at(blo, b, lo[idx])
            np.maximum.at(bhi, b, hi[idx])
            pref_lo = np.minimum.accumulate(blo, 0)
            pref_hi = np.maximum.accumulate(bhi, 0)
            suf_lo = np.minimum.accumulate(blo[::-1], 0)[::-1]
            suf_hi = np.maximum.accumulate(bhi[::-1], 0)[::-1]
            nl = np.cumsum(cnt)[:-1]
            nr = n - nl
            cost = (half_area(pref_lo[:-1], pref_hi[:-1]) * nl
                    + half_area(suf_lo[1:], suf_hi[1:]) * nr)
            cost = np.where((nl > 0) & (nr > 0), cost, np.inf)
            k = int(np.argmin(cost))
            if not np.isfinite(cost[k]):
                continue
            if best is None or cost[k] < best[0]:
                srt = idx[np.argsort(c[:, ax], kind="stable")]
                # snap the bin boundary's face count to a leaf multiple
                half = int(round(nl[k] / cap)) * cap
                half = min(max(half, cap), ((n - 1) // cap) * cap)
                if half <= 0 or half >= n:
                    half = min(-(-n // (2 * cap)) * cap, n - 1)
                best = (cost[k], ax, srt, half)
        if best is None:  # all centroids identical: balanced fallback
            half = min(-(-n // (2 * cap)) * cap, n - 1)
            stack.append(idx[half:])
            stack.append(idx[:half])
            continue
        _, _, srt, half = best
        stack.append(srt[half:])
        stack.append(srt[:half])
    return np.concatenate(out).astype(np.int32)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "49k"
    wave = sys.argv[2] if len(sys.argv) > 2 else "bounce"
    from rendertoy3c_tpu.accel.lbvh import (reorder_scene_by_bvh,
                                            split_order_scene)
    from rendertoy3c_tpu.trace.hierwalk import FANOUT, HIER_LEAF

    cap = HIER_LEAF
    scene = build_big_scene() if which == "49k" else town_scene(
        {"200k": 200_000, "1M": 1_000_000}[which])
    waves = make_wavefronts(scene)
    key = {"bounce": "bounce_sorted", "primary": "primary",
           "shadow": "shadow_sorted"}[wave]
    o, d = waves[key]
    o = o[:R_SIM].astype(np.float32)
    d = d[:R_SIM].astype(np.float32)
    print(f"scene={which} faces={scene.num_faces} wave={key} R={R_SIM}",
          flush=True)

    ref_t = None
    for name in ("median", "sah"):
        t0 = time.perf_counter()
        if name == "median":
            sc = split_order_scene(scene, leaf=cap)
        else:
            sc = reorder_scene_by_bvh(scene, sah_order(scene, cap))
        tb = time.perf_counter() - t0
        dv, lv_, rounds, bt = sim_walk(sc, cap, FANOUT, o, d)
        tot = dv + lv_
        if ref_t is None:
            ref_t = bt
            par = ""
        else:
            par = f" dt_max={np.abs(bt - ref_t).max():.2e}"
        print(f"{name:7s}: visits mean={tot.mean():6.2f} (dir {dv.mean():5.2f}"
              f" + leaf {lv_.mean():5.2f}) p90={np.percentile(tot, 90):5.1f}"
              f" max={tot.max():4d} rounds={rounds} build={tb:.1f}s{par}",
              flush=True)


if __name__ == "__main__":
    main()
