"""Per-ray ordered leaf walk: the incoherent-ray traversal path.

Reference parity: optixTraverse over the GAS (shader_common.h:74-94) serves
coherent AND incoherent rays alike on RT cores. Our Pallas tile-cull path
(pallas_mt.py) is the coherent-ray analog, but its cull decisions are per
ray-TILE (a 256-ray tile sweeps the union of tiles any of its rays overlap),
so diffuse-bounce wavefronts on large scenes degenerate to a dense sweep.
This module is the per-RAY analog of BVH traversal, built from ops the TPU
likes:

  1. leaves: Morton-ordered runs of LEAF triangles (accel.lbvh
     morton_order_scene provides spatial coherence), one flat [L, 9*LEAF]
     component-major row per leaf — the "BVH" is a single flat leaf level,
     tight because of the Morton order;
  2. slab-test every (ray, leaf AABB) pair densely on the VPU: [S, L] entry
     distances — brute force over leaf boxes is ~25 flops/pair, cheap enough
     to replace interior-node traversal outright;
  3. order each ray's overlapped leaves nearest-first with lax.top_k;
  4. walk: per round, each ray fetches its next leaf row (a plain row
     gather — see _fetch_rows for the measured strategy comparison) and
     runs a fused [S, LEAF] Moller-Trumbore block;
  5. closest-hit pruning: a leaf whose entry distance exceeds the ray's
     current best hit is dead — rays in closed scenes touch 2-5 leaves.

Rays are processed in SEG-sized segments (lax.map), pre-sorted by leaf
overlap count so each segment's round loop is bounded by rays of similar
cost — a cheap, static-shape approximation of active-ray compaction (see
_segmented). Measured on v5e at 49k faces: ~77 total rounds for a 32k
incoherent wavefront (vs mean overlap 4.6/ray), with the fused
matmul+MT round body running at the MXU scan rate.

Static scenes only (the round loop would need per-ray time-lerped leaves);
motion scenes use the pallas_mt motion kernels or the jnp tracer.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .intersect import Hit

LEAF = 256       # triangles per leaf
SEG = 2048       # rays per segment (independent round loops)
K_WAVE = 16      # leaves ordered per top_k wave
_BIG = 1e30
_DET_EPS = 1e-10


class LeafTable(NamedTuple):
    """Flat leaf-level acceleration table for the per-ray walk."""

    rows: jnp.ndarray    # [L, 9*LEAF] f32 component-major leaf rows
    aabb_t: jnp.ndarray  # [6, L] f32 (lox loy loz hix hiy hiz); empty leaves
    #                      carry an inverted box and never overlap anything
    num_faces: int


def build_leaf_table(geom, key: int = 0, leaf: int = LEAF) -> LeafTable:
    """Pack a GeometrySoA motion key into leaf rows. Host-side numpy."""
    v0 = np.asarray(geom.v0[key], np.float32)
    e1 = np.asarray(geom.e1[key], np.float32)
    e2 = np.asarray(geom.e2[key], np.float32)
    f = v0.shape[0]
    n_l = max(1, -(-f // leaf))
    f_pad = n_l * leaf

    comp = np.zeros((9, f_pad), np.float32)
    comp[0:3, :f] = v0.T
    comp[3:6, :f] = e1.T
    comp[6:9, :f] = e2.T
    # component-major leaf rows: row l = [v0x*LEAF, v0y*LEAF, ..., e2z*LEAF]
    rows = (comp.reshape(9, n_l, leaf).transpose(1, 0, 2)
            .reshape(n_l, 9 * leaf))

    aabb = np.zeros((6, n_l), np.float32)
    aabb[0:3] = _BIG
    aabb[3:6] = -_BIG
    p1 = v0 + e1
    p2 = v0 + e2
    valid = np.zeros((f_pad,), bool)
    valid[:f] = True
    for c in range(3):
        lo = np.full((f_pad,), _BIG, np.float32)
        hi = np.full((f_pad,), -_BIG, np.float32)
        lo[:f] = np.minimum(np.minimum(v0[:, c], p1[:, c]), p2[:, c])
        hi[:f] = np.maximum(np.maximum(v0[:, c], p1[:, c]), p2[:, c])
        aabb[c] = lo.reshape(n_l, leaf).min(axis=1)
        aabb[c + 3] = hi.reshape(n_l, leaf).max(axis=1)
    return LeafTable(rows=jnp.asarray(np.ascontiguousarray(rows)),
                     aabb_t=jnp.asarray(aabb), num_faces=f)


def _safe_inv(d):
    return jnp.where(jnp.abs(d) > 1e-20, 1.0 / d, jnp.float32(_BIG))


def _slab_entries(aabb_t, o, inv, tmin, tmax):
    """Per-(ray, leaf) entry distances; _BIG where the ray misses the box.

    o, inv: [S, 3]; tmin/tmax: [S, 1]; returns [S, L]."""
    tn = jnp.full((o.shape[0], aabb_t.shape[1]), -jnp.float32(_BIG))
    tf = jnp.full((o.shape[0], aabb_t.shape[1]), jnp.float32(_BIG))
    for c in range(3):
        oc = o[:, c:c + 1]
        ic = inv[:, c:c + 1]
        t0 = (aabb_t[c][None, :] - oc) * ic
        t1 = (aabb_t[c + 3][None, :] - oc) * ic
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    ok = (tn <= tf) & (tf > tmin) & (tn < tmax)
    return jnp.where(ok, jnp.maximum(tn, tmin), jnp.float32(_BIG))


def _mt_leaf(rows_g, o, d, tmin, tmax):
    """Fused MT test of each ray against its gathered leaf row.

    rows_g [S, 9*LEAF]; o, d [S, 3]; tmin/tmax [S, 1].
    Returns (t, u, v, hit) each [S, LEAF]."""
    s = rows_g.shape[0]
    leaf = rows_g.shape[1] // 9
    tri = rows_g.reshape(s, 9, leaf)
    v0x, v0y, v0z = tri[:, 0], tri[:, 1], tri[:, 2]
    e1x, e1y, e1z = tri[:, 3], tri[:, 4], tri[:, 5]
    e2x, e2y, e2z = tri[:, 6], tri[:, 7], tri[:, 8]
    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]

    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > _DET_EPS, 1.0 / det, 0.0)
    tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = (
        (jnp.abs(det) > _DET_EPS)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > tmin) & (t < tmax)
    )
    return t, u, v, hit


def _col(x, j):
    """Dynamic column j of [S, K] -> [S]."""
    return jax.lax.dynamic_slice_in_dim(x, j, 1, axis=1)[:, 0]


def _fetch_rows(rows, lj):
    """Per-ray leaf-row fetch ([S] ids -> [S, 9*LEAF] rows).

    A plain row gather: measured on v5e it matches the one-hot-matmul
    MXU-gather trick to within noise (both are bound on the [S, 9*LEAF]
    f32 output traffic, ~40us at S=2048/LEAF=256) and the 3-pass bf16
    split variant is strictly worse (three HBM-materialized partials)."""
    return jnp.take(rows, lj, axis=0)


def _processed_mask(idxs, n_leaves):
    """[S, L] bool: leaves whose index appears in this wave's top-k set."""
    lanes = jax.lax.iota(jnp.int32, n_leaves)[None, :]
    proc = jnp.zeros((idxs.shape[0], n_leaves), bool)
    for k in range(idxs.shape[1]):
        proc = proc | (lanes == idxs[:, k:k + 1])
    return proc


def _closest_seg(tab: LeafTable, o, d, tmin, tmax, live, k_wave):
    """Ordered leaf walk, one segment. All inputs [S(,3)]; returns [S] each."""
    s = o.shape[0]
    n_l = tab.aabb_t.shape[1]
    k = min(k_wave, n_l)
    tmin_c = tmin[:, None]
    inv = _safe_inv(d)
    entry = _slab_entries(tab.aabb_t, o, inv, tmin_c, tmax[:, None])
    entry = jnp.where(live[:, None], entry, jnp.float32(_BIG))

    init = (
        entry,
        tmax,                                  # best_t
        jnp.full((s,), -1, jnp.int32),         # best_prim
        jnp.zeros((s,), jnp.float32),          # best_u
        jnp.zeros((s,), jnp.float32),          # best_v
    )

    def outer_cond(carry):
        entry, best_t, *_ = carry
        return jnp.any(jnp.min(entry, axis=1) < best_t)

    def outer_body(carry):
        entry, best_t, best_prim, best_u, best_v = carry
        neg, idxs = jax.lax.top_k(-entry, k)   # [S, k] entries ascending
        evals = -neg

        def inner_cond(c):
            j, bt, *_ = c
            return (j < k) & jnp.any(_col(evals, jnp.minimum(j, k - 1)) < bt)

        def inner_body(c):
            j, bt, bp, bu, bv = c
            ej = _col(evals, j)
            lj = _col(idxs, j)
            active = ej < bt
            rows_g = _fetch_rows(tab.rows, lj)
            t, u, v, hit = _mt_leaf(rows_g, o, d, tmin_c, bt[:, None])
            hit = hit & active[:, None]
            tt = jnp.where(hit, t, jnp.float32(_BIG))
            t_leaf = jnp.min(tt, axis=1)
            leaf = tt.shape[1]
            lane = jax.lax.iota(jnp.int32, leaf)[None, :]
            at_min = tt <= t_leaf[:, None]
            lane_sel = jnp.min(jnp.where(at_min, lane, leaf), axis=1)
            one = at_min & (lane == lane_sel[:, None])
            u_sel = jnp.sum(jnp.where(one, u, 0.0), axis=1)
            v_sel = jnp.sum(jnp.where(one, v, 0.0), axis=1)
            better = t_leaf < bt
            prim = lj * leaf + lane_sel
            return (
                j + 1,
                jnp.where(better, t_leaf, bt),
                jnp.where(better, prim, bp),
                jnp.where(better, u_sel, bu),
                jnp.where(better, v_sel, bv),
            )

        _, best_t, best_prim, best_u, best_v = jax.lax.while_loop(
            inner_cond, inner_body,
            (jnp.int32(0), best_t, best_prim, best_u, best_v),
        )
        # every top-k leaf is spent: either it was walked, or its entry
        # already exceeded best_t — and best_t only decreases
        entry = jnp.where(_processed_mask(idxs, n_l), jnp.float32(_BIG),
                          entry)
        return (entry, best_t, best_prim, best_u, best_v)

    _, best_t, best_prim, best_u, best_v = jax.lax.while_loop(
        outer_cond, outer_body, init
    )
    # hits on leaf padding triangles are impossible (all-zero => det == 0)
    valid = best_prim >= 0
    return (jnp.where(valid, best_t, tmax), best_prim,
            jnp.where(valid, best_u, 0.0), jnp.where(valid, best_v, 0.0))


def _any_seg(tab: LeafTable, o, d, tmin, tmax, live, k_wave):
    """First-hit-wins occlusion walk (leaf order irrelevant)."""
    s = o.shape[0]
    n_l = tab.aabb_t.shape[1]
    k = min(k_wave, n_l)
    tmin_c = tmin[:, None]
    tmax_c = tmax[:, None]
    inv = _safe_inv(d)
    entry = _slab_entries(tab.aabb_t, o, inv, tmin_c, tmax_c)
    entry = jnp.where(live[:, None], entry, jnp.float32(_BIG))
    found0 = jnp.zeros((s,), bool)

    def outer_cond(carry):
        entry, found = carry
        return jnp.any((jnp.min(entry, axis=1) < _BIG) & ~found)

    def outer_body(carry):
        entry, found = carry
        neg, idxs = jax.lax.top_k(-entry, k)
        evals = -neg

        def inner_cond(c):
            j, fnd = c
            return (j < k) & jnp.any(
                (_col(evals, jnp.minimum(j, k - 1)) < _BIG) & ~fnd
            )

        def inner_body(c):
            j, fnd = c
            ej = _col(evals, j)
            lj = _col(idxs, j)
            active = (ej < _BIG) & ~fnd
            rows_g = _fetch_rows(tab.rows, lj)
            _, _, _, hit = _mt_leaf(rows_g, o, d, tmin_c, tmax_c)
            hit = hit & active[:, None]
            return j + 1, fnd | jnp.any(hit, axis=1)

        _, found = jax.lax.while_loop(inner_cond, inner_body,
                                      (jnp.int32(0), found))
        entry = jnp.where(_processed_mask(idxs, n_l), jnp.float32(_BIG),
                          entry)
        return (entry, found)

    _, found = jax.lax.while_loop(outer_cond, outer_body, (entry, found0))
    return found


def _segmented(fn, tab, o, d, tmin, tmax, live, k_wave, n_out):
    """Run fn per SEG-ray segment via lax.map; returns flat [R] outputs.

    Each segment's round loop exits when ITS rays are done, so the per-round
    cost is bounded by the segment's worst ray, not the wavefront's. To make
    that bound tight, rays are first sorted by leaf-overlap count (a cheap
    extra slab pass): straggler rays (p99 overlaps ~4x the mean on incoherent
    wavefronts) cluster into the last segment instead of inflating every
    segment's round count, and count-gated dead rays (overlap 0) concentrate
    in segments that exit immediately."""
    r = o.shape[0]
    if r <= SEG:
        return fn(tab, o, d, tmin, tmax, live, k_wave)

    entry = _slab_entries(tab.aabb_t, o, _safe_inv(d), tmin[:, None],
                          tmax[:, None])
    n_over = jnp.sum((entry < _BIG) & live[:, None], axis=1,
                     dtype=jnp.int32)
    iota = jax.lax.iota(jnp.int32, r)
    _, perm = jax.lax.sort((n_over, iota), num_keys=1)  # stable
    _, inv_perm = jax.lax.sort((perm, iota), num_keys=1)

    r_pad = -(-r // SEG) * SEG
    pad = r_pad - r

    def padto(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0
        ) if pad else x

    o_s = padto(jnp.take(o, perm, axis=0)).reshape(-1, SEG, 3)
    d_s = padto(jnp.take(d, perm, axis=0)).reshape(-1, SEG, 3)
    tmin_s = padto(jnp.take(tmin, perm)).reshape(-1, SEG)
    tmax_s = padto(jnp.take(tmax, perm), 1.0).reshape(-1, SEG)
    live_s = padto(jnp.take(live, perm), False).reshape(-1, SEG)

    outs = jax.lax.map(
        lambda xs: fn(tab, xs[0], xs[1], xs[2], xs[3], xs[4], k_wave),
        (o_s, d_s, tmin_s, tmax_s, live_s),
    )
    if n_out == 1:
        return jnp.take(outs.reshape(-1)[:r], inv_perm)
    return tuple(jnp.take(x.reshape(-1)[:r], inv_perm) for x in outs)


@functools.partial(jax.jit, static_argnames=("k_wave",))
def trace_closest_leafwalk(tab: LeafTable, o, d, tmin, tmax, *, count=None,
                           k_wave=K_WAVE) -> Hit:
    """Closest hit via per-ray ordered leaf walk.

    `count` (dynamic): only the first count rays are live (wavefront
    compaction contract shared with the pallas kernels)."""
    r = o.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    live = (jnp.arange(r) < (r if count is None else count))
    t, prim, u, v = _segmented(
        _closest_seg, tab, o.astype(jnp.float32), d.astype(jnp.float32),
        tmin, tmax, live, k_wave, 4,
    )
    valid = (prim >= 0) & (prim < tab.num_faces)
    return Hit(t=jnp.where(valid, t, tmax),
               prim=jnp.where(valid, prim, -1), u=u, v=v)


@functools.partial(jax.jit, static_argnames=("k_wave",))
def trace_any_leafwalk(tab: LeafTable, o, d, tmin, tmax, *, count=None,
                       k_wave=K_WAVE):
    """Any-hit occlusion probe (same contract as trace_any_mt)."""
    r = o.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    live = (jnp.arange(r) < (r if count is None else count))
    return _segmented(
        _any_seg, tab, o.astype(jnp.float32), d.astype(jnp.float32),
        tmin, tmax, live, k_wave, 1,
    )


def make_leafwalk_tracer(scene, k_wave: int = K_WAVE, leaf: int = LEAF):
    """(closest, any) tracer pair over the per-ray leaf walk.

    Static scenes only; apply accel.lbvh.morton_order_scene first so leaf
    AABBs are tight (the tracer is correct either way, just slower on
    scrambled face order)."""
    if scene.num_keys != 1:
        raise ValueError("leafwalk tracer supports static scenes only")
    tab = build_leaf_table(scene.geom, leaf=leaf)
    tab = tab._replace(num_faces=scene.num_faces)

    def closest(o, d, tmin, tmax, time, count=None):
        del time
        return trace_closest_leafwalk(tab, o, d, tmin, tmax, count=count,
                                      k_wave=k_wave)

    def any_hit(o, d, tmin, tmax, time, count=None):
        del time
        return trace_any_leafwalk(tab, o, d, tmin, tmax, count=count,
                                  k_wave=k_wave)

    return closest, any_hit
