"""Resident-table block-walk traversal: the scalable incoherent-ray path.

Reference parity: optixTraverse over the GAS (shader_common.h:74-94) keeps
per-ray cost near-flat as scenes grow. This module is the TPU answer at the
49k..300k-face scale, complementing the dense tile-cull sweep
(pallas_mt.py, whose per-256-ray-tile cull unions degenerate on diffuse
wavefronts) and the XLA leaf walk (leafwalk.py, bound by per-ray row-gather
HBM traffic at ~240 GB/s effective).

Design, shaped by five v5e measurements (ROADMAP.md records them):
  * XLA gather rounds cost ~390 us per [32k, 576] round — per-ray fetch
    loops at the XLA level cannot win;
  * Pallas grid-step overhead is ~1 us — one-leaf-per-grid-step schedules
    cannot win;
  * lax.while_loop INSIDE a kernel costs ~9 us per iteration and a
    fori_loop with a traced bound lowers to the same thing — loops must be
    static-trip fori;
  * a lax.cond-skipped round is as cheap as not running it (~0.02 us) —
    closest-hit pruning rides per-round conds under the static trip;
  * the whole leaf-row table fits VMEM (64 B/face at the padded [9->16,
    LEAF] tile: 3.2 MB at 49k faces, ~13 MB at 200k) — the ENTIRE walk
    runs inside one kernel over a small grid, and "fetching" a leaf is a
    dynamic leading-dim read of a resident ref (~0.3 us, the same pattern
    as pallas_mt's tris_ref[k]).

Kernel shape: grid (B/G,); each step processes G ray blocks of RT
Morton-sorted rays. Per block: one [RT, L] slab pass against all leaf
AABBs reduced to a block-level entry row [1, L], then T static rounds that
extract the nearest unvisited leaf (argmin over the entry row), read its
row from the resident table, and run one [RT, LEAF] Moller-Trumbore block
— nearest-first with closest-hit pruning via the round conds. Blocks
whose rays still have candidate leaves beyond T report a resume cursor
(last visited (entry, leaf) pair, lexicographic); the XLA wrapper
relaunches until every block is done — one pass typically suffices
(bounce-wavefront p99 pruned visits ~T).

Static scenes only (like leafwalk); motion scenes ride pallas_mt.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit
from .leafwalk import LeafTable, build_leaf_table

RT = 32        # rays per block (Morton-sorted neighbours share leaves)
T_ROUNDS = 24  # static in-kernel rounds per block per pass
GRID_TARGET = 160  # aim for about this many grid steps (1 us/step overhead)
LEAF = 128     # triangles per leaf row
_BIG = 1e30
_DET_EPS = 1e-10


@jax.tree_util.register_pytree_node_class
class WalkTable:
    """Leaf rows + leaf AABBs for the resident-table walk.

    Registered as a pytree: arrays are children, (num_faces, leaf, n_leaves)
    are static aux data (they size kernels and loop bounds)."""

    def __init__(self, rows, aabb_lanes, num_faces, leaf, n_leaves):
        self.rows = rows              # [L, 9, LEAF] f32 (VMEM-resident)
        self.aabb_lanes = aabb_lanes  # [8, Lp] f32 (slab: 6 rows x L lanes)
        self.num_faces = num_faces
        self.leaf = leaf
        self.n_leaves = n_leaves

    @classmethod
    def from_leaf_table(cls, tab: LeafTable, leaf: int):
        n_l = tab.aabb_t.shape[1]
        l_pad = -(-n_l // 128) * 128
        # lane-padded slab table; padding lanes carry a DEGENERATE far box
        # (lo = hi = +BIG). An inverted box (lo > hi) would pass the
        # unordered min/max slab test as an infinite box; a far point-box
        # always fails the tn < tmax clause.
        aabb_lanes = np.full((8, l_pad), _BIG, np.float32)
        aabb_lanes[:6, :n_l] = np.asarray(tab.aabb_t)
        # empty leaves inside n_l (f == 0 padding) also carry inverted
        # boxes upstream; neutralize them the same way
        inv_box = aabb_lanes[0, :] > aabb_lanes[3, :]
        for c in range(6):
            aabb_lanes[c, inv_box] = _BIG
        rows = tab.rows.reshape(n_l, 9, leaf)
        return cls(rows, jnp.asarray(aabb_lanes), tab.num_faces, leaf, n_l)

    def tree_flatten(self):
        return ((self.rows, self.aabb_lanes),
                (self.num_faces, self.leaf, self.n_leaves))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def build_walk_table(geom, num_faces: int, leaf: int = LEAF) -> WalkTable:
    tab = build_leaf_table(geom, leaf=leaf)
    tab = tab._replace(num_faces=num_faces)
    return WalkTable.from_leaf_table(tab, leaf)


def _mt_block(rcols, tcols, tmin, tmax):
    """[RT, LEAF] Moller-Trumbore: ray columns vs one leaf row.

    rcols: (ox..oz, dx..dz) each [RT, 1]; tcols: 9 x [1, LEAF];
    tmin/tmax [RT, 1]. Returns (t, u, v, hit) each [RT, LEAF]."""
    ox, oy, oz, dx, dy, dz = rcols
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = tcols
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > _DET_EPS, 1.0 / det, 0.0)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
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


def _slab_block(aabb_ref, o3, inv3, tmin, tmax):
    """[RT, Lp] slab entries vs every leaf box (BIG on miss).

    aabb_ref [8, Lp] (rows lox loy loz hix hiy hiz); o3/inv3 3 x [RT, 1];
    tmin/tmax [RT, 1]."""
    tn = None
    tf = None
    for c in range(3):
        lo = aabb_ref[c:c + 1, :]        # [1, Lp]
        hi = aabb_ref[c + 3:c + 4, :]
        t0 = (lo - o3[c]) * inv3[c]      # [RT, Lp]
        t1 = (hi - o3[c]) * inv3[c]
        cn = jnp.minimum(t0, t1)
        cf = jnp.maximum(t0, t1)
        tn = cn if tn is None else jnp.maximum(tn, cn)
        tf = cf if tf is None else jnp.minimum(tf, cf)
    ok = (tn <= tf) & (tf > tmin) & (tn < tmax)
    return jnp.where(ok, jnp.maximum(tn, tmin), jnp.float32(_BIG))


def _ray_cols(rays_ref, base, rt):
    return tuple(rays_ref[base:base + rt, c:c + 1] for c in range(8))


def _inv_cols3(cols):
    return tuple(
        jnp.where(jnp.abs(c) > 1e-20, 1.0 / c, jnp.float32(_BIG))
        for c in cols[3:6]
    )


def _argmin_lane(row):
    """(value, index) of the first minimum of a [1, Lp] row, as scalars."""
    m = jnp.min(row)
    lanes = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    idx = jnp.min(jnp.where(row <= m, lanes, jnp.int32(row.shape[1])))
    return m, idx


def _block_emin(aabb_ref, cols, inv3, tmin, tmax, live, er, ir):
    """Block-level entry row with resume masking applied.

    er/ir: resume cursor — leaves with (entry, id) lexicographically <=
    (er, ir) were visited in an earlier pass and are masked out."""
    ent = _slab_block(aabb_ref, cols[0:3], inv3, tmin, tmax)
    emin = jnp.min(ent, axis=0, keepdims=True)   # [1, Lp]
    emin = jnp.where(live, emin, jnp.float32(_BIG))
    lanes = jax.lax.broadcasted_iota(jnp.int32, emin.shape, 1)
    visited = (emin < er) | ((emin == er) & (lanes <= ir))
    return jnp.where(visited, jnp.float32(_BIG), emin)


def _cur_row(done, ce, ci):
    """Pack (done, cursor entry, cursor id) scalars into a [1, 8] row."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    row = jnp.where(lane == 0, done, 0.0)
    row = jnp.where(lane == 1, ce, row)
    return jnp.where(lane == 2, ci.astype(jnp.float32), row)


def _closest_kernel(count_ref, er_ref, ir_ref, rays_ref, rows_ref, aabb_ref,
                    out_ref, cur_ref, *, leaf: int, rt: int, g: int,
                    t_rounds: int):
    step = pl.program_id(0)

    for gi in range(g):
        base = gi * rt
        bidx = step * g + gi
        cols = _ray_cols(rays_ref, base, rt)
        inv3 = _inv_cols3(cols)
        tmin = cols[6]
        live = (bidx * rt) < count_ref[0]

        emin = _block_emin(aabb_ref, cols, inv3, tmin, cols[7], live,
                           er_ref[bidx], ir_ref[bidx])

        init = (
            emin,
            cols[7],                                   # best_t (miss=tmax)
            jnp.full((rt, 1), -1.0, jnp.float32),      # prim
            jnp.zeros((rt, 1), jnp.float32),           # u
            jnp.zeros((rt, 1), jnp.float32),           # v
            er_ref[bidx],                              # cursor entry
            ir_ref[bidx],                              # cursor leaf id
        )

        def round_(m, lid, carry, cols=cols, tmin=tmin):
            emin, best_t, prim, bu, bv, _ce, _ci = carry
            row = rows_ref[lid]                        # [9, LEAF]
            tcols = tuple(row[c:c + 1, :] for c in range(9))
            t, u, v, hit = _mt_block(cols[0:3] + cols[3:6], tcols, tmin,
                                     best_t)
            tt = jnp.where(hit, t, _BIG)
            t_c = jnp.min(tt, axis=1, keepdims=True)
            lane = jax.lax.broadcasted_iota(jnp.int32, (rt, leaf), 1)
            at_min = tt <= t_c
            lane_c = jnp.min(jnp.where(at_min, lane, jnp.int32(leaf)),
                             axis=1, keepdims=True)
            one = at_min & (lane == lane_c)
            u_c = jnp.sum(jnp.where(one, u, 0.0), axis=1, keepdims=True)
            v_c = jnp.sum(jnp.where(one, v, 0.0), axis=1, keepdims=True)
            prim_c = (jnp.float32(leaf) * lid.astype(jnp.float32)
                      + lane_c.astype(jnp.float32))
            better = t_c < best_t
            lanes = jax.lax.broadcasted_iota(jnp.int32, emin.shape, 1)
            emin = jnp.where(lanes == lid, jnp.float32(_BIG), emin)
            return (
                emin,
                jnp.where(better, t_c, best_t),
                jnp.where(better, prim_c, prim),
                jnp.where(better, u_c, bu),
                jnp.where(better, v_c, bv),
                m,
                lid,
            )

        def body(j, carry):
            # closest-hit pruning: once the nearest unvisited leaf starts
            # beyond every ray's best hit, remaining rounds cond-skip
            emin, best_t, *_ = carry
            m, lid = _argmin_lane(emin)
            return jax.lax.cond(m < jnp.max(best_t),
                                lambda c: round_(m, lid, c),
                                lambda c: c, carry)

        emin, best_t, prim, bu, bv, ce, ci = jax.lax.fori_loop(
            0, t_rounds, body, init)
        out_ref[base:base + rt, 0:1] = best_t
        out_ref[base:base + rt, 1:2] = prim
        out_ref[base:base + rt, 2:3] = bu
        out_ref[base:base + rt, 3:4] = bv
        done = jnp.where(jnp.min(emin) < jnp.max(best_t), 0.0, 1.0)
        cur_ref[gi:gi + 1, :] = _cur_row(done, ce, ci)


def _any_kernel(count_ref, er_ref, ir_ref, rays_ref, rows_ref, aabb_ref,
                out_ref, cur_ref, *, leaf: int, rt: int, g: int,
                t_rounds: int):
    step = pl.program_id(0)

    for gi in range(g):
        base = gi * rt
        bidx = step * g + gi
        cols = _ray_cols(rays_ref, base, rt)
        inv3 = _inv_cols3(cols)
        tmin = cols[6]
        tmax = cols[7]
        live = (bidx * rt) < count_ref[0]

        emin = _block_emin(aabb_ref, cols, inv3, tmin, tmax, live,
                           er_ref[bidx], ir_ref[bidx])

        init = (emin, jnp.zeros((rt, 1), jnp.float32), er_ref[bidx],
                ir_ref[bidx])

        def round_(m, lid, carry, cols=cols, tmin=tmin, tmax=tmax):
            emin, occ, _ce, _ci = carry
            row = rows_ref[lid]                        # [9, LEAF]
            tcols = tuple(row[c:c + 1, :] for c in range(9))
            _, _, _, hit = _mt_block(cols[0:3] + cols[3:6], tcols, tmin,
                                     jnp.where(occ > 0.0, tmin, tmax))
            occ = jnp.maximum(
                occ, jnp.max(hit.astype(jnp.float32), axis=1, keepdims=True))
            lanes = jax.lax.broadcasted_iota(jnp.int32, emin.shape, 1)
            emin = jnp.where(lanes == lid, jnp.float32(_BIG), emin)
            return emin, occ, m, lid

        def body(j, carry):
            emin, occ, *_ = carry
            m, lid = _argmin_lane(emin)
            todo = (m < _BIG) & (jnp.min(occ) < 1.0)
            return jax.lax.cond(todo, lambda c: round_(m, lid, c),
                                lambda c: c, carry)

        emin, occ, ce, ci = jax.lax.fori_loop(0, t_rounds, body, init)
        out_ref[base:base + rt, 0:1] = occ
        out_ref[base:base + rt, 1:4] = jnp.zeros((rt, 3), jnp.float32)
        open_ = (jnp.min(emin) < _BIG) & (jnp.min(occ) < 1.0)
        done = jnp.where(open_, 0.0, 1.0)
        cur_ref[gi:gi + 1, :] = _cur_row(done, ce, ci)


def _pick_g(b):
    """Sub-blocks per grid step: amortize the ~1 us/step overhead.

    The cursor output block is (g, 8), whose sublane dim must be 8-aligned
    or cover the whole array — so g is a multiple of 8, or b itself."""
    if b <= 8 or b % 8:
        return b
    g = max(8, (b // GRID_TARGET) // 8 * 8)
    while b % g:
        g -= 8
    return g


def _walk_call(kernel, count, er, ir, rays, tab: WalkTable, rt, t_rounds,
               interpret):
    r_pad = rays.shape[0]
    b = r_pad // rt
    g = _pick_g(b)
    n_l = tab.rows.shape[0]
    lp = tab.aabb_lanes.shape[1]
    return pl.pallas_call(
        functools.partial(kernel, leaf=tab.leaf, rt=rt, g=g,
                          t_rounds=t_rounds),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b // g,),
            in_specs=[
                pl.BlockSpec((g * rt, 8), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_l, 9, tab.leaf), lambda i, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, lp), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((g * rt, 4), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g, 8), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((r_pad, 4), jnp.float32),
            jax.ShapeDtypeStruct((b, 8), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=60 * r_pad * 8 * tab.leaf,
            bytes_accessed=(r_pad * 12 + n_l * 9 * tab.leaf) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(count, er, ir, rays, tab.rows, tab.aabb_lanes)


def _pack(o, d, tmin, tmax, rt):
    r = o.shape[0]
    r_pad = -(-r // rt) * rt
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    rays = jnp.concatenate(
        [o, d, tmin[:, None], tmax[:, None]], axis=1).astype(jnp.float32)
    if r_pad != r:
        # padding rays: d = 0 => slab misses everything, det == 0
        rays = jnp.concatenate(
            [rays, jnp.zeros((r_pad - r, 8), jnp.float32)], axis=0)
    return rays, r, r_pad


@functools.partial(jax.jit, static_argnames=("rt", "t_rounds", "interpret"))
def trace_closest_walk(tab: WalkTable, o, d, tmin, tmax, *, count=None,
                       rt=RT, t_rounds=T_ROUNDS, interpret=False) -> Hit:
    """Closest hit via the resident-table block walk (compaction contract
    as trace_closest_mt: only the first `count` rays are live)."""
    rays, r, r_pad = _pack(o, d, tmin, tmax, rt)
    if count is None:
        count = r
    count = jnp.asarray(count, jnp.int32).reshape(1)
    b = r_pad // rt
    max_pass = -(-tab.n_leaves // t_rounds) + 1

    er0 = jnp.full((b,), -jnp.float32(_BIG))
    ir0 = jnp.full((b,), -1, jnp.int32)
    best0 = jnp.concatenate(
        [rays[:, 7:8], jnp.full((r_pad, 1), -1.0),
         jnp.zeros((r_pad, 2))], axis=1).astype(jnp.float32)

    def pass_(best, er, ir):
        rays_p = jnp.concatenate([rays[:, 0:7], best[:, 0:1]], axis=1)
        out, cur = _walk_call(_closest_kernel, count, er, ir, rays_p, tab,
                              rt, t_rounds, interpret)
        improved = out[:, 1] >= 0.0
        best = jnp.where(improved[:, None], out, best)
        return best, cur

    best, cur = pass_(best0, er0, ir0)

    def cond(carry):
        best, cur, it = carry
        return (it < max_pass) & jnp.any(cur[:, 0] == 0.0)

    def body(carry):
        best, cur, it = carry
        best, cur = pass_(best, cur[:, 1], cur[:, 2].astype(jnp.int32))
        return best, cur, it + 1

    best, _, _ = jax.lax.while_loop(cond, body, (best, cur, jnp.int32(0)))

    best = best[:r]
    t = best[:, 0]
    prim_f = best[:, 1]
    # strict per-ray count gating (block gating in-kernel is coarser)
    live = jnp.arange(r) < count[0]
    valid = (prim_f >= 0.0) & (prim_f < tab.num_faces) & (t < _BIG) & live
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    return Hit(
        t=jnp.where(valid, t, tmax_b),
        prim=jnp.where(valid, prim_f.astype(jnp.int32), -1),
        u=jnp.where(valid, best[:, 2], 0.0),
        v=jnp.where(valid, best[:, 3], 0.0),
    )


@functools.partial(jax.jit, static_argnames=("rt", "t_rounds", "interpret"))
def trace_any_walk(tab: WalkTable, o, d, tmin, tmax, *, count=None, rt=RT,
                   t_rounds=T_ROUNDS, interpret=False):
    """Any-hit occlusion probe via the resident-table block walk."""
    rays, r, r_pad = _pack(o, d, tmin, tmax, rt)
    if count is None:
        count = r
    count = jnp.asarray(count, jnp.int32).reshape(1)
    b = r_pad // rt
    max_pass = -(-tab.n_leaves // t_rounds) + 1

    er0 = jnp.full((b,), -jnp.float32(_BIG))
    ir0 = jnp.full((b,), -1, jnp.int32)

    def pass_(occ, er, ir):
        out, cur = _walk_call(_any_kernel, count, er, ir, rays, tab, rt,
                              t_rounds, interpret)
        return jnp.maximum(occ, out[:, 0]), cur

    occ, cur = pass_(jnp.zeros((r_pad,), jnp.float32), er0, ir0)

    def cond(carry):
        occ, cur, it = carry
        return (it < max_pass) & jnp.any(cur[:, 0] == 0.0)

    def body(carry):
        occ, cur, it = carry
        occ, cur = pass_(occ, cur[:, 1], cur[:, 2].astype(jnp.int32))
        return occ, cur, it + 1

    occ, _, _ = jax.lax.while_loop(cond, body, (occ, cur, jnp.int32(0)))
    live = jnp.arange(r) < count[0]
    return (occ[:r] > 0.0) & live


def max_walk_faces(vmem_budget_bytes: int = 12 << 20) -> int:
    """Largest face count whose leaf rows fit the resident-table budget
    (the [9 -> 16, LEAF]-padded tile costs 64 B/face in VMEM)."""
    return vmem_budget_bytes // 64


def make_walk_tracer(scene, rt: int = RT, leaf: int = LEAF,
                     t_rounds: int = T_ROUNDS,
                     interpret: bool | None = None):
    """(closest, any) tracer pair over the resident-table block walk.

    Static scenes only; apply accel.lbvh.split_order_scene first so leaves
    are spatially tight. Rays should arrive Morton-sorted (the pool
    integrator's sort_rays order) for best leaf sharing — correctness does
    not depend on it."""
    if scene.num_keys != 1:
        raise ValueError("walk tracer supports static scenes only")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    tab = build_walk_table(scene.geom, scene.num_faces, leaf=leaf)

    def closest(o, d, tmin, tmax, time, count=None):
        del time
        return trace_closest_walk(tab, o, d, tmin, tmax, count=count,
                                  rt=rt, t_rounds=t_rounds,
                                  interpret=interpret)

    def any_hit(o, d, tmin, tmax, time, count=None):
        del time
        return trace_any_walk(tab, o, d, tmin, tmax, count=count, rt=rt,
                              t_rounds=t_rounds, interpret=interpret)

    return closest, any_hit
