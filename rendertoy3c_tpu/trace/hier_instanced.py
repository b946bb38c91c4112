"""Instanced hierarchical gather walk — the trace-time TLAS backend.

The TPU answer to optixTraverse over an IAS of motionless instances
(src/cuda/cuda_accel.h:92-150 single-level IAS; traversal transforms rays
into object space per instance). One flat row table extends
trace/hierwalk.py's ordered-DFS walk with two more row types:

  world directory rows : FANOUT instance/world-child AABBs (world space)
  instance rows        : inverse transform (12 lanes) + instance id +
                         mesh-subtree root pointer — visiting one switches
                         the ray into that instance's OBJECT space
  mesh directory rows  : FANOUT object-space child boxes (shared per MESH,
                         not duplicated per instance)
  leaf rows            : HIER_LEAF object-space triangles inline

Rays carry (o_cur, d_cur) for the space they are walking in; d_cur is NOT
renormalized after the affine transform, so MT and slab distances stay in
world-t units and one global best_t prunes across spaces. A pop that
selects a pending WORLD-level child restores the world ray (DFS pops
deepest-first, so an instance's object-space pendings are always exhausted
before the walk leaves it).

Geometry memory stays one copy per MESH (the whole point of trace-time
instancing vs. baking): instance rows reference shared mesh subtrees.

Static and 2-key matrix-motion scenes (motion instance rows carry BOTH
forward keys; visiting one lerps the forward transform by the lane's ray
time and inverts it per lane — the analog of OptixMatrixMotionTransform,
src/cuda/cuda_accel.h:38-73). >2 transform keys stay on the
pallas_instanced kernels.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .hierwalk import (
    _BIG,
    _VAR_DIR,
    _VAR_DIR_LAM,
    _WALK_CHUNK,
    _dp_group_sizes,
    FANOUT,
    FANOUT20,
    FANOUT32,
    HIER_LEAF,
    HIER_LEAF_MOTION,
    ROW,
    _bf16_outward,
    _dir_entries,
    _leaf_mt,
    _pack_bf16_lohi,
    _prune_cut,
    _safe_inv,
)
from .intersect import Hit

import os as _os

# Directory fanout for instanced tables: 16 = f32 boxes, 32 = bf16-packed;
# 0 = auto (32 only when the 16-ary table would exceed 4 levels — the
# level cut then unlocks the walk pool's x4 unroll + inline shadow gate:
# 562k-eff instance field 11.0 -> 12.8, motion 9.8 -> 11.1 Mray/s on v5e.
# SHALLOW tables keep 16: the small trace-time cornell config measured
# 27.2 -> 16.9 at forced 32 — bf16-loosened boxes over heavily
# overlapping instance shells cost more visits than the unpack saves).
INST_DIR_FANOUT = int(_os.environ.get("RT3C_INST_DIR_FANOUT", "0"))


def _levels_at(n: int, fanout: int) -> int:
    lv = 0
    while n > 1:
        n = -(-n // fanout)
        lv += 1
    return max(lv, 1)


def _resolve_inst_fanout(iscene) -> int:
    f = INST_DIR_FANOUT
    if f == 0:  # auto by table depth (see INST_DIR_FANOUT)
        def depth(fo):
            mesh_lv = max(
                _levels_at(-(-cnt // HIER_LEAF), fo)
                for _start, cnt in iscene.mesh_ranges)
            return _levels_at(iscene.num_instances, fo) + mesh_lv
        if depth(FANOUT) <= 4:
            f = FANOUT
        elif depth(FANOUT20) <= 4:
            # 20-ary exact-f32 rows (120 box lanes) achieve the level cut
            # that unlocks the x4 unroll + inline gate WITHOUT the bf16
            # box loosening the 32-ary rows pay (see hierwalk.FANOUT20)
            f = FANOUT20
        else:
            f = FANOUT32
    return f

# row lane map (extends hierwalk's; tri lanes fill 0..125 at HIER_LEAF=14)
_L_FIRST = 126   # child pointer / leaf first-face id (f32, exact)
_L_INST = 12     # static instance row: instance id (lanes 0-11 = inverse)
_L_INST_M = 24   # motion instance row: id (lanes 0-11/12-23 = m0/m1 FWD)
_L_TYPE = 127    # 0 = directory, 1 = leaf, 2 = instance


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class InstHierTable:
    table: jnp.ndarray      # [N, 128] f32
    # static metadata (shape-defining: level unrolls, fanout-wide iotas)
    world_starts: tuple = dataclasses.field(metadata=dict(static=True))
    inst_start: int = dataclasses.field(metadata=dict(static=True))
    mesh_starts: tuple = dataclasses.field(metadata=dict(static=True))
    leaf_start: int = dataclasses.field(metadata=dict(static=True))
    num_faces: int = dataclasses.field(metadata=dict(static=True))
    # 2-key matrix motion: instance rows carry both FORWARD keys; the
    # walk inverts the lerp per ray (trace/instanced.py _lerp_minv
    # semantics, cuda_accel.h matrix motion transforms)
    motion: bool = dataclasses.field(metadata=dict(static=True),
                                     default=False)
    # directory fanout (FANOUT32 = bf16 lo-hi packed boxes; halves the
    # world+mesh level count, unlocking the walk pool's x4 round unroll
    # and inline shadow gate on big instance fields)
    fanout: int = dataclasses.field(metadata=dict(static=True),
                                    default=FANOUT)


def _inv3(m):
    """Batched closed-form 3x3 inverse, [R, 3, 3] (cofactor/adjugate —
    jnp.linalg.inv lowers to LU, needlessly serial for 3x3 on TPU)."""
    a, b, c = m[:, 0, 0], m[:, 0, 1], m[:, 0, 2]
    d, e, f = m[:, 1, 0], m[:, 1, 1], m[:, 1, 2]
    g, h, i = m[:, 2, 0], m[:, 2, 1], m[:, 2, 2]
    ca = e * i - f * h
    cb = c * h - b * i
    cc = b * f - c * e
    cd = f * g - d * i
    ce = a * i - c * g
    cf = c * d - a * f
    cg = d * h - e * g
    ch = b * g - a * h
    ci = a * e - b * d
    det = a * ca + b * cd + c * cg
    r = jnp.where(jnp.abs(det) > 1e-30, 1.0 / det, 0.0)
    return jnp.stack([
        jnp.stack([ca, cb, cc], axis=-1),
        jnp.stack([cd, ce, cf], axis=-1),
        jnp.stack([cg, ch, ci], axis=-1),
    ], axis=-2) * r[:, None, None]


def _inst_space(rows, o_w, d_w, time, motion: bool):
    """Object-space ray + instance id at an instance row.

    Static rows store the precomputed world->object affine (lanes 0:12).
    Motion rows store both FORWARD keys; the world->object transform is
    the per-ray inverse of lerp(m0, m1, time) — inverse-of-lerp, never
    lerp-of-inverses (trace/instanced.py:27-42)."""
    r = rows.shape[0]
    if not motion:
        lin = rows[:, 0:9].reshape(r, 3, 3)
        o_t = jnp.einsum("rij,rj->ri", lin, o_w) + rows[:, 9:12]
        d_t = jnp.einsum("rij,rj->ri", lin, d_w)
        return o_t, d_t, rows[:, _L_INST]
    m0 = rows[:, 0:12].reshape(r, 3, 4)
    m1 = rows[:, 12:24].reshape(r, 3, 4)
    mt = m0 + (m1 - m0) * time[:, None, None]
    lin = _inv3(mt[:, :, :3])
    o_t = jnp.einsum("rij,rj->ri", lin, o_w - mt[:, :, 3])
    d_t = jnp.einsum("rij,rj->ri", lin, d_w)
    return o_t, d_t, rows[:, _L_INST_M]


def _build_levels(lo, hi, fanout, var):
    """Bottom-up directory levels over ordered node boxes: DP-grouped
    variable consecutive runs (hierwalk._dp_group_sizes, r4) or fixed
    stride-fanout blocks. Returns (levels, root_lo, root_hi); levels is
    top-first (clo [n,fanout,3], chi, first_rel [n])."""
    levels = []
    cnt = lo.shape[0]
    while cnt > 1:
        use_var = var
        if use_var:
            sizes = _dp_group_sizes(lo, hi, fanout, _VAR_DIR_LAM)
            # progress guard (see hierwalk): singleton-heavy DP solutions
            # must not stall the level recursion
            if len(sizes) * 2 > cnt:
                use_var = False
        if use_var:
            n_dir = len(sizes)
            clo = np.full((n_dir, fanout, 3), _BIG, np.float32)
            chi = np.full((n_dir, fanout, 3), _BIG, np.float32)
            first_rel = np.zeros(n_dir, np.int64)
            pos = 0
            for gi, sz in enumerate(sizes):
                clo[gi, :sz] = lo[pos:pos + sz]
                chi[gi, :sz] = hi[pos:pos + sz]
                first_rel[gi] = pos
                pos += sz
        else:
            n_dir = -(-cnt // fanout)
            pad = n_dir * fanout
            glo = np.full((pad, 3), _BIG, np.float32)
            ghi = np.full((pad, 3), _BIG, np.float32)  # degenerate far
            glo[:cnt] = lo
            ghi[:cnt] = hi
            clo = glo.reshape(n_dir, fanout, 3)
            chi = ghi.reshape(n_dir, fanout, 3)
            first_rel = fanout * np.arange(n_dir, dtype=np.int64)
        levels.insert(0, (clo, chi, first_rel))
        real = (clo[:, :, 0] < _BIG)[:, :, None]
        lo = np.where(real, clo, _BIG).min(axis=1).astype(np.float32)
        hi = np.where(real, chi, -_BIG).max(axis=1).astype(np.float32)
        hi = np.where(lo < _BIG, hi, _BIG)
        cnt = n_dir
    return levels, lo[0], hi[0]


def _mesh_subtree(v0, e1, e2, first_face, fanout=FANOUT, var=False):
    """Leaf rows + bottom-up levels for one mesh (object space).

    Returns (levels, leaf_rows, root_lo, root_hi) where levels is a list
    (top first) of (child_lo [n,fanout,3], child_hi, first_rel) groups."""
    f = v0.shape[0]
    n_leaf = max(1, -(-f // HIER_LEAF))
    f_pad = n_leaf * HIER_LEAF
    comp = np.zeros((9, f_pad), np.float32)
    comp[0:3, :f] = v0.T
    comp[3:6, :f] = e1.T
    comp[6:9, :f] = e2.T
    leaf_tris = (comp.reshape(9, n_leaf, HIER_LEAF).transpose(1, 0, 2)
                 .reshape(n_leaf, 9 * HIER_LEAF))

    p1 = v0 + e1
    p2 = v0 + e2
    lo_f = np.full((f_pad, 3), _BIG, np.float32)
    hi_f = np.full((f_pad, 3), -_BIG, np.float32)
    lo_f[:f] = np.minimum(np.minimum(v0, p1), p2)
    hi_f[:f] = np.maximum(np.maximum(v0, p1), p2)
    leaf_lo = lo_f.reshape(n_leaf, HIER_LEAF, 3).min(axis=1)
    leaf_hi = hi_f.reshape(n_leaf, HIER_LEAF, 3).max(axis=1)

    leaf_rows = np.zeros((n_leaf, ROW), np.float32)
    leaf_rows[:, :9 * HIER_LEAF] = leaf_tris
    leaf_rows[:, _L_FIRST] = (first_face
                              + HIER_LEAF * np.arange(n_leaf,
                                                      dtype=np.float32))
    leaf_rows[:, _L_TYPE] = 1.0

    if n_leaf == 1:
        return [], leaf_rows, leaf_lo[0], leaf_hi[0]
    levels, root_lo, root_hi = _build_levels(leaf_lo, leaf_hi, fanout, var)
    return levels, leaf_rows, root_lo, root_hi


def split_order_instanced(iscene):
    """Binned-SAH face order WITHIN each mesh range (object space) so
    each mesh's consecutive HIER_LEAF runs cluster tightly
    (accel.lbvh.sah_split_perm). Returns a new InstancedScene (prim ids
    change)."""
    import dataclasses

    from ..accel.lbvh import sah_split_perm

    g = iscene.geom
    f_total = g.mat_id.shape[0]
    perm = np.arange(f_total)
    for start, cnt in iscene.mesh_ranges:
        v0 = np.asarray(g.v0[0][start:start + cnt])
        e1 = np.asarray(g.e1[0][start:start + cnt])
        e2 = np.asarray(g.e2[0][start:start + cnt])
        real = ~((np.abs(v0).sum(1) == 0) & (np.abs(e1).sum(1) == 0)
                 & (np.abs(e2).sum(1) == 0))
        nf = int(real.sum())
        if nf <= HIER_LEAF:
            continue
        lo = np.minimum(np.minimum(v0[:nf], v0[:nf] + e1[:nf]),
                        v0[:nf] + e2[:nf])
        hi = np.maximum(np.maximum(v0[:nf], v0[:nf] + e1[:nf]),
                        v0[:nf] + e2[:nf])
        perm[start:start + nf] = start + sah_split_perm(lo, hi, HIER_LEAF)

    def take(arr, per_key):
        a = np.asarray(arr)
        return jnp.asarray(a[:, perm] if per_key else a[perm])

    geom = g._replace(
        v0=take(g.v0, True), e1=take(g.e1, True), e2=take(g.e2, True),
        n0=take(g.n0, True), n1=take(g.n1, True), n2=take(g.n2, True),
        uv0=take(g.uv0, False), uv1=take(g.uv1, False),
        uv2=take(g.uv2, False), mat_id=take(g.mat_id, False),
        **{k: take(getattr(g, k), False)
           for k in ("uv0b", "uv1b", "uv2b", "c0", "c1", "c2")
           if getattr(g, k) is not None},
    )

    # also order the INSTANCES spatially: the world directory levels group
    # FANOUT consecutive instances, so build-order (arbitrary) grouping
    # gives loose world boxes on large instance fields
    inst = iscene.instances
    ilo = np.asarray(inst.aabb_lo)
    ihi = np.asarray(inst.aabb_hi)
    ifan = _resolve_inst_fanout(iscene)
    iperm = (sah_split_perm(ilo, ihi, ifan)
             if iscene.num_instances > ifan
             else np.arange(iscene.num_instances))
    inst = inst._replace(
        mesh_id=jnp.asarray(np.asarray(inst.mesh_id)[iperm]),
        m=jnp.asarray(np.asarray(inst.m)[iperm]),
        minv=jnp.asarray(np.asarray(inst.minv)[iperm]),
        inv_t=jnp.asarray(np.asarray(inst.inv_t)[iperm]),
        aabb_lo=jnp.asarray(ilo[iperm]),
        aabb_hi=jnp.asarray(ihi[iperm]),
    )
    imesh = tuple(iscene.instance_mesh[int(j)] for j in iperm)
    return dataclasses.replace(iscene, geom=geom, instances=inst,
                               instance_mesh=imesh)


def build_inst_hier_table(iscene, fanout: int | None = None
                          ) -> InstHierTable:
    """Host-side build: world levels over instance AABBs, instance rows,
    shared per-mesh object-space subtrees.

    2-key matrix motion (iscene.num_keys == 2): instance rows carry both
    FORWARD keys and the walk inverts the lerp per ray; the world levels
    stay valid for any t because inst.aabb_lo/hi union the key boxes and
    a lerped affine maps each point along a segment inside that union
    (scene/instanced.py:44-45; cuda_accel.h motion IAS semantics)."""
    if fanout is None:
        fanout = _resolve_inst_fanout(iscene)
    if fanout not in (FANOUT, FANOUT20, FANOUT32):
        raise ValueError(
            f"fanout must be {FANOUT}, {FANOUT20} or {FANOUT32}")
    g = iscene.geom
    inst = iscene.instances
    n_inst = iscene.num_instances
    motion = iscene.num_keys == 2
    minv = np.asarray(inst.minv)[:, 0]        # [I, 3, 4] (static: key 0)
    mfwd = np.asarray(inst.m)                 # [I, 2, 3, 4] forward keys
    ilo = np.asarray(inst.aabb_lo)
    ihi = np.asarray(inst.aabb_hi)

    # per-mesh subtrees (+ world levels): DP-grouped variable runs where
    # the hierwalk structure proxy says fixed blocks bound loosely (the
    # r4 town rule; uniform grids — the 562k tower field measured
    # 12.8 -> 11.5 under forced variable grouping — keep fixed blocks).
    # Judged separately for the world layer (instance boxes) and each
    # mesh subtree (its leaf boxes).
    from .hierwalk import _dir_half_area_sum

    def _wants_var(lo_b, hi_b):
        if not _VAR_DIR or lo_b.shape[0] <= FANOUT:
            return False
        return (_dir_half_area_sum(lo_b, hi_b, FANOUT)
                > _dir_half_area_sum(lo_b, hi_b, FANOUT20))

    mesh_sub = []
    for start, cnt in iscene.mesh_ranges:
        v0 = np.asarray(g.v0[0][start:start + cnt], np.float32)
        e1 = np.asarray(g.e1[0][start:start + cnt], np.float32)
        e2 = np.asarray(g.e2[0][start:start + cnt], np.float32)
        real = ~((np.abs(v0).sum(1) == 0) & (np.abs(e1).sum(1) == 0)
                 & (np.abs(e2).sum(1) == 0))
        nf = max(1, int(real.sum()))
        p1 = v0[:nf] + e1[:nf]
        p2 = v0[:nf] + e2[:nf]
        flo = np.minimum(np.minimum(v0[:nf], p1), p2)
        fhi = np.maximum(np.maximum(v0[:nf], p1), p2)
        nl = -(-nf // HIER_LEAF)
        pad = nl * HIER_LEAF - nf
        if pad:
            flo = np.concatenate([flo, np.full((pad, 3), _BIG, np.float32)])
            fhi = np.concatenate([fhi, np.full((pad, 3), -_BIG,
                                               np.float32)])
        llo = flo.reshape(nl, HIER_LEAF, 3).min(1)
        lhi = fhi.reshape(nl, HIER_LEAF, 3).max(1)
        mesh_sub.append(_mesh_subtree(v0[:nf], e1[:nf], e2[:nf], start,
                                      fanout=fanout,
                                      var=_wants_var(llo, lhi)))
    mesh_depth = max(len(levels) for levels, *_ in mesh_sub)

    # world levels over instances
    if n_inst > 1:
        wlevels, _rl, _rh = _build_levels(ilo, ihi, fanout,
                                          _wants_var(ilo, ihi))
    else:  # single instance: a 1-child root directory
        clo = np.full((1, fanout, 3), _BIG, np.float32)
        chi = np.full((1, fanout, 3), _BIG, np.float32)
        clo[0, 0] = ilo[0]
        chi[0, 0] = ihi[0]
        wlevels = [(clo, chi, np.zeros(1, np.int64))]

    # row layout: [world dirs by level][instance rows]
    #             [mesh dirs by level (all meshes)][leaves (all meshes)]
    world_starts = []
    acc = 0
    for clo, _chi, _fr in wlevels:
        world_starts.append(acc)
        acc += clo.shape[0]
    inst_start = acc
    acc += n_inst
    mesh_starts = []
    mesh_level_rows = []  # per global mesh level: list of (mesh_i, clo, chi)
    for lv in range(mesh_depth):
        mesh_starts.append(acc)
        rows_here = []
        for mi, (levels, *_rest) in enumerate(mesh_sub):
            if lv < len(levels):
                rows_here.append((mi, levels[lv]))
                acc += levels[lv][0].shape[0]
        mesh_level_rows.append(rows_here)
    leaf_start = acc
    leaf_base = {}
    for mi, (_levels, leaf_rows, _lo, _hi) in enumerate(mesh_sub):
        leaf_base[mi] = acc
        acc += leaf_rows.shape[0]
    n_rows = acc

    # per-mesh, per-level row bases (for child pointers)
    level_base = {}
    for lv, rows_here in enumerate(mesh_level_rows):
        base = mesh_starts[lv]
        for mi, (clo, _chi, _fr) in rows_here:
            level_base[(mi, lv)] = base
            base += clo.shape[0]

    table = np.zeros((n_rows, ROW), np.float32)

    def fill_dir(base, clo, chi, first_rel, child_base):
        n_dir = clo.shape[0]
        rows = table[base:base + n_dir]
        if fanout == FANOUT32:
            # bf16 lo-hi pairs, one child per f32 lane (hierwalk packing)
            for c in range(3):
                rows[:, c * fanout:(c + 1) * fanout] = _pack_bf16_lohi(
                    _bf16_outward(clo[:, :, c], up=False),
                    _bf16_outward(chi[:, :, c], up=True))
        else:
            for c in range(3):
                rows[:, c * fanout:(c + 1) * fanout] = clo[:, :, c]
                rows[:, (c + 3) * fanout:(c + 4) * fanout] = chi[:, :, c]
        rows[:, _L_FIRST] = (child_base + first_rel).astype(np.float32)
        rows[:, _L_TYPE] = 0.0

    # world dirs: children of level i are level i+1 rows (or instances)
    for i, (clo, chi, first_rel) in enumerate(wlevels):
        child = (world_starts[i + 1] if i + 1 < len(wlevels) else inst_start)
        fill_dir(world_starts[i], clo, chi, first_rel, child)

    # instance rows
    for i in range(n_inst):
        row = table[inst_start + i]
        if motion:
            row[0:12] = mfwd[i, 0].reshape(12)
            row[12:24] = mfwd[i, 1].reshape(12)
            row[_L_INST_M] = float(i)
        else:
            row[0:9] = minv[i, :, :3].reshape(9)
            row[9:12] = minv[i, :, 3]
            row[_L_INST] = float(i)
        mi = int(np.asarray(inst.mesh_id)[i])
        levels = mesh_sub[mi][0]
        row[_L_FIRST] = (level_base[(mi, 0)] if levels else leaf_base[mi])
        row[_L_TYPE] = 2.0

    # mesh dirs: children at level lv+1 (or the mesh's leaves)
    for lv, rows_here in enumerate(mesh_level_rows):
        for mi, (clo, chi, first_rel) in rows_here:
            levels = mesh_sub[mi][0]
            child = (level_base[(mi, lv + 1)] if lv + 1 < len(levels)
                     else leaf_base[mi])
            fill_dir(level_base[(mi, lv)], clo, chi, first_rel, child)

    # leaves
    for mi, (_levels, leaf_rows, _lo, _hi) in enumerate(mesh_sub):
        table[leaf_base[mi]:leaf_base[mi] + leaf_rows.shape[0]] = leaf_rows

    return InstHierTable(
        table=jnp.asarray(table),
        world_starts=tuple(world_starts),
        inst_start=inst_start,
        mesh_starts=tuple(mesh_starts),
        leaf_start=leaf_start,
        num_faces=int(g.mat_id.shape[0]),
        motion=motion,
        fanout=fanout,
    )


def _walk_inst(tab: InstHierTable, o, d, tmin, tmax, live, any_mode: bool,
               time=None, motion: bool = False):
    """Ordered-DFS walk over the instanced table (see module docstring).

    Per-ray space state: (o_cur, d_cur, inv_cur, inst_cur) switch into an
    instance's object frame at its instance row and restore to world when
    the pop re-enters a world level. `time` is the per-ray motion time
    and `motion` the STATIC motion-table flag (a Python bool, never
    tab.motion inside jit — NamedTuple leaves trace)."""
    r = o.shape[0]
    if time is None:
        time = jnp.zeros((r,), jnp.float32)
    n_world = len(tab.world_starts)
    n_mesh = len(tab.mesh_starts)
    inv_w = _safe_inv(d)
    tmin_c = tmin[:, None]
    fanout = tab.fanout
    lane16 = jax.lax.iota(jnp.int32, fanout)[None, :]

    # directory level id ranges: world levels then mesh levels
    level_lo = list(tab.world_starts) + list(tab.mesh_starts)
    level_hi = (list(tab.world_starts[1:]) + [tab.inst_start]
                + list(tab.mesh_starts[1:]) + [tab.leaf_start])
    n_levels = n_world + n_mesh

    state = dict(
        cur=jnp.where(live, 0, -1).astype(jnp.int32),
        o_cur=o, d_cur=d, inv_cur=inv_w,
        inst_cur=jnp.full((r,), -1, jnp.int32),
        best_t=tmax,
        best_prim=jnp.full((r,), -1, jnp.int32),
        best_inst=jnp.full((r,), -1, jnp.int32),
        best_u=jnp.zeros((r,), jnp.float32),
        best_v=jnp.zeros((r,), jnp.float32),
        found=jnp.zeros((r,), bool),
        ents=[jnp.full((r, fanout), jnp.float32(_BIG))
              for _ in range(n_levels)],
        bases=[jnp.zeros((r,), jnp.int32) for _ in range(n_levels)],
    )

    def cond(s):
        return jnp.any(s["cur"] >= 0)

    def body(s):
        cur = s["cur"]
        valid = cur >= 0
        rows = jnp.take(tab.table, jnp.maximum(cur, 0), axis=0)
        typ = rows[:, _L_TYPE]
        is_leaf = typ > 0.5
        is_inst = typ > 1.5
        is_leaf = is_leaf & ~is_inst
        first = rows[:, _L_FIRST]
        o_cur, d_cur, inv_cur = s["o_cur"], s["d_cur"], s["inv_cur"]

        # --- leaf: fused MT in the current space (t in world units) ---
        tcur = jnp.where(s["found"], 0.0, s["best_t"]) if any_mode \
            else s["best_t"]
        t, u, v, hit = _leaf_mt(rows, o_cur, d_cur, tmin_c, tcur[:, None])
        hit = hit & (is_leaf & valid)[:, None]
        if any_mode:
            found = s["found"] | jnp.any(hit, axis=1)
            best_t, best_prim = s["best_t"], s["best_prim"]
            best_u, best_v = s["best_u"], s["best_v"]
            best_inst = s["best_inst"]
        else:
            cap = hit.shape[1]
            tt = jnp.where(hit, t, jnp.float32(_BIG))
            t_leaf = jnp.min(tt, axis=1)
            lane = jax.lax.iota(jnp.int32, cap)[None, :]
            at_min = tt <= t_leaf[:, None]
            lane_sel = jnp.min(jnp.where(at_min, lane, cap), axis=1)
            one = at_min & (lane == lane_sel[:, None])
            better = t_leaf < s["best_t"]
            best_t = jnp.where(better, t_leaf, s["best_t"])
            best_prim = jnp.where(
                better, first.astype(jnp.int32) + lane_sel, s["best_prim"])
            best_inst = jnp.where(better, s["inst_cur"], s["best_inst"])
            best_u = jnp.where(
                better, jnp.sum(jnp.where(one, u, 0.0), axis=1), s["best_u"])
            best_v = jnp.where(
                better, jnp.sum(jnp.where(one, v, 0.0), axis=1), s["best_v"])
            found = s["found"]

        # --- instance row: switch into object space, jump to subtree ---
        o_t, d_t, iid = _inst_space(rows, o, d, time, motion)
        sel_i = (valid & is_inst)[:, None]
        o_cur = jnp.where(sel_i, o_t, o_cur)
        d_cur = jnp.where(sel_i, d_t, d_cur)
        inv_cur = jnp.where(sel_i, _safe_inv(d_t), inv_cur)
        inst_cur = jnp.where(valid & is_inst, iid.astype(jnp.int32),
                             s["inst_cur"])

        # --- directory: slab-test children in the current space ---
        ent = _dir_entries(rows, o_cur, inv_cur, tmin_c,
                           _prune_cut(jnp.where(found, 0.0, best_t)
                                      if any_mode else best_t)[:, None],
                           fanout=fanout)
        is_dir = valid & ~is_leaf & ~is_inst
        ents = list(s["ents"])
        bases = list(s["bases"])
        for lv in range(n_levels):
            at_lv = is_dir & (cur >= level_lo[lv]) & (cur < level_hi[lv])
            ents[lv] = jnp.where(at_lv[:, None], ent, ents[lv])
            bases[lv] = jnp.where(at_lv, first.astype(jnp.int32), bases[lv])

        # --- pop: nearest pending at the deepest level; instance rows
        # jump straight to their subtree root instead ---
        nxt = jnp.full((r,), -1, jnp.int32)
        pop_lv = jnp.full((r,), -1, jnp.int32)
        done_now = found if any_mode else jnp.zeros((r,), bool)
        cut = _prune_cut(jnp.where(found, 0.0, best_t)
                         if any_mode else best_t)[:, None]
        for lv in reversed(range(n_levels)):
            e = ents[lv]
            alive_e = e < cut
            ee = jnp.where(alive_e, e, jnp.float32(_BIG))
            e_min = jnp.min(ee, axis=1)
            has = (e_min < _BIG) & valid & ~is_inst & (nxt < 0) & ~done_now
            at_min = ee <= e_min[:, None]
            j = jnp.min(jnp.where(at_min, lane16, fanout), axis=1)
            nxt = jnp.where(has, bases[lv] + j, nxt)
            pop_lv = jnp.where(has, lv, pop_lv)
            taken = has[:, None] & (lane16 == j[:, None])
            ents[lv] = jnp.where(taken, jnp.float32(_BIG), ents[lv])

        # instance rows jump directly (their single child)
        go_inst = valid & is_inst & ~done_now
        nxt = jnp.where(go_inst, first.astype(jnp.int32), nxt)

        # a world-level pop leaves the current instance: restore world ray
        back = (pop_lv >= 0) & (pop_lv < n_world)
        o_cur = jnp.where(back[:, None], o, o_cur)
        d_cur = jnp.where(back[:, None], d, d_cur)
        inv_cur = jnp.where(back[:, None], inv_w, inv_cur)
        inst_cur = jnp.where(back, -1, inst_cur)

        return dict(
            cur=jnp.where(valid, nxt, cur),
            o_cur=o_cur, d_cur=d_cur, inv_cur=inv_cur, inst_cur=inst_cur,
            best_t=best_t, best_prim=best_prim, best_inst=best_inst,
            best_u=best_u, best_v=best_v, found=found,
            ents=ents, bases=bases,
        )

    state = jax.lax.while_loop(cond, body, state)
    if any_mode:
        return state["found"]
    return (state["best_t"], state["best_prim"], state["best_inst"],
            state["best_u"], state["best_v"])


def _walk_inst_chunked(tab, o, d, tmin, tmax, live, any_mode, time=None,
                       motion=False):
    r = o.shape[0]
    if time is None:
        time = jnp.zeros((r,), jnp.float32)
    if r <= _WALK_CHUNK:
        return _walk_inst(tab, o, d, tmin, tmax, live, any_mode, time=time,
                          motion=motion)
    outs = []
    for s in range(0, r, _WALK_CHUNK):
        e = min(s + _WALK_CHUNK, r)
        outs.append(_walk_inst(tab, o[s:e], d[s:e], tmin[s:e], tmax[s:e],
                               live[s:e], any_mode, time=time[s:e],
                               motion=motion))
    if any_mode:
        return jnp.concatenate(outs)
    return tuple(jnp.concatenate(parts) for parts in zip(*outs))


@functools.partial(jax.jit, static_argnames=("motion",))
def trace_closest_inst_hier(tab: InstHierTable, o, d, tmin, tmax,
                            count=None, time=None,
                            motion: bool = False) -> Hit:
    r = o.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    live = jnp.arange(r) < (r if count is None else count)
    t, prim, inst, u, v = _walk_inst_chunked(
        tab, o.astype(jnp.float32), d.astype(jnp.float32), tmin, tmax,
        live, any_mode=False, time=time, motion=motion)
    valid = (prim >= 0) & (prim < tab.num_faces)
    return Hit(t=jnp.where(valid, t, tmax),
               prim=jnp.where(valid, prim, -1),
               u=jnp.where(valid, u, 0.0), v=jnp.where(valid, v, 0.0),
               inst=jnp.where(valid, inst, -1))


@functools.partial(jax.jit, static_argnames=("motion",))
def trace_any_inst_hier(tab: InstHierTable, o, d, tmin, tmax, count=None,
                        time=None, motion: bool = False):
    r = o.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    live = jnp.arange(r) < (r if count is None else count)
    return _walk_inst_chunked(tab, o.astype(jnp.float32),
                              d.astype(jnp.float32), tmin, tmax, live,
                              any_mode=True, time=time, motion=motion)


def make_inst_hierwalk_tracer(iscene):
    """(closest, any) over the instanced hierarchical walk (static or
    2-key matrix motion; cuda_accel.h:92-150 IAS + motion transforms).

    Order the scene with split_order_instanced first (correct either way,
    slower on scrambled order)."""
    if iscene.num_keys > 2:
        raise ValueError(
            "instanced hierwalk supports <= 2 transform keys; more keys "
            "ride the pallas_instanced kernels")
    tab = build_inst_hier_table(iscene)

    motion = bool(tab.motion)

    def _times(time, r):
        if not motion:
            return None
        if time is None:
            time = 0.0
        return jnp.broadcast_to(jnp.asarray(time, jnp.float32), (r,))

    def closest(o, d, tmin, tmax, time, count=None):
        return trace_closest_inst_hier(tab, o, d, tmin, tmax, count=count,
                                       time=_times(time, o.shape[0]),
                                       motion=motion)

    def any_hit(o, d, tmin, tmax, time, count=None):
        return trace_any_inst_hier(tab, o, d, tmin, tmax, count=count,
                                   time=_times(time, o.shape[0]),
                                   motion=motion)

    return closest, any_hit


# ---------------------------------------------------------------------------
# Pre-transformed world-space tables (the "flatten the IAS" memory trade)
# ---------------------------------------------------------------------------

# Baked-table budget: effective (instance-expanded) leaf rows in the flat
# world-space table, ~512 B each. The default admits ~5.7M effective faces
# (~200 MB of HBM) — far past the bench's 562k-face tower field and a tiny
# slice of a v5e's 16 GB. RT3C_INST_BAKE=0 disables, =2 forces (tests).
INST_BAKE_MAX_ROWS = int(_os.environ.get("RT3C_INST_BAKE_ROWS", "409600"))
_INST_BAKE = _os.environ.get("RT3C_INST_BAKE", "1")


def baked_world_eligible(iscene) -> bool:
    """Instanced scenes whose instance-expanded world-space table fits
    the bake budget and whose encoded hit ids stay f32-exact.

    The OptiX analog is flattening an IAS into one GAS when memory allows
    (cuda_accel.h:92-150 keeps the two-level IAS because GPU hardware
    traversal makes the per-instance transform free; the TPU gather walk
    pays ~9 XLA ops per round for the space switch, so buying them out
    with duplicated world-space leaf rows is the right trade).

    2-key matrix motion CAN bake (a lerped affine is linear in its
    entries, so lerp(m0,m1,t) @ v == lerp(m0 @ v, m1 @ v, t) EXACTLY and
    the per-key world vertices form an ordinary 2-key vertex-motion leaf
    table) but measured SLOWER on the bench tower field (8.4 vs 11.4
    Mray/s, r5): baked boxes must bound ALL t — leaf-granularity key
    unions inflate under per-instance yaw — while the space-switching
    walk gets tight per-t object-space boxes at every level. So the auto
    path bakes STATIC scenes only; RT3C_INST_BAKE=2 forces motion bakes
    for parity tests/A-B."""
    mode = _os.environ.get("RT3C_INST_BAKE", _INST_BAKE)
    if mode == "0":
        return False
    if iscene.num_keys not in (1, 2):
        return False
    if iscene.num_keys == 2 and mode != "2":
        return False
    stride = int(iscene.geom.mat_id.shape[0])
    if iscene.num_instances * stride >= 1 << 24:  # f32-exact hit ids
        return False
    cap = HIER_LEAF if iscene.num_keys == 1 else HIER_LEAF_MOTION
    rows = sum(
        -(-iscene.mesh_ranges[m][1] // cap)
        for m in iscene.instance_mesh)
    return rows <= INST_BAKE_MAX_ROWS


def build_baked_world_table(iscene, fanout: int = 0):
    """Flat world-space hier table over the instance-EXPANDED geometry.

    Every instance's mesh triangles are pre-transformed by its (static)
    forward transform and emitted as ordinary hierwalk leaf rows, so the
    walk is exactly trace/hierwalk.py's — no instance rows, no per-round
    object-space switch (measured the non-gather half of the instanced
    band's subframe, VERDICT r4 item 4). Leaf ids encode
    eff = instance * stride + global_face (stride = stored face count);
    the walk-pool boundary decodes (face, instance) for the shade stage's
    per-instance inverse-transpose normal transform, so shading semantics
    are IDENTICAL to the space-switching walk — only traversal arithmetic
    runs in world space.

    Returns (hierwalk.HierTable, stride). Instances/faces must already be
    split_order_instanced-ordered (instance-major leaf order then rides
    the SAH instance permutation)."""
    from .hierwalk import (
        HierTable,
        _dir_half_area_sum,
        _L_FIRST as _H_FIRST,
        _L_TYPE as _H_TYPE,
    )

    g = iscene.geom
    inst = iscene.instances
    n_inst = iscene.num_instances
    stride = int(g.mat_id.shape[0])
    if iscene.num_keys not in (1, 2):
        raise ValueError("baked world tables support 1 or 2 transform "
                         "keys (lerped affines are linear in their "
                         "entries, so 2-key matrix motion bakes to "
                         "2-key vertex-motion leaves)")
    n_keys = iscene.num_keys
    m_all = np.asarray(inst.m)  # [I, K, 3, 4] forward keys
    cap = HIER_LEAF if n_keys == 1 else HIER_LEAF_MOTION

    # per-mesh real-face slices (object space, split-ordered)
    mesh_faces = {}
    for mi, (start, cnt) in enumerate(iscene.mesh_ranges):
        v0 = np.asarray(g.v0[0][start:start + cnt], np.float32)
        e1 = np.asarray(g.e1[0][start:start + cnt], np.float32)
        e2 = np.asarray(g.e2[0][start:start + cnt], np.float32)
        real = ~((np.abs(v0).sum(1) == 0) & (np.abs(e1).sum(1) == 0)
                 & (np.abs(e2).sum(1) == 0))
        nf = max(1, int(real.sum()))
        mesh_faces[mi] = (start, v0[:nf], e1[:nf], e2[:nf])

    rows_per_inst = []
    lo_per_inst = []
    hi_per_inst = []
    for i in range(n_inst):
        start, v0, e1, e2 = mesh_faces[iscene.instance_mesh[i]]
        nf = v0.shape[0]
        nl = -(-nf // cap)
        f_pad = nl * cap
        rows = np.zeros((nl, ROW), np.float32)
        lo_f = np.full((f_pad, 3), _BIG, np.float32)
        hi_f = np.full((f_pad, 3), -_BIG, np.float32)
        for k in range(n_keys):
            lin_t = m_all[i, k, :, :3].T
            v0w = v0 @ lin_t + m_all[i, k, :, 3]
            e1w = e1 @ lin_t
            e2w = e2 @ lin_t
            comp = np.zeros((9, f_pad), np.float32)
            comp[0:3, :nf] = v0w.T
            comp[3:6, :nf] = e1w.T
            comp[6:9, :nf] = e2w.T
            rows[:, 9 * cap * k:9 * cap * (k + 1)] = (
                comp.reshape(9, nl, cap).transpose(1, 0, 2)
                .reshape(nl, 9 * cap))
            # leaf boxes: union over keys (lerped verts are convex combos)
            lo_f[:nf] = np.minimum(
                lo_f[:nf],
                np.minimum(np.minimum(v0w, v0w + e1w), v0w + e2w))
            hi_f[:nf] = np.maximum(
                hi_f[:nf],
                np.maximum(np.maximum(v0w, v0w + e1w), v0w + e2w))
        rows[:, _H_FIRST] = (float(i * stride + start)
                             + cap * np.arange(nl, dtype=np.float32))
        rows[:, _H_TYPE] = 1.0
        rows_per_inst.append(rows)
        lo_per_inst.append(lo_f.reshape(nl, cap, 3).min(axis=1))
        hi_per_inst.append(hi_f.reshape(nl, cap, 3).max(axis=1))

    leaf_rows = np.concatenate(rows_per_inst, axis=0)
    leaf_lo = np.concatenate(lo_per_inst, axis=0)
    leaf_hi = np.concatenate(hi_per_inst, axis=0)
    n_leaf = leaf_rows.shape[0]

    # directory fanout/grouping: the same fixed-16-vs-20 half-area
    # comparator as build_hier_table (uniform fields keep fixed 16-ary;
    # irregular layouts take DP-grouped 20-ary runs)
    if fanout not in (0, FANOUT, FANOUT20):
        raise ValueError(
            f"baked world tables support fanout 0 (auto), {FANOUT} or "
            f"{FANOUT20} (bf16-packed 32-ary rows are not built here)")
    var = bool(_VAR_DIR)
    if fanout == 0:
        if (_dir_half_area_sum(leaf_lo, leaf_hi, FANOUT)
                <= _dir_half_area_sum(leaf_lo, leaf_hi, FANOUT20)):
            fanout = FANOUT
            var = False
        else:
            fanout = FANOUT20
    if n_leaf > 1:
        levels, _rl, _rh = _build_levels(leaf_lo, leaf_hi, fanout, var)
    else:
        levels = []

    starts = []
    acc = 0
    for clo, _chi, _fr in levels:
        starts.append(acc)
        acc += clo.shape[0]
    leaf_start = acc  # no levels: row 0 IS the single leaf (walk root)
    table = np.zeros((leaf_start + n_leaf, ROW), np.float32)
    for li, (clo, chi, first_rel) in enumerate(levels):
        base = starts[li]
        child = starts[li + 1] if li + 1 < len(levels) else leaf_start
        rows = table[base:base + clo.shape[0]]
        for c in range(3):
            rows[:, c * fanout:(c + 1) * fanout] = clo[:, :, c]
            rows[:, (c + 3) * fanout:(c + 4) * fanout] = chi[:, :, c]
        rows[:, _H_FIRST] = (child + first_rel).astype(np.float32)
        rows[:, _H_TYPE] = 0.0
    table[leaf_start:] = leaf_rows

    return (HierTable(table=jnp.asarray(table),
                      level_starts=tuple(starts) if levels else (),
                      leaf_start=leaf_start,
                      num_faces=n_inst * stride,  # eff-id validity bound
                      fanout=fanout),
            stride)
