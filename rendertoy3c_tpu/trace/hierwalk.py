"""Hierarchical gather-round walk: the scalable incoherent-ray tracer.

The TPU answer to optixTraverse over a GAS (shader_common.h:74-94) for
scenes past VMEM residency. Measured laws this design is built on (see
scripts/micro_rounds.py, v5e):

  * a [R, W] row gather costs ~3 ns/ROW at R=32k, INDEPENDENT of W up to
    128 f32 lanes (DMA-descriptor-rate bound, not traffic bound) — so every
    tree node packs a full 128-float row and the only quantity that matters
    is ROWS GATHERED PER RAY;
  * rows wider than 128 lanes or tables past VMEM scale 3x worse;
  * XLA scatters are banned (~10 ns/element serialized), so all per-ray
    traversal state is dense [R] arrays updated with selects.

Structure: a 16-ary tree over 14-triangle leaves, one 128-float row per
node, walked ORDERED DFS with per-ray, per-level pending-children entry
distances (a vectorized stackless traversal — the "stack" is D [16]-float
rows in lanes). One global while_loop round gathers each live ray's
current node row and either MT-tests its 13 inline triangles (leaf) or
slab-tests its 16 child boxes and records their entry distances
(directory). The pop takes the NEAREST pending child at the deepest level
and prunes every pending entry >= the ray's current best_t, so closest
rays terminate in ~2·depth rounds instead of exhausting the full cut
(the straggler fix over the round-1 unordered bitmask walk). Faces must
be pre-ordered spatially (accel.lbvh.split_order_scene with
leaf=HIER_LEAF) so consecutive 14-face leaves and 16-leaf directories get
tight boxes.

Per-ray rows gathered = nodes visited (~10-16 on the 49k box field) vs the
flat leafwalk's ~4.8 leaf visits x 18 row-units each — ~7x fewer row
fetches, which is the whole game at 3 ns/row.

2-key motion scenes use HIER_LEAF_MOTION-triangle leaves with BOTH
keyframes' triangles inline; the leaf test lerps the raw row floats by the
per-ray time (vertex lerp == row lerp, both linear) and directory boxes
union the two keys' child boxes — correct for any t in [0,1] because
lerped vertices are convex combinations (cuda_mesh.h:85-88 motion GAS
semantics). >2-key scenes stack num_keys-1 structurally identical 2-key
SEGMENT tables and walk with a per-ray row offset + local time
(build_hier_table_nkey) — the piecewise-linear N-key motion GAS.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .intersect import Hit

HIER_LEAF = 14    # triangles inline per leaf row (9*14 = 126 lanes)
HIER_LEAF_MOTION = 7  # 2-key leaves: both keys inline (2*9*7 = 126 lanes)
FANOUT = 16       # children per directory row (6*16 = 96 lanes of boxes)
# 32-ary bf16 directories: 32 children x 6 box components = 192 bf16
# values bit-packed two-per-f32 into the same 96 row lanes. The row gather
# is DMA-descriptor-rate bound (~3 ns/row regardless of width), so the
# only lever is ROWS GATHERED PER RAY — doubling the fanout halves the
# directory share of visits and drops a whole level on 200k+/1M tables
# (1M: 5 -> 4 levels, which also unlocks the x4 round unroll and the
# walk pool's inline shadow gate). Box coords are rounded OUTWARD by
# 2^-7 relative before the bf16 cast, so culling stays conservative; leaf
# rows stay exact f32 (MT parity unchanged).
FANOUT32 = 32
# 20-ary EXACT-f32 directories: 6*20 = 120 box lanes still fit under the
# pointer pair. One less level than 16-ary on tables whose leaf count
# lands between 16^(L-1) and 20^(L-1) (the 1M town: 5 -> 4 levels, which
# unlocks the walk pool's x4 round unroll + inline shadow gate) WITHOUT
# FANOUT32's bf16 box loosening (its measured giveback, ROADMAP r3).
FANOUT20 = 20
ROW = 128
_BIG = 1e30
_DET_EPS = 1e-10

# row lane map (tri lanes fill 0..125, so the pointer pair sits at the top)
_L_FIRST = 126    # leaf: first face id / dir: first child id (f32, exact)
_L_TYPE = 127     # 1.0 = leaf, 0.0 = directory


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HierTable:
    """Flat node table: one 128-f32 row per node, levels contiguous.

    Everything but the table itself is static metadata (shape-defining:
    the walk unrolls over levels and builds fanout-wide iotas)."""

    table: jnp.ndarray  # [N, 128] f32
    # first row id of each directory level (root=0); leaves end the table
    level_starts: tuple = dataclasses.field(metadata=dict(static=True))
    leaf_start: int = dataclasses.field(metadata=dict(static=True))
    num_faces: int = dataclasses.field(metadata=dict(static=True))
    # children per directory row (FANOUT32 = bf16-packed boxes)
    fanout: int = dataclasses.field(metadata=dict(static=True),
                                    default=FANOUT)
    # >2-key piecewise-linear vertex motion (cuda_mesh.h:85-88 N obj
    # files = N keys): the table stacks num_keys-1 structurally identical
    # 2-key segment tables; a ray at time t walks segment
    # s = clip(floor(t*(K-1)), 0, K-2) via row offset s*seg_rows with
    # local time t*(K-1)-s. seg_rows = 0 means a single-segment table.
    seg_rows: int = dataclasses.field(metadata=dict(static=True),
                                      default=0)
    n_seg: int = dataclasses.field(metadata=dict(static=True), default=1)


def _bf16_outward(x: np.ndarray, up: bool) -> np.ndarray:
    """Round f32 box coords OUTWARD (up=True toward +inf) and cast bf16.

    The pre-pad of |x|*2^-7 dominates the bf16 nearest-rounding error
    (<= |x|*2^-9), so the cast value is guaranteed on the conservative
    side: lo_b <= lo and hi_b >= hi — boxes only loosen, culling stays
    exact-safe."""
    import ml_dtypes

    m = np.abs(x) * np.float32(2.0 ** -7) + np.float32(1e-34)
    y = x + m if up else x - m
    return y.astype(ml_dtypes.bfloat16)


def _pack_bf16_lohi(lo16: np.ndarray, hi16: np.ndarray) -> np.ndarray:
    """Pack per-child (lo, hi) bf16 pairs into one f32 lane each: lo in
    the LOW 16 bits, hi in the HIGH 16. The walk unpacks with two sub-lane
    integer ops (u << 16 / u & 0xFFFF0000 are exactly the bf16 -> f32
    widenings) — no cross-lane reshuffle, unlike a [.., k, 2] bitcast
    reshape (measured 20.7 -> 15.3 Mray/s on the 49k field)."""
    u32 = ((hi16.view(np.uint16).astype(np.uint32) << 16)
           | lo16.view(np.uint16).astype(np.uint32))
    return u32.view(np.float32)


import os as _os

# Variable directory grouping (r4): directories get DP-chosen CONSECUTIVE
# leaf runs (size <= fanout) minimizing sum(group half-area) + lam per
# group, instead of fixed stride-fanout blocks. On structured scenes the
# fixed blocks straddle objects (a town building's leaves split across
# sibling dirs whose boxes then overlap and ordered DFS pops both):
# simulated bounce visits 200k town 15.8 -> 7.7, town50 11.8 -> 8.2,
# 49k field par (exp/exp_vardir.py); group boundaries stay run-aligned so
# pointers and leaf order are untouched. 0 disables (fixed blocks).
_VAR_DIR = int(_os.environ.get("RT3C_VAR_DIR", "1"))
_VAR_DIR_LAM = float(_os.environ.get("RT3C_VAR_DIR_LAM", "0.5"))


def _dp_group_sizes(lo: np.ndarray, hi: np.ndarray, fanout: int,
                    lam: float) -> list:
    """Boundary DP over the ordered node boxes: minimize
    sum(HA(group)) + lam_abs * n_groups with group size <= fanout.
    lam is in units of the mean real-box half-area (scale-free).
    Returns the group sizes covering 0..n-1 in order."""
    n = lo.shape[0]
    d = np.maximum(hi - lo, 0.0)
    ha1 = d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]
    real = lo[:, 0] < _BIG
    lam_abs = lam * float(ha1[real].mean()) if real.any() else 0.0
    # window-union half-areas: wha[i, k] = HA(union of boxes i-k..i)
    wha = np.full((n, fanout), np.float32(_BIG))
    run_lo = lo.copy()
    run_hi = hi.copy()
    wha[:, 0] = ha1
    for k in range(1, fanout):
        run_lo[k:] = np.minimum(run_lo[k:], lo[:-k])
        run_hi[k:] = np.maximum(run_hi[k:], hi[:-k])
        dk = np.maximum(run_hi[k:] - run_lo[k:], 0.0)
        wha[k:, k] = (dk[:, 0] * dk[:, 1] + dk[:, 1] * dk[:, 2]
                      + dk[:, 2] * dk[:, 0])
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
    sizes.reverse()
    return sizes


def _dir_half_area_sum(leaf_lo, leaf_hi, fanout: int) -> float:
    """Sum of directory-node half-areas for a candidate fanout — the
    visit-probability proxy behind the fanout auto-pick (P(ray visits
    node) ~ HA(node); leaves contribute identically for every fanout).
    Mirrors the bottom-up union in build_hier_table."""
    lo, hi = leaf_lo, leaf_hi
    total = 0.0
    while lo.shape[0] > 1:
        m = lo.shape[0]
        n_dir = -(-m // fanout)
        m_pad = n_dir * fanout
        glo = np.full((m_pad, 3), _BIG, np.float32)
        ghi = np.full((m_pad, 3), _BIG, np.float32)
        glo[:m] = lo
        ghi[:m] = hi
        clo = glo.reshape(n_dir, fanout, 3)
        chi = ghi.reshape(n_dir, fanout, 3)
        real = (clo[:, :, 0] < _BIG)[:, :, None]
        lo = np.where(real, clo, _BIG).min(axis=1).astype(np.float32)
        hi = np.where(real, chi, -_BIG).max(axis=1).astype(np.float32)
        hi = np.where(lo < _BIG, hi, _BIG)
        ok = lo[:, 0] < _BIG
        d = np.maximum(hi[ok] - lo[ok], 0.0)
        total += float((d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2]
                        + d[:, 2] * d[:, 0]).sum())
    return total


def build_hier_table(geom, num_faces: int, num_keys: int = 1,
                     fanout: int = FANOUT,
                     allow_var: bool = True) -> HierTable:
    """Host-side (numpy) build over spatially-ordered faces.

    Leaves are consecutive cap-face runs (cap = HIER_LEAF static,
    HIER_LEAF_MOTION for 2-key scenes, whose leaves inline both keys);
    each directory level groups `fanout` consecutive lower nodes. Order
    the scene with accel.lbvh.split_order_scene(scene, leaf=cap) first.

    fanout=0 auto-picks 16 vs 20 by the smaller directory half-area sum
    (visit-probability proxy, validated on-chip: the 20-ary exact-f32
    directories win every town config +3-8% — town50 drops 4 -> 3
    levels — while the uniform 49k box field prefers 16 by the same
    margin the metric predicts; ROADMAP r4)."""
    if num_keys not in (1, 2):
        raise ValueError("hier table supports 1 or 2 motion keys")
    if fanout not in (0, FANOUT, FANOUT20, FANOUT32):
        raise ValueError(
            f"fanout must be 0 (auto), {FANOUT}, {FANOUT20} or {FANOUT32}")
    cap = HIER_LEAF if num_keys == 1 else HIER_LEAF_MOTION
    f = num_faces
    n_leaf = max(1, -(-f // cap))
    f_pad = n_leaf * cap

    def key_comp(key):
        v0 = np.asarray(geom.v0[key][:f], np.float32)
        e1 = np.asarray(geom.e1[key][:f], np.float32)
        e2 = np.asarray(geom.e2[key][:f], np.float32)
        comp = np.zeros((9, f_pad), np.float32)
        comp[0:3, :f] = v0.T
        comp[3:6, :f] = e1.T
        comp[6:9, :f] = e2.T
        # leaf rows: component-major [9, cap] flattened
        tris = (comp.reshape(9, n_leaf, cap).transpose(1, 0, 2)
                .reshape(n_leaf, 9 * cap))
        return tris, v0, e1, e2

    leaf_tris, v0, e1, e2 = key_comp(0)
    if num_keys == 2:
        tris1, v01, e11, e21 = key_comp(1)
        leaf_tris = np.concatenate([leaf_tris, tris1], axis=1)

    # per-leaf AABBs (over real faces only; union over keys for motion —
    # lerped vertices are convex combos of the keys, so the union bounds
    # every time in [0,1])
    lo_f = np.full((f_pad, 3), _BIG, np.float32)
    hi_f = np.full((f_pad, 3), -_BIG, np.float32)
    lo_f[:f] = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
    hi_f[:f] = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)
    if num_keys == 2:
        lo_f[:f] = np.minimum(
            lo_f[:f], np.minimum(np.minimum(v01, v01 + e11), v01 + e21))
        hi_f[:f] = np.maximum(
            hi_f[:f], np.maximum(np.maximum(v01, v01 + e11), v01 + e21))
    # all-zero faces are variable-leaf padding (sah_split_perm
    # variable=True -> reorder_scene_by_bvh -1 slots) or genuinely
    # degenerate: MT can never hit them (det = 0), so keep them out of
    # the leaf AABBs — a zero face straddling a far-away leaf would
    # otherwise inflate its box through the origin
    fake = ((np.abs(v0).sum(1) == 0) & (np.abs(e1).sum(1) == 0)
            & (np.abs(e2).sum(1) == 0))
    if num_keys == 2:
        fake &= ((np.abs(v01).sum(1) == 0) & (np.abs(e11).sum(1) == 0)
                 & (np.abs(e21).sum(1) == 0))
    if fake.any():
        lo_f[:f][fake] = _BIG
        hi_f[:f][fake] = -_BIG
    leaf_lo = lo_f.reshape(n_leaf, cap, 3).min(axis=1)
    leaf_hi = hi_f.reshape(n_leaf, cap, 3).max(axis=1)

    var_dirs = bool(_VAR_DIR) and allow_var
    if fanout == 0:
        # mode pick by the FIXED-grouping half-area metric: scenes whose
        # stride-16 blocks already bound tightly (uniform fields — the
        # 49k box field) keep fixed 16-ary grouping (measured 22.1 vs
        # 20.2-20.7 for every variable/20-ary variant); everything else
        # takes DP-grouped 20-ary directories (200k town 11.8 -> 15.8,
        # town50 14.0 -> 15.5, 1M 9.1 -> 9.3 on v5e)
        c16 = _dir_half_area_sum(leaf_lo, leaf_hi, FANOUT)
        c20 = _dir_half_area_sum(leaf_lo, leaf_hi, FANOUT20)
        if c16 <= c20:
            fanout = FANOUT
            var_dirs = False
        else:
            fanout = FANOUT20

    # directory levels bottom-up: level[i] groups consecutive runs of
    # level[i+1] nodes — DP-chosen variable runs (<= fanout each, see
    # _VAR_DIR) or fixed stride-fanout blocks
    levels = []  # list of (clo, chi, first_rel [n_dir])
    lo, hi = leaf_lo, leaf_hi
    counts = [n_leaf]
    while counts[0] > 1:
        m = counts[0]
        use_var = var_dirs
        if use_var:
            sizes = _dp_group_sizes(lo, hi, fanout, _VAR_DIR_LAM)
            # progress guard: a singleton-heavy DP solution (boxes so
            # large that no union beats lam) must not stall the level
            # recursion — fall back to fixed blocks for this level
            if len(sizes) * 2 > m:
                use_var = False
            else:
                n_dir = len(sizes)
        if use_var:
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
            n_dir = -(-m // fanout)
            m_pad = n_dir * fanout
            glo = np.full((m_pad, 3), _BIG, np.float32)
            ghi = np.full((m_pad, 3), _BIG, np.float32)  # degenerate far
            glo[:m] = lo
            ghi[:m] = hi
            clo = glo.reshape(n_dir, fanout, 3)
            chi = ghi.reshape(n_dir, fanout, 3)
            first_rel = fanout * np.arange(n_dir, dtype=np.int64)
        levels.insert(0, (clo, chi, first_rel))
        # union over REAL children only (padding slots carry degenerate far
        # boxes that would blow the parent's hi out to +BIG)
        real = (clo[:, :, 0] < _BIG)[:, :, None]
        lo = np.where(real, clo, _BIG).min(axis=1).astype(np.float32)
        hi = np.where(real, chi, -_BIG).max(axis=1).astype(np.float32)
        hi = np.where(lo < _BIG, hi, _BIG)
        counts.insert(0, n_dir)

    # assign row ids: [L0 dirs][L1 dirs]...[leaves]
    starts = []
    acc = 0
    for c in counts[:-1]:
        starts.append(acc)
        acc += c
    leaf_start = acc
    n_rows = acc + n_leaf

    table = np.zeros((n_rows, ROW), np.float32)
    # directory rows
    for li, (clo, chi, first_rel) in enumerate(levels):
        base = starts[li]
        child_base = starts[li + 1] if li + 1 < len(levels) else leaf_start
        n_dir = clo.shape[0]
        rows = table[base:base + n_dir]
        if fanout == FANOUT32:
            # per-component lanes [x: 0..31][y: 32..63][z: 64..95], each
            # f32 lane = (lo bf16 | hi bf16) of one child
            for c in range(3):
                rows[:, c * fanout:(c + 1) * fanout] = _pack_bf16_lohi(
                    _bf16_outward(clo[:, :, c], up=False),
                    _bf16_outward(chi[:, :, c], up=True))
        else:
            # component-major f32 child boxes: lox[16] loy loz hix hiy hiz
            for c in range(3):
                rows[:, c * fanout:(c + 1) * fanout] = clo[:, :, c]
                rows[:, (c + 3) * fanout:(c + 4) * fanout] = chi[:, :, c]
        rows[:, _L_FIRST] = (child_base + first_rel).astype(np.float32)
        rows[:, _L_TYPE] = 0.0
    # leaf rows
    lrows = table[leaf_start:]
    lrows[:, : leaf_tris.shape[1]] = leaf_tris
    lrows[:, _L_FIRST] = cap * np.arange(n_leaf, dtype=np.float32)
    lrows[:, _L_TYPE] = 1.0

    return HierTable(table=jnp.asarray(table),
                     level_starts=tuple(starts),
                     leaf_start=leaf_start, num_faces=f, fanout=fanout)


def build_hier_table_nkey(geom, num_faces: int, num_keys: int,
                          fanout: int = FANOUT) -> HierTable:
    """>2-key piecewise-linear vertex motion: stack num_keys-1 two-key
    SEGMENT tables (keys k, k+1) into one row array. All segments share
    the same face order and FIXED grouping (variable directories are
    disabled — DP boundaries would differ per segment and break the
    shared level structure), so level_starts/leaf_start/pointers are
    segment-invariant and a per-ray row offset of seg*seg_rows selects
    the segment (the fast-path answer to the reference's N-obj-files
    motion GAS, cuda_mesh.h:85-88 / mesh.cpp:39-55). Directory boxes
    bound only their segment's sweep — tighter than any global union."""
    if num_keys <= 2:
        raise ValueError("build_hier_table_nkey needs num_keys > 2")
    if fanout == 0:
        # auto-pick (fanout=0) could resolve differently per segment from
        # the segments' differing leaf boxes, breaking the shared level
        # structure the stacked table requires — require a fixed fanout.
        raise ValueError(
            "build_hier_table_nkey requires a fixed fanout (got 0=auto); "
            "all motion segments must share one level structure")
    tabs = []
    for k in range(num_keys - 1):
        gseg = geom._replace(
            v0=geom.v0[k:k + 2], e1=geom.e1[k:k + 2], e2=geom.e2[k:k + 2],
            n0=geom.n0[k:k + 2], n1=geom.n1[k:k + 2], n2=geom.n2[k:k + 2],
        )
        tabs.append(build_hier_table(gseg, num_faces, num_keys=2,
                                     fanout=fanout, allow_var=False))
    t0 = tabs[0]
    assert all(t.level_starts == t0.level_starts
               and t.leaf_start == t0.leaf_start for t in tabs[1:])
    return HierTable(
        table=jnp.concatenate([t.table for t in tabs], axis=0),
        level_starts=t0.level_starts, leaf_start=t0.leaf_start,
        num_faces=num_faces, fanout=t0.fanout,
        seg_rows=int(t0.table.shape[0]), n_seg=num_keys - 1,
    )


def _seg_select(tab: HierTable, time, r):
    """(seg_off [R] i32, local_time [R]) for an N-segment table."""
    t = (jnp.zeros((r,), jnp.float32) if time is None
         else jnp.broadcast_to(jnp.asarray(time, jnp.float32), (r,)))
    ts = t * jnp.float32(tab.n_seg)
    s = jnp.clip(jnp.floor(ts).astype(jnp.int32), 0, tab.n_seg - 1)
    return s * tab.seg_rows, ts - s.astype(jnp.float32)


def _leaf_mt(rows, o, d, tmin, tcur, time=None):
    """[R, cap] MT test of each ray vs its row's inline triangles.

    With `time` ([R] in [0,1]): rows carry both keys' triangles
    (HIER_LEAF_MOTION wide) and the raw row floats lerp before the test —
    row lerp == vertex lerp, both linear in the components."""
    r = rows.shape[0]
    if time is None:
        cap = HIER_LEAF
        tri = rows[:, :9 * cap].reshape(r, 9, cap)
    else:
        cap = HIER_LEAF_MOTION
        t0 = rows[:, :9 * cap]
        t1 = rows[:, 9 * cap:18 * cap]
        tri = (t0 + time[:, None] * (t1 - t0)).reshape(r, 9, cap)
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
        & (t > tmin) & (t < tcur)
    )
    return t, u, v, hit


def _dir_entries(rows, o, inv, tmin, tcur, fanout: int = FANOUT):
    """[R, fanout] child-box entry distances; _BIG where missed.

    Padding children carry degenerate far boxes (lo = hi = +BIG), which
    fail (tn <= tf) & (tn < tcur) naturally (ROADMAP: inverted boxes are
    NOT safe padding for unordered slab tests). fanout=32 rows carry
    bf16-packed boxes (two per f32 lane, conservative outward rounding)
    which unpack via one bitcast."""
    r = rows.shape[0]
    if fanout == FANOUT32:
        u = jax.lax.bitcast_convert_type(rows[:, :96], jnp.uint32)
    tn = jnp.full((r, fanout), -jnp.float32(_BIG))
    tf = jnp.full((r, fanout), jnp.float32(_BIG))
    for c in range(3):
        if fanout == FANOUT32:
            uc = u[:, c * fanout:(c + 1) * fanout]
            # u << 16 / u & 0xFFFF0000 ARE the bf16 -> f32 widenings of
            # the packed (lo, hi) halves — sub-lane ops, no reshuffle
            lo = jax.lax.bitcast_convert_type(uc << jnp.uint32(16),
                                              jnp.float32)
            hi = jax.lax.bitcast_convert_type(
                uc & jnp.uint32(0xFFFF0000), jnp.float32)
        else:
            lo = rows[:, c * fanout:(c + 1) * fanout]
            hi = rows[:, (c + 3) * fanout:(c + 4) * fanout]
        oc = o[:, c:c + 1]
        ic = inv[:, c:c + 1]
        t0 = (lo - oc) * ic
        t1 = (hi - oc) * ic
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    ok = (tn <= tf) & (tf > tmin) & (tn < tcur)
    return jnp.where(ok, jnp.maximum(tn, tmin), jnp.float32(_BIG))


def _safe_inv(d):
    return jnp.where(jnp.abs(d) > 1e-20, 1.0 / d, jnp.float32(_BIG))


def _prune_cut(best_t):
    """Conservative pruning bound: slab entry and MT hit t round
    differently (~1 ulp each), so a box whose entry lands a few ulps past
    best_t can still contain the true closest hit. Expand the cut by a
    relative+absolute slack before discarding pending subtrees."""
    return best_t * 1.00001 + 1e-6


def _walk(tab: HierTable, o, d, tmin, tmax, live, any_mode: bool,
          time=None, seg_off=None):
    """The gather-round walk. All inputs [R(,3)]; returns best (t, prim,
    u, v) for closest mode, or found [R] bool for any mode. `time` [R]
    selects the 2-key motion leaf layout (see _leaf_mt); `seg_off` [R]
    adds the per-ray segment row offset of an N-key stacked table
    (build_hier_table_nkey) to every gather."""
    r = o.shape[0]
    n_levels = len(tab.level_starts)  # directory levels (root = level 0)
    fanout = tab.fanout
    inv = _safe_inv(d)
    tmin_c = tmin[:, None]
    lane16 = jax.lax.iota(jnp.int32, fanout)[None, :]

    # level-id boundaries are STATIC: level of a row = count of starts <= id
    bounds = tuple(tab.level_starts[1:]) + (tab.leaf_start,)

    state = dict(
        cur=jnp.where(live, 0, -1).astype(jnp.int32),
        best_t=tmax,
        best_prim=jnp.full((r,), -1, jnp.int32),
        best_u=jnp.zeros((r,), jnp.float32),
        best_v=jnp.zeros((r,), jnp.float32),
        found=jnp.zeros((r,), bool),
        # pending-children entry distances per directory level (_BIG = none)
        ents=[jnp.full((r, fanout), jnp.float32(_BIG))
              for _ in range(n_levels)],
        bases=[jnp.zeros((r,), jnp.int32) for _ in range(n_levels)],
    )

    def cond(s):
        return jnp.any(s["cur"] >= 0)

    def body(s):
        cur = s["cur"]
        valid = cur >= 0
        idx = jnp.maximum(cur, 0)
        if seg_off is not None:
            idx = idx + seg_off
        rows = jnp.take(tab.table, idx, axis=0)
        is_leaf = rows[:, _L_TYPE] > 0.5
        first = rows[:, _L_FIRST]

        # --- leaf: fused MT over the inline triangles ---
        tcur = jnp.where(s["found"], 0.0, s["best_t"]) if any_mode \
            else s["best_t"]
        t, u, v, hit = _leaf_mt(rows, o, d, tmin_c, tcur[:, None],
                                time=time)
        hit = hit & (is_leaf & valid)[:, None]
        if any_mode:
            found = s["found"] | jnp.any(hit, axis=1)
            best_t, best_prim = s["best_t"], s["best_prim"]
            best_u, best_v = s["best_u"], s["best_v"]
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
            best_u = jnp.where(
                better, jnp.sum(jnp.where(one, u, 0.0), axis=1), s["best_u"])
            best_v = jnp.where(
                better, jnp.sum(jnp.where(one, v, 0.0), axis=1), s["best_v"])
            found = s["found"]

        # --- directory: slab-test 16 children, record entry distances ---
        ent = _dir_entries(rows, o, inv, tmin_c,
                           _prune_cut(jnp.where(found, 0.0, best_t)
                                      if any_mode else best_t)[:, None],
                           fanout=fanout)
        is_dir = valid & ~is_leaf
        ents = list(s["ents"])
        bases = list(s["bases"])
        for lv in range(n_levels):
            # directory at level lv pushes into slot lv (children entries);
            # DFS invariant: deeper slots are spent when a level-lv node is
            # visited, so a whole-row overwrite is safe
            lo_b = tab.level_starts[lv]
            hi_b = bounds[lv]
            at_lv = is_dir & (cur >= lo_b) & (cur < hi_b)
            ents[lv] = jnp.where(at_lv[:, None], ent, ents[lv])
            bases[lv] = jnp.where(at_lv, first.astype(jnp.int32), bases[lv])

        # --- pop: nearest pending child at the deepest level (ordered
        # DFS), pruning entries past the ray's current best_t ---
        nxt = jnp.full((r,), -1, jnp.int32)
        done_now = found if any_mode else jnp.zeros((r,), bool)
        cut = _prune_cut(jnp.where(found, 0.0, best_t)
                         if any_mode else best_t)[:, None]
        for lv in reversed(range(n_levels)):
            e = ents[lv]
            alive = e < cut          # prune vs the CURRENT best_t
            ee = jnp.where(alive, e, jnp.float32(_BIG))
            e_min = jnp.min(ee, axis=1)
            has = (e_min < _BIG) & valid & (nxt < 0) & ~done_now
            at_min = ee <= e_min[:, None]
            j = jnp.min(jnp.where(at_min, lane16, fanout), axis=1)
            nxt = jnp.where(has, bases[lv] + j, nxt)
            taken = has[:, None] & (lane16 == j[:, None])
            ents[lv] = jnp.where(taken, jnp.float32(_BIG), ents[lv])

        return dict(
            cur=jnp.where(valid, nxt, cur),
            best_t=best_t, best_prim=best_prim,
            best_u=best_u, best_v=best_v, found=found,
            ents=ents, bases=bases,
        )

    state = jax.lax.while_loop(cond, body, state)
    if any_mode:
        return state["found"]
    return state["best_t"], state["best_prim"], state["best_u"], state["best_v"]


# Widest single while_loop the walk will run. XLA on the TPU backend
# MISCOMPILES this loop somewhere between 81920 and 98304 lanes (measured:
# duplicated-ray blocks return different, mostly-miss results at >= 98304
# while every width <= 81920 is exact; the row gather, leaf MT, and slab
# tests are each correct standalone at 131072+). Wider wavefronts are
# walked in sequential <= 65536-lane chunks — the pool still amortizes its
# glue over the full width, and 65536 was the measured-correct sweet spot.
_WALK_CHUNK = 65536


def _walk_chunked(tab, o, d, tmin, tmax, live, any_mode, time,
                  seg_off=None):
    r = o.shape[0]
    if r <= _WALK_CHUNK:
        return _walk(tab, o, d, tmin, tmax, live, any_mode, time=time,
                     seg_off=seg_off)
    outs = []
    for s in range(0, r, _WALK_CHUNK):
        e = min(s + _WALK_CHUNK, r)
        outs.append(_walk(
            tab, o[s:e], d[s:e], tmin[s:e], tmax[s:e], live[s:e],
            any_mode, time=None if time is None else time[s:e],
            seg_off=None if seg_off is None else seg_off[s:e]))
    if any_mode:
        return jnp.concatenate(outs)
    return tuple(jnp.concatenate(parts) for parts in zip(*outs))


@jax.jit
def trace_closest_hier(tab: HierTable, o, d, tmin, tmax, count=None,
                       time=None) -> Hit:
    """Closest hit via the hierarchical gather walk (compaction contract:
    only the first `count` rays are live)."""
    r = o.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    live = jnp.arange(r) < (r if count is None else count)
    seg_off = None
    if tab.n_seg > 1:
        seg_off, time = _seg_select(tab, time, r)
    t, prim, u, v = _walk_chunked(
        tab, o.astype(jnp.float32), d.astype(jnp.float32),
        tmin, tmax, live, any_mode=False, time=time, seg_off=seg_off)
    valid = (prim >= 0) & (prim < tab.num_faces)
    return Hit(t=jnp.where(valid, t, tmax),
               prim=jnp.where(valid, prim, -1),
               u=jnp.where(valid, u, 0.0), v=jnp.where(valid, v, 0.0))


@jax.jit
def trace_any_hier(tab: HierTable, o, d, tmin, tmax, count=None, time=None):
    r = o.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    live = jnp.arange(r) < (r if count is None else count)
    seg_off = None
    if tab.n_seg > 1:
        seg_off, time = _seg_select(tab, time, r)
    return _walk_chunked(tab, o.astype(jnp.float32), d.astype(jnp.float32),
                         tmin, tmax, live, any_mode=True, time=time,
                         seg_off=seg_off)


def make_hierwalk_tracer(scene):
    """(closest, any) pair over the hierarchical gather walk.

    Static and 2-key motion scenes; order the scene with
    accel.lbvh.split_order_scene(scene, leaf=HIER_LEAF or
    HIER_LEAF_MOTION) first so leaves and directories cover compact
    clusters (correct either way, slower on scrambled order)."""
    motion = scene.num_keys >= 2
    if scene.num_keys > 2:
        # N-key piecewise-linear motion: stacked segment tables
        tab = build_hier_table_nkey(scene.geom, scene.num_faces,
                                    scene.num_keys)
    else:
        tab = build_hier_table(scene.geom, scene.num_faces,
                               num_keys=scene.num_keys)

    def _time_col(time, o):
        if not motion:
            return None
        if time is None:
            return jnp.zeros((o.shape[0],), jnp.float32)
        return jnp.broadcast_to(
            jnp.asarray(time, jnp.float32), (o.shape[0],))

    def closest(o, d, tmin, tmax, time, count=None):
        return trace_closest_hier(tab, o, d, tmin, tmax, count=count,
                                  time=_time_col(time, o))

    def any_hit(o, d, tmin, tmax, time, count=None):
        return trace_any_hier(tab, o, d, tmin, tmax, count=count,
                              time=_time_col(time, o))

    return closest, any_hit
