"""LBVH build -> 8-wide flattened BVH.

TPU-native replacement for optixAccelBuild (src/cuda/cuda_mesh.h:33-155):
no RT cores exist, so we build our own structure, shaped for a vector
machine rather than per-thread pointer chasing:

  * triangles are sorted by the Morton code of their centroid (classic LBVH,
    Lauterbach/Karras) so leaves cover compact spatial clusters AND the
    triangle SoA itself becomes spatially coherent in HBM;
  * topology comes from Karras-style longest-common-prefix splits of the
    sorted codes (recursive radix splits, median fallback on equal codes),
    with subtrees of <= max_leaf triangles collapsed into leaves;
  * the binary tree is then collapsed into 8-wide nodes: one traversal step
    gathers all 8 child AABBs of a node and slab-tests them in a single
    [rays, 8] vector op — divergent per-lane binary descent is replaced by
    wide, regular work that the VPU tiles cleanly;
  * child AABBs are stored in the parent (SoA [N, 8, 3] lo/hi + [N, 8]
    child index), so each step is exactly one gather per ray.

Motion blur: node AABBs are unions over all motion keys (conservative bound,
like OptiX's motion GAS covering timeBegin..timeEnd, cuda_mesh.h:85-88);
leaf triangle tests lerp the actual keyed vertices per-ray.

Child slot encoding (int32):
  >= 0  : internal child, value = node index
  -1    : empty slot (ENC_EMPTY)
  <= -2 : leaf, encoding start/count as -(2 + (start << LEAF_BITS) + count)

The build runs on host numpy at scene-load time (the reference also builds
its BVH on scene load, cuda_scene.h:124-158); a C++ builder can replace it
for very large scenes (native/).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from .morton import morton3d_np

ENC_EMPTY = -1
LEAF_BITS = 5  # up to 31 triangles per leaf
MAX_LEAF = (1 << LEAF_BITS) - 1


def _encode_leaf(start: int, count: int) -> int:
    assert 0 < count <= MAX_LEAF
    return -(2 + (start << LEAF_BITS) + count)


def decode_leaf(v: jnp.ndarray):
    """Vectorized decode of leaf slots: returns (start, count)."""
    raw = -v - 2
    return raw >> LEAF_BITS, raw & MAX_LEAF


class BVH8(NamedTuple):
    """Flat 8-wide BVH (device pytree)."""

    child_lo: jnp.ndarray  # [N, 8, 3] f32 child AABB mins
    child_hi: jnp.ndarray  # [N, 8, 3] f32 child AABB maxs
    child: jnp.ndarray  # [N, 8] i32 slot encoding (see module docstring)


def _tri_aabbs(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray):
    """Per-triangle AABBs unioned over motion keys. v0/e1/e2: [K, F, 3]."""
    p0 = v0
    p1 = v0 + e1
    p2 = v0 + e2
    lo = np.minimum(np.minimum(p0, p1), p2).min(axis=0)
    hi = np.maximum(np.maximum(p0, p1), p2).max(axis=0)
    return lo, hi


def build_bvh8(
    v0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
    num_faces: int, max_leaf: int = 8, use_native: bool = True,
) -> Tuple[np.ndarray, BVH8]:
    """Build over faces [0, num_faces) of [K, F, 3] slabs.

    Returns (perm, bvh): perm is the Morton ordering to apply to the face
    axis (length num_faces); leaves reference post-permutation indices.

    Uses the C++ builder (native/lbvh.cc) when available — same Morton
    scheme and split rule, tight loops instead of per-node Python — with
    this Python implementation as the fallback/oracle.
    """
    assert 1 <= max_leaf <= MAX_LEAF
    v0 = np.asarray(v0, np.float32)[:, :num_faces]
    e1 = np.asarray(e1, np.float32)[:, :num_faces]
    e2 = np.asarray(e2, np.float32)[:, :num_faces]
    lo, hi = _tri_aabbs(v0, e1, e2)

    if use_native:
        try:
            from ..native import native_build_bvh8

            out = native_build_bvh8(lo, hi, max_leaf)
        except Exception:
            out = None
        if out is not None:
            perm, child_lo, child_hi, child = out
            return perm, BVH8(
                child_lo=jnp.asarray(child_lo),
                child_hi=jnp.asarray(child_hi),
                child=jnp.asarray(child),
            )
    centroid = 0.5 * (lo + hi)
    scene_lo = centroid.min(axis=0)
    scene_hi = centroid.max(axis=0)
    extent = np.maximum(scene_hi - scene_lo, 1e-12)
    codes = morton3d_np((centroid - scene_lo) / extent)
    perm = np.argsort(codes, kind="stable").astype(np.int32)
    codes = codes[perm].astype(np.uint64)
    # append index bits so all keys are distinct (Karras trick)
    keys = (codes << np.uint64(32)) | np.arange(num_faces, dtype=np.uint64)
    lo_s = lo[perm]
    hi_s = hi[perm]

    # --- binary topology via radix splits (iterative, host) ---
    # node = (start, end); leaves are ranges <= max_leaf
    left_child: list = []
    right_child: list = []
    ranges: list = []

    def make_node(s, e):
        idx = len(ranges)
        ranges.append((s, e))
        left_child.append(-1)
        right_child.append(-1)
        return idx

    def split_pos(s, e):
        """First index in (s, e) whose key differs from keys[s] at the
        highest differing bit of keys[s], keys[e-1]."""
        first, last = int(keys[s]), int(keys[e - 1])
        diff = first ^ last
        if diff == 0:
            return (s + e) // 2
        top = diff.bit_length() - 1
        mask = ~((1 << top) - 1) & ((1 << 64) - 1)
        prefix = first & mask
        # binary search for first key with a different prefix at `top`
        lo_i, hi_i = s + 1, e
        while lo_i < hi_i:
            mid = (lo_i + hi_i) // 2
            if (int(keys[mid]) & mask) == prefix:
                lo_i = mid + 1
            else:
                hi_i = mid
        if lo_i == e:  # degenerate; median
            return (s + e) // 2
        return lo_i

    root = make_node(0, num_faces)
    stack = [root]
    while stack:
        n = stack.pop()
        s, e = ranges[n]
        if e - s <= max_leaf:
            continue
        m = split_pos(s, e)
        l = make_node(s, m)
        r = make_node(m, e)
        left_child[n] = l
        right_child[n] = r
        stack.append(l)
        stack.append(r)

    n_bin = len(ranges)
    is_leaf_bin = np.asarray([lc < 0 for lc in left_child])

    # Bottom-up AABBs: children were created after their parents, so a
    # reverse pass sees children before parents. Leaves reduce over their
    # triangle range (O(F) total); internals union their two children.
    node_lo = np.empty((n_bin, 3), np.float32)
    node_hi = np.empty((n_bin, 3), np.float32)
    for i in range(n_bin - 1, -1, -1):
        if left_child[i] < 0:
            s, e = ranges[i]
            node_lo[i] = lo_s[s:e].min(axis=0)
            node_hi[i] = hi_s[s:e].max(axis=0)
        else:
            l, r = left_child[i], right_child[i]
            node_lo[i] = np.minimum(node_lo[l], node_lo[r])
            node_hi[i] = np.maximum(node_hi[l], node_hi[r])

    # --- collapse binary -> 8-wide ---
    # Each wide node's children: expand internal binary children (largest
    # surface area first) until 8 slots are used or all are leaves.
    def area(i):
        d = np.maximum(node_hi[i] - node_lo[i], 0)
        return float(d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    wide_children: list = []  # per wide node: list of binary node ids
    wide_of_binary = {}

    def build_wide(b: int) -> int:
        kids = [left_child[b], right_child[b]]
        while len(kids) < 8:
            # expand the internal child with the largest surface area
            best_j, best_a = -1, -1.0
            for j, k in enumerate(kids):
                if left_child[k] >= 0:  # internal
                    a = area(k)
                    if a > best_a:
                        best_j, best_a = j, a
            if best_j < 0:
                break
            k = kids.pop(best_j)
            kids.extend([left_child[k], right_child[k]])
        idx = len(wide_children)
        wide_children.append((b, kids))
        return idx

    if is_leaf_bin[root]:
        # single-leaf scene: one wide node with one leaf child
        wide_children.append((root, [root]))
    else:
        order = [build_wide(root)]
        qi = 0
        while qi < len(order):
            w = order[qi]
            qi += 1
            _, kids = wide_children[w]
            for k in kids:
                if left_child[k] >= 0:
                    wide_of_binary[k] = build_wide(k)
                    order.append(wide_of_binary[k])

    n_wide = len(wide_children)
    child_lo = np.zeros((n_wide, 8, 3), np.float32)
    child_hi = np.zeros((n_wide, 8, 3), np.float32)
    child = np.full((n_wide, 8), ENC_EMPTY, np.int32)
    for w, (_, kids) in enumerate(wide_children):
        for j, k in enumerate(kids):
            child_lo[w, j] = node_lo[k]
            child_hi[w, j] = node_hi[k]
            if left_child[k] >= 0:
                child[w, j] = wide_of_binary[k]
            else:
                s, e = ranges[k]
                child[w, j] = _encode_leaf(s, e - s)

    bvh = BVH8(
        child_lo=jnp.asarray(child_lo),
        child_hi=jnp.asarray(child_hi),
        child=jnp.asarray(child),
    )
    return perm, bvh


def reorder_scene_by_bvh(scene, perm: np.ndarray):
    """Permute a Scene's face SoA into BVH (Morton/SAH) order.

    Leaves padding faces in place past num_faces. `perm` may carry -1
    entries (variable-leaf padding from sah_split_perm(variable=True)):
    those slots become all-zero degenerate faces — unhittable (MT det=0)
    and excluded from leaf AABBs by build_hier_table — and num_faces
    grows to len(perm). Returns a new Scene whose traversal leaves index
    directly into the permuted SoA.

    Runs entirely in host numpy: this is a scene-load step, and issuing
    per-array eager gathers on a (possibly remote) device would pay a
    compile+transfer round trip per field.
    """
    import dataclasses

    from ..scene.scene import GeometrySoA, Scene

    f = scene.num_faces
    total = scene.geom.mat_id.shape[0]
    m = len(perm)
    new_f = m if m > f else f
    # keep the array length 256-aligned (the brute-force chunk scan and
    # tile kernels assume it) and the original trailing pads addressable
    n_tail = total - f
    length = -(-(new_f + n_tail) // 256) * 256
    full = np.full(length, -1, np.int64)
    full[:m] = perm
    if n_tail:
        full[new_f:new_f + n_tail] = np.arange(f, total)
    pad = full < 0
    safe = np.maximum(full, 0)

    g = scene.geom

    def take(arr, per_key: bool):
        a = np.asarray(arr)
        out = a[:, safe] if per_key else a[safe]
        if pad.any():
            out = out.copy()
            if per_key:
                out[:, pad] = 0
            else:
                out[pad] = 0
        return jnp.asarray(out)

    def take_opt(arr):
        return None if arr is None else take(arr, False)

    geom = GeometrySoA(
        v0=take(g.v0, True), e1=take(g.e1, True), e2=take(g.e2, True),
        n0=take(g.n0, True), n1=take(g.n1, True), n2=take(g.n2, True),
        uv0=take(g.uv0, False), uv1=take(g.uv1, False), uv2=take(g.uv2, False),
        mat_id=take(g.mat_id, False),
        uv0b=take_opt(g.uv0b), uv1b=take_opt(g.uv1b), uv2b=take_opt(g.uv2b),
        c0=take_opt(g.c0), c1=take_opt(g.c1), c2=take_opt(g.c2),
    )
    # only the face SoA is permuted; every other Scene field (env map,
    # instances, light table, flags...) carries over untouched
    if m > f:
        return dataclasses.replace(scene, geom=geom, num_faces=m,
                                   variable_ordered=True)
    return dataclasses.replace(scene, geom=geom)


def morton_order_scene(scene):
    """Reorder a Scene's faces by centroid Morton code.

    Spatially coherent face order makes the Pallas kernels' per-tile AABBs
    tight (trace/pallas_mt.py TriSoup.aabb), turning the tile cull into an
    effective 1-level BVH — use on any scene larger than a few tiles.
    Returns the reordered Scene (prim ids change; lights/materials are
    face-order independent).
    """
    from .morton import morton3d_np

    g = scene.geom
    f = scene.num_faces
    v0 = np.asarray(g.v0[0][:f])
    e1 = np.asarray(g.e1[0][:f])
    e2 = np.asarray(g.e2[0][:f])
    centroid = v0 + (e1 + e2) / 3.0
    lo = centroid.min(axis=0)
    ext = np.maximum(centroid.max(axis=0) - lo, 1e-12)
    codes = morton3d_np((centroid - lo) / ext)
    perm = np.argsort(codes, kind="stable").astype(np.int32)
    return reorder_scene_by_bvh(scene, perm)


_SAH_BINS = 32
_BIG_F = np.float32(1e30)


def sah_split_perm(lo: np.ndarray, hi: np.ndarray, leaf: int,
                   variable: bool = False) -> np.ndarray:
    """Recursive binned-SAH split permutation over primitive AABBs.

    Dispatches to the C++ builder (native/sah.cc, bit-identical output —
    tests/test_native.py asserts it; ~20x faster on 1M faces) and falls
    back to the pure-numpy recursion below.

    Clusters are spatial partitions so consecutive `leaf`-prim runs get
    tight AABBs. The split axis AND position are chosen by minimal binned
    surface-area cost (32 centroid bins, prefix/suffix box areas);
    degenerate nodes (all centroids equal on every axis) fall back to the
    balanced longest-axis median split. Host-side numpy.

    variable=False: the split is snapped to a leaf multiple so every
    cluster boundary stays run-aligned; returns the [N] permutation.

    variable=True: splits land wherever SAH wants them and every cluster
    is padded with -1 entries up to the next `leaf` multiple — callers
    fill -1 slots with all-zero (degenerate, unhittable) faces, which
    build_hier_table excludes from leaf AABBs. Quantized geometry (e.g. a
    field of 12-tri boxes) gets leaves that align with its natural
    components instead of straddling them. Returns the [M] padded
    permutation (M = n_clusters * leaf >= N)."""
    from ..native import native_sah_split_perm

    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    native = native_sah_split_perm(lo, hi, leaf, variable)
    if native is not None:
        return native
    return _sah_split_perm_py(lo, hi, leaf, variable)


def _sah_split_perm_py(lo, hi, leaf, variable=False):
    """Pure-numpy sah_split_perm (fallback + the native twin's oracle)."""
    f = lo.shape[0]
    cent = (lo + hi) * 0.5
    nb = _SAH_BINS

    def half_area(blo, bhi):
        d = np.maximum(bhi - blo, 0.0)
        return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] \
            + d[..., 2] * d[..., 0]

    out = []
    stack = [np.arange(f)]
    while stack:
        idx = stack.pop()
        n = len(idx)
        if n <= leaf:
            if variable and n < leaf:
                idx = np.concatenate(
                    [idx, np.full(leaf - n, -1, idx.dtype)])
            out.append(idx)
            continue
        c = cent[idx]
        cmin = c.min(axis=0)
        ext = c.max(axis=0) - cmin
        best = None  # (cost, axis, split count)
        for ax in range(3):
            if ext[ax] <= 0:
                continue
            b = np.minimum((c[:, ax] - cmin[ax]) * (nb / ext[ax]),
                           nb - 1).astype(np.int32)
            cnt = np.bincount(b, minlength=nb)
            blo = np.full((nb, 3), _BIG_F, np.float32)
            bhi = np.full((nb, 3), -_BIG_F, np.float32)
            np.minimum.at(blo, b, lo[idx])
            np.maximum.at(bhi, b, hi[idx])
            pre_lo = np.minimum.accumulate(blo, 0)
            pre_hi = np.maximum.accumulate(bhi, 0)
            suf_lo = np.minimum.accumulate(blo[::-1], 0)[::-1]
            suf_hi = np.maximum.accumulate(bhi[::-1], 0)[::-1]
            nl = np.cumsum(cnt)[:-1]
            cost = (half_area(pre_lo[:-1], pre_hi[:-1]) * nl
                    + half_area(suf_lo[1:], suf_hi[1:]) * (n - nl))
            cost = np.where((nl > 0) & (nl < n), cost, np.inf)
            k = int(np.argmin(cost))
            if np.isfinite(cost[k]) and (best is None or cost[k] < best[0]):
                if variable:
                    half = int(nl[k])
                else:
                    half = int(round(nl[k] / leaf)) * leaf
                    half = min(max(half, leaf), ((n - 1) // leaf) * leaf)
                if 0 < half < n:
                    best = (cost[k], ax, half)
        if best is None:
            ax = int(np.argmax(ext))
            half = (n // 2 if variable
                    else min(-(-n // (2 * leaf)) * leaf, n - 1))
        else:
            _, ax, half = best
        srt = idx[np.argsort(c[:, ax], kind="stable")]
        stack.append(srt[half:])
        stack.append(srt[:half])
    return np.concatenate(out).astype(np.int32)


def merge_variable_clusters(perm: np.ndarray, leaf: int) -> np.ndarray:
    """Greedily merge ADJACENT variable-SAH clusters into shared leaves.

    sah_split_perm(variable=True) pads every natural cluster to its own
    `leaf`-slot row, so scenes whose components are smaller than a leaf
    pay heavy row inflation (towns: fill ~0.72, +38% leaf rows — the
    measured on-chip regression that made split_order_scene reject
    variable orderings below fill 0.8). Adjacent clusters are spatial
    siblings of the SAH recursion, so packing consecutive clusters into
    one row while their real faces fit keeps boxes tight AND restores
    fill. Returns the re-padded [M] permutation (M <= len(perm))."""
    cl = perm.reshape(-1, leaf)
    sizes = (cl >= 0).sum(axis=1)
    rows = []
    cur: list = []
    cur_n = 0
    for i in range(cl.shape[0]):
        n = int(sizes[i])
        if cur_n + n > leaf:
            cur.extend([-1] * (leaf - cur_n))
            rows.append(cur)
            cur, cur_n = [], 0
        cur.extend(cl[i, :n].tolist())
        cur_n += n
    if cur_n or not rows:
        cur.extend([-1] * (leaf - cur_n))
        rows.append(cur)
    return np.asarray([x for row in rows for x in row], dtype=perm.dtype)


def split_order_scene(scene, leaf: int = 256, variable: bool | None = None):
    """Reorder a Scene's faces by recursive binned-SAH split
    (sah_split_perm), so the leafwalk / hierwalk tracers' consecutive
    `leaf`-face runs get tight AABBs.

    variable=None (auto): hier-table orderings (leaf <= 16) TRY
    VARIABLE-size leaves — splits land where SAH wants them, clusters pad
    to the leaf multiple with all-zero unhittable faces (num_faces
    grows; build_hier_table masks them out of leaf AABBs) — and KEEP the
    variable ordering only when cluster fill stays >= 0.8, i.e. the
    splits found natural component boundaries instead of fragmenting.
    Measured (v5e): the 49k box field fills 0.86 (leaves align with its
    12-tri boxes) and gains 16.7 -> 19.4 Mray/s; the towns fill ~0.72
    and the +38% leaf rows REGRESS them (200k 11.8 -> 9.2, 1M flat)
    despite a -3% simulated mean-visit count, so low-fill scenes fall
    back to snapped splits. Big-leaf orderings (leafwalk's 256) always
    snap: padding inflation would exceed the box-tightness win there.

    vs the round-1 pure median split (exp/exp_sah.py): 49k mean visits
    9.55 -> 7.27, worst-ray rounds 39 -> 26, identical hits; on-chip 49k
    13.0 -> 16.6, 200k town 8.8 -> 11.7 Mray/s. Host-side numpy; returns
    the reordered Scene (prim ids change)."""
    g = scene.geom
    f = scene.num_faces
    v0 = np.asarray(g.v0[0][:f])
    e1 = np.asarray(g.e1[0][:f])
    e2 = np.asarray(g.e2[0][:f])
    lo = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
    hi = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)
    if variable or (variable is None and leaf <= 16):
        # fill is only known AFTER building the variable ordering, so a
        # low-fill scene pays for both orderings at load time — cheap
        # with the native builder (1M faces ~2s; numpy fallback ~40s)
        perm = merge_variable_clusters(
            sah_split_perm(lo, hi, leaf, variable=True), leaf)
        if variable or f / len(perm) >= 0.8:
            return reorder_scene_by_bvh(scene, perm)
    return reorder_scene_by_bvh(
        scene, sah_split_perm(lo, hi, leaf, variable=False))
