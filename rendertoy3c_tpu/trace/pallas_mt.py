"""Fused ray x triangle intersection kernels in Pallas (TPU).

This is the hot traversal replacement for OptiX's optixTraverse
(src/shader/shader_common.h:74-94) at the dense end of the backend ladder.
The XLA-level brute-force tracer (intersect.py) materializes [rays, tris]
3-vector intermediates in HBM (cross products, barycentrics) and is
bandwidth-bound ~30x below VPU peak; this kernel keeps one
[RAY_TILE, TRI_TILE] tile fully resident in VMEM so the entire
Moller-Trumbore test plus the closest-hit reduction runs at vector-unit rate
with zero HBM intermediates.

Execution shape: a 1-D grid over ray tiles; the triangle soup is fully
VMEM-resident and swept by an in-kernel fori_loop. Ray tiles past the live
count (wavefront compaction: the integrator sorts alive rays to the front)
skip the whole sweep and cost only their block DMA — this keeps the
fixed-overhead of late, nearly-empty bounce waves negligible.

Layouts (chosen for TPU lanes — no gathers, no transposes, no strided
slices):
  rays   [R, 8]          f32 : ox oy oz dx dy dz tmin tmax rows; each
                               component is a [RT, 1] sublane column via a
                               static lane slice.
  tris   [F/CT, 9, CT]   f32 : component-major triangle tiles
                               (v0.xyz e1.xyz e2.xyz rows x CT tri lanes);
                               tile k is tris_ref[k], a [9, CT] block.
  out    [R, 4]          f32 : t, prim(float), u, v.

Per sweep step the test matrix is [RT, CT] (rays in sublanes, triangles in
lanes) — full 128-lane utilization at CT >= 128. Padding triangles are
all-zero => det == 0 => never hit, so no count masking is needed.

Closest-hit selection is reduction-only (min t, lowest-prim tiebreak,
masked payload sums) exactly like intersect.py's XLA path.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit

RAY_TILE = 256
TRI_TILE = 512
SUPER_TILE = 8  # tri tiles per supertile (2-level cull)
_BIG = 1e30  # plain float: jnp scalars would be captured kernel constants
_DET_EPS = 1e-10


class TriSoup(NamedTuple):
    """Tiled component-major triangle table for the Pallas kernels."""

    tris: jnp.ndarray  # [F/CT, 9, CT] f32
    num_faces: int     # real faces (padding beyond is all-zero)
    # per-tile AABB (lo.xyz hi.xyz pad2): a 1-level BVH over 512-tri leaves.
    # Tiles whose box the whole ray tile misses skip the MT sweep; all-padding
    # tiles carry an inverted box and are always skipped. Spatially coherent
    # face order (accel.lbvh.morton_order_scene) makes this effective.
    aabb: jnp.ndarray = None  # [ceil(F/CT/SUPER)*SUPER, 8] f32
    # supertile AABBs (union of SUPER_TILE consecutive tile boxes): the
    # second hierarchy level — one test can skip SUPER_TILE tiles at once.
    super_aabb: jnp.ndarray = None  # [n_super, 8] f32


def build_tri_soup(geom, key: int = 0, num_faces: int | None = None) -> TriSoup:
    """Transpose+tile a GeometrySoA motion key into the kernel layout.

    Host-side (numpy) — runs once at scene build. num_faces (the REAL face
    count, before the scene's FACE_ALIGN padding) picks the tile width:
    scenes that fit one tile get the smallest 128-lane multiple that covers
    them — a 36-face Cornell sweeps [RT, 128] instead of [RT, 512], 4x
    fewer pair lanes per MT step on the pair-rate-bound small-scene path.
    """
    v0 = np.asarray(geom.v0[key])
    e1 = np.asarray(geom.e1[key])
    e2 = np.asarray(geom.e2[key])
    f = v0.shape[0] if num_faces is None else num_faces
    ct = TRI_TILE if f > TRI_TILE else max(128, -(-f // 128) * 128)
    f_pad = -(-f // ct) * ct
    n_copy = min(f_pad, v0.shape[0])
    soup = np.zeros((9, f_pad), np.float32)
    soup[0:3, :n_copy] = v0[:n_copy].T
    soup[3:6, :n_copy] = e1[:n_copy].T
    soup[6:9, :n_copy] = e2[:n_copy].T
    tiled = soup.reshape(9, f_pad // ct, ct).transpose(1, 0, 2)

    # per-tile AABBs over real faces (empty tiles get an inverted box),
    # padded to a SUPER_TILE multiple so the 2-level sweep needs no edge
    # handling
    n_tiles = f_pad // ct
    n_tiles_pad = -(-n_tiles // SUPER_TILE) * SUPER_TILE
    aabb = np.zeros((n_tiles_pad, 8), np.float32)
    aabb[:, 0:3] = 1e30
    aabb[:, 3:6] = -1e30
    p0 = v0
    p1 = v0 + e1
    p2 = v0 + e2
    for k in range(n_tiles):
        s0, s1 = k * ct, min((k + 1) * ct, f)
        if s0 >= f:
            break
        pts = np.concatenate([p0[s0:s1], p1[s0:s1], p2[s0:s1]])
        aabb[k, 0:3] = pts.min(axis=0)
        aabb[k, 3:6] = pts.max(axis=0)
    n_super = n_tiles_pad // SUPER_TILE
    super_aabb = np.zeros((n_super, 8), np.float32)
    grp = aabb.reshape(n_super, SUPER_TILE, 8)
    super_aabb[:, 0:3] = grp[:, :, 0:3].min(axis=1)
    super_aabb[:, 3:6] = grp[:, :, 3:6].max(axis=1)
    return TriSoup(tris=jnp.asarray(np.ascontiguousarray(tiled)), num_faces=f,
                   aabb=jnp.asarray(aabb), super_aabb=jnp.asarray(super_aabb))


def _mt_test_cols(cols, tile, prim_base):
    """One [RT, CT] Moller-Trumbore test block over ray component columns.

    cols = (ox..oz, dx..dz, tmin, tmax), each [RT, 1]; tile [9, CT] (a
    value); prim_base = scalar id of the tile's first triangle.
    Returns (t, u, v, hit, prim_f) each [RT, CT] (prim_f float32 ids).
    """
    ox, oy, oz, dx, dy, dz, tmin, tmax = cols
    rt = ox.shape[0]
    ct = tile.shape[1]

    def trow(c):  # tri component -> [1, CT]
        return tile[c:c + 1, :]
    v0x, v0y, v0z = trow(0), trow(1), trow(2)
    e1x, e1y, e1z = trow(3), trow(4), trow(5)
    e2x, e2y, e2z = trow(6), trow(7), trow(8)

    # pvec = d x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > _DET_EPS, 1.0 / det, 0.0)
    # tvec = o - v0
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    # qvec = tvec x e1
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
    prim_f = (
        jnp.asarray(prim_base).astype(jnp.float32)
        + jax.lax.broadcasted_iota(jnp.int32, (rt, ct), 1).astype(jnp.float32)
    )
    return t, u, v, hit, prim_f


def _ray_cols(rays_ref):
    """Slice a [RT, 8] ray block into its component columns."""
    return tuple(rays_ref[:, c:c + 1] for c in range(8))


def _mt_test(rays_ref, tile, k):
    """Back-compat wrapper: [RT,8] ray block vs tri tile k."""
    return _mt_test_cols(_ray_cols(rays_ref), tile, k * tile.shape[1])


def _tile_box_hits(aabb_ref, k, cols_o, cols_inv, tmin, tcur):
    """Does ANY ray in the tile hit tri-tile k's AABB? Returns f32 scalar."""
    ox, oy, oz = cols_o
    ix, iy, iz = cols_inv
    t0x = (aabb_ref[k, 0] - ox) * ix
    t1x = (aabb_ref[k, 3] - ox) * ix
    t0y = (aabb_ref[k, 1] - oy) * iy
    t1y = (aabb_ref[k, 4] - oy) * iy
    t0z = (aabb_ref[k, 2] - oz) * iz
    t1z = (aabb_ref[k, 5] - oz) * iz
    tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                 jnp.minimum(t0y, t1y)),
                     jnp.minimum(t0z, t1z))
    tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                 jnp.maximum(t0y, t1y)),
                     jnp.maximum(t0z, t1z))
    hit = (tn <= tf) & (tf >= tmin) & (tn <= tcur)
    return jnp.max(hit.astype(jnp.float32))


def _culled_sweep(aabb_ref, super_ref, n_tiles, cols_o, inv_d, tmin,
                  tcur_fn, mt_tile, carry, live):
    """2-level AABB-culled sweep over tri tiles.

    mt_tile(k, carry) -> carry runs the expensive test for tile k;
    tcur_fn(carry) -> [RT,1] current upper t bound. Supertiles whose box no
    ray can hit skip SUPER_TILE tiles with a single test.

    n_tiles is static, so the sweep specializes: tiny scenes skip the cull
    machinery entirely (a Cornell-sized single tile costs nothing extra),
    small scenes use one level, large scenes both."""
    if n_tiles == 1:
        return jax.lax.cond(live, lambda c: mt_tile(0, c), lambda c: c, carry)

    if n_tiles <= 2 * SUPER_TILE:  # one cull level is enough
        def tile_only(k, c):
            any_box = _tile_box_hits(aabb_ref, k, cols_o, inv_d, tmin,
                                     tcur_fn(c))
            return jax.lax.cond(any_box > 0.0,
                                lambda cc: mt_tile(k, cc), lambda cc: cc, c)

        return jax.lax.fori_loop(
            0, jnp.where(live, n_tiles, 0), tile_only, carry
        )

    n_super = jnp.where(
        live, (n_tiles + SUPER_TILE - 1) // SUPER_TILE, 0
    )

    def tile_body(j, kc):
        ks, c = kc
        k = ks * SUPER_TILE + j
        any_box = _tile_box_hits(aabb_ref, k, cols_o, inv_d, tmin, tcur_fn(c))
        c = jax.lax.cond(
            (any_box > 0.0) & (k < n_tiles),
            lambda cc: mt_tile(k, cc), lambda cc: cc, c,
        )
        return (ks, c)

    def super_body(ks, c):
        any_super = _tile_box_hits(super_ref, ks, cols_o, inv_d, tmin,
                                   tcur_fn(c))

        def descend(cc):
            _, out = jax.lax.fori_loop(0, SUPER_TILE, tile_body, (ks, cc))
            return out

        return jax.lax.cond(any_super > 0.0, descend, lambda cc: cc, c)

    return jax.lax.fori_loop(0, n_super, super_body, carry)


def _inv_cols(dx, dy, dz):
    big = jnp.float32(_BIG)
    return (
        jnp.where(jnp.abs(dx) > 1e-20, 1.0 / dx, big),
        jnp.where(jnp.abs(dy) > 1e-20, 1.0 / dy, big),
        jnp.where(jnp.abs(dz) > 1e-20, 1.0 / dz, big),
    )


def _closest_kernel(count_ref, rays_ref, tris_ref, aabb_ref, super_ref,
                    out_ref):
    i = pl.program_id(0)
    rt = rays_ref.shape[0]
    miss_t = rays_ref[:, 7:8]  # tmax
    init = (
        miss_t,
        jnp.full((rt, 1), -1.0, jnp.float32),
        jnp.zeros((rt, 1), jnp.float32),
        jnp.zeros((rt, 1), jnp.float32),
    )
    cols = _ray_cols(rays_ref)
    inv_d = _inv_cols(cols[3], cols[4], cols[5])

    def mt_tile(k, carry):
        best_t, best_prim, best_u, best_v = carry
        t, u, v, hit, prim_f = _mt_test(rays_ref, tris_ref[k], k)
        t = jnp.where(hit, t, _BIG)
        t_c = jnp.min(t, axis=1, keepdims=True)  # [RT, 1]
        at_min = t <= t_c
        prim_c = jnp.min(jnp.where(at_min, prim_f, _BIG), axis=1, keepdims=True)
        one = at_min & (prim_f == prim_c)
        u_c = jnp.sum(jnp.where(one, u, 0.0), axis=1, keepdims=True)
        v_c = jnp.sum(jnp.where(one, v, 0.0), axis=1, keepdims=True)
        better = t_c < best_t
        return (
            jnp.where(better, t_c, best_t),
            jnp.where(better, prim_c, best_prim),
            jnp.where(better, u_c, best_u),
            jnp.where(better, v_c, best_v),
        )

    # Wavefront compaction: rays are sorted alive-first; tiles past the live
    # count skip the whole sweep (they only pay their block DMA).
    live = i * RAY_TILE < count_ref[0]
    n_tiles = tris_ref.shape[0]
    best_t, best_prim, best_u, best_v = _culled_sweep(
        aabb_ref, super_ref, n_tiles, cols[0:3], inv_d, cols[6],
        lambda c: c[0], mt_tile, init, live,
    )
    out_ref[:, 0:1] = best_t
    out_ref[:, 1:2] = best_prim
    out_ref[:, 2:3] = best_u
    out_ref[:, 3:4] = best_v


def _any_kernel(count_ref, rays_ref, tris_ref, aabb_ref, super_ref,
                out_ref):
    i = pl.program_id(0)
    rt = rays_ref.shape[0]
    cols = _ray_cols(rays_ref)
    inv_d = _inv_cols(cols[3], cols[4], cols[5])
    tmax = cols[7]

    def mt_tile(k, occ):
        _, _, _, hit, _ = _mt_test(rays_ref, tris_ref[k], k)
        return jnp.maximum(occ, jnp.max(hit.astype(jnp.float32), axis=1,
                                        keepdims=True))

    live = i * RAY_TILE < count_ref[0]
    n_tiles = tris_ref.shape[0]
    occ = _culled_sweep(
        aabb_ref, super_ref, n_tiles, cols[0:3], inv_d, cols[6],
        lambda c: tmax, mt_tile, jnp.zeros((rt, 1), jnp.float32), live,
    )
    out_ref[:, 0:1] = occ
    out_ref[:, 1:4] = jnp.zeros((rt, 3), jnp.float32)


def _pack_rays(o, d, tmin, tmax):
    r = o.shape[0]
    r_pad = -(-r // RAY_TILE) * RAY_TILE
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    rays = jnp.concatenate(
        [o, d, tmin[:, None], tmax[:, None]], axis=1
    ).astype(jnp.float32)
    if r_pad != r:
        pad = jnp.zeros((r_pad - r, 8), jnp.float32)
        # padding rays: d=0 => det=0 => no hits
        rays = jnp.concatenate([rays, pad], axis=0)
    return rays, r, r_pad


def _mt_pallas_call(kernel, count, rays, soup: TriSoup, r_pad, interpret):
    tris = soup.tris
    f_tiles = tris.shape[0]
    ct = tris.shape[2]
    pairs = r_pad * f_tiles * ct
    aabb = soup.aabb
    super_aabb = soup.super_aabb
    if aabb is None:  # cull disabled: everything-boxes pass every test
        n_pad = -(-f_tiles // SUPER_TILE) * SUPER_TILE
        aabb = (jnp.zeros((n_pad, 8), jnp.float32)
                .at[:, 0:3].set(-1e30).at[:, 3:6].set(1e30))
        super_aabb = (jnp.zeros((n_pad // SUPER_TILE, 8), jnp.float32)
                      .at[:, 0:3].set(-1e30).at[:, 3:6].set(1e30))
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(r_pad // RAY_TILE,),
            in_specs=[
                pl.BlockSpec((RAY_TILE, 8), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((f_tiles, 9, ct), lambda i, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((aabb.shape[0], 8), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((super_aabb.shape[0], 8), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((RAY_TILE, 4), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((r_pad, 4), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=60 * pairs,
            bytes_accessed=(r_pad * 12 + f_tiles * 9 * ct) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(count, rays, tris, aabb, super_aabb)


@functools.partial(jax.jit, static_argnames=("interpret",))
def trace_closest_mt(soup: TriSoup, o, d, tmin, tmax, *, count=None,
                     interpret=False) -> Hit:
    """Fused closest-hit over the whole triangle soup.

    `count` (dynamic scalar, default = all rays): only the first `count`
    rays are live; whole tiles past it are skipped (wavefront compaction)."""
    rays, r, r_pad = _pack_rays(o, d, tmin, tmax)
    if count is None:
        count = r
    count = jnp.asarray(count, jnp.int32).reshape(1)
    out = _mt_pallas_call(_closest_kernel, count, rays, soup, r_pad,
                          interpret)
    out = out[:r]
    t = out[:, 0]
    prim_f = out[:, 1]
    # mask out hits on padding faces (prim >= num_faces)
    valid = (prim_f >= 0.0) & (prim_f < soup.num_faces) & (t < _BIG)
    return Hit(
        t=jnp.where(valid, t, jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))),
        prim=jnp.where(valid, prim_f.astype(jnp.int32), -1),
        u=jnp.where(valid, out[:, 2], 0.0),
        v=jnp.where(valid, out[:, 3], 0.0),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def trace_any_mt(soup: TriSoup, o, d, tmin, tmax, *, count=None,
                 interpret=False):
    """Fused any-hit occlusion probe (same compaction contract as closest)."""
    rays, r, r_pad = _pack_rays(o, d, tmin, tmax)
    if count is None:
        count = r
    count = jnp.asarray(count, jnp.int32).reshape(1)
    out = _mt_pallas_call(_any_kernel, count, rays, soup, r_pad,
                          interpret)
    return out[:r, 0] > 0.0


def make_pallas_mt_tracer(scene, interpret: bool | None = None):
    """(closest, any) tracer over the fused kernels.

    Static scenes use the base kernels; 2-key scenes (the reference's motion
    format) use the in-kernel time-lerp variants. >2-key scenes fall back to
    the jnp brute-force path, whose piecewise key selection is
    data-dependent.

    interpret=None auto-selects: compiled on TPU, interpreter elsewhere
    (the Mosaic kernels only compile for TPU)."""
    if scene.num_keys > 2:
        raise ValueError(
            "pallas MT tracer supports <= 2 motion keys; use the jnp tracer"
        )
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    # Exclude padding by building the soup only over real faces; the soup
    # re-pads to TRI_TILE with all-zero (unhittable) triangles.
    soup = build_tri_soup(scene.geom, num_faces=scene.num_faces)
    soup = soup._replace(num_faces=scene.num_faces)

    if scene.num_keys == 2:
        soup1 = build_tri_soup(scene.geom, key=1,
                               num_faces=scene.num_faces)
        soup1 = soup1._replace(num_faces=scene.num_faces)

        def closest(o, d, tmin, tmax, time, count=None):
            return trace_closest_mt_motion(
                soup, soup1, o, d, tmin, tmax, time, count=count,
                interpret=interpret,
            )

        def any_hit(o, d, tmin, tmax, time, count=None):
            return trace_any_mt_motion(
                soup, soup1, o, d, tmin, tmax, time, count=count,
                interpret=interpret,
            )

        return closest, any_hit

    def closest(o, d, tmin, tmax, time, count=None):
        del time
        return trace_closest_mt(
            soup, o, d, tmin, tmax, count=count, interpret=interpret
        )

    def any_hit(o, d, tmin, tmax, time, count=None):
        del time
        return trace_any_mt(
            soup, o, d, tmin, tmax, count=count, interpret=interpret
        )

    return closest, any_hit


# ---------------------------------------------------------------------------
# Motion-blur variants: 2-key scenes (the reference's matrix/vertex motion is
# 2-key, cuda_accel.h:38-73) lerp triangle data to each ray's time inside the
# kernel — v0/e1/e2 are linear in the keyed vertices so the lerp is exact
# (shader_common.h:64 per-ray rayTime). Scenes with >2 keys use the jnp
# brute-force tracer, whose piecewise-key selection is data-dependent.
# Tile culling uses the UNION of both keys' tile AABBs (a triangle lerped to
# any time in [0,1] stays inside the union of its endpoint boxes, since the
# lerp is per-vertex linear), so the 2-level culled sweep carries over.

MOTION_RAY_TILE = 128  # lerped [RT, CT] tri components raise VMEM pressure


def motion_union_aabbs(soup0: TriSoup, soup1: TriSoup):
    """(aabb, super_aabb) covering both motion keys, for conservative
    time-independent tile culling."""
    if soup0.aabb is None or soup1.aabb is None:
        return None, None
    lo = jnp.minimum(soup0.aabb[:, 0:3], soup1.aabb[:, 0:3])
    hi = jnp.maximum(soup0.aabb[:, 3:6], soup1.aabb[:, 3:6])
    aabb = jnp.concatenate([lo, hi, soup0.aabb[:, 6:8]], axis=1)
    slo = jnp.minimum(soup0.super_aabb[:, 0:3], soup1.super_aabb[:, 0:3])
    shi = jnp.maximum(soup0.super_aabb[:, 3:6], soup1.super_aabb[:, 3:6])
    super_aabb = jnp.concatenate([slo, shi, soup0.super_aabb[:, 6:8]], axis=1)
    return aabb, super_aabb


def _mt_test_motion(cols, tcol, tile0, tile1, prim_base):
    """[RT, CT] MT test with per-ray time-lerped triangles.

    cols as in _mt_test_cols; tcol [RT, 1]; tile0/tile1 [9, CT]."""
    ox, oy, oz, dx, dy, dz, tmin, tmax = cols
    rt = ox.shape[0]
    ct = tile0.shape[1]

    def trow(c):  # [RT, CT] lerped component
        r0 = tile0[c:c + 1, :]
        r1 = tile1[c:c + 1, :]
        return r0 + (r1 - r0) * tcol

    v0x, v0y, v0z = trow(0), trow(1), trow(2)
    e1x, e1y, e1z = trow(3), trow(4), trow(5)
    e2x, e2y, e2z = trow(6), trow(7), trow(8)

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
    prim_f = (
        jnp.asarray(prim_base).astype(jnp.float32)
        + jax.lax.broadcasted_iota(jnp.int32, (rt, ct), 1).astype(jnp.float32)
    )
    return t, u, v, hit, prim_f


def _closest_kernel_motion(count_ref, rays_ref, time_ref, tris0_ref,
                           tris1_ref, aabb_ref, super_ref, out_ref):
    i = pl.program_id(0)
    rt = rays_ref.shape[0]
    tcol = time_ref[:, 0:1]
    cols = _ray_cols(rays_ref)
    inv_d = _inv_cols(cols[3], cols[4], cols[5])
    init = (
        rays_ref[:, 7:8],
        jnp.full((rt, 1), -1.0, jnp.float32),
        jnp.zeros((rt, 1), jnp.float32),
        jnp.zeros((rt, 1), jnp.float32),
    )

    def mt_tile(k, carry):
        best_t, best_prim, best_u, best_v = carry
        c = cols[:7] + (best_t,)
        t, u, v, hit, prim_f = _mt_test_motion(
            c, tcol, tris0_ref[k], tris1_ref[k],
            k * tris0_ref.shape[2]
        )
        t = jnp.where(hit, t, _BIG)
        t_c = jnp.min(t, axis=1, keepdims=True)
        at_min = t <= t_c
        prim_c = jnp.min(jnp.where(at_min, prim_f, _BIG), axis=1, keepdims=True)
        one = at_min & (prim_f == prim_c)
        u_c = jnp.sum(jnp.where(one, u, 0.0), axis=1, keepdims=True)
        v_c = jnp.sum(jnp.where(one, v, 0.0), axis=1, keepdims=True)
        better = t_c < best_t
        return (
            jnp.where(better, t_c, best_t),
            jnp.where(better, prim_c, best_prim),
            jnp.where(better, u_c, best_u),
            jnp.where(better, v_c, best_v),
        )

    live = i * MOTION_RAY_TILE < count_ref[0]
    n_tiles = tris0_ref.shape[0]
    best_t, best_prim, best_u, best_v = _culled_sweep(
        aabb_ref, super_ref, n_tiles, cols[0:3], inv_d, cols[6],
        lambda c: c[0], mt_tile, init, live,
    )
    out_ref[:, 0:1] = best_t
    out_ref[:, 1:2] = best_prim
    out_ref[:, 2:3] = best_u
    out_ref[:, 3:4] = best_v


def _any_kernel_motion(count_ref, rays_ref, time_ref, tris0_ref, tris1_ref,
                       aabb_ref, super_ref, out_ref):
    i = pl.program_id(0)
    rt = rays_ref.shape[0]
    tcol = time_ref[:, 0:1]
    cols = _ray_cols(rays_ref)
    inv_d = _inv_cols(cols[3], cols[4], cols[5])
    tmax = cols[7]

    def mt_tile(k, occ):
        _, _, _, hit, _ = _mt_test_motion(
            cols, tcol, tris0_ref[k], tris1_ref[k],
            k * tris0_ref.shape[2]
        )
        return jnp.maximum(occ, jnp.max(hit.astype(jnp.float32), axis=1,
                                        keepdims=True))

    live = i * MOTION_RAY_TILE < count_ref[0]
    n_tiles = tris0_ref.shape[0]
    occ = _culled_sweep(
        aabb_ref, super_ref, n_tiles, cols[0:3], inv_d, cols[6],
        lambda c: tmax, mt_tile, jnp.zeros((rt, 1), jnp.float32), live,
    )
    out_ref[:, 0:1] = occ
    out_ref[:, 1:4] = jnp.zeros((rt, 3), jnp.float32)


def _motion_cull_tables(soup0: TriSoup, soup1: TriSoup):
    aabb, super_aabb = motion_union_aabbs(soup0, soup1)
    if aabb is None:  # cull disabled: everything-boxes pass every test
        f_tiles = soup0.tris.shape[0]
        n_pad = -(-f_tiles // SUPER_TILE) * SUPER_TILE
        aabb = (jnp.zeros((n_pad, 8), jnp.float32)
                .at[:, 0:3].set(-1e30).at[:, 3:6].set(1e30))
        super_aabb = (jnp.zeros((n_pad // SUPER_TILE, 8), jnp.float32)
                      .at[:, 0:3].set(-1e30).at[:, 3:6].set(1e30))
    return aabb, super_aabb


def _mt_motion_call(kernel, count, rays, time_col, soup0, soup1, r_pad,
                    interpret):
    tris0 = soup0.tris
    tris1 = soup1.tris
    f_tiles = tris0.shape[0]
    aabb, super_aabb = _motion_cull_tables(soup0, soup1)
    # 8-wide time block: a [R, 1] operand poisons XLA's layout choice for
    # every array flowing through the surrounding while body (measured 2.6x
    # glue inflation on the fused pool); broadcasting to the rays' width
    # keeps all pallas operands uniformly tiled.
    time8 = jnp.broadcast_to(time_col, (r_pad, 8))
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(r_pad // MOTION_RAY_TILE,),
            in_specs=[
                pl.BlockSpec((MOTION_RAY_TILE, 8), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((MOTION_RAY_TILE, 8), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((f_tiles, 9, tris0.shape[2]),
                             lambda i, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((f_tiles, 9, tris0.shape[2]),
                             lambda i, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((aabb.shape[0], 8), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((super_aabb.shape[0], 8), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((MOTION_RAY_TILE, 4), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((r_pad, 4), jnp.float32),
        interpret=interpret,
    )(count, rays, time8, tris0, tris1, aabb, super_aabb)


def _pack_rays_motion(o, d, tmin, tmax, time):
    r = o.shape[0]
    r_pad = -(-r // MOTION_RAY_TILE) * MOTION_RAY_TILE
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    time = jnp.broadcast_to(jnp.asarray(time, jnp.float32), (r,))
    rays = jnp.concatenate(
        [o, d, tmin[:, None], tmax[:, None]], axis=1
    ).astype(jnp.float32)
    tcol = time[:, None]
    if r_pad != r:
        rays = jnp.concatenate(
            [rays, jnp.zeros((r_pad - r, 8), jnp.float32)], axis=0
        )
        tcol = jnp.concatenate(
            [tcol, jnp.zeros((r_pad - r, 1), jnp.float32)], axis=0
        )
    return rays, tcol, r, r_pad


@functools.partial(jax.jit, static_argnames=("interpret",))
def trace_closest_mt_motion(soup0: TriSoup, soup1: TriSoup, o, d, tmin, tmax,
                            time, *, count=None, interpret=False) -> Hit:
    rays, tcol, r, r_pad = _pack_rays_motion(o, d, tmin, tmax, time)
    if count is None:
        count = r
    count = jnp.asarray(count, jnp.int32).reshape(1)
    out = _mt_motion_call(_closest_kernel_motion, count, rays, tcol,
                          soup0, soup1, r_pad, interpret)
    out = out[:r]
    t = out[:, 0]
    prim_f = out[:, 1]
    valid = (prim_f >= 0.0) & (prim_f < soup0.num_faces) & (t < _BIG)
    return Hit(
        t=jnp.where(valid, t,
                    jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))),
        prim=jnp.where(valid, prim_f.astype(jnp.int32), -1),
        u=jnp.where(valid, out[:, 2], 0.0),
        v=jnp.where(valid, out[:, 3], 0.0),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def trace_any_mt_motion(soup0: TriSoup, soup1: TriSoup, o, d, tmin, tmax,
                        time, *, count=None, interpret=False):
    rays, tcol, r, r_pad = _pack_rays_motion(o, d, tmin, tmax, time)
    if count is None:
        count = r
    count = jnp.asarray(count, jnp.int32).reshape(1)
    out = _mt_motion_call(_any_kernel_motion, count, rays, tcol,
                          soup0, soup1, r_pad, interpret)
    return out[:r, 0] > 0.0


@functools.partial(jax.jit, static_argnames=("interpret",))
def trace_closest_mt_motion_raw(soup0: TriSoup, soup1: TriSoup, rays_padded,
                                time_col, count, *, interpret=False):
    """Raw motion closest-hit over pre-packed [R_pad, 8] rays + [R_pad, 1]
    times -> [R_pad, 4] (t, prim_f, u, v). The fused motion pipeline
    consumes this directly."""
    count = jnp.asarray(count, jnp.int32).reshape(1)
    return _mt_motion_call(_closest_kernel_motion, count, rays_padded,
                           time_col, soup0, soup1, rays_padded.shape[0],
                           interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def trace_closest_mt_raw(soup: TriSoup, rays_padded, count, *,
                         interpret=False):
    """Raw closest-hit over pre-packed [R_pad, 8] rays -> [R_pad, 4]
    (t, prim_f, u, v; prim_f = -1 on miss). The fused pipeline consumes this
    directly, skipping Hit unpack/repack."""
    count = jnp.asarray(count, jnp.int32).reshape(1)
    return _mt_pallas_call(_closest_kernel, count, rays_padded, soup,
                           rays_padded.shape[0], interpret)
