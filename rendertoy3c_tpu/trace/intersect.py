"""Ray-triangle intersection + brute-force tracers.

This replaces OptiX's hardware traversal (optixTraverse,
src/shader/shader_common.h:74-94) at the lowest rung of the backend ladder:

  1. brute force (here): every ray tests every triangle via a lax.scan over
     triangle chunks — O(R*T) but perfectly vectorized on the VPU, exact, and
     the correctness oracle for every other backend;
  2. wide-BVH traversal in jnp (accel/ + bvh_traverse.py);
  3. Pallas kernels (pallas_intersect.py) that keep ray tiles and triangle
     chunks resident in VMEM.

All tracers share the same interface:
  closest(o, d, tmin, tmax, time) -> Hit
  any(o, d, tmin, tmax, time) -> occluded bool mask
with time in [0,1) selecting the motion-blur vertex lerp (the per-ray rayTime
of shader_common.h:64,125).

Triangles are two-sided (the reference sets no cull flags) and barycentrics
follow the OptiX convention: P = (1-u-v)*p0 + u*p1 + v*p2.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..math.vec import cross, dot
from ..scene.scene import GeometrySoA, Scene

_DET_EPS = 1e-10


class Hit(NamedTuple):
    t: jnp.ndarray  # [R] f32 hit distance (tmax where miss)
    prim: jnp.ndarray  # [R] i32 primitive index, -1 on miss
    u: jnp.ndarray  # [R] f32 barycentric
    v: jnp.ndarray  # [R] f32 barycentric
    # instance index (two-level AS tracers only; None on single-level paths,
    # mirroring optixGetInstanceId being meaningful only under an IAS)
    inst: jnp.ndarray = None

    @property
    def mask(self) -> jnp.ndarray:
        return self.prim >= 0


def ray_triangle(o, d, v0, e1, e2, tmin, tmax):
    """Moller-Trumbore, broadcasting rays against triangles.

    o, d: [..., 3]; v0, e1, e2: [..., 3] (any mutually broadcastable shapes).
    Returns (t, u, v, hit_mask) of the broadcast shape.
    """
    pvec = cross(d, e2)
    det = dot(e1, pvec)
    inv_det = jnp.where(jnp.abs(det) > _DET_EPS, 1.0 / det, 0.0)
    tvec = o - v0
    u = dot(tvec, pvec) * inv_det
    qvec = cross(tvec, e1)
    v = dot(d, qvec) * inv_det
    t = dot(e2, qvec) * inv_det
    hit = (
        (jnp.abs(det) > _DET_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tmin)
        & (t < tmax)
    )
    return t, u, v, hit


def _tri_chunk(geom: GeometrySoA, num_keys: int, start: int, size, time):
    """Slice one triangle chunk and lerp it to per-ray time if animated.

    Static scenes (num_keys == 1) skip the lerp entirely; animated scenes
    produce per-ray triangle data [R, C, 3] — linear interpolation of
    v0/e1/e2 is exact because both are linear in the keyed vertices.
    """
    if num_keys == 1:
        v0 = jax.lax.dynamic_slice_in_dim(geom.v0[0], start, size, axis=0)
        e1 = jax.lax.dynamic_slice_in_dim(geom.e1[0], start, size, axis=0)
        e2 = jax.lax.dynamic_slice_in_dim(geom.e2[0], start, size, axis=0)
        return v0[None], e1[None], e2[None]  # [1, C, 3] broadcasts over rays

    # Piecewise-linear motion over num_keys keys on t in [0, 1]
    # (OptixMotionOptions timeBegin=0 timeEnd=1, cuda_mesh.h:85-88).
    ts = time * (num_keys - 1)
    k0 = jnp.clip(jnp.floor(ts).astype(jnp.int32), 0, num_keys - 2)
    frac = (ts - k0.astype(jnp.float32))[:, None, None]  # [R, 1, 1]

    def slab(arr):
        chunk = jax.lax.dynamic_slice_in_dim(arr, start, size, axis=1)  # [K, C, 3]
        a = chunk[k0]  # [R, C, 3]
        b = chunk[jnp.minimum(k0 + 1, num_keys - 1)]
        return a + (b - a) * frac

    return slab(geom.v0), slab(geom.e1), slab(geom.e2)


@partial(jax.jit, static_argnames=("num_keys", "num_faces", "chunk"))
def trace_closest_bruteforce(
    geom: GeometrySoA,
    o,
    d,
    tmin,
    tmax,
    time,
    *,
    num_keys: int,
    num_faces: int,
    chunk: int = 256,
) -> Hit:
    """Closest hit over all triangles: scan over chunks carrying the best hit."""
    r = o.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    f_padded = geom.mat_id.shape[0]
    assert f_padded % chunk == 0, "chunk must divide the padded face count"
    n_chunks = f_padded // chunk

    o_b = o[:, None, :]
    d_b = d[:, None, :]

    def body(carry, start):
        best_t, best_prim, best_u, best_v = carry
        v0, e1, e2 = _tri_chunk(geom, num_keys, start, chunk, time)
        t, u, v, hit = ray_triangle(o_b, d_b, v0, e1, e2, tmin[:, None], tmax[:, None])
        # Mask out padding faces beyond num_faces.
        prim_ids = start + jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        hit &= prim_ids < num_faces
        t = jnp.where(hit, t, jnp.inf)
        # Chunk-closest selection as pure reductions — per-row gathers
        # (t[rows, argmin]) serialize on TPU, so reduce instead: min t, then
        # a lowest-prim tiebreak mask, then masked sums for the payload.
        t_c = jnp.min(t, axis=1)
        at_min = t <= t_c[:, None]
        prim_c = jnp.min(jnp.where(at_min, prim_ids, jnp.int32(0x7FFFFFFF)), axis=1)
        one = at_min & (prim_ids == prim_c[:, None])
        u_c = jnp.sum(jnp.where(one, u, 0.0), axis=1)
        v_c = jnp.sum(jnp.where(one, v, 0.0), axis=1)
        better = (t_c < best_t) & jnp.isfinite(t_c)
        return (
            jnp.where(better, t_c, best_t),
            jnp.where(better, prim_c, best_prim),
            jnp.where(better, u_c, best_u),
            jnp.where(better, v_c, best_v),
        ), None

    init = (
        tmax,
        jnp.full((r,), -1, jnp.int32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
    )
    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (t, prim, u, v), _ = jax.lax.scan(body, init, starts)
    return Hit(t=t, prim=prim, u=u, v=v)


@partial(jax.jit, static_argnames=("num_keys", "num_faces", "chunk"))
def trace_any_bruteforce(
    geom: GeometrySoA,
    o,
    d,
    tmin,
    tmax,
    time,
    *,
    num_keys: int,
    num_faces: int,
    chunk: int = 256,
) -> jnp.ndarray:
    """Any-hit occlusion probe (traceOcclusion, shader_common.h:110-134)."""
    r = o.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    f_padded = geom.mat_id.shape[0]
    assert f_padded % chunk == 0, "chunk must divide the padded face count"
    n_chunks = f_padded // chunk
    o_b = o[:, None, :]
    d_b = d[:, None, :]

    def body(occluded, start):
        v0, e1, e2 = _tri_chunk(geom, num_keys, start, chunk, time)
        _, _, _, hit = ray_triangle(o_b, d_b, v0, e1, e2, tmin[:, None], tmax[:, None])
        prim_ids = start + jax.lax.broadcasted_iota(jnp.int32, hit.shape, 1)
        hit &= prim_ids < num_faces
        return occluded | jnp.any(hit, axis=1), None

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    occluded, _ = jax.lax.scan(body, jnp.zeros((r,), bool), starts)
    return occluded


def make_bruteforce_tracer(scene: Scene, chunk: int = 256):
    """Bind a scene into the (closest, any) tracer interface.

    `count` (live-ray hint for compacted wavefronts) is accepted for
    interface parity but ignored — the XLA path tests all lanes anyway."""

    def closest(o, d, tmin, tmax, time, count=None):
        del count
        return trace_closest_bruteforce(
            scene.geom, o, d, tmin, tmax, time,
            num_keys=scene.num_keys, num_faces=scene.num_faces, chunk=chunk,
        )

    def any_hit(o, d, tmin, tmax, time, count=None):
        del count
        return trace_any_bruteforce(
            scene.geom, o, d, tmin, tmax, time,
            num_keys=scene.num_keys, num_faces=scene.num_faces, chunk=chunk,
        )

    return closest, any_hit
