"""Two-level (TLAS -> BLAS) tracing in jnp: transform rays per instance.

The XLA-level reference implementation of IAS traversal
(src/cuda/cuda_accel.h + OptiX's instance transform stage): for every
instance, rays are mapped into object space by the inverse instance matrix
(direction left unnormalized so t stays world-parametric), tested against
that mesh's triangle range, and the closest hit across instances wins.
Instance matrix motion uses the reference semantics — vertices move by
elementwise-lerped matrices (cuda_accel.h:38-73) — so the per-ray object-
space transform is the inverse of the lerped matrix, inverted per ray.

The instance loop is a compile-time Python loop (instance counts are
static); per-instance work is fully vectorized. The Pallas backend
(pallas_mt_instanced) adds tile-level instance AABB culling on top.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..scene.instanced import InstancedScene
from .intersect import Hit, ray_triangle

_BIG = 1e30


def _lerp_minv(inst, i, time, motion: bool):
    """Per-ray world->object affine for instance i at per-ray times.

    Static: constant minv row. Motion: invert lerp(m0, m1, t) per ray.
    Returns (lin [R?,3,3], trans [R?,3]) broadcastable against rays.
    """
    if not motion:
        mi = inst.minv[i]  # [2,3,4]; key 0 == key 1 for static tables
        return mi[0, :, :3][None], mi[0, :, 3][None]
    from .hier_instanced import _inv3

    m0 = inst.m[i, 0]
    m1 = inst.m[i, 1]
    mt = m0[None] + (m1 - m0)[None] * time[:, None, None]  # [R,3,4]
    # closed-form cofactor inverse, det-guarded to ZERO on singular
    # time-lerps — the same arithmetic the instanced hierwalk uses
    # (trace/hier_instanced.py _inv3), so both tracers agree that a ray
    # at a degenerate lerp time misses the instance instead of one
    # producing NaNs (jnp.linalg.inv) and the other zeros
    lin = _inv3(mt[:, :, :3])
    trans = -jnp.einsum("rij,rj->ri", lin, mt[:, :, 3])
    return lin, trans


def _transform_rays(lin, trans, o, d):
    o2 = jnp.einsum("rij,rj->ri", jnp.broadcast_to(lin, (o.shape[0], 3, 3)), o)
    o2 = o2 + jnp.broadcast_to(trans, o.shape)
    d2 = jnp.einsum("rij,rj->ri", jnp.broadcast_to(lin, (d.shape[0], 3, 3)), d)
    return o2, d2


def _trace_range(geom, start, count, o, d, tmin, tmax, chunk=512):
    """Closest hit over faces [start, start+count) (static range)."""
    if count % chunk:
        # mesh ranges are INST_FACE_ALIGN-padded; shrink the slice so it
        # never spills into the next mesh's faces
        import math as _m

        chunk = _m.gcd(count, chunk)
    r = o.shape[0]
    best = (
        tmax,
        jnp.full((r,), -1, jnp.int32),
        jnp.zeros((r,)),
        jnp.zeros((r,)),
    )
    o_b = o[:, None, :]
    d_b = d[:, None, :]
    for c0 in range(start, start + count, chunk):
        v0 = jax.lax.dynamic_slice_in_dim(geom.v0[0], c0, chunk, axis=0)
        e1 = jax.lax.dynamic_slice_in_dim(geom.e1[0], c0, chunk, axis=0)
        e2 = jax.lax.dynamic_slice_in_dim(geom.e2[0], c0, chunk, axis=0)
        t, u, v, hit = ray_triangle(
            o_b, d_b, v0[None], e1[None], e2[None],
            tmin[:, None], best[0][:, None],
        )
        t = jnp.where(hit, t, _BIG)
        t_c = jnp.min(t, axis=1)
        at_min = t <= t_c[:, None]
        prim_ids = c0 + jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        prim_c = jnp.min(
            jnp.where(at_min, prim_ids, jnp.int32(0x7FFFFFFF)), axis=1
        )
        one = at_min & (prim_ids == prim_c[:, None])
        u_c = jnp.sum(jnp.where(one, u, 0.0), axis=1)
        v_c = jnp.sum(jnp.where(one, v, 0.0), axis=1)
        better = (t_c < best[0]) & (t_c < _BIG)
        best = (
            jnp.where(better, t_c, best[0]),
            jnp.where(better, prim_c, best[1]),
            jnp.where(better, u_c, best[2]),
            jnp.where(better, v_c, best[3]),
        )
    return best


def make_instanced_tracer(scene: InstancedScene, chunk: int = 512):
    """(closest, any) over the two-level structure."""
    inst = scene.instances
    motion = scene.num_keys > 1

    def closest(o, d, tmin, tmax, time, count=None):
        del count
        r = o.shape[0]
        tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
        tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
        best_t = tmax
        best = (
            jnp.full((r,), -1, jnp.int32),
            jnp.zeros((r,)),
            jnp.zeros((r,)),
            jnp.full((r,), -1, jnp.int32),
        )
        for i, mesh_i in enumerate(scene.instance_mesh):
            start, cnt = scene.mesh_ranges[mesh_i]
            lin, trans = _lerp_minv(inst, i, time, motion)
            o2, d2 = _transform_rays(lin, trans, o, d)
            t_c, prim_c, u_c, v_c = _trace_range(
                scene.geom, start, cnt, o2, d2, tmin, best_t, chunk
            )
            better = (prim_c >= 0) & (t_c < best_t)
            best_t = jnp.where(better, t_c, best_t)
            best = (
                jnp.where(better, prim_c, best[0]),
                jnp.where(better, u_c, best[1]),
                jnp.where(better, v_c, best[2]),
                jnp.where(better, i, best[3]),
            )
        return Hit(t=best_t, prim=best[0], u=best[1], v=best[2], inst=best[3])

    def any_hit(o, d, tmin, tmax, time, count=None):
        del count
        r = o.shape[0]
        tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
        tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
        occluded = jnp.zeros((r,), bool)
        for i, mesh_i in enumerate(scene.instance_mesh):
            start, cnt = scene.mesh_ranges[mesh_i]
            lin, trans = _lerp_minv(inst, i, time, motion)
            o2, d2 = _transform_rays(lin, trans, o, d)
            t_c, prim_c, _, _ = _trace_range(
                scene.geom, start, cnt, o2, d2, tmin, tmax, chunk
            )
            occluded = occluded | (prim_c >= 0)
        return occluded

    return closest, any_hit
