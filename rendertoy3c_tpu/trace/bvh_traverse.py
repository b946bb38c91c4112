"""Vectorized 8-wide BVH traversal in pure jnp.

The portable mid-tier tracer (between brute force and the Pallas kernels):
every ray carries its own traversal stack as a lane of a [R, S] array, and
each super-step pops one entry per ray in lock-step:

  * internal entry -> gather that node's 8 child AABBs (one gather) and
    slab-test them as a [R, 8] vector op, scatter the surviving child slots
    back onto the stack;
  * leaf entry -> gather <= max_leaf triangles and Moller-Trumbore them as a
    [R, max_leaf] vector op, keeping the closest hit (or early-terminating
    the lane for occlusion probes, OPTIX_RAY_FLAG_TERMINATE_ON_FIRST_HIT
    semantics of shader_common.h:128).

Lanes diverge only in *which* node/leaf they process, never in control flow,
so the whole loop stays one fused XLA while_loop over static shapes. Cost is
gather-bound; the Pallas backend (pallas_bvh.py) attacks exactly that.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..accel.lbvh import BVH8, ENC_EMPTY, decode_leaf
from ..scene.scene import GeometrySoA, Scene
from .intersect import Hit, ray_triangle

STACK_SIZE = 96


def _inv_dir(d):
    big = jnp.float32(1e30)
    return jnp.where(jnp.abs(d) > 1e-20, 1.0 / d, big)


def _slab_test(o, inv_d, lo, hi, tmin, tmax):
    """o/inv_d [R,3]; lo/hi [R,8,3]; tmin/tmax [R]. Returns [R,8] bool."""
    t0 = (lo - o[:, None, :]) * inv_d[:, None, :]
    t1 = (hi - o[:, None, :]) * inv_d[:, None, :]
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (tn <= tf) & (tf >= tmin[:, None]) & (tn <= tmax[:, None])


def _gather_leaf_tris(geom: GeometrySoA, num_keys: int, idx, time):
    """idx [R, L] triangle indices -> lerped (v0, e1, e2) [R, L, 3]."""
    if num_keys == 1:
        return geom.v0[0][idx], geom.e1[0][idx], geom.e2[0][idx]
    ts = time * (num_keys - 1)
    k0 = jnp.clip(jnp.floor(ts).astype(jnp.int32), 0, num_keys - 2)
    frac = (ts - k0.astype(jnp.float32))[:, None, None]
    k0b = k0[:, None]
    k1b = jnp.minimum(k0 + 1, num_keys - 1)[:, None]

    def lerp(arr):
        a = arr[k0b, idx]
        b = arr[k1b, idx]
        return a + (b - a) * frac

    return lerp(geom.v0), lerp(geom.e1), lerp(geom.e2)


@partial(jax.jit, static_argnames=("num_keys", "max_leaf", "any_hit"))
def trace_bvh(
    bvh: BVH8,
    geom: GeometrySoA,
    o,
    d,
    tmin,
    tmax,
    time,
    *,
    num_keys: int,
    max_leaf: int = 8,
    any_hit: bool = False,
):
    """Closest-hit (any_hit=False) -> Hit; occlusion (any_hit=True) -> bool mask."""
    r = o.shape[0]
    rows = jnp.arange(r)
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    inv_d = _inv_dir(d)
    f_padded = geom.mat_id.shape[0]

    stack0 = jnp.full((r, STACK_SIZE), ENC_EMPTY, jnp.int32).at[:, 0].set(0)
    state = dict(
        stack=stack0,
        sp=jnp.ones((r,), jnp.int32),
        best_t=tmax,
        prim=jnp.full((r,), -1, jnp.int32),
        u=jnp.zeros((r,), jnp.float32),
        v=jnp.zeros((r,), jnp.float32),
        occluded=jnp.zeros((r,), bool),
    )

    def cond(s):
        return jnp.any(s["sp"] > 0)

    def body(s):
        active = s["sp"] > 0
        sp = jnp.where(active, s["sp"] - 1, 0)
        top = jnp.where(active, s["stack"][rows, sp], ENC_EMPTY)

        is_node = active & (top >= 0)
        is_leaf = active & (top <= -2)

        # ---- internal: expand 8 children ----
        node = jnp.maximum(top, 0)
        lo = bvh.child_lo[node]  # [R, 8, 3]
        hi = bvh.child_hi[node]
        slots = bvh.child[node]  # [R, 8]
        pass_aabb = _slab_test(o, inv_d, lo, hi, tmin, s["best_t"])
        push = is_node[:, None] & pass_aabb & (slots != ENC_EMPTY)
        offs = jnp.cumsum(push.astype(jnp.int32), axis=1) - push.astype(jnp.int32)
        pos = jnp.where(push, sp[:, None] + offs, STACK_SIZE)  # drop non-push
        stack = s["stack"].at[rows[:, None], pos].set(
            slots, mode="drop"
        )
        new_sp = sp + jnp.sum(push.astype(jnp.int32), axis=1)

        # ---- leaf: intersect up to max_leaf triangles ----
        start, count = decode_leaf(top)
        lane = jnp.arange(max_leaf, dtype=jnp.int32)
        idx = jnp.clip(start[:, None] + lane[None, :], 0, f_padded - 1)
        valid = is_leaf[:, None] & (lane[None, :] < count[:, None])
        v0g, e1g, e2g = _gather_leaf_tris(geom, num_keys, idx, time)
        t, uu, vv, hit = ray_triangle(
            o[:, None, :], d[:, None, :], v0g, e1g, e2g,
            tmin[:, None], s["best_t"][:, None],
        )
        hit &= valid
        if any_hit:
            occluded = s["occluded"] | jnp.any(hit, axis=1)
            # terminate occluded lanes immediately
            new_sp = jnp.where(occluded, 0, new_sp)
            return dict(
                stack=stack, sp=new_sp, best_t=s["best_t"], prim=s["prim"],
                u=s["u"], v=s["v"], occluded=occluded,
            )
        t = jnp.where(hit, t, jnp.inf)
        # Leaf-closest selection as reductions (no per-row gathers; see
        # intersect.py) — min t, lowest-prim tiebreak, masked payload sums.
        t_c = jnp.min(t, axis=1)
        at_min = t <= t_c[:, None]
        prim_c = jnp.min(jnp.where(at_min, idx, jnp.int32(0x7FFFFFFF)), axis=1)
        one = at_min & (idx == prim_c[:, None])
        u_c = jnp.sum(jnp.where(one, uu, 0.0), axis=1)
        v_c = jnp.sum(jnp.where(one, vv, 0.0), axis=1)
        better = jnp.isfinite(t_c) & (t_c < s["best_t"])
        return dict(
            stack=stack,
            sp=new_sp,
            best_t=jnp.where(better, t_c, s["best_t"]),
            prim=jnp.where(better, prim_c, s["prim"]),
            u=jnp.where(better, u_c, s["u"]),
            v=jnp.where(better, v_c, s["v"]),
            occluded=s["occluded"],
        )

    out = jax.lax.while_loop(cond, body, state)
    if any_hit:
        return out["occluded"]
    return Hit(t=out["best_t"], prim=out["prim"], u=out["u"], v=out["v"])


def make_bvh_tracer(scene: Scene, bvh: BVH8, max_leaf: int = 8):
    """Bind (scene, bvh) into the (closest, any) tracer interface.

    The scene must already be reordered with reorder_scene_by_bvh."""

    def closest(o, d, tmin, tmax, time, count=None):
        del count
        return trace_bvh(
            bvh, scene.geom, o, d, tmin, tmax, time,
            num_keys=scene.num_keys, max_leaf=max_leaf, any_hit=False,
        )

    def any_hit(o, d, tmin, tmax, time, count=None):
        del count
        return trace_bvh(
            bvh, scene.geom, o, d, tmin, tmax, time,
            num_keys=scene.num_keys, max_leaf=max_leaf, any_hit=True,
        )

    return closest, any_hit


def build_scene_bvh(scene: Scene, max_leaf: int = 8):
    """Convenience: build the BVH for a scene and reorder its SoA.

    Returns (scene_reordered, bvh, perm)."""
    import numpy as np

    from ..accel.lbvh import build_bvh8, reorder_scene_by_bvh

    perm, bvh = build_bvh8(
        np.asarray(scene.geom.v0), np.asarray(scene.geom.e1),
        np.asarray(scene.geom.e2), scene.num_faces, max_leaf=max_leaf,
    )
    return reorder_scene_by_bvh(scene, perm), bvh, perm
