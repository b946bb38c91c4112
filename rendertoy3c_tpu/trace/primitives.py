"""Analytic (non-triangle) primitive intersectors, vectorized.

Parity with the legacy whitted pipeline's custom-primitive programs
(cuda/geometry.cu:38-144, cuda/sphere.cu:37-96, schemas in
cuda/GeometryData.h:55-135): sphere (with the refined-root iteration the
reference uses for precision), sphere shell (inner/outer surface with
hit-type classification), and parallelogram. All functions broadcast over
leading axes and return (t, normal, hit_mask[, aux]); misses report t
unchanged-from-tmax semantics via the mask.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..math.vec import cross, dot, normalize

# sphere-shell hit classification (GeometryData.h SphereShell hit kinds)
SHELL_OUTSIDE_FROM_OUTSIDE = 0
SHELL_OUTSIDE_FROM_INSIDE = 1
SHELL_INSIDE_FROM_OUTSIDE = 2
SHELL_INSIDE_FROM_INSIDE = 3


def intersect_sphere(o, d, center, radius, tmin, tmax):
    """Ray-sphere with one Newton refinement of the quadratic root
    (sphere.cu:37-96 refines to counter catastrophic cancellation).

    Returns (t, normal [..,3], hit).
    """
    oc = o - center
    b = dot(oc, d)
    c = dot(oc, oc) - radius * radius
    disc = b * b - c
    has = disc > 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where((t0 > tmin) & (t0 < tmax), t0,
                  jnp.where((t1 > tmin) & (t1 < tmax), t1, tmax))
    hit = has & (t < tmax) & (t > tmin)
    # one refinement step: t' = t - f(t)/f'(t)
    p = oc + t[..., None] * d
    f = dot(p, p) - radius * radius
    fp = 2.0 * dot(p, d)
    t_ref = t - f / jnp.where(jnp.abs(fp) > 1e-12, fp, 1e-12)
    t = jnp.where(hit & (t_ref > tmin) & (t_ref < tmax), t_ref, t)
    n = normalize((o + t[..., None] * d) - center, eps=1e-20)
    return t, n, hit


def intersect_sphere_shell(o, d, center, r_inner, r_outer, tmin, tmax):
    """Sphere shell: nearest crossing of either surface
    (geometry.cu:67-143 __intersection__sphere_shell).

    Returns (t, normal, hit, hit_type) with normals pointing outward from
    the shell material (inner surface normals point toward the center).
    """
    oc = o - center
    b = dot(oc, d)
    c_out = dot(oc, oc) - r_outer * r_outer
    c_in = dot(oc, oc) - r_inner * r_inner

    disc_o = b * b - c_out
    disc_i = b * b - c_in
    sq_o = jnp.sqrt(jnp.maximum(disc_o, 0.0))
    sq_i = jnp.sqrt(jnp.maximum(disc_i, 0.0))

    big = jnp.full_like(b, 1e30)

    def valid(t, ok):
        return jnp.where(ok & (t > tmin) & (t < tmax), t, big)

    t_o0 = valid(-b - sq_o, disc_o > 0)  # outer, entering
    t_o1 = valid(-b + sq_o, disc_o > 0)  # outer, exiting
    t_i0 = valid(-b - sq_i, disc_i > 0)  # inner, entering
    t_i1 = valid(-b + sq_i, disc_i > 0)  # inner, exiting

    ts = jnp.stack([t_o0, t_i0, t_i1, t_o1], axis=-1)
    kinds = jnp.asarray([
        SHELL_OUTSIDE_FROM_OUTSIDE, SHELL_INSIDE_FROM_OUTSIDE,
        SHELL_INSIDE_FROM_INSIDE, SHELL_OUTSIDE_FROM_INSIDE,
    ])
    k = jnp.argmin(ts, axis=-1)
    t = jnp.min(ts, axis=-1)
    hit = t < 1e29
    hit_type = kinds[k]
    p = o + t[..., None] * d
    n = normalize(p - center, eps=1e-20)
    inner = (hit_type == SHELL_INSIDE_FROM_OUTSIDE) | (
        hit_type == SHELL_INSIDE_FROM_INSIDE
    )
    n = jnp.where(inner[..., None], -n, n)
    return jnp.where(hit, t, tmax), n, hit, hit_type


def intersect_parallelogram(o, d, anchor, v1, v2, tmin, tmax):
    """Parallelogram spanned by v1, v2 at anchor
    (geometry.cu:38-65 __intersection__parallelogram).

    Returns (t, normal, hit, (a, b)) with a, b in [0, 1] the patch
    coordinates.
    """
    n_raw = cross(v1, v2)
    n = normalize(n_raw, eps=1e-20)
    dn = dot(d, n)
    ok = jnp.abs(dn) > 1e-12
    t = jnp.where(ok, dot(anchor - o, n) / jnp.where(ok, dn, 1.0), tmax)
    p = o + t[..., None] * d
    rel = p - anchor
    # project onto the (v1, v2) basis
    v11 = dot(v1, v1)
    v22 = dot(v2, v2)
    v12 = dot(v1, v2)
    det = v11 * v22 - v12 * v12
    rv1 = dot(rel, v1)
    rv2 = dot(rel, v2)
    a = (rv1 * v22 - rv2 * v12) / jnp.maximum(det, 1e-20)
    b = (rv2 * v11 - rv1 * v12) / jnp.maximum(det, 1e-20)
    hit = (
        ok & (t > tmin) & (t < tmax)
        & (a >= 0.0) & (a <= 1.0) & (b >= 0.0) & (b <= 1.0)
    )
    return jnp.where(hit, t, tmax), jnp.broadcast_to(n, p.shape), hit, (a, b)


def intersect_capsule(o, d, p0, p1, r0, r1, tmin, tmax):
    """Ray vs. a linearly-swept sphere segment (round cone / capsule with
    lerped radius) — the primitive a subdivided swept-sphere curve reduces
    to. Approximates the varying-radius side wall by iterating the sphere
    at the closest curve parameter (2 fixed refinement steps), which
    converges fast for the small segments curve subdivision produces.

    o, d: [..., 3]; p0/p1/r0/r1 broadcastable. Returns (t, normal, hit, s)
    with s in [0, 1] the segment parameter of the hit.
    """
    axis = p1 - p0
    len2 = jnp.maximum(dot(axis, axis), 1e-20)

    def sphere_at(s):
        c = p0 + s[..., None] * axis
        r = r0 * (1.0 - s) + r1 * s
        return c, r

    # initial s: parameter of the ray origin's projection onto the axis
    s = jnp.clip(dot(o - p0, axis) / len2, 0.0, 1.0)
    t = jnp.zeros_like(s)
    for _ in range(3):
        c, r = sphere_at(s)
        t, _, _ = intersect_sphere(o, d, c, r, tmin, tmax)
        p = o + t[..., None] * d
        s = jnp.clip(dot(p - p0, axis) / len2, 0.0, 1.0)
    c, r = sphere_at(s)
    t, n, hit = intersect_sphere(o, d, c, r, tmin, tmax)
    return t, n, hit, s


def intersect_curve(kind, ctrl, radii, o, d, tmin, tmax, segments: int = 8):
    """Ray vs. swept-sphere curve by uniform subdivision into capsule
    segments (the software counterpart of OptiX's built-in curve
    intersectors consuming cuda/curve.h's evaluators).

    ctrl [..., n, 3], radii [..., n] per the curve kind; o, d [..., 3].
    Returns (t, normal, hit, u) with u the curve parameter of the hit.
    """
    from ..math.curves import curve_eval, curve_surface_normal

    us = [i / segments for i in range(segments + 1)]
    pts = []
    rads = []
    for uu in us:
        u_arr = jnp.full(o.shape[:-1], uu, jnp.float32)
        pos, _, rad, _ = curve_eval(kind, ctrl, radii, u_arr)
        pts.append(pos)
        rads.append(rad)

    best_t = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), o.shape[:-1])
    best_u = jnp.zeros_like(best_t)
    any_hit = jnp.zeros(o.shape[:-1], bool)
    for i in range(segments):
        t, _, hit, s = intersect_capsule(
            o, d, pts[i], pts[i + 1], rads[i], rads[i + 1], tmin, best_t
        )
        better = hit & (t < best_t)
        best_t = jnp.where(better, t, best_t)
        best_u = jnp.where(better, (us[i] + s * (1.0 / segments)), best_u)
        any_hit = any_hit | better

    hit_p = o + best_t[..., None] * d
    n = curve_surface_normal(kind, ctrl, radii, best_u, hit_p)
    return best_t, n, any_hit, best_u


def trace_prims(prims, o, d, tmin, tmax):
    """Closest analytic hit across every primitive slab of a PrimSoA.

    One dense vectorized [R, K] sweep per kind present (static python
    gates on the slab shapes — the TPU counterpart of the reference
    registering one intersection program per custom-primitive kind into
    the whitted SBT, sutil/Scene.cpp:1214-1452).

    Returns (t [R], n [R,3], uv [R,2], mat [R] i32, hit [R] bool); lanes
    that miss keep t = tmax, n/uv zeros, mat -1.
    """
    r = o.shape[0]
    tmin_c = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))[:, None]
    best_t = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    best_n = jnp.zeros((r, 3), jnp.float32)
    best_uv = jnp.zeros((r, 2), jnp.float32)
    best_mat = jnp.full((r,), -1, jnp.int32)
    o_b = o[:, None, :]
    d_b = d[:, None, :]

    def merge(t, n, uv, mat, hit, best):
        """Fold a [R, K] kind-sweep into the running [R] best."""
        best_t, best_n, best_uv, best_mat = best
        tt = jnp.where(hit, t, jnp.float32(1e30))
        k_t = jnp.min(tt, axis=1)
        k = tt.shape[1]
        lane = jax.lax.iota(jnp.int32, k)[None, :]
        sel = jnp.min(jnp.where(tt <= k_t[:, None], lane, k), axis=1)
        one = (lane == sel[:, None]) & hit
        better = k_t < best_t
        pick = lambda a, cur: jnp.where(  # noqa: E731
            better if a.ndim == 1 else better[:, None],
            jnp.sum(jnp.where(one if a.ndim == 2 else one[..., None],
                              a, 0), axis=1), cur)
        return (jnp.where(better, k_t, best_t),
                pick(n, best_n), pick(uv, best_uv),
                jnp.where(better,
                          jnp.sum(jnp.where(one, mat[None, :], 0), axis=1)
                          .astype(jnp.int32),
                          best_mat))

    best = (best_t, best_n, best_uv, best_mat)

    if prims.sph_radius.shape[0]:
        t, n, hit = intersect_sphere(
            o_b, d_b, prims.sph_center[None], prims.sph_radius[None],
            tmin_c, best[0][:, None])
        # lat-long uv from the outward normal (customs have no uv in the
        # reference; spherical chart is the natural texture frame)
        uv = jnp.stack([
            0.5 + jnp.arctan2(n[..., 2], n[..., 0]) / (2.0 * jnp.pi),
            0.5 + jnp.arcsin(jnp.clip(n[..., 1], -1, 1)) / jnp.pi,
        ], axis=-1)
        best = merge(t, n, uv, prims.sph_mat, hit, best)

    if prims.shell_radii.shape[0]:
        t, n, hit, _kind = intersect_sphere_shell(
            o_b, d_b, prims.shell_center[None],
            prims.shell_radii[None, :, 0], prims.shell_radii[None, :, 1],
            tmin_c, best[0][:, None])
        uv = jnp.stack([
            0.5 + jnp.arctan2(n[..., 2], n[..., 0]) / (2.0 * jnp.pi),
            0.5 + jnp.arcsin(jnp.clip(n[..., 1], -1, 1)) / jnp.pi,
        ], axis=-1)
        best = merge(t, n, uv, prims.shell_mat, hit, best)

    if prims.par_anchor.shape[0]:
        t, n, hit, (a, b) = intersect_parallelogram(
            o_b, d_b, prims.par_anchor[None], prims.par_v1[None],
            prims.par_v2[None], tmin_c, best[0][:, None])
        best = merge(t, n, jnp.stack([a, b], axis=-1), prims.par_mat, hit,
                     best)

    for cs in prims.curves:
        t, n, hit, u = intersect_curve(
            cs.kind, cs.ctrl[None], cs.radii[None], o_b, d_b,
            tmin_c, best[0][:, None])
        uv = jnp.stack([u, jnp.zeros_like(u)], axis=-1)
        best = merge(t, n, uv, cs.mat_id, hit, best)

    best_t, best_n, best_uv, best_mat = best
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    return best_t, best_n, best_uv, best_mat, best_t < tmax_b


def trace_prims_any(prims, o, d, tmin, tmax):
    """Occlusion probe against the analytic slabs (shadow rays)."""
    _t, _n, _uv, _m, hit = trace_prims(prims, o, d, tmin, tmax)
    return hit
