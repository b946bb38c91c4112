"""Scalar numpy oracle integrator.

An independent, deliberately-slow re-implementation of the reference
integrator's exact control flow (SURVEY.md S3.3: raygen.cu /
closehit_radiance.cu / miss.cu), one ray at a time with scalar Python RNG.
The production wavefront integrator must match it per-pixel under matched
seeds — this validates the vectorization (masked RNG stream advance, RR
short-circuit, NEE fork) end to end.

Where the reference hits undefined behavior (light pick index == count) this
clamps, matching the documented choice in scene/light.py.
"""
from __future__ import annotations

import math

import numpy as np

M = 0xFFFFFFFF


def tea(v0, v1, rounds=4):
    v0 &= M
    v1 &= M
    s0 = 0
    for _ in range(rounds):
        s0 = (s0 + 0x9E3779B9) & M
        v0 = (v0 + ((((v1 << 4) & M) + 0xA341316C) ^ ((v1 + s0) & M) ^ ((v1 >> 5) + 0xC8013EA4))) & M
        v1 = (v1 + ((((v0 << 4) & M) + 0xAD90777D) ^ ((v0 + s0) & M) ^ ((v0 >> 5) + 0x7E95761E))) & M
    return v0


class Lcg:
    def __init__(self, state):
        self.state = state & M

    def rnd(self) -> np.float32:
        self.state = (1664525 * self.state + 1013904223) & M
        return np.float32(np.float32(self.state & 0x00FFFFFF) / np.float32(0x01000000))


def _normalize(v):
    return v / np.linalg.norm(v)


def _intersect_all(o, d, v0, e1, e2, tmin, tmax):
    """Closest hit among all triangles (vectorized over triangles only)."""
    eps = 1e-10
    pvec = np.cross(np.broadcast_to(d, v0.shape), e2)
    det = np.sum(e1 * pvec, -1)
    inv = np.where(np.abs(det) > eps, 1.0 / np.where(det == 0, 1, det), 0.0)
    tvec = o - v0
    u = np.sum(tvec * pvec, -1) * inv
    qvec = np.cross(tvec, e1)
    v = np.sum(np.broadcast_to(d, v0.shape) * qvec, -1) * inv
    t = np.sum(e2 * qvec, -1) * inv
    hit = (np.abs(det) > eps) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > tmin) & (t < tmax)
    t = np.where(hit, t, np.inf)
    i = int(np.argmin(t))
    if not hit[i]:
        return None
    return i, float(t[i]), float(u[i]), float(v[i])


def _occluded(o, d, v0, e1, e2, tmin, tmax):
    eps = 1e-10
    pvec = np.cross(np.broadcast_to(d, v0.shape), e2)
    det = np.sum(e1 * pvec, -1)
    inv = np.where(np.abs(det) > eps, 1.0 / np.where(det == 0, 1, det), 0.0)
    tvec = o - v0
    u = np.sum(tvec * pvec, -1) * inv
    qvec = np.cross(tvec, e1)
    v = np.sum(np.broadcast_to(d, v0.shape) * qvec, -1) * inv
    t = np.sum(e2 * qvec, -1) * inv
    hit = (np.abs(det) > eps) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > tmin) & (t < tmax)
    return bool(hit.any())


def render_oracle(scene_np, cam, width, height, spp, subframe_index=0,
                  max_depth=32, bg=(0.01, 0.01, 0.01)):
    """scene_np: dict with keys v0,e1,e2 [F,3] (key 0), n0,n1,n2, uv0..2,
    mat_id, mat_diffuse [M,3], mat_emission [M,3], lights_* arrays.
    cam: (eye, U, V, W) numpy. Returns [H, W, 3] float32 (pre-accumulation
    subframe estimate, i.e. result/spp)."""
    eye, U, V, W = [np.asarray(x, np.float64) for x in cam]
    v0, e1, e2 = scene_np["v0"], scene_np["e1"], scene_np["e2"]
    img = np.zeros((height, width, 3), np.float64)
    n_lights = len(scene_np["light_v0"])
    bg = np.asarray(bg, np.float64)

    for py in range(height):
        for px in range(width):
            outer = Lcg(tea(py * width + px, subframe_index))
            result = np.zeros(3)
            for _ in range(spp):
                jx = outer.rnd()
                jy = outer.rnd()
                dx = 2.0 * ((px + jx) / width) - 1.0
                dy = 2.0 * ((py + jy) / height) - 1.0
                direction = _normalize(dx * U + dy * V + W)
                origin = eye.copy()
                prd_seed = Lcg(outer.state)
                atten = np.ones(3)
                last_atten = np.ones(3)
                depth = 0
                while True:
                    _time = prd_seed.rnd()  # motion-time draw
                    h = _intersect_all(origin, direction, v0, e1, e2, 0.01, 1e16)
                    if h is None:
                        # miss: constant ambient, done
                        result += bg * last_atten
                        break
                    prim, t, u, v = h
                    w0, w1, w2 = 1 - u - v, u, v
                    ng = _normalize(
                        w0 * scene_np["n0"][prim]
                        + w1 * scene_np["n1"][prim]
                        + w2 * scene_np["n2"][prim]
                    )
                    ns = ng if np.dot(-direction, ng) >= 0 else -ng
                    p = origin + t * direction
                    mid = scene_np["mat_id"][prim]
                    emitted = (
                        scene_np["mat_emission"][mid] if depth == 0 else np.zeros(3)
                    )
                    # BSDF sampling
                    prd_seed.rnd()  # z1 (unused)
                    prd_seed.rnd()  # z2 (unused)
                    u1 = prd_seed.rnd()
                    u2 = prd_seed.rnd()
                    r = math.sqrt(u1)
                    phi = 2 * math.pi * u2
                    wx, wy = r * math.cos(phi), r * math.sin(phi)
                    wz = math.sqrt(max(0.0, 1 - wx * wx - wy * wy))
                    pdf_prev = wz / math.pi
                    # ONB (shader_common.h:15-48)
                    if abs(ns[0]) > abs(ns[2]):
                        b = np.array([-ns[1], ns[0], 0.0])
                    else:
                        b = np.array([0.0, -ns[2], ns[1]])
                    b = _normalize(b)
                    tg = np.cross(b, ns)
                    new_dir = wx * tg + wy * b + wz * ns
                    albedo = scene_np["mat_diffuse"][mid].copy()
                    atten = atten * albedo * ((1.0 / math.pi) / max(pdf_prev, 1e-12))
                    # NEE
                    u_pick = prd_seed.rnd()
                    lu = prd_seed.rnd()
                    lv = prd_seed.rnd()
                    radiance = np.zeros(3)
                    if n_lights > 0:
                        li = min(int(u_pick * n_lights), n_lights - 1)
                        su0 = math.sqrt(lu)
                        b0 = 1 - su0
                        b1 = lv * su0
                        lpos = (
                            b0 * scene_np["light_v0"][li]
                            + b1 * scene_np["light_v1"][li]
                            + (1 - b0 - b1) * scene_np["light_v2"][li]
                        )
                        dvec = lpos - p
                        dist2 = float(np.dot(dvec, dvec))
                        if dist2 < 1e-5:
                            emission_l = np.zeros(3)
                            pdf_l = 1.0
                        else:
                            ndir = dvec / math.sqrt(dist2)
                            omega = (
                                abs(np.dot(ndir, scene_np["light_n"][li]))
                                * scene_np["light_area"][li]
                                / dist2
                            )
                            if omega < 1e-5:
                                emission_l = np.zeros(3)
                                pdf_l = 1.0
                            else:
                                emission_l = scene_np["light_e"][li] * omega
                                pdf_l = 1.0 / omega
                        pdf_l = pdf_l / n_lights
                        ldist = float(np.linalg.norm(lpos - p))
                        ldir = (lpos - p) / max(ldist, 1e-20)
                        ndl = float(np.dot(ns, ldir))
                        weight = np.zeros(3)
                        if ndl > 0:
                            occ = _occluded(p, ldir, v0, e1, e2, 0.001, ldist - 0.01)
                            if not occ:
                                pdf_scatter = abs(ndl) / math.pi
                                ph = pdf_l * pdf_l / (pdf_l * pdf_l + pdf_scatter * pdf_scatter)
                                weight = albedo * ph * (1.0 / math.pi)
                        radiance = emission_l * weight
                    # raygen accumulation
                    result += emitted
                    result += radiance * last_atten
                    last_atten = atten.copy()
                    p_rr = float(np.dot(atten, [0.30, 0.59, 0.11]))
                    u_rr = prd_seed.rnd()
                    if u_rr > p_rr:
                        break
                    atten = atten / p_rr
                    origin = p
                    direction = new_dir
                    depth += 1
                    if depth >= max_depth:
                        break
            img[py, px] = result / spp
    return img.astype(np.float32)
