"""Emissive-triangle area lights + samplers.

Equivalent of src/light.h (the Light struct + solid-angle Sample) and
buildLightSampler (src/wavefront.cpp:257-275): every triangle of every mesh
whose material emission has |e| >= 1e-5 becomes one area light, built from
motion key 0's vertices. Device side this is a flat SoA table sampled with
batched gathers.

Two light pick strategies:
  * uniform (reference semantics, closehit_radiance.cu:10-15)
  * power-proportional (reference roadmap item "power light sampler",
    README.md:19) — pick probability proportional to emitted power
    (luminance(Le) * area), via a precomputed CDF and searchsorted.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..math.sampling import sample_uniform_triangle
from ..math.vec import dot


class LightTable(NamedTuple):
    v0: jnp.ndarray  # [L, 3]
    v1: jnp.ndarray  # [L, 3]
    v2: jnp.ndarray  # [L, 3]
    emission: jnp.ndarray  # [L, 3]
    normal: jnp.ndarray  # [L, 3]
    area: jnp.ndarray  # [L]
    power_cdf: jnp.ndarray  # [L] inclusive normalized CDF of luminance*area
    # packed row-major copy (v0 v1 v2 emission normal area) — TPU gathers pay
    # per-row costs, so sampling fetches ONE [L,16] row instead of six arrays
    packed: jnp.ndarray = None  # [L, 16]


def build_light_table(v0, v1, v2, emission) -> LightTable:
    """Host build from numpy arrays of emissive triangles [L, 3]."""
    v0 = np.asarray(v0, np.float32).reshape(-1, 3)
    v1 = np.asarray(v1, np.float32).reshape(-1, 3)
    v2 = np.asarray(v2, np.float32).reshape(-1, 3)
    emission = np.asarray(emission, np.float32).reshape(-1, 3)
    if len(v0) == 0:
        # Pad with one dark degenerate light so gathers stay well-formed;
        # callers gate on num_lights == 0.
        v0 = v1 = v2 = np.zeros((1, 3), np.float32)
        emission = np.zeros((1, 3), np.float32)
    n = np.cross(v1 - v0, v2 - v0)
    nlen = np.linalg.norm(n, axis=-1, keepdims=True)
    area = 0.5 * nlen[..., 0]
    normal = n / np.maximum(nlen, 1e-20)
    power = np.sum(emission * np.array([0.30, 0.59, 0.11], np.float32), -1) * area
    total = power.sum()
    cdf = np.cumsum(power) / (total if total > 0 else 1.0)
    packed = np.zeros((len(v0), 16), np.float32)
    packed[:, 0:3] = v0
    packed[:, 3:6] = v1
    packed[:, 6:9] = v2
    packed[:, 9:12] = emission
    packed[:, 12:15] = normal
    packed[:, 15] = area
    return LightTable(
        v0=jnp.asarray(v0),
        v1=jnp.asarray(v1),
        v2=jnp.asarray(v2),
        emission=jnp.asarray(emission),
        normal=jnp.asarray(normal),
        area=jnp.asarray(area.astype(np.float32)),
        power_cdf=jnp.asarray(cdf.astype(np.float32)),
        packed=jnp.asarray(packed),
    )


def pick_light_uniform(lights: LightTable, num_lights: int, u: jnp.ndarray):
    """Uniform pick: index = int(u * count) (closehit_radiance.cu:12).

    The reference can index one past the end when u -> 1; we clamp (the
    reference's read there is undefined behavior, SURVEY.md S3.3).
    Returns (index, pick_pdf).
    """
    idx = jnp.minimum((u * num_lights).astype(jnp.int32), num_lights - 1)
    pdf = jnp.full_like(u, 1.0 / max(num_lights, 1))
    return idx, pdf


def pick_light_power(lights: LightTable, num_lights: int, u: jnp.ndarray):
    """Power-proportional pick via CDF inversion (roadmap parity)."""
    idx = jnp.searchsorted(lights.power_cdf, u, side="right").astype(jnp.int32)
    idx = jnp.minimum(idx, num_lights - 1)
    lo = jnp.where(idx > 0, lights.power_cdf[idx - 1], 0.0)
    pdf = lights.power_cdf[idx] - lo
    return idx, pdf


def sample_light(lights: LightTable, idx: jnp.ndarray, u: jnp.ndarray,
                 v: jnp.ndarray, p: jnp.ndarray):
    """Light::Sample (src/light.h:33-60), batched.

    Returns (light_pos [...,3], emission*solid_angle [...,3], pdf [...]) where
    pdf is in solid-angle measure (1/omega), with the reference's degenerate
    guards: dist^2 < 1e-5 or omega < 1e-5 -> emission 0, pdf 1.
    """
    b0, b1, b2 = sample_uniform_triangle(u, v)
    if lights.packed is not None:
        row = lights.packed[idx]  # one gather for all six fields
        lv0, lv1, lv2 = row[..., 0:3], row[..., 3:6], row[..., 6:9]
        l_emis, l_norm, l_area = row[..., 9:12], row[..., 12:15], row[..., 15]
    else:
        lv0, lv1, lv2 = lights.v0[idx], lights.v1[idx], lights.v2[idx]
        l_emis, l_norm, l_area = (
            lights.emission[idx], lights.normal[idx], lights.area[idx]
        )
    pos = b0[..., None] * lv0 + b1[..., None] * lv1 + b2[..., None] * lv2

    dvec = pos - p
    dist2 = dot(dvec, dvec)
    safe_dist2 = jnp.maximum(dist2, 1e-20)
    ndir = dvec * jax_rsqrt(safe_dist2)[..., None]
    omega = jnp.abs(dot(ndir, l_norm)) * l_area / safe_dist2

    degenerate = (dist2 < 1e-5) | (omega < 1e-5)
    emission = jnp.where(
        degenerate[..., None], 0.0, l_emis * omega[..., None]
    )
    pdf = jnp.where(degenerate, 1.0, 1.0 / jnp.maximum(omega, 1e-20))
    return pos, emission, pdf


def jax_rsqrt(x):
    import jax.lax

    return jax.lax.rsqrt(x)
