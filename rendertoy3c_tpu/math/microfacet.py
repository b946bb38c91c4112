"""Microfacet BSDF building blocks: GGX distribution, Smith masking,
Schlick fresnel.

Counterparts in the reference: the whitted pipeline's GGX direct lighting
(cuda/whitted.cu:149-289 uses `ggxNormal`/`vis`/`schlick` from
cuda/whitted_cuda.h:47-70) and the Principled-BSDF roadmap scaffold
(src/bxdf.h, src/material.h:7-13). All functions are batched jnp ops in the
local shading frame (+z = shading normal) unless noted.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

M_PI = math.pi


def schlick_weight(cos_theta):
    """(1 - cos)^5, clamped."""
    m = jnp.clip(1.0 - cos_theta, 0.0, 1.0)
    m2 = m * m
    return m2 * m2 * m


def schlick_fresnel(f0, cos_theta):
    """F = f0 + (1 - f0) (1 - cos)^5 (whitted_cuda.h:47-50).

    Shapes must broadcast (pass cos_theta[..., None] against an RGB f0)."""
    return f0 + (1.0 - f0) * schlick_weight(cos_theta)


def fresnel_dielectric(cos_i, eta):
    """Exact dielectric fresnel (unpolarized). cos_i >= 0 entering side;
    eta = ior_transmitted / ior_incident."""
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    sin2_t = (1.0 - cos_i * cos_i) / jnp.maximum(eta * eta, 1e-12)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    r_par = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-12)
    r_perp = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, 1e-12)
    f = 0.5 * (r_par * r_par + r_perp * r_perp)
    return jnp.where(tir, 1.0, f)


def d_ggx(cos_h, alpha):
    """GGX normal distribution D(h) for half-vector z-cosine cos_h."""
    a2 = alpha * alpha
    c2 = cos_h * cos_h
    denom = c2 * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(M_PI * denom * denom, 1e-12)


def smith_g1(cos_v, alpha):
    """Smith masking term G1 for GGX (height-correlated-free form)."""
    a2 = alpha * alpha
    c2 = jnp.clip(cos_v * cos_v, 1e-12, 1.0)
    tan2 = (1.0 - c2) / c2
    return 2.0 / (1.0 + jnp.sqrt(1.0 + a2 * tan2))


def smith_g(cos_i, cos_o, alpha):
    return smith_g1(cos_i, alpha) * smith_g1(cos_o, alpha)


def sample_ggx_half(u1, u2, alpha):
    """Sample a GGX half-vector around local +z. Returns [..., 3].

    pdf(h) = D(h) cos_h.
    """
    a2 = alpha * alpha
    phi = 2.0 * M_PI * u1
    denom = 1.0 + (a2 - 1.0) * u2
    cos_h = jnp.sqrt(jnp.clip((1.0 - u2) / jnp.maximum(denom, 1e-12), 0.0, 1.0))
    sin_h = jnp.sqrt(jnp.maximum(1.0 - cos_h * cos_h, 0.0))
    return jnp.stack(
        [sin_h * jnp.cos(phi), sin_h * jnp.sin(phi), cos_h], axis=-1
    )


def ggx_half_pdf(cos_h, cos_oh, alpha):
    """pdf of the reflected direction when h ~ D(h)cos_h:
    pdf(wi) = D(h) cos_h / (4 |wo . h|)."""
    return d_ggx(cos_h, alpha) * jnp.maximum(cos_h, 0.0) / jnp.maximum(
        4.0 * jnp.abs(cos_oh), 1e-12
    )


