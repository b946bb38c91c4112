"""Vectorized BSDF dispatch for the wavefront integrator.

The reference enumerates four material types (src/material.h:7-13) but only
ships the Lambertian closure (closehit_radiance.cu:90-112; src/bxdf.h is the
unfinished abstraction for the rest — "Principled BSDF" is a README roadmap
item). This module provides all four, evaluated branch-free across a
wavefront: every lobe family is computed for every lane and the result picked
by material type, which is exactly how divergent material dispatch maps onto
a vector machine.

  DIFFUSE              Lambertian, cosine-hemisphere sampling (reference).
  SPECULAR             perfect mirror (delta lobe), tinted by diffuse color.
  FRESNEL_TRANSMISSIVE smooth dielectric: Schlick-weighted reflect/refract
                       (delta lobes; semantics follow the legacy glass
                       closest-hit, cuda/shading.cu:226-325, minus recursion).
  PRINCIPLED           metallic-roughness model: Lambertian base (1-metallic)
                       + GGX/Smith specular with Schlick F0 from ior/metallic
                       + sheen term (Disney-style), one-sample lobe selection.

Conventions: all directions point AWAY from the surface point; `wo` is toward
the viewer (-ray.direction), computed in the local frame of the shading
normal (+z). Delta lobes return pdf == 0 and carry their full weight in
`weight`; NEE must be skipped for them (`is_delta`).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from ..math.microfacet import (
    d_ggx,
    fresnel_dielectric,
    ggx_half_pdf,
    sample_ggx_half,
    schlick_fresnel,
    schlick_weight,
    smith_g,
)
from ..math.onb import onb_local_to_world, onb_world_to_local
from ..math.sampling import sample_cosine_hemisphere
from ..math.vec import luminance, normalize
from ..scene.material import MaterialType

_INV_PI = 1.0 / math.pi
_EPS = 1e-7


class BsdfSample(NamedTuple):
    wi: jnp.ndarray        # [R, 3] world-space sampled direction
    weight: jnp.ndarray    # [R, 3] f * cos / pdf (or delta throughput)
    pdf: jnp.ndarray       # [R] solid-angle pdf of wi (0 for delta lobes)
    is_delta: jnp.ndarray  # [R] bool — skip NEE on these lanes


class MatParams(NamedTuple):
    """Per-lane material parameters gathered from the MaterialTable."""

    mtype: jnp.ndarray       # [R] int32
    albedo: jnp.ndarray      # [R, 3] (diffuse color or texture)
    roughness: jnp.ndarray   # [R]
    metallic: jnp.ndarray    # [R]
    ior: jnp.ndarray         # [R]
    transmittance: jnp.ndarray  # [R]
    sheen: jnp.ndarray       # [R]


def _principled_f0(p: MatParams):
    """Specular F0: dielectric base from ior, lerped to albedo by metallic."""
    r0 = (p.ior - 1.0) / (p.ior + 1.0)
    f0d = (r0 * r0)[:, None]
    return f0d * (1.0 - p.metallic[:, None]) + p.albedo * p.metallic[:, None]


def _ggx_alpha(p: MatParams):
    return jnp.maximum(p.roughness * p.roughness, 1e-4)


def _principled_spec_prob(p: MatParams, f0):
    """One-sample lobe-selection probability for the specular lobe."""
    spec_w = luminance(f0)
    diff_w = luminance(p.albedo) * (1.0 - p.metallic)
    return jnp.clip(spec_w / jnp.maximum(spec_w + diff_w, 1e-9), 0.05, 0.98)


def _principled_eval_local(p: MatParams, f0, wo_l, wi_l):
    """f and pdf for the principled model, local frame, reflection side only.

    Returns (f [R,3], pdf [R]); both 0 when wi is below the surface.
    """
    cos_o = wo_l[..., 2]
    cos_i = wi_l[..., 2]
    valid = (cos_i > _EPS) & (cos_o > _EPS)
    h = normalize(wo_l + wi_l, eps=1e-20)
    cos_h = h[..., 2]
    cos_oh = jnp.sum(wo_l * h, axis=-1)
    alpha = _ggx_alpha(p)

    f_spec = (
        schlick_fresnel(f0, jnp.clip(cos_oh, 0.0, 1.0)[:, None])
        * (
            d_ggx(cos_h, alpha)
            * smith_g(cos_i, cos_o, alpha)
            / jnp.maximum(4.0 * cos_i * cos_o, 1e-9)
        )[:, None]
    )
    # Disney-style sheen on the fresnel edge
    f_sheen = (p.sheen * schlick_weight(cos_oh))[:, None] * jnp.ones_like(f_spec)
    f_diff = p.albedo * ((1.0 - p.metallic) * _INV_PI)[:, None]
    f = jnp.where(valid[:, None], f_diff + f_spec + f_sheen, 0.0)

    p_spec = _principled_spec_prob(p, f0)
    pdf_spec = ggx_half_pdf(cos_h, cos_oh, alpha)
    pdf_diff = jnp.maximum(cos_i, 0.0) * _INV_PI
    pdf = jnp.where(valid, p_spec * pdf_spec + (1.0 - p_spec) * pdf_diff, 0.0)
    return f, pdf


def bsdf_sample(p: MatParams, ns, wo_world, z1, u1, u2) -> BsdfSample:
    """Sample one bounce direction per lane, dispatched on material type.

    z1 selects lobes (specular-vs-diffuse for PRINCIPLED, reflect-vs-refract
    for FRESNEL_TRANSMISSIVE); u1/u2 warp the chosen lobe. The RNG draw count
    is uniform across types so lane streams stay aligned.
    """
    r = ns.shape[0]
    wo_l = onb_world_to_local(wo_world, ns)
    cos_o = jnp.maximum(wo_l[..., 2], _EPS)

    # --- DIFFUSE: cosine hemisphere (closehit_radiance.cu:90-112) ---
    wi_diff_l = sample_cosine_hemisphere(u1, u2)
    pdf_diff = jnp.maximum(wi_diff_l[..., 2], 0.0) * _INV_PI
    w_diff = p.albedo  # f*cos/pdf = albedo/pi * cos / (cos/pi)

    # --- SPECULAR: perfect mirror about +z ---
    wi_mirr_l = wo_l * jnp.asarray([-1.0, -1.0, 1.0])
    w_mirr = p.albedo

    # --- FRESNEL_TRANSMISSIVE: smooth dielectric ---
    # (entering when cos of geometric side > 0 — ns is faceforwarded so wo.z>0;
    # track inside/outside via ior inversion on refraction.)
    f_diel = fresnel_dielectric(cos_o, p.ior)
    eta = 1.0 / p.ior  # air -> medium for the faceforwarded frame
    sin2_t = eta * eta * jnp.maximum(1.0 - cos_o * cos_o, 0.0)
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    wi_refr_l = jnp.stack(
        [-eta * wo_l[..., 0], -eta * wo_l[..., 1], -cos_t], axis=-1
    )
    choose_refl = z1 < f_diel
    wi_glass_l = jnp.where(choose_refl[:, None], wi_mirr_l, wi_refr_l)
    # one-sample fresnel estimator: weight = 1 on both branches (tinted)
    w_glass = jnp.where(
        choose_refl[:, None],
        jnp.ones((r, 3)),
        p.albedo * p.transmittance[:, None]
        + (1.0 - p.transmittance[:, None]),
    )

    # --- PRINCIPLED: one-sample mix of diffuse + GGX ---
    f0 = _principled_f0(p)
    p_spec = _principled_spec_prob(p, f0)
    alpha = _ggx_alpha(p)
    h_l = sample_ggx_half(u1, u2, alpha)
    cos_oh = jnp.sum(wo_l * h_l, axis=-1)
    wi_spec_l = 2.0 * cos_oh[:, None] * h_l - wo_l
    take_spec = z1 < p_spec
    wi_prin_l = jnp.where(take_spec[:, None], wi_spec_l, wi_diff_l)
    f_prin, pdf_prin = _principled_eval_local(p, f0, wo_l, wi_prin_l)
    w_prin = jnp.where(
        (pdf_prin > _EPS)[:, None],
        f_prin
        * (jnp.maximum(wi_prin_l[..., 2], 0.0) / jnp.maximum(pdf_prin, _EPS))[
            :, None
        ],
        0.0,
    )

    # --- dispatch ---
    mt = p.mtype[:, None]
    wi_l = jnp.where(
        mt == MaterialType.SPECULAR, wi_mirr_l,
        jnp.where(
            mt == MaterialType.FRESNEL_TRANSMISSIVE, wi_glass_l,
            jnp.where(mt == MaterialType.PRINCIPLED, wi_prin_l, wi_diff_l),
        ),
    )
    weight = jnp.where(
        mt == MaterialType.SPECULAR, w_mirr,
        jnp.where(
            mt == MaterialType.FRESNEL_TRANSMISSIVE, w_glass,
            jnp.where(mt == MaterialType.PRINCIPLED, w_prin, w_diff),
        ),
    )
    pdf = jnp.where(
        p.mtype == MaterialType.PRINCIPLED, pdf_prin,
        jnp.where(p.mtype == MaterialType.DIFFUSE, pdf_diff, 0.0),
    )
    is_delta = (p.mtype == MaterialType.SPECULAR) | (
        p.mtype == MaterialType.FRESNEL_TRANSMISSIVE
    )
    wi = onb_local_to_world(wi_l, ns)
    return BsdfSample(wi=wi, weight=weight, pdf=pdf, is_delta=is_delta)


def bsdf_eval(p: MatParams, ns, wo_world, wi_world):
    """f(wo, wi) and pdf(wo, wi) for NEE/MIS weighting. Delta lanes get 0."""
    wo_l = onb_world_to_local(wo_world, ns)
    wi_l = onb_world_to_local(wi_world, ns)
    cos_i = jnp.maximum(wi_l[..., 2], 0.0)

    f_diff = p.albedo * _INV_PI
    pdf_diff = cos_i * _INV_PI

    f0 = _principled_f0(p)
    f_prin, pdf_prin = _principled_eval_local(p, f0, wo_l, wi_l)

    is_prin = (p.mtype == MaterialType.PRINCIPLED)[:, None]
    is_diff = (p.mtype == MaterialType.DIFFUSE)[:, None]
    f = jnp.where(is_prin, f_prin, jnp.where(is_diff, f_diff, 0.0))
    pdf = jnp.where(
        p.mtype == MaterialType.PRINCIPLED, pdf_prin,
        jnp.where(p.mtype == MaterialType.DIFFUSE, pdf_diff, 0.0),
    )
    return f, pdf
