"""GGX direct-lighting renderer — parity with the reference's legacy whitted
pipeline (cuda/whitted.cu:149-289): GLTF PBR metallic-roughness closest-hit
shading with point + ambient lights and shadow attenuation.

The reference's whitted stack shoots one radiance ray per pixel, shades the
hit with base-color/metallic-roughness/emissive textures, GGX specular
(D * vis * schlick F, whitted_cuda.h:47-70) plus Lambertian diffuse for each
point light gated by an occlusion probe, and adds an ambient term
(whitted.cu:200-287). No indirect bounces. Here that maps to a single
wavefront super-step: camera rays -> trace closest -> vectorized shade with a
static loop over the (few) point lights, each with one batched shadow trace.

Anti-aliasing: the same per-pixel tea/LCG jitter stream as the path tracer,
accumulated progressively through the Film.

Alpha modes (cuda/MaterialData.h, whitted.cu anyhit programs): MASK cuts out
texels below the cutoff via a transparent-hit continuation loop
(trace_closest_alpha); BLEND composites `alpha * shaded + (1-alpha) *
continuation` layers front to back (render_direct_pixels) and both modes
attenuate shadow rays by the product of (1 - alpha) over non-opaque hits
(trace_shadow_transmission).
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..film.film import Film, film_accumulate
from ..math import rng
from ..math.microfacet import d_ggx, schlick_fresnel, smith_g
from ..math.vec import dot, faceforward, length, luminance, normalize
from ..scene.camera import CameraParams
from ..scene.material import MaterialType
from ..scene.scene import Scene
from ..scene.texture import sample_texture_alpha, sample_texture_bilinear
from ..trace.intersect import Hit, make_bruteforce_tracer
from .config import RenderConfig
from .path import RenderStats, _camera_ray

_INV_PI = 1.0 / math.pi


def shade_direct(scene: Scene, cfg: RenderConfig, trace_any, hit, org,
                 direction, point_lights, ambient, count=None,
                 shadow_transmission=None, checker=False,
                 prim_override=None, lane_mask=None):
    """Vectorized whitted closest-hit (whitted.cu:149-289). Returns
    (rgb [R,3], shadow_ray_count).

    shadow_transmission (optional): fn(p, ldir, tmin, tmax) -> [R] f32
    fractional shadow visibility for scenes with MASK/BLEND materials
    (the reference's occlusion-anyhit attenuation, whitted.cu:113-137);
    when None, occlusion is the binary trace_any probe.

    prim_override (optional): (is_prim [R], n [R,3], uv [R,2],
    mat [R] i32) from the analytic-primitive sweep — overrides the
    barycentric shading frame on those lanes (the whitted custom-primitive
    programs' attribute path, cuda/geometry.cu:38-144).

    checker (static gate): compile in the procedural checker
    (cuda/shading.cu:169-205): the parity of floor(uv * inv_checker_size)
    picks between the material's (diffuse, roughness) and its
    (checker_color2, checker_rough2) pair — check 1 takes set 1, check 0
    set 2, matching which_check at shading.cu:184-199."""
    prim = jnp.maximum(hit.prim, 0)
    u, v = hit.u, hit.v
    w0 = (1.0 - u - v)[:, None]
    w1 = u[:, None]
    w2 = v[:, None]
    g = scene.geom
    ng = normalize(w0 * g.n0[0, prim] + w1 * g.n1[0, prim] + w2 * g.n2[0, prim])
    if hit.inst is not None:
        # Two-level AS under the direct stack: object-space normal -> world
        # via the instance inverse-transpose (key 0; the direct stack always
        # traces at time 0, shading.cu:338 optixTransformNormal... parity).
        it = scene.instances.inv_t[jnp.maximum(hit.inst, 0), 0]
        ng = normalize(jnp.einsum("rij,rj->ri", it, ng))
    texcoord = w0 * g.uv0[prim] + w1 * g.uv1[prim] + w2 * g.uv2[prim]
    # second texcoord set (GeometryData.h:71-79 num_texcoords=2); each
    # texture picks its set by MaterialData::Texture.texcoord
    # (LocalShading.h:41 geom.texcoord[tex.texcoord].UV)
    texcoord_b = None
    if g.uv0b is not None:
        texcoord_b = (w0 * g.uv0b[prim] + w1 * g.uv1b[prim]
                      + w2 * g.uv2b[prim])

    mat = scene.materials
    mid = g.mat_id[prim]
    if prim_override is not None:
        is_prim, p_n, p_uv, p_mat = prim_override
        ng = jnp.where(is_prim[:, None], p_n, ng)
        texcoord = jnp.where(is_prim[:, None], p_uv, texcoord)
        if texcoord_b is not None:
            texcoord_b = jnp.where(is_prim[:, None], p_uv, texcoord_b)
        mid = jnp.where(is_prim, p_mat, mid)

    def tex_uv_for(slot):
        # texcoord-set select per texture slot (0=diffuse, 1=roughness,
        # 2=emissive, 3=normal)
        if texcoord_b is None:
            return texcoord
        use_b = (mat.tex_uv[mid, slot] == 1)[:, None]
        return jnp.where(use_b, texcoord_b, texcoord)

    ns = faceforward(ng, -direction, ng)
    p = org + hit.t[:, None] * direction
    wo = -direction

    tex_id = mat.diffuse_tex[mid]
    uv_d = tex_uv_for(0)
    tex_rgb = sample_texture_bilinear(
        scene.atlas, tex_id, uv_d[..., 0], uv_d[..., 1]
    )
    base = jnp.where((tex_id >= 0)[:, None], tex_rgb * mat.diffuse[mid],
                     mat.diffuse[mid])
    # COLOR_0 vertex-color modulation: base_color *= interpolated color
    # (whitted.cu:157 base_color = pbr.base_color * geom.color; the .w
    # component folds into the BLEND alpha at the compositing site)
    if g.c0 is not None:
        vcol = w0 * g.c0[prim] + w1 * g.c1[prim] + w2 * g.c2[prim]
        if prim_override is not None:
            vcol = jnp.where(prim_override[0][:, None], 1.0, vcol)
        base = base * vcol[..., :3]
    metallic = mat.metallic[mid]
    rough = mat.roughness[mid]
    if checker:
        ct = texcoord * mat.checker_inv[mid]
        which = (jnp.floor(ct[..., 0]).astype(jnp.int32)
                 + jnp.floor(ct[..., 1]).astype(jnp.int32)) & 1
        use2 = mat.checker[mid] & (which == 0)
        base = jnp.where(use2[:, None], mat.checker_color2[mid], base)
        rough = jnp.where(use2, mat.checker_rough2[mid], rough)
    rtex = mat.roughness_tex[mid]
    # glTF metallicRoughness texture: G = roughness, B = metallic
    uv_r = tex_uv_for(1)
    mr_rgb = sample_texture_bilinear(
        scene.atlas, rtex, uv_r[..., 0], uv_r[..., 1]
    )
    rough = jnp.where(rtex >= 0, rough * mr_rgb[..., 1], rough)
    metallic = jnp.where(rtex >= 0, metallic * mr_rgb[..., 2], metallic)
    alpha = jnp.maximum(rough * rough, 1e-4)

    emitted = mat.emission[mid]
    etex = mat.emissive_tex[mid]
    uv_e = tex_uv_for(2)
    emis_rgb = sample_texture_bilinear(
        scene.atlas, etex, uv_e[..., 0], uv_e[..., 1]
    )
    emitted = jnp.where((etex >= 0)[:, None], emitted * emis_rgb, emitted)

    # F0 = lerp(0.04, base, metallic); diffuse = base * (1 - metallic)
    # (whitted.cu:208-214)
    f0 = 0.04 * (1.0 - metallic[:, None]) + base * metallic[:, None]
    diff_color = base * (1.0 - metallic[:, None])

    result = emitted + ambient[None, :] * diff_color
    n_do = jnp.maximum(dot(ns, wo), 1e-6)

    shadow_count = jnp.zeros((), jnp.int32)
    for light in point_lights:
        lpos = jnp.asarray(light.position, jnp.float32)
        lcol = jnp.asarray(light.color, jnp.float32) * jnp.float32(
            light.intensity
        )
        lvec = lpos[None, :] - p
        ldist = length(lvec)
        ldir = lvec / jnp.maximum(ldist, 1e-20)[:, None]
        n_dl = dot(ns, ldir)
        want = hit.mask & (n_dl > 0.0)
        if lane_mask is not None:
            # glass continuation passes restrict shading (and the shadow-ray
            # count) to their live lanes; the pool traces full-width
            want = want & lane_mask
        if shadow_transmission is not None:
            trans = shadow_transmission(
                p, ldir, cfg.shadow_tmin, ldist - cfg.shadow_tmax_eps
            )
            vis = jnp.where(want, trans, 0.0)
        else:
            occluded = trace_any(
                p, ldir, cfg.shadow_tmin, ldist - cfg.shadow_tmax_eps,
                jnp.zeros_like(ldist), count=count,
            )
            vis = (want & ~occluded).astype(jnp.float32)

        h = normalize(wo + ldir, eps=1e-20)
        cos_h = dot(ns, h)
        cos_oh = jnp.clip(dot(wo, h), 0.0, 1.0)
        f = schlick_fresnel(f0, cos_oh[:, None])
        spec = f * (
            d_ggx(cos_h, alpha) * smith_g(n_dl, n_do, alpha)
            / jnp.maximum(4.0 * n_dl * n_do, 1e-9)
        )[:, None]
        brdf = diff_color * _INV_PI + spec
        contrib = lcol[None, :] * brdf * n_dl[:, None]
        result = result + contrib * vis[:, None]
        shadow_count = shadow_count + jnp.sum(want.astype(jnp.int32))

    return jnp.where(hit.mask[:, None], result, 0.0), shadow_count


def _sampled_alpha(scene, hit):
    """Base-color-texture A (nearest) x alpha factor at a hit, plus the
    hit material's mode columns. Returns (a, mask_lane, blend_lane, cutoff)."""
    g = scene.geom
    prim = jnp.maximum(hit.prim, 0)
    mid = g.mat_id[prim]
    mat = scene.materials
    w0 = (1.0 - hit.u - hit.v)[:, None]
    texcoord = (w0 * g.uv0[prim] + hit.u[:, None] * g.uv1[prim]
                + hit.v[:, None] * g.uv2[prim])
    if g.uv0b is not None:
        # the base-color texture samples its own texcoord set
        # (LocalShading.h:41 via MaterialData::Texture.texcoord)
        texcoord_b = (w0 * g.uv0b[prim] + hit.u[:, None] * g.uv1b[prim]
                      + hit.v[:, None] * g.uv2b[prim])
        texcoord = jnp.where((mat.tex_uv[mid, 0] == 1)[:, None],
                             texcoord_b, texcoord)
    a = sample_texture_alpha(
        scene.atlas, mat.diffuse_tex[mid], texcoord[..., 0], texcoord[..., 1]
    ) * mat.alpha[mid]
    return a, mat.alpha_mask[mid], mat.alpha_blend[mid], mat.alpha_cutoff[mid]


def _hit_alpha(scene, hit, direction):
    """Cutout alpha at a hit: base-color-texture A (nearest) x alpha factor
    for MASK materials, 1 otherwise (whitted radiance-anyhit semantics,
    cuda/whitted.cu:100-111 — BLEND is forced to mask mode with cutoff 0,
    i.e. never cut out)."""
    del direction
    a, mask_lane, _, cutoff = _sampled_alpha(scene, hit)
    return jnp.where(mask_lane, a, 1.0), cutoff


def trace_closest_alpha(scene, trace_closest, o, d, tmin, tmax, time,
                        max_transparent: int = 4):
    """Closest hit skipping MASK texels below their cutoff: re-traces past
    transparent hits up to max_transparent times (the anyhit-continuation
    loop expressed as wavefront iterations)."""
    hit = trace_closest(o, d, tmin, tmax, time)
    any_mask = bool(scene.num_materials) and True
    for _ in range(max_transparent):
        a, cutoff = _hit_alpha(scene, hit, d)
        transparent = hit.mask & (a < cutoff)
        # re-trace transparent lanes from just past the hit
        tmin2 = jnp.where(transparent, hit.t + 1e-4, tmin)
        hit2 = trace_closest(o, d, tmin2, tmax, time)
        hit = Hit(
            t=jnp.where(transparent, hit2.t, hit.t),
            prim=jnp.where(transparent, hit2.prim, hit.prim),
            u=jnp.where(transparent, hit2.u, hit.u),
            v=jnp.where(transparent, hit2.v, hit.v),
            inst=None if hit.inst is None else jnp.where(
                transparent, hit2.inst, hit.inst
            ),
        )
    return hit


def trace_shadow_transmission(scene, trace_closest, o, d, tmin, tmax, time,
                              max_layers: int = 8):
    """Fractional shadow visibility through MASK/BLEND/glass surfaces.

    The reference's occlusion anyhits: an OPAQUE hit blocks outright; a
    MASK hit below its cutoff is ignored; any other non-opaque alpha hit
    multiplies the carried attenuation by (1 - alpha) and continues while
    the product stays positive (whitted.cu:113-137). A
    FRESNEL_TRANSMISSIVE hit multiplies by
    1 - fresnel_schlick(|N.D|, 5, 1 - shadow_attenuation, 1) and continues
    until the product drops below the glass importance cutoff (>99%
    blocked -> testing done, cuda/shading.cu:327-352). Expressed here as
    wavefront re-trace iterations walking hits front to back (up to
    max_layers; deeper stacks keep the partial product, an invisible bias
    for real scenes)."""
    r = o.shape[0]
    g = scene.geom
    mat = scene.materials
    trans = jnp.ones((r,), jnp.float32)
    walking = jnp.ones((r,), bool)
    tmin_cur = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    for _ in range(max_layers):
        hit = trace_closest(o, d, tmin_cur, tmax, time)
        live = walking & hit.mask
        a, mask_lane, blend_lane, cutoff = _sampled_alpha(scene, hit)
        prim = jnp.maximum(hit.prim, 0)
        mid = g.mat_id[prim]
        glass_lane = mat.mtype[mid] == int(MaterialType.FRESNEL_TRANSMISSIVE)
        opaque_lane = ~(mask_lane | blend_lane | glass_lane)
        mask_pass = mask_lane & (a < cutoff)  # cutout texel: no attenuation
        # opaque hit: fully blocked, stop walking this lane
        trans = jnp.where(live & opaque_lane, 0.0, trans)
        attenuate = live & ~opaque_lane & ~glass_lane & ~mask_pass
        trans = jnp.where(attenuate, trans * (1.0 - a), trans)
        # glass shell: fresnel-graded attenuation on |N.D| (shading.cu:340);
        # the reference transforms the object normal to world space first
        # (optixTransformNormalFromObjectToWorldSpace, shading.cu:338) —
        # apply the instance inverse-transpose on instanced hits. Key-0
        # normals are exact: the direct stack always traces at time 0.
        w0 = (1.0 - hit.u - hit.v)[:, None]
        nrm = normalize(w0 * g.n0[0, prim] + hit.u[:, None] * g.n1[0, prim]
                        + hit.v[:, None] * g.n2[0, prim])
        if hit.inst is not None:
            it = scene.instances.inv_t[jnp.maximum(hit.inst, 0), 0]
            nrm = normalize(jnp.einsum("rij,rj->ri", it, nrm))
        n_di = jnp.abs(dot(nrm, d))
        sa = mat.shadow_att[mid]
        glass_f = 1.0 - ((1.0 - sa) + sa * (1.0 - n_di) ** 5.0)
        trans = jnp.where(live & glass_lane, trans * glass_f, trans)
        # glass lanes stop early once >99% blocked (importance cutoff);
        # alpha lanes walk while any light remains
        limit = jnp.where(glass_lane, _GLASS_IMPORTANCE_CUTOFF, 0.0)
        walking = live & ~opaque_lane & (trans > limit)
        tmin_cur = jnp.where(walking, hit.t, tmin_cur)
    return trans


def _merge_prim_hits(scene, hit, o, d, tmin, tmax_default):
    """Fold the analytic-primitive sweep into a triangle Hit.

    Returns (hit, (is_prim, n, uv, mat)) — the override tuple feeds
    shade_direct's prim lanes. Primitive hits claim prim id 0 purely so
    hit.mask stays true; every shading attribute on those lanes comes from
    the override."""
    from ..trace.primitives import trace_prims

    tmax = jnp.where(hit.mask, hit.t, tmax_default)
    pt, pn, puv, pmat, phit = trace_prims(scene.prims, o, d, tmin, tmax)
    merged = Hit(
        t=jnp.where(phit, pt, hit.t),
        prim=jnp.where(phit, jnp.maximum(hit.prim, 0), hit.prim),
        u=jnp.where(phit, 0.0, hit.u),
        v=jnp.where(phit, 0.0, hit.v),
        inst=hit.inst,
    )
    return merged, (phit, pn, puv, pmat)


# Whitted-glass constants (the classic OptiX glass sample's values, used
# by cuda/shading.cu:226-325; our Material carries only ior/transmittance,
# so colors are white and Beer extinction is the grey log(transmittance)).
_GLASS_FRESNEL_EXP = 3.0
_GLASS_FRESNEL_MIN = 0.1
_GLASS_FRESNEL_MAX = 1.0
_GLASS_IMPORTANCE_CUTOFF = 0.01
_GLASS_CUTOFF_COLOR = (0.34, 0.55, 0.85)
_GLASS_MAXDEPTH = 3      # refraction_maxdepth == reflection_maxdepth
_GLASS_STACK = 4
# Full binary recursion tree at maxdepth 3: 1 + 2 + 4 internal nodes PLUS
# the 8 depth-3 continuation rays the reference still traces and shades
# (traceRadianceRay at depth+1 == 3 from depth-2 hits, shading.cu:300-316);
# one pool iteration processes one tree node per lane.
_GLASS_ITERS = 15


def _glass_radiance(scene, cfg, tracer_pair, shade_cb, org, dirn, hit0, bg):
    """Recursive glass continuation rays, linearized (shading.cu:226-325).

    The reference's __closesthit__glass_radiance recurses into BOTH the
    fresnel-weighted reflection and refraction rays (with Beer attenuation
    on interior segments and an importance cutoff). A wavefront machine
    has no per-lane call stack, so the binary recursion runs as a fixed
    iteration loop over an explicit per-lane ray stack: each iteration
    traces every lane's CURRENT ray, shades non-glass hits via
    `shade_cb` (the full GGX direct-lighting closure), splits glass hits
    into reflection (continues in place) + refraction (pushed), and pops
    when the current branch terminates. Bounded by the same
    refraction/reflection_maxdepth=3 and importance cutoff as the
    reference, so at most 7 nodes per primary ray.

    Returns (rgb [R,3] for lanes whose hit0 is glass, shadow_ray_count).
    hit0/org/dirn are the PRIMARY trace results (re-used, not re-traced).
    """
    trace_closest, _ = tracer_pair
    n = org.shape[0]
    mat = scene.materials
    g = scene.geom
    cutoff_color = jnp.asarray(_GLASS_CUTOFF_COLOR, jnp.float32)

    def glass_split(hit, o, d, w, depth, live):
        """One glass-surface interaction: returns (result_add, refl ray,
        refr ray, their weights + trace gates)."""
        prim = jnp.maximum(hit.prim, 0)
        w0 = (1.0 - hit.u - hit.v)[:, None]
        nrm = normalize(w0 * g.n0[0, prim] + hit.u[:, None] * g.n1[0, prim]
                        + hit.v[:, None] * g.n2[0, prim])
        mid = g.mat_id[prim]
        ior = mat.ior[mid]
        ext = jnp.log(jnp.clip(mat.transmittance[mid], 1e-8, 1.0))
        p = o + hit.t[:, None] * d

        cos_in = dot(d, nrm)           # >0 when leaving the medium
        inside = cos_in > 0.0
        # Beer's law on interior segments (shading.cu:269-277); grey
        # extinction from the scalar transmittance
        beer = jnp.where(inside[:, None],
                         jnp.exp(ext * hit.t)[:, None], 1.0)

        # two-sided snell (helpers.h refract): eta/N by side
        n_eff = jnp.where(inside[:, None], -nrm, nrm)
        eta = jnp.where(inside, ior, 1.0 / jnp.maximum(ior, 1e-6))
        ci = -dot(d, n_eff)            # >= 0
        k = 1.0 - eta * eta * (1.0 - ci * ci)
        refract_ok = k > 0.0
        t_dir = normalize(
            eta[:, None] * d
            + (eta * ci - jnp.sqrt(jnp.maximum(k, 0.0)))[:, None] * n_eff)

        # fresnel_schlick(cos, 3, 0.1, 1.0); cos from the incident side
        # outside, from the transmitted ray inside (shading.cu:286-293)
        cos_f = jnp.where(inside, dot(t_dir, nrm), -cos_in)
        cos_f = jnp.clip(cos_f, 0.0, 1.0)
        fres = (_GLASS_FRESNEL_MIN
                + (_GLASS_FRESNEL_MAX - _GLASS_FRESNEL_MIN)
                * (1.0 - cos_f) ** _GLASS_FRESNEL_EXP)
        depth_ok = live & (depth < min(_GLASS_MAXDEPTH, cfg.max_depth - 1))
        # reflection stays 1.0 on TIR AND when the refraction depth check
        # fails (the reference's refraction block — including the fresnel
        # assignment — is skipped entirely at depth exhaustion,
        # shading.cu:280-306, so depth-capped hits contribute
        # 1.0 * cutoff_color * beer)
        refl = jnp.where(refract_ok & depth_ok, fres, 1.0)

        w_refl = w * refl[:, None] * beer
        w_refr = w * (1.0 - refl)[:, None] * beer
        go_refl = depth_ok & (luminance(w_refl) > _GLASS_IMPORTANCE_CUTOFF)
        go_refr = (depth_ok & refract_ok
                   & (luminance(w_refr) > _GLASS_IMPORTANCE_CUTOFF))
        # untraced branches contribute the cutoff color (color inits to
        # cutoff_color, shading.cu:281-320; the refraction term vanishes
        # entirely when depth runs out — reflection==1 there)
        res_add = jnp.where((live & ~go_refl)[:, None],
                            w_refl * cutoff_color[None, :], 0.0)
        res_add += jnp.where((live & depth_ok & refract_ok
                              & ~go_refr)[:, None],
                             w_refr * cutoff_color[None, :], 0.0)

        r_dir = normalize(d - 2.0 * cos_in[:, None] * nrm)
        eps = float(cfg.shadow_tmin)
        # front/back hit points offset along the normal (scene_epsilon
        # nudges, shading.cu:246-261)
        fhp = p + eps * jnp.where(inside[:, None], -nrm, nrm)
        bhp = p - eps * jnp.where(inside[:, None], -nrm, nrm)
        return res_add, (fhp, r_dir, w_refl, go_refl), \
            (bhp, t_dir, w_refr, go_refr)

    mtype0 = mat.mtype[g.mat_id[jnp.maximum(hit0.prim, 0)]]
    live0 = hit0.mask & (mtype0 == int(MaterialType.FRESNEL_TRANSMISSIVE))

    # current-branch state + per-lane pending stack
    cur_o, cur_d = org, dirn
    cur_w = jnp.ones((n, 3), jnp.float32)
    cur_depth = jnp.zeros((n,), jnp.int32)
    cur_live = live0
    cur_hit = hit0          # iteration 0 reuses the primary trace
    st_o = [jnp.zeros((n, 3), jnp.float32) for _ in range(_GLASS_STACK)]
    st_d = [jnp.zeros((n, 3), jnp.float32) for _ in range(_GLASS_STACK)]
    st_w = [jnp.zeros((n, 3), jnp.float32) for _ in range(_GLASS_STACK)]
    st_depth = [jnp.zeros((n,), jnp.int32) for _ in range(_GLASS_STACK)]
    st_n = jnp.zeros((n,), jnp.int32)
    result = jnp.zeros((n, 3), jnp.float32)
    n_shad = jnp.zeros((), jnp.int32)

    for it in range(_GLASS_ITERS):
        if it > 0:
            cur_hit = trace_closest(cur_o, cur_d,
                                    jnp.full((n,), cfg.shadow_tmin),
                                    cfg.primary_tmax,
                                    jnp.zeros((n,), jnp.float32))
        mt = mat.mtype[g.mat_id[jnp.maximum(cur_hit.prim, 0)]]
        is_glass = (cur_live & cur_hit.mask
                    & (mt == int(MaterialType.FRESNEL_TRANSMISSIVE)))
        non_glass = cur_live & cur_hit.mask & ~is_glass
        miss = cur_live & ~cur_hit.mask
        result += jnp.where(miss[:, None], cur_w * bg[None, :], 0.0)
        # non-glass continuation hits shade through the full GGX closure
        # (iteration 0's mask is empty: live0 holds glass lanes only)
        shaded, n_sh = shade_cb(cur_hit, cur_o, cur_d, non_glass)
        result += jnp.where(non_glass[:, None], cur_w * shaded, 0.0)
        n_shad = n_shad + n_sh

        res_add, (ro, rd, rw, r_go), (to, td, tw, t_go) = glass_split(
            cur_hit, cur_o, cur_d, cur_w, cur_depth, is_glass)
        result += res_add

        # push the refraction branch
        push = t_go
        for s in range(_GLASS_STACK):
            at = push & (st_n == s)
            st_o[s] = jnp.where(at[:, None], to, st_o[s])
            st_d[s] = jnp.where(at[:, None], td, st_d[s])
            st_w[s] = jnp.where(at[:, None], tw, st_w[s])
            st_depth[s] = jnp.where(at, cur_depth + 1, st_depth[s])
        st_n = st_n + push.astype(jnp.int32)

        # continue with reflection, else pop a pending branch
        cur_o = jnp.where(r_go[:, None], ro, cur_o)
        cur_d = jnp.where(r_go[:, None], rd, cur_d)
        cur_w = jnp.where(r_go[:, None], rw, cur_w)
        cur_depth = jnp.where(r_go, cur_depth + 1, cur_depth)
        cur_live = r_go
        want_pop = ~cur_live & (st_n > 0)
        top = st_n - 1
        for s in range(_GLASS_STACK):
            at = want_pop & (top == s)
            cur_o = jnp.where(at[:, None], st_o[s], cur_o)
            cur_d = jnp.where(at[:, None], st_d[s], cur_d)
            cur_w = jnp.where(at[:, None], st_w[s], cur_w)
            cur_depth = jnp.where(at, st_depth[s], cur_depth)
        cur_live = cur_live | want_pop
        st_n = st_n - want_pop.astype(jnp.int32)

    return jnp.where(live0[:, None], result, 0.0), live0, n_shad


def render_direct_pixels(scene, cfg, cam, tracer, pixel_idx, subframe_index,
                         point_lights, ambient, bg, alpha_masked=False,
                         alpha_blended=False, blend_layers: int = 3,
                         checker=False):
    trace_closest, trace_any = tracer
    import numpy as _np

    # static gate: compile the recursive-glass pass only when the scene
    # has FRESNEL_TRANSMISSIVE materials (7 extra trace+shade rounds)
    any_glass = bool((_np.asarray(scene.materials.mtype)
                      == int(MaterialType.FRESNEL_TRANSMISSIVE)).any())
    n = pixel_idx.shape[0]
    width = jnp.float32(cfg.width)
    height = jnp.float32(cfg.height)
    px = pixel_idx % cfg.width
    py = pixel_idx // cfg.width
    seed = rng.tea(pixel_idx.astype(jnp.uint32), subframe_index)
    if cfg.seed:
        seed = rng.rot_seed(seed, jnp.uint32(cfg.seed))

    if scene.prims is not None:
        from ..trace.primitives import trace_prims_any

        tri_any = trace_any

        def trace_any(o, d, tn, tx, time, count=None):
            return (tri_any(o, d, tn, tx, time, count=count)
                    | trace_prims_any(scene.prims, o, d, tn, tx))

    shadow_transmission = None
    if alpha_masked or alpha_blended or any_glass:
        # glass scenes need the fractional probe: FRESNEL_TRANSMISSIVE
        # casters attenuate shadows instead of blocking (shading.cu:327-352)
        time0_s = jnp.zeros((n,), jnp.float32)

        def shadow_transmission(p, ldir, tn, tx):
            trans = trace_shadow_transmission(
                scene, trace_closest, p, ldir, tn, tx, time0_s
            )
            if scene.prims is not None:
                from ..trace.primitives import trace_prims_any

                blocked = trace_prims_any(scene.prims, p, ldir, tn, tx)
                trans = jnp.where(blocked, 0.0, trans)
            return trans

    def sample_body(carry, _):
        seed, acc, n_rad, n_shad = carry
        seed, jx = rng.rnd(seed)
        seed, jy = rng.rnd(seed)
        org, direction = _camera_ray(cam, px, py, jx, jy, width, height)
        time0 = jnp.zeros((n,), jnp.float32)

        # BLEND compositing (whitted.cu:266-287): result = alpha * shaded +
        # (1 - alpha) * continuation from the hit distance onward, recursive
        # up to MAX_TRACE_DEPTH — expressed as a static front-to-back layer
        # loop carrying the (1 - alpha) product. Opaque scenes compile a
        # single layer.
        rgb = jnp.zeros((n, 3), jnp.float32)
        weight = jnp.ones((n,), jnp.float32)
        tmin_cur = jnp.full((n,), cfg.primary_tmin, jnp.float32)
        n_sh_total = jnp.zeros((), jnp.int32)
        for _layer in range(blend_layers if alpha_blended else 1):
            if alpha_masked:
                hit = trace_closest_alpha(
                    scene, trace_closest, org, direction,
                    tmin_cur, cfg.primary_tmax, time0,
                )
            else:
                hit = trace_closest(
                    org, direction, tmin_cur, cfg.primary_tmax, time0
                )
            prim_override = None
            if scene.prims is not None:
                hit, prim_override = _merge_prim_hits(
                    scene, hit, org, direction, tmin_cur, cfg.primary_tmax)
            shaded, n_sh = shade_direct(
                scene, cfg, trace_any, hit, org, direction, point_lights,
                ambient, shadow_transmission=shadow_transmission,
                checker=checker, prim_override=prim_override,
            )
            n_sh_total = n_sh_total + n_sh
            if any_glass and _layer == 0:
                # recursive whitted glass (shading.cu:226-325) on
                # FRESNEL_TRANSMISSIVE hits; replaces the GGX shade there
                def _shade_cb(h2, o2, d2, mask2):
                    return shade_direct(
                        scene, cfg, trace_any, h2, o2, d2, point_lights,
                        ambient, shadow_transmission=shadow_transmission,
                        checker=checker, lane_mask=mask2,
                    )
                glass_rgb, glass_lane, n_sh_g = _glass_radiance(
                    scene, cfg, (trace_closest, trace_any), _shade_cb,
                    org, direction, hit, bg)
                shaded = jnp.where(glass_lane[:, None], glass_rgb, shaded)
                n_sh_total = n_sh_total + n_sh_g
            if alpha_blended:
                a, _, blend_lane, _ = _sampled_alpha(scene, hit)
                if scene.geom.c0 is not None:
                    # BLEND alpha includes the interpolated COLOR_0 .w
                    # (whitted.cu:157/268 base_color.w = factor.w *
                    # geom.color.w * tex.w drives the composite)
                    gg = scene.geom
                    pm = jnp.maximum(hit.prim, 0)
                    wb = (1.0 - hit.u - hit.v)
                    a = a * (wb * gg.c0[pm, 3] + hit.u * gg.c1[pm, 3]
                             + hit.v * gg.c2[pm, 3])
                if prim_override is not None:
                    blend_lane = blend_lane & ~prim_override[0]  # prims opaque
                a = jnp.where(blend_lane, a, 1.0)
            else:
                a = jnp.ones((n,), jnp.float32)
            layer_rgb = jnp.where(hit.mask[:, None], a[:, None] * shaded,
                                  bg[None, :])
            rgb = rgb + weight[:, None] * layer_rgb
            weight = weight * jnp.where(hit.mask, 1.0 - a, 0.0)
            tmin_cur = jnp.where(hit.mask, hit.t, tmin_cur)
        return (seed, acc + rgb, n_rad + n, n_shad + n_sh_total), None

    init = (seed, jnp.zeros((n, 3), jnp.float32), jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32))
    (seed, acc, n_rad, n_shad), _ = jax.lax.scan(
        sample_body, init, None, length=cfg.samples_per_launch
    )
    return acc / jnp.float32(cfg.samples_per_launch), n_rad, n_shad


def make_direct_render_fn(
    scene: Scene,
    cfg: RenderConfig,
    point_lights: Sequence = (),
    ambient: tuple = (0.35, 0.35, 0.35),
    tracer=None,
) -> Callable:
    """jit-compiled progressive direct-lighting subframe step.

    Defaults mirror the whitted pipeline's ambient term (whitted.cu's
    LaunchParams ambient light) — pass ambient=(0,0,0) to disable.
    """
    if tracer is None:
        tracer = make_bruteforce_tracer(scene, chunk=cfg.tri_chunk)
    bg = jnp.asarray(cfg.bg_radiance, jnp.float32)
    ambient_v = jnp.asarray(ambient, jnp.float32)
    n_pixels = cfg.width * cfg.height
    pixel_idx = jnp.arange(n_pixels, dtype=jnp.int32)
    # static gates: the transparent-continuation / blend-compositing loops
    # only compile in when some material needs them
    import numpy as _np

    alpha_masked = bool(_np.asarray(scene.materials.alpha_mask).any())
    alpha_blended = bool(_np.asarray(scene.materials.alpha_blend).any())
    any_checker = bool(_np.asarray(scene.materials.checker).any())

    def step(cam: CameraParams, film: Film):
        rgb, n_rad, n_shad = render_direct_pixels(
            scene, cfg, cam, tracer, pixel_idx, film.subframe_index,
            point_lights, ambient_v, bg, alpha_masked=alpha_masked,
            alpha_blended=alpha_blended, checker=any_checker,
        )
        film = film_accumulate(
            film, rgb.reshape(cfg.height, cfg.width, 3)
        )
        return film, RenderStats(radiance_rays=n_rad, shadow_rays=n_shad)

    return jax.jit(step, donate_argnames=("film",))


def render_direct(
    scene: Scene,
    camera_params: CameraParams,
    cfg: RenderConfig,
    point_lights: Sequence = (),
    ambient: tuple = (0.35, 0.35, 0.35),
    subframes: int = 1,
    film: Optional[Film] = None,
    tracer=None,
):
    """Offline progressive direct-lighting render. Returns (film, stats)."""
    from ..film.film import film_create

    step = make_direct_render_fn(
        scene, cfg, point_lights=point_lights, ambient=ambient, tracer=tracer
    )
    if film is None:
        film = film_create(cfg.height, cfg.width)
    for _ in range(subframes):
        film, stats = step(camera_params, film)
    return film, stats
