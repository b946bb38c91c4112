"""Wavefront path integrator — the TPU re-architecture of the reference's
device pipeline (raygen.cu + closehit_radiance.cu + miss.cu + shader_common.h).

Where OptiX runs one persistent thread per pixel with an unbounded bounce
loop, recursion into shading programs, and hardware ray reordering, the TPU
design is a single jit-compiled super-step over structure-of-arrays ray state
resident in HBM:

    pixel block -> [scan over spp] -> [while_loop over bounces]
        trace-closest (all lanes)  -> shade + NEE (all lanes, masked)
        -> trace-any shadow probe  -> RR termination (masked lanes go idle)

Dead lanes are masked rather than compacted: under XLA every lane costs the
same vector-ALU slot whether live or not, and static shapes let the whole
bounce loop fuse into a handful of kernels. (Compaction/sorting re-enters with
the Pallas BVH backend, where memory divergence — not ALU — is the cost.)

Semantics reproduce the reference integrator exactly (SURVEY.md S3.3),
including its RNG draw ordering, so per-lane sample sequences match the CUDA
build bit-for-bit under matched seeds:
  * per-pixel stream seeded tea<4>(pixel_index, subframe) (raygen.cu:25);
  * 2 jitter draws per sample from the outer stream; the bounce stream forks
    from it (prd.seed copy, raygen.cu:32-43);
  * 1 motion-time draw per radiance ray (shader_common.h:64);
  * closest-hit draws: z1, z2 (consumed but unused, closehit_radiance.cu:91-92),
    2 hemisphere draws, 3 NEE draws; the shadow-ray time draw happens on a
    fork that never rejoins (prd.seed is stored *before* traceOcclusion,
    closehit_radiance.cu:123-138);
  * RR draw only on surviving (non-miss) lanes — C++ short-circuit of
    `prd.done || rnd(seed) > p` (raygen.cu:63);
  * emission is collected at depth 0 only; misses add the constant ambient
    callable's 0.01 grey at any depth (miss.cu:30, test.cu:3-6).
"""
from __future__ import annotations

import math
import os
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..film.film import Film, film_accumulate
from ..math import rng
from ..math.onb import onb_local_to_world
from ..math.sampling import power_heuristic, sample_cosine_hemisphere
from ..math.vec import dot, faceforward, length, luminance, normalize
from ..scene.camera import CameraParams
from ..scene.light import pick_light_power, pick_light_uniform, sample_light
from ..scene.scene import Scene
from ..scene.texture import sample_texture_bilinear
from ..trace.intersect import Hit, make_bruteforce_tracer
from .bsdf import MatParams, bsdf_eval, bsdf_sample
from .config import RenderConfig

_INV_PI = 1.0 / math.pi


class RenderStats(NamedTuple):
    radiance_rays: jnp.ndarray  # scalar int64-ish f32 counter
    shadow_rays: jnp.ndarray
    # walk-pool traversal rounds executed this subframe (0 on non-walk
    # backends); rows gathered = walk_rounds * pool width — the roofline
    # accounting input (bench.py writes rows/ray + %-of-gather-floor).
    # Plain-int default: a jnp default would materialize an array at
    # import time and initialize the backend before
    # jax.distributed.initialize can run (parallel/multihost.py).
    walk_rounds: "jnp.ndarray | int" = 0
    # fused/external megakernel pool iterations (kernel launches) this
    # subframe; 0 elsewhere. kernel-floor accounting: bench multiplies by
    # a standalone-timed per-iteration kernel cost to report the
    # megakernel band's %-of-kernel-floor (the walk band's rows/ray
    # analog — VERDICT r3 #3 asked for an absolute yardstick).
    pool_iters: "jnp.ndarray | int" = 0


def _miss_radiance(scene, bg, direction):
    """Background radiance for miss lanes: the environment-map callable when
    the scene has one, else the constant ambient (miss.cu:30, test.cu:3-6)."""
    if getattr(scene, "env", None) is not None:
        from ..scene.envmap import sample_env_map

        return sample_env_map(scene.env, direction)
    return jnp.broadcast_to(bg[None, :], direction.shape)


def _camera_ray(cam: CameraParams, px, py, jx, jy, width, height):
    """Jittered pinhole ray (raygen.cu:32-39)."""
    dx = 2.0 * ((px.astype(jnp.float32) + jx) / width) - 1.0
    dy = 2.0 * ((py.astype(jnp.float32) + jy) / height) - 1.0
    direction = normalize(
        dx[:, None] * cam.u[None, :] + dy[:, None] * cam.v[None, :] + cam.w[None, :]
    )
    origin = jnp.broadcast_to(cam.eye, direction.shape)
    return origin, direction


def _shade_and_nee(scene: Scene, cfg: RenderConfig, trace_any, hit: Hit,
                   org, direction, seed, active, count=None):
    """Closest-hit program body (closehit_radiance.cu:60-160), vectorized.

    Returns (new_seed, emitted_gate_d0, radiance, new_org, new_dir,
    atten_factor, want_shadow [lane mask]).
    All outputs are defined on every lane; callers mask with `active & hit`.
    """
    prim = jnp.maximum(hit.prim, 0)
    u, v = hit.u, hit.v
    w0 = (1.0 - u - v)[:, None]
    w1 = u[:, None]
    w2 = v[:, None]

    g = scene.geom
    # Shading attributes always come from motion key 0, matching the SBT
    # record pointers (cuda_scene.h:78-81 point at the concatenated buffer
    # base = key 0).
    ng = normalize(w0 * g.n0[0, prim] + w1 * g.n1[0, prim] + w2 * g.n2[0, prim])
    if hit.inst is not None:
        # Two-level AS: object-space normal -> world via the instance's
        # inverse-transpose (key 0, matching the shading-attribute key).
        it = scene.instances.inv_t[jnp.maximum(hit.inst, 0), 0]
        ng = normalize(jnp.einsum("rij,rj->ri", it, ng))
    texcoord = w0 * g.uv0[prim] + w1 * g.uv1[prim] + w2 * g.uv2[prim]
    if getattr(scene, "any_uv_transform", False):
        # per-material texture-coordinate transform (MaterialData.h texture
        # desc / KHR_texture_transform): uv' = offset + M @ uv
        xf = scene.materials.uv_xform[scene.geom.mat_id[prim]]
        tu = xf[:, 0] * texcoord[:, 0] + xf[:, 1] * texcoord[:, 1] + xf[:, 4]
        tv = xf[:, 2] * texcoord[:, 0] + xf[:, 3] * texcoord[:, 1] + xf[:, 5]
        texcoord = jnp.stack([tu, tv], axis=-1)
    if getattr(scene, "any_normal_map", False):
        # tangent-space normal mapping (the reference carries normal-map ids,
        # src/material.h:36, but never applies them — done here): tangent
        # from the uv parameterization, Gram-Schmidt against ng.
        ntex = scene.materials.normal_tex[g.mat_id[prim]]
        n_rgb = sample_texture_bilinear(
            scene.atlas, ntex, texcoord[..., 0], texcoord[..., 1]
        )
        n_ts = n_rgb * 2.0 - 1.0
        duv1 = g.uv1[prim] - g.uv0[prim]
        duv2 = g.uv2[prim] - g.uv0[prim]
        e1w = g.e1[0, prim]
        e2w = g.e2[0, prim]
        if hit.inst is not None:
            # two-level AS: uv-parameterization edges are object-space;
            # tangents live in world space, so push them through the
            # instance's linear part (key 0, like the normal above)
            lin = scene.instances.m[jnp.maximum(hit.inst, 0), 0][:, :, :3]
            e1w = jnp.einsum("rij,rj->ri", lin, e1w)
            e2w = jnp.einsum("rij,rj->ri", lin, e2w)
        tang = e1w * duv2[:, 1:2] - e2w * duv1[:, 1:2]
        tang = tang - ng * jnp.sum(tang * ng, axis=-1, keepdims=True)
        tang = normalize(tang, eps=1e-12)
        bitan = jnp.stack([
            ng[:, 1] * tang[:, 2] - ng[:, 2] * tang[:, 1],
            ng[:, 2] * tang[:, 0] - ng[:, 0] * tang[:, 2],
            ng[:, 0] * tang[:, 1] - ng[:, 1] * tang[:, 0],
        ], axis=-1)
        ng_mapped = normalize(
            n_ts[:, 0:1] * tang + n_ts[:, 1:2] * bitan + n_ts[:, 2:3] * ng,
            eps=1e-12,
        )
        ng = jnp.where((ntex >= 0)[:, None], ng_mapped, ng)
    ns = faceforward(ng, -direction, ng)
    p = org + hit.t[:, None] * direction

    mat = scene.materials
    mid = g.mat_id[prim]
    emitted = mat.emission[mid]

    is_hit = hit.mask
    adv = active & is_hit  # lanes whose stream advances through shading

    # --- BSDF sampling (closehit_radiance.cu:90-112) ---
    # Draw count is uniform across material types so lane streams stay
    # aligned; the reference consumes z1/z2 without using them — the
    # dispatch path reuses z1 as its lobe selector.
    seed, z1 = rng.rnd_masked(seed, adv)
    seed, _z2 = rng.rnd_masked(seed, adv)
    seed, u1 = rng.rnd_masked(seed, adv)
    seed, u2 = rng.rnd_masked(seed, adv)

    # Texture-less scenes (1x1 empty atlas, statically known) skip the
    # 4-tap gather entirely.
    has_textures = scene.atlas.data.shape[:2] != (1, 1)
    if has_textures:
        tex_id = mat.diffuse_tex[mid]
        tex_rgb = sample_texture_bilinear(
            scene.atlas, tex_id, texcoord[..., 0], texcoord[..., 1]
        )
        albedo = jnp.where((tex_id >= 0)[:, None], tex_rgb, mat.diffuse[mid])
    else:
        albedo = mat.diffuse[mid]

    if scene.all_diffuse:
        # Reference-exact Lambertian fast path (zero dispatch overhead).
        w_local = sample_cosine_hemisphere(u1, u2)
        cos_sampled = w_local[..., 2]
        pdf_bsdf_sampled = cos_sampled * _INV_PI
        new_dir = onb_local_to_world(w_local, ns)
        new_org = p
        if cfg.throughput_model == "reference":
            # attenuation *= albedo * bsdf / pdf  (bsdf = 1/pi, pdf = cos/pi)
            atten_factor = albedo * (
                _INV_PI / jnp.maximum(pdf_bsdf_sampled, 1e-12)
            )[:, None]
        else:
            # physical: f * cos / pdf = albedo
            atten_factor = albedo
        is_delta = jnp.zeros(adv.shape, bool)
        params = None
    else:
        # Full material dispatch (bsdf.py): DIFFUSE / SPECULAR /
        # FRESNEL_TRANSMISSIVE / PRINCIPLED, branch-free across the wave.
        rough = mat.roughness[mid]
        if has_textures:
            rtex = mat.roughness_tex[mid]
            rough_tex = sample_texture_bilinear(
                scene.atlas, rtex, texcoord[..., 0], texcoord[..., 1]
            )[..., 0]
            rough = jnp.where(rtex >= 0, rough_tex, rough)
            etex = mat.emissive_tex[mid]
            emis_rgb = sample_texture_bilinear(
                scene.atlas, etex, texcoord[..., 0], texcoord[..., 1]
            )
            emitted = jnp.where((etex >= 0)[:, None], emitted * emis_rgb,
                                emitted)
        params = MatParams(
            mtype=mat.mtype[mid],
            albedo=albedo,
            roughness=rough,
            metallic=mat.metallic[mid],
            ior=mat.ior[mid],
            transmittance=mat.transmittance[mid],
            sheen=mat.sheen[mid],
        )
        samp = bsdf_sample(params, ns, -direction, z1, u1, u2)
        new_dir = samp.wi
        new_org = p
        atten_factor = samp.weight
        is_delta = samp.is_delta

    # --- Next-event estimation (closehit_radiance.cu:117-156) ---
    seed, u_pick = rng.rnd_masked(seed, adv)
    seed, lu = rng.rnd_masked(seed, adv)
    seed, lv = rng.rnd_masked(seed, adv)
    if cfg.light_sampler == "power":
        lidx, pick_pdf = pick_light_power(scene.lights, scene.num_lights, u_pick)
    else:
        lidx, pick_pdf = pick_light_uniform(scene.lights, scene.num_lights, u_pick)
    light_pos, light_emission, pdf_samp = sample_light(scene.lights, lidx, lu, lv, p)
    pdf_light = pdf_samp * pick_pdf  # SampleLights: pdf /= light_count

    lvec = light_pos - p
    ldist = length(lvec)
    ldir = lvec / jnp.maximum(ldist, 1e-20)[:, None]
    n_dl = dot(ns, ldir)

    # Shadow-ray time comes from a fork of the post-NEE stream that never
    # rejoins (prd.seed stored before traceOcclusion). rnd() peek:
    _, occl_time = rng.rnd(seed)
    want_shadow = adv & (n_dl > 0.0) & (scene.num_lights > 0) & ~is_delta
    occluded = trace_any(
        p, ldir, cfg.shadow_tmin, ldist - cfg.shadow_tmax_eps, occl_time,
        count=count,
    )

    lit = want_shadow & ~occluded
    if scene.all_diffuse:
        pdf_scatter = jnp.abs(n_dl) * _INV_PI
        if cfg.throughput_model == "reference":
            weight = albedo * (
                power_heuristic(pdf_light, pdf_scatter) * _INV_PI
            )[:, None]
            radiance = light_emission * jnp.where(lit[:, None], weight, 0.0)
        else:
            # Unbiased NEE for diffuse: Le*omega * f * cos / pick_pdf
            contrib = light_emission * albedo * (
                _INV_PI * n_dl / jnp.maximum(pick_pdf, 1e-12)
            )[:, None]
            radiance = jnp.where(lit[:, None], contrib, 0.0)
    else:
        # General NEE: Le*omega * f(wo, wl) * cos / pick_pdf. NEE is the
        # only sampler of direct light on non-delta lobes (emission is
        # otherwise collected at depth 0 / after delta chains only), so no
        # MIS heuristic is applied.
        f_eval, _pdf_eval = bsdf_eval(params, ns, -direction, ldir)
        contrib = light_emission * f_eval * (
            n_dl / jnp.maximum(pick_pdf, 1e-12)
        )[:, None]
        radiance = jnp.where(lit[:, None], contrib, 0.0)

    return (seed, emitted, radiance, new_org, new_dir, atten_factor,
            want_shadow, is_delta, albedo, ns)


def _trace_block(scene: Scene, cfg: RenderConfig, cam: CameraParams,
                 tracer, pixel_idx, subframe_index):
    """Full path-traced estimate for one block of pixels. Returns
    (rgb [B,3], aov, radiance_ray_count, shadow_ray_count) where aov is
    (albedo [B,3], normal [B,3]) when cfg.aov, else None."""
    trace_closest, trace_any = tracer
    bsize = pixel_idx.shape[0]
    width = jnp.float32(cfg.width)
    height = jnp.float32(cfg.height)
    valid = pixel_idx >= 0  # padding lanes carry -1 and never come alive
    pixel_idx = jnp.maximum(pixel_idx, 0)
    px = pixel_idx % cfg.width
    py = pixel_idx // cfg.width

    outer_seed0 = rng.tea(pixel_idx.astype(jnp.uint32), subframe_index)
    if cfg.seed:
        outer_seed0 = rng.rot_seed(outer_seed0, jnp.uint32(cfg.seed))
    bg = jnp.asarray(cfg.bg_radiance, jnp.float32)

    def sample_body(carry, _):
        outer_seed, result, aov_sum, n_rad, n_shad = carry
        outer_seed, jx = rng.rnd(outer_seed)
        outer_seed, jy = rng.rnd(outer_seed)
        org, direction = _camera_ray(cam, px, py, jx, jy, width, height)

        state = dict(
            org=org,
            dir=direction,
            seed=outer_seed,  # prd.seed = seed (raygen.cu:43)
            atten=jnp.ones((bsize, 3), jnp.float32),
            last_atten=jnp.ones((bsize, 3), jnp.float32),
            result=result,
            alive=valid,
            prev_delta=jnp.zeros((bsize,), bool),
            slot=jnp.arange(bsize, dtype=jnp.int32),
            depth=jnp.zeros((), jnp.int32),
            n_rad=n_rad,
            n_shad=n_shad,
        )
        if cfg.aov:
            state["aov_alb"] = jnp.zeros((bsize, 3), jnp.float32)
            state["aov_nrm"] = jnp.zeros((bsize, 3), jnp.float32)
        _SCALARS = ("depth", "n_rad", "n_shad")

        def cond(s):
            return jnp.any(s["alive"]) & (s["depth"] < cfg.max_depth)

        def body(s):
            # --- wavefront compaction: sort alive lanes to the front so the
            # tracer only pays for ceil(alive / tile) tiles. Every per-lane
            # quantity (including its RNG stream and the original lane id in
            # `slot`) rides along, so per-pixel results are bit-identical to
            # the uncompacted loop — this is the TPU replacement for SER/
            # persistent-thread ray reordering (optixReorder,
            # shader_common.h:89).
            order = jnp.argsort(jnp.logical_not(s["alive"]))
            s = {
                k: (v if k in _SCALARS else jnp.take(v, order, axis=0))
                for k, v in s.items()
            }
            alive = s["alive"]
            n_alive = jnp.sum(alive.astype(jnp.int32))

            # traceRadiance: motion-time draw then traversal
            seed, _time = rng.rnd_masked(s["seed"], alive)
            hit = trace_closest(
                s["org"], s["dir"], cfg.primary_tmin, cfg.primary_tmax, _time,
                count=n_alive,
            )
            (seed, emitted, radiance, new_org, new_dir, atten_factor,
             want_shadow, is_delta, sh_albedo, sh_normal) = _shade_and_nee(
                scene, cfg, trace_any, hit, s["org"], s["dir"], seed, alive,
                count=n_alive,
            )
            is_hit = hit.mask
            aov_out = {}
            if cfg.aov:
                first = (alive & is_hit & (s["depth"] == 0))[:, None]
                aov_out = dict(
                    aov_alb=jnp.where(first, sh_albedo, s["aov_alb"]),
                    aov_nrm=jnp.where(first, sh_normal, s["aov_nrm"]),
                )

            # Miss program (miss.cu:22-35): env-map or constant callable
            radiance = jnp.where(
                is_hit[:, None], radiance,
                _miss_radiance(scene, bg, s["dir"]),
            )
            # Emission collects at depth 0 (reference) and after delta chains
            # (NEE cannot sample delta lobes, so mirrors/glass would
            # otherwise never see lights).
            see_emit = is_hit & ((s["depth"] == 0) | s["prev_delta"])
            emitted = jnp.where(see_emit[:, None], emitted, 0.0)

            contrib = emitted + radiance * s["last_atten"]
            result = s["result"] + jnp.where(alive[:, None], contrib, 0.0)

            atten = jnp.where(
                (alive & is_hit)[:, None], s["atten"] * atten_factor, s["atten"]
            )
            last_atten = jnp.where(alive[:, None], atten, s["last_atten"])

            # Russian roulette from bounce 0 (raygen.cu:62-66); the draw only
            # happens on non-miss lanes (short-circuited `||`).
            p_rr = luminance(atten)
            seed, u_rr = rng.rnd_masked(seed, alive & is_hit)
            survive = is_hit & (u_rr <= p_rr)
            atten = jnp.where(
                (alive & survive)[:, None],
                atten / jnp.maximum(p_rr, 1e-12)[:, None],
                atten,
            )

            new_alive = alive & survive
            org = jnp.where(new_alive[:, None], new_org, s["org"])
            direction = jnp.where(new_alive[:, None], new_dir, s["dir"])

            return dict(
                org=org,
                dir=direction,
                seed=seed,
                atten=atten,
                last_atten=last_atten,
                result=result,
                alive=new_alive,
                prev_delta=jnp.where(alive, is_delta, s["prev_delta"]),
                slot=s["slot"],
                depth=s["depth"] + 1,
                n_rad=s["n_rad"] + n_alive,
                n_shad=s["n_shad"] + jnp.sum(want_shadow.astype(jnp.int32)),
                **aov_out,
            )

        state = jax.lax.while_loop(cond, body, state)
        # Undo the compaction permutations: scatter each lane's accumulated
        # radiance back to its original (pixel-ordered) slot.
        result = jnp.zeros_like(state["result"]).at[state["slot"]].set(
            state["result"]
        )
        if cfg.aov:
            aov_sum = (
                aov_sum[0].at[state["slot"]].add(state["aov_alb"]),
                aov_sum[1].at[state["slot"]].add(state["aov_nrm"]),
            )
        return (outer_seed, result, aov_sum, state["n_rad"],
                state["n_shad"]), None

    aov_init = (
        (jnp.zeros((bsize, 3), jnp.float32),
         jnp.zeros((bsize, 3), jnp.float32)) if cfg.aov else ()
    )
    init = (
        outer_seed0,
        jnp.zeros((bsize, 3), jnp.float32),
        aov_init,
        jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32),
    )
    (outer_seed, result, aov_sum, n_rad, n_shad), _ = jax.lax.scan(
        sample_body, init, None, length=cfg.samples_per_launch
    )
    inv_spp = 1.0 / jnp.float32(cfg.samples_per_launch)
    rgb = result * inv_spp
    aov = (aov_sum[0] * inv_spp, aov_sum[1] * inv_spp) if cfg.aov else None
    return rgb, aov, n_rad, n_shad, jnp.zeros((), jnp.int32)


def _lcg_advance_table(spp: int) -> jnp.ndarray:
    """Per-sample affine LCG jumps: row s = (a, c) with
    state_after_2s_draws = a * state0 + c (mod 2^32).

    Lets pool lanes start sample s of a pixel at exactly the outer-stream
    position the sequential spp scan would have reached (2 jitter draws per
    preceding sample, raygen.cu:32-39) — pool and wave integrators consume
    identical per-path RNG streams.
    """
    import numpy as np

    a_step, c_step = 1664525, 1013904223
    a, c = 1, 0
    rows = []
    for _ in range(spp):
        rows.append((a, c))
        for _ in range(2):
            a = (a_step * a) & 0xFFFFFFFF
            c = (a_step * c + c_step) & 0xFFFFFFFF
    return np.array(rows, np.uint64).astype(np.uint32)  # host constants


def _render_pool(scene, cfg, cam, tracer, pixel_idx, subframe_index):
    """Persistent ray-pool integrator.

    Where the wave integrator runs a bounce while_loop per (block, sample)
    and lets lane density decay as Russian roulette kills paths, the pool
    keeps ONE fixed-size lane pool at ~100% occupancy: every iteration,
    finished paths flush their radiance to the framebuffer (scatter-add) and
    their lanes are refilled with fresh (pixel, sample) work items. This is
    the TPU analog of persistent-threads wavefront scheduling: total
    super-steps ~= total_path_segments / pool_size instead of
    blocks x spp x max_depth.

    Per-path arithmetic and RNG streams are identical to the wave integrator
    (and the reference, SURVEY.md S3.3); only the order in which a pixel's
    samples are summed differs, so images match to float addition order.
    Returns (rgb [N,3] mean over spp, n_radiance_rays, n_shadow_rays).

    FusedPipeline tracers take the packed-state variant below
    (_render_pool_fused) instead.
    """
    trace_closest, trace_any = tracer
    n_pix = pixel_idx.shape[0]
    pool = min(cfg.ray_block, _next_pow2(n_pix * cfg.samples_per_launch))
    # 0 = auto flush cadence (see RenderConfig.flush_every)
    flush_every = cfg.flush_every or (8 if n_pix > 32 * pool else 16)
    spp = cfg.samples_per_launch
    total_work = n_pix * spp
    width = jnp.float32(cfg.width)
    height = jnp.float32(cfg.height)
    bg = jnp.asarray(cfg.bg_radiance, jnp.float32)
    jump = _lcg_advance_table(spp)  # [spp, 2] uint32
    # The pool addresses pixels arithmetically (no gathers): the work list
    # must be a contiguous pixel range, which both entry points guarantee
    # (full frame = arange, dist shard = base + arange).
    pixel_base = pixel_idx[0]

    if cfg.sort_rays:
        # scene bounds for origin-Morton sort keys (loop-invariant jnp ops —
        # scene leaves may be tracers under jit, so no host conversion here)
        if getattr(scene, "instances", None) is not None:
            sort_lo = jnp.min(scene.instances.aabb_lo, axis=0)
            s_hi = jnp.max(scene.instances.aabb_hi, axis=0)
        else:
            v0s = scene.geom.v0[0][: scene.num_faces]
            sort_lo = jnp.min(v0s, axis=0)
            s_hi = jnp.max(v0s, axis=0)
        sort_inv = 1.0 / jnp.maximum(s_hi - sort_lo, 1e-6)

    state = dict(
        org=jnp.zeros((pool, 3), jnp.float32),
        dir=jnp.zeros((pool, 3), jnp.float32),
        seed=jnp.zeros((pool,), jnp.uint32),
        atten=jnp.ones((pool, 3), jnp.float32),
        last_atten=jnp.ones((pool, 3), jnp.float32),
        acc=jnp.zeros((pool, 3), jnp.float32),
        pixel=jnp.full((pool,), -1, jnp.int32),  # framebuffer slot, -1 = idle
        depth=jnp.zeros((pool,), jnp.int32),
        prev_delta=jnp.zeros((pool,), bool),
        alive=jnp.zeros((pool,), bool),
        samp=jnp.zeros((pool,), jnp.int32),  # next sample index (pixel-major)
        image=jnp.zeros((n_pix + 1, 3), jnp.float32),  # +1 = scatter sink
        next_work=jnp.zeros((), jnp.int32),
        iter=jnp.zeros((), jnp.int32),
        n_rad=jnp.zeros((), jnp.int32),
        n_shad=jnp.zeros((), jnp.int32),
    )
    if cfg.aov:
        state.update(
            acc_alb=jnp.zeros((pool, 3), jnp.float32),
            acc_nrm=jnp.zeros((pool, 3), jnp.float32),
            image_alb=jnp.zeros((n_pix + 1, 3), jnp.float32),
            image_nrm=jnp.zeros((n_pix + 1, 3), jnp.float32),
        )
    _ACCS = ("acc", "acc_alb", "acc_nrm") if cfg.aov else ("acc",)
    _IMGS = (("image", "acc"), ("image_alb", "acc_alb"),
             ("image_nrm", "acc_nrm")) if cfg.aov else (("image", "acc"),)

    if cfg.pool_pixel_major:
        def cond(s):
            pending = (s["pixel"] >= 0) & (s["samp"] < spp)
            return ((s["next_work"] < n_pix) | jnp.any(s["alive"])
                    | jnp.any(pending))
    else:
        def cond(s):
            return (s["next_work"] < total_work) | jnp.any(s["alive"])

    def body(s):
        # No compaction: lanes refill in place (rank via cumsum), so lane
        # occupancy stays ~100% without any gather/scatter of pool state.
        dead = ~s["alive"]
        n_alive = pool - jnp.sum(dead.astype(jnp.int32))

        if cfg.pool_pixel_major:
            # --- pixel-major schedule: a lane owns one pixel and renders
            # all its samples back-to-back; completed lanes were flushed +
            # freed by the OUTER flush stage (the loop nests outer-while/
            # inner-fori so the framebuffer scatter runs unconditionally
            # once per flush_every iterations — a lax.cond here made XLA
            # copy the image buffers every iteration).
            pixel_cur = s["pixel"]
            samp_cur = s["samp"]

            # assign fresh pixels to idle lanes
            idle = dead & (pixel_cur < 0)
            rank = jnp.cumsum(idle.astype(jnp.int32)) - 1
            wpix = s["next_work"] + rank
            take_px = idle & (wpix < n_pix)
            pixel_cur = jnp.where(
                take_px, pixel_base + jnp.clip(wpix, 0, n_pix - 1), pixel_cur
            )
            samp_cur = jnp.where(take_px, 0, samp_cur)
            next_work = s["next_work"] + jnp.sum(take_px.astype(jnp.int32))

            # (re)start: any dead lane holding a pixel with samples left
            take = dead & (pixel_cur >= 0) & (samp_cur < spp)
            new_pixel = jnp.maximum(pixel_cur, 0)
            samp = samp_cur
            flush = jnp.zeros_like(dead)  # freeing lives in flush_stage
            s = dict(s, next_work=next_work,
                     iter=s["iter"] + 1, pixel=pixel_cur,
                     samp=jnp.where(take, samp_cur + 1, samp_cur))
        else:
            # --- sample-major: flush every dying path, refill immediately ---
            flush = dead & (s["pixel"] >= 0)
            # global pixel id -> local shard row; idle lanes -> sink row
            target = jnp.where(flush, s["pixel"] - pixel_base, n_pix)
            flushed = {
                img_k: s[img_k].at[target].add(
                    jnp.where(flush[:, None], s[acc_k], 0.0)
                )
                for img_k, acc_k in _IMGS
            }
            image = flushed["image"]

            rank = jnp.cumsum(dead.astype(jnp.int32)) - 1  # per-dead rank
            w = s["next_work"] + rank
            take = dead & (w < total_work)
            w_c = jnp.clip(w, 0, total_work - 1)
            p_slot = w_c % n_pix
            samp = w_c // n_pix
            new_pixel = pixel_base + p_slot
            s = dict(s, **flushed, iter=s["iter"] + 1,
                     next_work=s["next_work"]
                     + jnp.sum(take.astype(jnp.int32)))
        st = rng.tea(new_pixel.astype(jnp.uint32), subframe_index)
        if cfg.seed:
            st = rng.rot_seed(st, jnp.uint32(cfg.seed))
        # per-sample LCG jump constants via a select chain (a gather from the
        # tiny [spp, 2] table costs a full serial pass on TPU)
        aj = jnp.full((pool,), int(jump[0, 0]), jnp.uint32)
        cj = jnp.full((pool,), int(jump[0, 1]), jnp.uint32)
        for si in range(1, spp):
            sel = samp == si
            aj = jnp.where(sel, jnp.uint32(int(jump[si, 0])), aj)
            cj = jnp.where(sel, jnp.uint32(int(jump[si, 1])), cj)
        st = aj * st + cj  # jump to this sample's outer-stream position
        st, jx = rng.rnd(st)
        st, jy = rng.rnd(st)
        px = new_pixel % cfg.width
        py = new_pixel // cfg.width
        new_org, new_dir = _camera_ray(cam, px, py, jx, jy, width, height)

        def fill(new, old):
            m = take if old.ndim == 1 else take[:, None]
            return jnp.where(m, new, old)

        if cfg.pool_pixel_major:
            # acc persists across a pixel's samples; pixel already updated
            acc_new = {k: s[k] for k in _ACCS}
            pixel_new = s["pixel"]
        else:
            acc_new = {
                k: fill(jnp.zeros((pool, 3), jnp.float32),
                        jnp.where(flush[:, None], 0.0, s[k]))
                for k in _ACCS
            }
            pixel_new = fill(new_pixel, jnp.where(flush, -1, s["pixel"]))
        s = dict(
            s,
            org=fill(new_org, s["org"]),
            dir=fill(new_dir, s["dir"]),
            seed=fill(st, s["seed"]),
            atten=fill(jnp.ones((pool, 3), jnp.float32), s["atten"]),
            last_atten=fill(jnp.ones((pool, 3), jnp.float32), s["last_atten"]),
            pixel=pixel_new,
            depth=fill(jnp.zeros((pool,), jnp.int32), s["depth"]),
            prev_delta=s["prev_delta"] & ~take,
            alive=s["alive"] | take,
            **acc_new,
        )

        if cfg.sort_rays:
            # Coherence re-sort (SER analog): order live lanes by direction
            # octant then origin Morton code (rays in one tile then share a
            # direction cone AND a spatial cluster, which is what tile-level
            # instance-AABB culling keys on). Dead lanes sort last, so alive
            # lanes become a dense prefix again; per-lane state rides along,
            # leaving per-path results unchanged.
            from ..accel.morton import morton3d

            oct_key = (
                (s["dir"][:, 0] >= 0).astype(jnp.uint32)
                + 2 * (s["dir"][:, 1] >= 0).astype(jnp.uint32)
                + 4 * (s["dir"][:, 2] >= 0).astype(jnp.uint32)
            )
            om = morton3d((s["org"] - sort_lo) * sort_inv)
            key = (oct_key << jnp.uint32(27)) | (om >> jnp.uint32(3))
            key = jnp.where(s["alive"], key, jnp.uint32(0xFFFFFFFF))
            order = jnp.argsort(key)
            per_lane = ("org", "dir", "seed", "atten", "last_atten", "acc",
                        "pixel", "depth", "prev_delta", "alive", "samp",
                        "acc_alb", "acc_nrm")
            s = {
                k: (jnp.take(v, order, axis=0) if k in per_lane else v)
                for k, v in s.items()
            }

        alive = s["alive"]
        n_live = jnp.sum(alive.astype(jnp.int32))
        if cfg.sort_rays:
            count_hint = n_live  # sorted: alive lanes are a dense prefix
        else:
            # Lanes refill in place, so alive lanes are not a prefix; the
            # tracer count must cover the highest live lane. While work
            # remains the pool is full anyway; this only trims endgame cost.
            count_hint = jnp.max(
                jnp.where(alive, jnp.arange(pool, dtype=jnp.int32), -1)
            ) + 1

        # --- one path segment for every live lane (same math as the wave
        # integrator / reference S3.3) ---
        seed, _time = rng.rnd_masked(s["seed"], alive)

        hit = trace_closest(
            s["org"], s["dir"], cfg.primary_tmin, cfg.primary_tmax, _time,
            count=count_hint,
        )
        (seed, emitted, radiance, new_org2, new_dir2, atten_factor,
         want_shadow, is_delta, sh_albedo, sh_normal) = _shade_and_nee(
            scene, cfg, trace_any, hit, s["org"], s["dir"], seed, alive,
            count=count_hint,
        )
        is_hit = hit.mask
        aov_out = {}
        if cfg.aov:
            first = (alive & is_hit & (s["depth"] == 0))[:, None]
            aov_out = dict(
                acc_alb=s["acc_alb"] + jnp.where(first, sh_albedo, 0.0),
                acc_nrm=s["acc_nrm"] + jnp.where(first, sh_normal, 0.0),
            )
        radiance = jnp.where(
            is_hit[:, None], radiance, _miss_radiance(scene, bg, s["dir"])
        )
        see_emit = is_hit & ((s["depth"] == 0) | s["prev_delta"])
        emitted = jnp.where(see_emit[:, None], emitted, 0.0)
        contrib = emitted + radiance * s["last_atten"]
        acc = s["acc"] + jnp.where(alive[:, None], contrib, 0.0)

        atten = jnp.where(
            (alive & is_hit)[:, None], s["atten"] * atten_factor, s["atten"]
        )
        last_atten = jnp.where(alive[:, None], atten, s["last_atten"])

        p_rr = luminance(atten)
        seed, u_rr = rng.rnd_masked(seed, alive & is_hit)
        survive = is_hit & (u_rr <= p_rr)
        atten = jnp.where(
            (alive & survive)[:, None],
            atten / jnp.maximum(p_rr, 1e-12)[:, None],
            atten,
        )
        depth = jnp.where(alive, s["depth"] + 1, s["depth"])
        new_alive = alive & survive & (depth < cfg.max_depth)
        org = jnp.where(new_alive[:, None], new_org2, s["org"])
        direction = jnp.where(new_alive[:, None], new_dir2, s["dir"])

        return dict(
            s,
            org=org,
            dir=direction,
            seed=seed,
            atten=atten,
            last_atten=last_atten,
            acc=acc,
            depth=depth,
            prev_delta=jnp.where(alive, is_delta, s["prev_delta"]),
            alive=new_alive,
            n_rad=s["n_rad"] + n_live,
            n_shad=s["n_shad"] + jnp.sum(want_shadow.astype(jnp.int32)),
            **aov_out,
        )

    if cfg.pool_pixel_major:
        _IMG_KEYS = tuple(k for k, _a in _IMGS)

        def flush_stage(s):
            # unconditional scatter + free of completed lanes, once per
            # outer iteration (unique-indices fast path: one lane per
            # pixel; non-completed lanes drop OOB; global pixel id
            # rebased into the local shard image)
            completed = (~s["alive"] & (s["pixel"] >= 0)
                         & (s["samp"] >= spp))
            target = jnp.where(completed, s["pixel"] - pixel_base,
                               n_pix + 1)
            out = {
                img_k: s[img_k].at[target].add(s[acc_k], mode="drop",
                                               unique_indices=True)
                for img_k, acc_k in _IMGS
            }
            out["pixel"] = jnp.where(completed, -1, s["pixel"])
            out["samp"] = jnp.where(completed, 0, s["samp"])
            for acc_k in _ACCS:
                out[acc_k] = jnp.where(completed[:, None], 0.0, s[acc_k])
            return dict(s, **out)

        def outer(s):
            s = flush_stage(s)
            lanes = {k: v for k, v in s.items() if k not in _IMG_KEYS}
            lanes = jax.lax.fori_loop(
                0, flush_every, lambda i, st: body(st), lanes,
                unroll=False)
            return dict(lanes, **{k: s[k] for k in _IMG_KEYS})

        s = jax.lax.while_loop(cond, outer, state)
    else:
        s = jax.lax.while_loop(cond, body, state)
    # final flush: the loop exits with all lanes dead but unflushed
    flush = s["pixel"] >= 0
    # global pixel id -> local shard row; idle lanes drop OOB
    target_oob = jnp.where(flush, s["pixel"] - pixel_base, n_pix + 1)
    inv_spp = 1.0 / jnp.float32(spp)

    def final_flush(img_k, acc_k):
        img = s[img_k].at[target_oob].add(
            s[acc_k], mode="drop",
            unique_indices=bool(cfg.pool_pixel_major),
        )
        return img[:n_pix] * inv_spp

    rgb = final_flush("image", "acc")
    aov = (
        (final_flush("image_alb", "acc_alb"),
         final_flush("image_nrm", "acc_nrm")) if cfg.aov else None
    )
    return rgb, aov, s["n_rad"], s["n_shad"], jnp.zeros((), jnp.int32)


def _render_pool_fused_krefill(scene, cfg, cam, pixel_idx, subframe_index,
                               fused, pool, use_stash, flush_every):
    """Megakernel pool with IN-KERNEL refill (pallas_shade refill mode).

    The XLA loop body is ONE kernel launch: retire, the work-counter
    pixel claim, tea seeding, the per-sample LCG jump, and camera-ray
    generation all run in the kernel's epilogue over an SMEM work counter
    that persists across the sequential grid. Per-pixel RNG streams are
    keyed by PIXEL id (tea), so the accumulated image matches the XLA
    -refill pool to float-op order regardless of lane assignment. The
    flush scatter stays XLA at the flush_every cadence (persistent
    threads vs optixLaunch-per-frame, wavefront.cpp:203-222)."""
    n_pix = pixel_idx.shape[0]
    spp = cfg.samples_per_launch
    pixel_base = pixel_idx[0]
    shader = fused.refill_shader(n_pix, use_stash)
    misc_w = 24 if cfg.aov else 16

    state = dict(
        rays=jnp.zeros((pool, 8), jnp.float32),
        misc=jnp.zeros((pool, misc_w), jnp.float32).at[:, 13].set(-1.0),
        image=jnp.zeros((n_pix + 1, 3), jnp.float32),
        next_work=jnp.zeros((), jnp.int32),
        count=jnp.zeros((), jnp.int32),
        iter=jnp.zeros((), jnp.int32),
        n_rad=jnp.zeros((), jnp.int32),
        n_shad=jnp.zeros((), jnp.float32),
    )
    if use_stash:
        state["stash16"] = (jnp.zeros((pool, 16), jnp.float32)
                            .at[:, 0].set(-1.0))
    if fused.motion:
        state["time8"] = jnp.zeros((pool, 8), jnp.float32)
    if cfg.aov:
        state.update(
            image_alb=jnp.zeros((n_pix + 1, 3), jnp.float32),
            image_nrm=jnp.zeros((n_pix + 1, 3), jnp.float32),
        )
    _IMGS = ((("image", 10), ("image_alb", 16), ("image_nrm", 19))
             if cfg.aov else (("image", 10),))
    _IMG_KEYS = tuple(k for k, _c in _IMGS)

    scf = jnp.concatenate([
        jnp.asarray(cam.eye, jnp.float32).reshape(3),
        jnp.asarray(cam.u, jnp.float32).reshape(3),
        jnp.asarray(cam.v, jnp.float32).reshape(3),
        jnp.asarray(cam.w, jnp.float32).reshape(3),
    ])
    sub_i = jnp.asarray(subframe_index, jnp.int32).reshape(())
    base_i = jnp.asarray(pixel_base, jnp.int32).reshape(())

    def cond(s):
        m = s["misc"]
        pending = (m[:, 13] >= 0) & (m[:, 14] < spp)
        return ((s["next_work"] < n_pix) | jnp.any(m[:, 9] > 0)
                | jnp.any(pending))

    def body(i, s):
        sci = jnp.stack([s["next_work"], base_i, sub_i,
                         jnp.zeros((), jnp.int32)])
        args = [s["rays"], s["misc"],
                s["stash16"] if use_stash else None,
                s["count"], sci, scf]
        if fused.motion:
            args.append(s["time8"])
        outs = list(shader(*args))
        rays2 = outs.pop(0)
        misc2 = outs.pop(0)
        upd = {}
        if use_stash:
            upd["stash16"] = outs.pop(0)
        if fused.motion:
            upd["time8"] = outs.pop(0)
        stats = outs.pop(0)
        return dict(
            s, rays=rays2, misc=misc2,
            next_work=stats[0], count=stats[1],
            iter=s["iter"] + 1,
            n_rad=s["n_rad"] + stats[2],
            n_shad=s["n_shad"] + jnp.sum(misc2[:, 15]),
            **upd,
        )

    def flush_stage(s):
        # unconditional stash + parked-lane scatter once per outer
        # iteration (mirrors _render_pool_fused's flush_stage; the stash
        # rides one [pool, 16] blob: px | rgb | aov6 | pad)
        misc = s["misc"]
        pixel = misc[:, 13]
        completed = ((misc[:, 9] <= 0) & (pixel >= 0)
                     & (misc[:, 14] >= spp))
        target = jnp.where(
            completed, pixel.astype(jnp.int32) - pixel_base, n_pix + 1)
        if use_stash:
            st = s["stash16"]
            sp = st[:, 0]
            starget = jnp.where(sp >= 0,
                                sp.astype(jnp.int32) - pixel_base,
                                n_pix + 1)
            stash_accs = ((st[:, 1:4],)
                          + ((st[:, 4:7], st[:, 7:10]) if cfg.aov else ()))
            out = {
                k: s[k].at[starget].add(sa, mode="drop",
                                        unique_indices=True)
                      .at[target].add(misc[:, c:c + 3], mode="drop",
                                      unique_indices=True)
                for (k, c), sa in zip(_IMGS, stash_accs)
            }
            out["stash16"] = (jnp.zeros((pool, 16), jnp.float32)
                              .at[:, 0].set(-1.0))
        else:
            out = {
                k: s[k].at[target].add(misc[:, c:c + 3], mode="drop",
                                       unique_indices=True)
                for k, c in _IMGS
            }
        misc = misc.at[:, 10:13].set(
            jnp.where(completed[:, None], 0.0, misc[:, 10:13]))
        if cfg.aov:
            misc = misc.at[:, 16:22].set(
                jnp.where(completed[:, None], 0.0, misc[:, 16:22]))
        misc = misc.at[:, 13].set(jnp.where(completed, -1.0, pixel))
        misc = misc.at[:, 14].set(jnp.where(completed, 0.0, misc[:, 14]))
        return dict(s, misc=misc, **out)

    def outer(s):
        s = flush_stage(s)
        lanes = {k: v for k, v in s.items() if k not in _IMG_KEYS}
        lanes = jax.lax.fori_loop(0, flush_every, body, lanes,
                                  unroll=False)
        return dict(lanes, **{k: s[k] for k in _IMG_KEYS})

    s = jax.lax.while_loop(cond, outer, state)
    misc = s["misc"]
    pixel = misc[:, 13]
    target = jnp.where(pixel >= 0, pixel.astype(jnp.int32) - pixel_base,
                       n_pix + 1)
    inv_spp = 1.0 / jnp.float32(spp)

    def final_img(key, c):
        img = s[key]
        if use_stash:
            st = s["stash16"]
            sp = st[:, 0]
            starget = jnp.where(sp >= 0,
                                sp.astype(jnp.int32) - pixel_base,
                                n_pix + 1)
            off = {"image": 1, "image_alb": 4, "image_nrm": 7}[key]
            img = img.at[starget].add(st[:, off:off + 3], mode="drop",
                                      unique_indices=True)
        img = img.at[target].add(misc[:, c:c + 3], mode="drop",
                                 unique_indices=True)
        return img[:n_pix] * inv_spp

    rgb = final_img("image", 10)
    aov = ((final_img("image_alb", 16), final_img("image_nrm", 19))
           if cfg.aov else None)
    return rgb, aov, s["n_rad"], s["n_shad"].astype(jnp.int32), s["iter"]


def _render_pool_fused(scene, cfg, cam, pixel_idx, subframe_index, fused):
    """Persistent ray pool over the fused kernel pair with PACKED state.

    The fused shade kernel consumes and emits the whole [pool, 16] per-lane
    state blob (trace/pallas_shade.py MISC layout) with accumulation, RR,
    depth, and aliveness resolved in-kernel, so this loop body keeps only
    work assignment, camera-ray refill, and the framebuffer flush — the
    dict-state pool's ~40 per-iteration state-update fusions measured 2.5x
    the kernels' own cost on a Cornell subframe. Schedules (pixel-major /
    sample-major), RNG streams, and per-path arithmetic are identical to
    _render_pool.
    """
    n_pix = pixel_idx.shape[0]
    pool = min(cfg.ray_block, _next_pow2(n_pix * cfg.samples_per_launch))
    # Retire stash on/off (cfg.pool_stash; -1 = auto). Stashless
    # completed lanes wait parked for the flush at the old tighter
    # cadence — recovers the stash's ~6 select/iteration cost on
    # shade-bound configs (VERDICT r3 #4). Measured v5e (exp_fused_e2e,
    # stash-on/off): Cornell 65.0/58.8 and baked TLAS 66.2/61.3 want the
    # stash; Cornell 1080p 57.6/58.6 and the external-pipeline trace-time
    # instanced 26.6/29.1 want it OFF — auto = off when the frame dwarfs
    # the pool (n_pix > 32*pool) or the pipeline traces externally
    # (shade-bound; the kernel-external closest dominates and the stash
    # selects are pure overhead). RT3C_POOL_STASH env (0/1) overrides.
    from ..trace.pallas_shade import ExternalPipeline as _ExtPipe

    kernel_refill = (cfg.pool_pixel_major and not cfg.sort_rays
                     and hasattr(fused, "refill_shader")
                     and os.environ.get("RT3C_KREFILL", "1") == "1")
    _stash_env = os.environ.get("RT3C_POOL_STASH", "")
    if _stash_env in ("0", "1"):
        use_stash = cfg.pool_pixel_major and _stash_env == "1"
    elif kernel_refill:
        # in-kernel refill always stashes: the kernel epilogue frees a
        # completed lane in the SAME launch, while a stashless park now
        # waits an extra launch (the flush frees lanes BETWEEN launches
        # but refill moved in-kernel) — measured v5e Cornell 1080p 51.2
        # stashless vs 62.8 stash under krefill (r5)
        use_stash = True
    elif cfg.pool_stash == -1:
        use_stash = (cfg.pool_pixel_major
                     and not (n_pix > 32 * pool
                              or isinstance(fused, _ExtPipe)))
    else:
        use_stash = cfg.pool_pixel_major and cfg.pool_stash != 0
    # 0 = auto flush cadence. With the retire stash, completed lanes
    # refill without waiting for the flush, so the cadence only trades
    # scatter amortization vs stash-full parking (needs 2 completions of
    # one lane per window). Measured v5e Cornell 768^2 fe 16/32/48/64:
    # 58.3/66.2/63.3/55.2; 1080p fe 8/16/32: 46.3/57.8/57.4. Stashless
    # keeps the pre-stash 8/16 cadence (parking pressure).
    if cfg.flush_every:
        flush_every = cfg.flush_every
    elif use_stash or not cfg.pool_pixel_major:
        flush_every = 16 if n_pix > 32 * pool else 32
    else:
        flush_every = 8 if n_pix > 32 * pool else 16

    # in-kernel-refill megakernel (pallas_shade refill mode): the whole
    # XLA refill block moves into the kernel epilogue, leaving one launch
    # per iteration. Pixel-major unsorted FusedPipeline only (sorting and
    # the sample-major schedule keep the XLA refill). Measured v5e (r5):
    # Cornell 768 66.3 -> 74.0, 1080p 59.2 -> 62.8, baked TLAS 66.4 ->
    # 75.1 Mray/s. RT3C_KREFILL=0 reverts for A/B.
    if kernel_refill:
        return _render_pool_fused_krefill(
            scene, cfg, cam, pixel_idx, subframe_index, fused,
            pool, use_stash, flush_every)
    spp = cfg.samples_per_launch
    total_work = n_pix * spp
    width = jnp.float32(cfg.width)
    height = jnp.float32(cfg.height)
    jump = _lcg_advance_table(spp)
    pixel_base = pixel_idx[0]

    if cfg.sort_rays:
        v0s = scene.geom.v0[0][: scene.num_faces]
        sort_lo = jnp.min(v0s, axis=0)
        s_hi = jnp.max(v0s, axis=0)
        sort_inv = 1.0 / jnp.maximum(s_hi - sort_lo, 1e-6)

    misc_w = 24 if cfg.aov else 16  # 16-21: first-hit albedo/normal accs
    state = dict(
        rays=jnp.zeros((pool, 8), jnp.float32),
        misc=jnp.zeros((pool, misc_w), jnp.float32).at[:, 13].set(-1.0),
        image=jnp.zeros((n_pix + 1, 3), jnp.float32),  # +1 = scatter sink
        next_work=jnp.zeros((), jnp.int32),
        iter=jnp.zeros((), jnp.int32),
        n_rad=jnp.zeros((), jnp.int32),
        n_shad=jnp.zeros((), jnp.float32),
    )
    if use_stash:
        # retire stash (the walk pool's trick): completed lanes park
        # (pixel, acc) in their dense per-lane slot and take new work in
        # the SAME body pass — without it a completed lane idles until
        # the flush (up to flush_every-1 kernel iterations; measured
        # flush_every=64 sinks Cornell 61 -> 38 purely on that parking)
        state.update(
            stash_px=jnp.full((pool,), -1.0, jnp.float32),
            stash_rgb=jnp.zeros((pool, 3), jnp.float32),
        )
        if cfg.aov:
            state.update(stash_aov=jnp.zeros((pool, 6), jnp.float32))
    if cfg.aov:
        state.update(
            image_alb=jnp.zeros((n_pix + 1, 3), jnp.float32),
            image_nrm=jnp.zeros((n_pix + 1, 3), jnp.float32),
        )
    # (image key, misc acc column range) pairs driving every flush
    _IMGS = ((("image", 10), ("image_alb", 16), ("image_nrm", 19))
             if cfg.aov else (("image", 10),))

    if cfg.pool_pixel_major:
        def cond(s):
            m = s["misc"]
            pending = (m[:, 13] >= 0) & (m[:, 14] < spp)
            return ((s["next_work"] < n_pix) | jnp.any(m[:, 9] > 0)
                    | jnp.any(pending))
    else:
        def cond(s):
            return ((s["next_work"] < total_work)
                    | jnp.any(s["misc"][:, 9] > 0))

    def body(s):
        rays, misc = s["rays"], s["misc"]
        alive = misc[:, 9] > 0
        dead = ~alive
        pixel = misc[:, 13]
        samp = misc[:, 14]
        acc = misc[:, 10:13]
        aacc = misc[:, 16:22] if cfg.aov else None
        images = (None if cfg.pool_pixel_major
                  else tuple(s[k] for k, _ in _IMGS))
        next_work = s["next_work"]

        if cfg.pool_pixel_major:
            # the loop nests outer-while/inner-fori so the framebuffer
            # scatter runs UNCONDITIONALLY once per flush_every
            # iterations (a lax.cond here made XLA copy the image
            # buffers every iteration, the largest single piece of the
            # Cornell loop's ~0.2 ms XLA glue); completed lanes retire
            # into the stash NOW and refill below without waiting
            # (stashless: they wait parked for the flush to free them)
            if use_stash:
                completed = dead & (pixel >= 0) & (samp >= spp)
                can_stash = completed & (s["stash_px"] < 0)
                stash_px = jnp.where(can_stash, pixel, s["stash_px"])
                stash_rgb = jnp.where(can_stash[:, None], acc,
                                      s["stash_rgb"])
                acc = jnp.where(can_stash[:, None], 0.0, acc)
                if cfg.aov:
                    stash_aov = jnp.where(can_stash[:, None], aacc,
                                          s["stash_aov"])
                    aacc = jnp.where(can_stash[:, None], 0.0, aacc)
                pixel = jnp.where(can_stash, -1.0, pixel)
                samp = jnp.where(can_stash, 0.0, samp)

            # assign fresh pixels to idle lanes
            idle = dead & (pixel < 0)
            rank = jnp.cumsum(idle.astype(jnp.int32)) - 1
            wpix = next_work + rank
            take_px = idle & (wpix < n_pix)
            pixel = jnp.where(
                take_px,
                (pixel_base + jnp.clip(wpix, 0, n_pix - 1))
                .astype(jnp.float32),
                pixel,
            )
            samp = jnp.where(take_px, 0.0, samp)
            next_work = next_work + jnp.sum(take_px.astype(jnp.int32))

            # (re)start: any dead lane holding a pixel with samples left
            take = dead & (pixel >= 0) & (samp < spp)
            samp_rng = samp  # this sample's index feeds the RNG jump
            samp = jnp.where(take, samp + 1.0, samp)
            new_pixel = jnp.maximum(pixel, 0.0).astype(jnp.int32)
        else:
            # sample-major: flush every dying path, refill immediately
            # (two samples of one pixel may die together -> not unique)
            flush = dead & (pixel >= 0)
            # global pixel id -> local shard row (see _render_pool)
            target = jnp.where(flush, pixel.astype(jnp.int32) - pixel_base,
                               n_pix + 1)
            images = tuple(
                img.at[target].add(misc[:, c:c + 3], mode="drop")
                for img, (_k, c) in zip(images, _IMGS)
            )
            rank = jnp.cumsum(dead.astype(jnp.int32)) - 1
            w = next_work + rank
            take = dead & (w < total_work)
            w_c = jnp.clip(w, 0, total_work - 1)
            samp_rng = (w_c // n_pix).astype(jnp.float32)
            new_pixel = pixel_base + w_c % n_pix
            pixel = jnp.where(take, new_pixel.astype(jnp.float32),
                              jnp.where(flush, -1.0, pixel))
            acc = jnp.where((take | flush)[:, None], 0.0, acc)
            if cfg.aov:
                aacc = jnp.where((take | flush)[:, None], 0.0, aacc)
            samp = jnp.where(take, samp_rng, samp)
            next_work = next_work + jnp.sum(take.astype(jnp.int32))

        st = rng.tea(new_pixel.astype(jnp.uint32), subframe_index)
        if cfg.seed:
            st = rng.rot_seed(st, jnp.uint32(cfg.seed))
        # per-sample LCG jump constants via a select chain (a gather from
        # the tiny [spp, 2] table costs a full serial pass on TPU)
        samp_i = samp_rng.astype(jnp.int32)
        aj = jnp.full((pool,), int(jump[0, 0]), jnp.uint32)
        cj = jnp.full((pool,), int(jump[0, 1]), jnp.uint32)
        for si in range(1, spp):
            sel = samp_i == si
            aj = jnp.where(sel, jnp.uint32(int(jump[si, 0])), aj)
            cj = jnp.where(sel, jnp.uint32(int(jump[si, 1])), cj)
        st = aj * st + cj
        st, jx = rng.rnd(st)
        st, jy = rng.rnd(st)
        px = new_pixel % cfg.width
        py = new_pixel // cfg.width
        new_org, new_dir = _camera_ray(cam, px, py, jx, jy, width, height)

        take2 = take[:, None]
        seed_u = jnp.where(
            take, st, jax.lax.bitcast_convert_type(misc[:, 0], jnp.uint32)
        )
        alive2 = alive | take
        # per-ray motion time draw (masked: streams advance on live lanes
        # only, matching the wave integrator)
        seed_u, _time = rng.rnd_masked(seed_u, alive2)

        rays = jnp.concatenate(
            [
                jnp.where(take2, new_org, rays[:, 0:3]),
                jnp.where(take2, new_dir, rays[:, 3:6]),
                jnp.full((pool, 1), cfg.primary_tmin, jnp.float32),
                jnp.full((pool, 1), cfg.primary_tmax, jnp.float32),
            ],
            axis=1,
        )
        one3 = jnp.ones((pool, 3), jnp.float32)
        misc_cols = [
            jax.lax.bitcast_convert_type(seed_u, jnp.float32)[:, None],
            jnp.where(take2, one3, misc[:, 1:4]),        # atten
            jnp.where(take2, one3, misc[:, 4:7]),        # last_atten
            jnp.where(take, 0.0, misc[:, 7])[:, None],   # prev_delta
            jnp.where(take, 0.0, misc[:, 8])[:, None],   # depth
            alive2.astype(jnp.float32)[:, None],
            acc,
            pixel[:, None],
            samp[:, None],
            jnp.zeros((pool, 1), jnp.float32),
        ]
        if cfg.aov:
            misc_cols += [aacc, jnp.zeros((pool, 2), jnp.float32)]
        misc = jnp.concatenate(misc_cols, axis=1)

        if cfg.sort_rays:
            from ..accel.morton import morton3d

            oct_key = (
                (rays[:, 3] >= 0).astype(jnp.uint32)
                + 2 * (rays[:, 4] >= 0).astype(jnp.uint32)
                + 4 * (rays[:, 5] >= 0).astype(jnp.uint32)
            )
            om = morton3d((rays[:, 0:3] - sort_lo) * sort_inv)
            key = (oct_key << jnp.uint32(27)) | (om >> jnp.uint32(3))
            key = jnp.where(alive2, key, jnp.uint32(0xFFFFFFFF))
            order = jnp.argsort(key)
            rays = jnp.take(rays, order, axis=0)
            misc = jnp.take(misc, order, axis=0)
            _time = jnp.take(_time, order, axis=0)
            alive2 = misc[:, 9] > 0

        n_live = jnp.sum(alive2.astype(jnp.int32))
        if cfg.sort_rays:
            count_hint = n_live  # sorted: alive lanes are a dense prefix
        else:
            count_hint = jnp.max(
                jnp.where(alive2, jnp.arange(pool, dtype=jnp.int32), -1)
            ) + 1

        # megakernel: closest + shade + NEE + shadow + RR, one launch
        # (motion variants consume the per-ray time as an 8-wide block)
        time8 = (jnp.broadcast_to(_time[:, None], (pool, 8))
                 if fused.motion else None)
        rays2, misc2 = fused.trace_shade(rays, misc, count_hint, time8)

        if use_stash:
            img_out = dict(stash_px=stash_px, stash_rgb=stash_rgb)
            if cfg.aov:
                img_out["stash_aov"] = stash_aov
        elif cfg.pool_pixel_major:
            img_out = {}
        else:
            img_out = {k: img for (k, _c), img in zip(_IMGS, images)}
        return dict(
            s, rays=rays2, misc=misc2,
            next_work=next_work, iter=s["iter"] + 1,
            n_rad=s["n_rad"] + n_live,
            n_shad=s["n_shad"] + jnp.sum(misc2[:, 15]),
            **img_out,
        )

    if cfg.pool_pixel_major:
        _IMG_KEYS = tuple(k for k, _c in _IMGS)

        def flush_stage(s):
            # unconditional scatter of the retire stash + free of any
            # lane still PARKED completed (its stash slot was occupied —
            # needs two completions in one window, rare), once per outer
            # iteration. pixel-major: each pixel is owned by one lane and
            # scattered once, so both scatters take the unique-indices
            # fast path; idle lanes drop OOB. pixel is the GLOBAL id;
            # rebase into the local shard image.
            misc = s["misc"]
            pixel = misc[:, 13]
            completed = ((misc[:, 9] <= 0) & (pixel >= 0)
                         & (misc[:, 14] >= spp))
            target = jnp.where(
                completed, pixel.astype(jnp.int32) - pixel_base, n_pix + 1)
            if use_stash:
                sp = s["stash_px"]
                starget = jnp.where(sp >= 0,
                                    sp.astype(jnp.int32) - pixel_base,
                                    n_pix + 1)
                stash_accs = ((s["stash_rgb"],)
                              + ((s["stash_aov"][:, :3],
                                  s["stash_aov"][:, 3:])
                                 if cfg.aov else ()))
                out = {
                    k: s[k].at[starget].add(sa, mode="drop",
                                            unique_indices=True)
                          .at[target].add(misc[:, c:c + 3], mode="drop",
                                          unique_indices=True)
                    for (k, c), sa in zip(_IMGS, stash_accs)
                }
                out["stash_px"] = jnp.full((pool,), -1.0, jnp.float32)
                out["stash_rgb"] = jnp.zeros((pool, 3), jnp.float32)
                if cfg.aov:
                    out["stash_aov"] = jnp.zeros((pool, 6), jnp.float32)
            else:
                out = {
                    k: s[k].at[target].add(misc[:, c:c + 3], mode="drop",
                                           unique_indices=True)
                    for k, c in _IMGS
                }
            misc = misc.at[:, 10:13].set(
                jnp.where(completed[:, None], 0.0, misc[:, 10:13]))
            if cfg.aov:
                misc = misc.at[:, 16:22].set(
                    jnp.where(completed[:, None], 0.0, misc[:, 16:22]))
            misc = misc.at[:, 13].set(jnp.where(completed, -1.0, pixel))
            misc = misc.at[:, 14].set(
                jnp.where(completed, 0.0, misc[:, 14]))
            return dict(s, misc=misc, **out)

        def outer(s):
            s = flush_stage(s)
            lanes = {k: v for k, v in s.items() if k not in _IMG_KEYS}
            lanes = jax.lax.fori_loop(
                0, flush_every, lambda i, st: body(st), lanes,
                unroll=False)
            return dict(lanes, **{k: s[k] for k in _IMG_KEYS})

        s = jax.lax.while_loop(cond, outer, state)
    else:
        s = jax.lax.while_loop(cond, body, state)
    # final flush: the loop exits with all lanes dead but unflushed
    misc = s["misc"]
    pixel = misc[:, 13]
    flushm = pixel >= 0
    # global pixel id -> local shard row; idle lanes drop OOB
    target = jnp.where(flushm, pixel.astype(jnp.int32) - pixel_base,
                       n_pix + 1)
    inv_spp = 1.0 / jnp.float32(spp)

    if use_stash:
        sp_f = s["stash_px"]
        starget_f = jnp.where(sp_f >= 0,
                              sp_f.astype(jnp.int32) - pixel_base,
                              n_pix + 1)
        stash_accs_f = ((s["stash_rgb"],)
                        + ((s["stash_aov"][:, :3], s["stash_aov"][:, 3:])
                           if cfg.aov else ()))
        _stash_by_key = {k: sa for (k, _c), sa in zip(_IMGS, stash_accs_f)}

    def final_img(key, c):
        img = s[key]
        if use_stash:
            img = img.at[starget_f].add(_stash_by_key[key], mode="drop",
                                        unique_indices=True)
        img = img.at[target].add(
            misc[:, c:c + 3], mode="drop",
            unique_indices=bool(cfg.pool_pixel_major),
        )
        return img[:n_pix] * inv_spp

    rgb = final_img("image", 10)
    aov = ((final_img("image_alb", 16), final_img("image_nrm", 19))
           if cfg.aov else None)
    # 5th slot = kernel-launch count (render_subframe routes it to
    # RenderStats.pool_iters for megakernel tracers)
    return rgb, aov, s["n_rad"], s["n_shad"].astype(jnp.int32), s["iter"]


def render_pixels(
    scene: Scene,
    cfg: RenderConfig,
    cam: CameraParams,
    tracer,
    pixel_idx,
    subframe_index,
):
    """Path-trace an arbitrary flat list of pixel indices.

    The distributed entry point: each device of a mesh calls this on its own
    pixel shard (parallel/dist.py). Pads to the ray-block size internally.
    Returns (rgb [N,3], radiance_ray_count, shadow_ray_count).

    cfg.integrator selects the execution schedule: "wave" (per-block bounce
    loops, reference-ordered accumulation, bit-reproducible layout used by
    golden tests) or "pool" (persistent ray pool, ~100% lane occupancy, the
    fast path — identical per-path arithmetic, float-order-different sums).
    """
    from ..trace.pallas_shade import ExternalPipeline, FusedPipeline
    from .walkpool import WalkPoolPipeline, _render_pipepool, _render_walkpool

    if isinstance(tracer, WalkPoolPipeline):
        if cfg.integrator != "pool":
            raise ValueError("WalkPoolPipeline requires cfg.integrator='pool'")
        paths = cfg.pool_paths or 2
        if paths >= 2:
            return _render_pipepool(scene, cfg, cam, tracer, pixel_idx,
                                    subframe_index, paths=paths)
        return _render_walkpool(scene, cfg, cam, tracer, pixel_idx,
                                subframe_index)
    if isinstance(tracer, (FusedPipeline, ExternalPipeline)):
        if cfg.integrator != "pool":
            raise ValueError("FusedPipeline requires cfg.integrator='pool'")
        pool = min(cfg.ray_block,
                   _next_pow2(pixel_idx.shape[0] * cfg.samples_per_launch))
        if pool % 256:
            raise ValueError("fused pipeline needs a pool multiple of 256")
        return _render_pool_fused(scene, cfg, cam, pixel_idx,
                                  subframe_index, fused=tracer)
    if tracer is None:
        tracer = make_bruteforce_tracer(scene, chunk=cfg.tri_chunk)
    if cfg.integrator == "pool":
        return _render_pool(scene, cfg, cam, tracer, pixel_idx, subframe_index)
    n_pixels = pixel_idx.shape[0]
    block = min(cfg.ray_block, _next_pow2(n_pixels))
    n_padded = -(-n_pixels // block) * block
    idx_padded = jnp.concatenate(
        [pixel_idx, jnp.full((n_padded - n_pixels,), -1, jnp.int32)]
    ).reshape(-1, block)

    def per_block(idx):
        return _trace_block(scene, cfg, cam, tracer, idx, subframe_index)

    rgb_blocks, aov_blocks, n_rad, n_shad, _rounds = jax.lax.map(
        per_block, idx_padded)
    rgb = rgb_blocks.reshape(-1, 3)[:n_pixels]
    aov = (
        tuple(a.reshape(-1, 3)[:n_pixels] for a in aov_blocks)
        if cfg.aov else None
    )
    return rgb, aov, jnp.sum(n_rad), jnp.sum(n_shad), jnp.zeros((), jnp.int32)


def render_subframe(
    scene: Scene,
    cam: CameraParams,
    film: Film,
    cfg: RenderConfig,
    tracer=None,
):
    """Render one progressive subframe and fold it into the film.

    Equivalent of launchSubframe + the raygen accumulation
    (src/wavefront.cpp:203-222, raygen.cu:75-86). Returns (film, stats).
    """
    if tracer is None:
        # default to the PRODUCTION ladder on TPU (fused/walk-pool
        # pipelines; choose_tracer returns (scene, None) on CPU, where
        # golden tests rely on the brute path). The brute [R, F] sweep at
        # the default 65536-lane wavefront FAULTS the TPU worker on
        # ~50k-face scenes (reproduced r5), so raw render_frame calls
        # must not land there on big scenes.
        from ..trace.auto import choose_tracer

        # make_render_fn jits this body: keep the host-side table builds
        # concrete (the scene is a captured constant; see refill_shader)
        with jax.ensure_compile_time_eval():
            scene2, auto = choose_tracer(scene, cfg)
        if auto is not None:
            scene, tracer = scene2, auto
        else:
            tracer = make_bruteforce_tracer(scene, chunk=cfg.tri_chunk)

    n_pixels = cfg.width * cfg.height
    pixel_idx = jnp.arange(n_pixels, dtype=jnp.int32)
    rgb, aov, n_rad, n_shad, n_round = render_pixels(
        scene, cfg, cam, tracer, pixel_idx, film.subframe_index
    )
    rgb = rgb.reshape(cfg.height, cfg.width, 3)
    film = film_accumulate(film, rgb, aov=aov)
    from ..trace.pallas_shade import ExternalPipeline, FusedPipeline

    if isinstance(tracer, (FusedPipeline, ExternalPipeline)):
        stats = RenderStats(radiance_rays=n_rad, shadow_rays=n_shad,
                            pool_iters=n_round)
    else:
        stats = RenderStats(radiance_rays=n_rad, shadow_rays=n_shad,
                            walk_rounds=n_round)
    return film, stats


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def make_render_fn(scene: Scene, cfg: RenderConfig, tracer=None) -> Callable:
    """jit-compiled subframe step with film donation: the accumulator stays
    in HBM across subframes (the reference's async param upload + persistent
    accum buffer, cuda_scene.h:172-178)."""

    def step(cam: CameraParams, film: Film):
        return render_subframe(scene, cam, film, cfg, tracer=tracer)

    return jax.jit(step, donate_argnames=("film",))


def render_frame(
    scene: Scene,
    camera_params: CameraParams,
    cfg: RenderConfig,
    subframes: int = 1,
    film: Optional[Film] = None,
    tracer=None,
):
    """Offline progressive render of `subframes` launches. Returns
    (film, total_stats)."""
    from ..film.film import film_create

    step = make_render_fn(scene, cfg, tracer=tracer)
    if film is None:
        film = film_create(cfg.height, cfg.width, aov=cfg.aov)
    total_rad = 0
    total_shad = 0
    for _ in range(subframes):
        film, stats = step(camera_params, film)
        total_rad += int(stats.radiance_rays)
        total_shad += int(stats.shadow_rays)
    return film, RenderStats(
        radiance_rays=jnp.asarray(total_rad), shadow_rays=jnp.asarray(total_shad)
    )
