"""Fused shade + NEE + shadow-trace + Russian-roulette Pallas kernel.

One kernel performs everything between two closest-hit traces of the pool
integrator: attribute interpolation, Lambertian BSDF sampling, next-event
estimation with the uniform light sampler, the occlusion sweep, progressive
contribution, and RR termination — the body of __closesthit__radiance plus
the raygen bookkeeping (closehit_radiance.cu:60-160, raygen.cu:48-72)
compiled as a single fused program instead of ~40 XLA fusions.

TPU-native tricks:
  * per-lane attribute fetch is a ONE-HOT MATMUL: onehot(prim) [RT, F] @
    attribute table [F, 16] on the MXU — the fast "gather" for tables that
    fit VMEM (F <= ~2048);
  * the light row is fetched the same way ([RT, L] @ [L, 16]);
  * the RNG is the reference's LCG advanced in-kernel on uint32 columns
    (identical streams to the XLA path, including masked draws);
  * the shadow probe sweeps the same VMEM-resident triangle soup as the
    closest kernel (any-hit with per-lane light distance as tmax).

Gated fast path: <=2 motion keys, uniform/power light sampler, reference
throughput model, constant background, <= MAX_ONEHOT_FACES faces. Covered
in-kernel: the full 4-type material dispatch, diffuse textures for atlases
within MAX_ATLAS_TEXELS (the bilinear fetch is a two-stage one-hot gather
on the MXU, see _tex_fetch), uv transforms, tangent-space normal maps, and
first-hit AOV accumulation. Roughness/emissive maps, env maps, and larger
scenes fall back to the general XLA shading path (integrate/path.py) —
same results, more kernels.

Table layouts (VMEM, lane-friendly):
  attr   [16, F] f32 : rows n0.xyz n1.xyz n2.xyz emission.xyz diffuse.xyz pad
  lights [16, Lp] f32: rows v0.xyz v1.xyz v2.xyz emission.xyz normal.xyz area
  misc [R, 16] f32 (same layout in and out — the pool's packed per-lane
  state, round-tripped through the kernel with all post-shade updates
  applied in-kernel):
    0 seed(bits) | 1-3 atten | 4-6 last_atten | 7 prev_delta | 8 depth
    | 9 alive | 10-12 acc | 13 pixel | 14 samp | 15 want_shadow (out only)
  rays_out [R, 8] f32: new org/dir + tmin/tmax for the next bounce
"""
from __future__ import annotations

import functools
import math
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_mt import (RAY_TILE, SUPER_TILE, TRI_TILE, _culled_sweep,
                        _inv_cols, _mt_test_cols, _mt_test_motion,
                        motion_union_aabbs)

_INV_PI = 1.0 / math.pi
_LCG_A = 1664525
_LCG_C = 1013904223
_INV_2_24 = 1.0 / float(1 << 24)
MAX_ONEHOT_FACES = 2048


def attr_params_base(textured: bool, uv_xform: bool,
                     normal_maps: bool) -> int:
    """First material-parameter row in the attr table (mirrors
    build_shade_tables' layout arithmetic)."""
    if not textured:
        return 16
    base = 29 if uv_xform else 23
    return base + (4 if normal_maps else 0)


def build_shade_tables(scene, textured: bool = False,
                       dispatch: bool = False, f_limit: int | None = None,
                       uv_xform: bool = False, normal_maps: bool = False):
    """(attr_t [H,F], lights_t [24,Lp]) — transposed so the one-hot fetch
    yields lanes-major rows (see module doc).

    f_limit: truncate the face axis to the traced soup's padded width (hit
    prim ids never exceed it), shrinking the per-ray attr one-hot matmul's
    K — 4x for a Cornell whose 128-wide soup sits in a 512-padded scene.

    Attr rows 0-15: n0 n1 n2 emission diffuse pad. Textured scenes append
    rows 16-21 = uv0.xy uv1.xy uv2.xy, 22 = diffuse texture id. Dispatch
    (non-all-diffuse) scenes append 6 material-parameter rows at
    `params_base` = 23 (textured) or 16: mtype roughness metallic ior
    transmittance sheen. Lights row 16 = per-light power-pick probability
    (the CDF difference consumed by the power sampler)."""
    g = scene.geom
    f = g.mat_id.shape[0]
    if f_limit is not None:
        f = min(f, f_limit)
    mat_id = np.asarray(g.mat_id)[:f]
    emission = np.asarray(scene.materials.emission)[mat_id]
    diffuse = np.asarray(scene.materials.diffuse)[mat_id]
    nmap_base = (29 if uv_xform else 23) if textured else 16
    params_base = attr_params_base(textured, uv_xform, normal_maps)
    height = (params_base + 6 if dispatch
              else (params_base + 1 if textured else 16))
    height = -(-height // 8) * 8
    attr = np.zeros((f, height), np.float32)
    attr[:, 0:3] = np.asarray(g.n0[0])[:f]
    attr[:, 3:6] = np.asarray(g.n1[0])[:f]
    attr[:, 6:9] = np.asarray(g.n2[0])[:f]
    attr[:, 9:12] = emission
    attr[:, 12:15] = diffuse
    if textured:
        attr[:, 16:18] = np.asarray(g.uv0)[:f]
        attr[:, 18:20] = np.asarray(g.uv1)[:f]
        attr[:, 20:22] = np.asarray(g.uv2)[:f]
        attr[:, 22] = np.asarray(scene.materials.diffuse_tex)[mat_id]
        if uv_xform:
            # per-material uv transform rows (m00 m01 m10 m11 ox oy),
            # applied in-kernel AFTER interpolation in the exact
            # integrate/path.py op order for bit parity
            attr[:, 23:29] = np.asarray(scene.materials.uv_xform)[mat_id]
        if normal_maps:
            # per-face raw tangent from the uv parameterization
            # (path.py:125-136: tang = e1*duv2.y - e2*duv1.y, world space)
            # + the material's normal-texture id
            duv1 = (np.asarray(g.uv1) - np.asarray(g.uv0))[:f]
            duv2 = (np.asarray(g.uv2) - np.asarray(g.uv0))[:f]
            tang = (np.asarray(g.e1[0])[:f] * duv2[:, 1:2]
                    - np.asarray(g.e2[0])[:f] * duv1[:, 1:2])
            attr[:, nmap_base:nmap_base + 3] = tang
            attr[:, nmap_base + 3] = np.asarray(
                scene.materials.normal_tex)[mat_id]
    if dispatch:
        m = scene.materials
        attr[:, params_base + 0] = np.asarray(m.mtype)[mat_id]
        attr[:, params_base + 1] = np.asarray(m.roughness)[mat_id]
        attr[:, params_base + 2] = np.asarray(m.metallic)[mat_id]
        attr[:, params_base + 3] = np.asarray(m.ior)[mat_id]
        attr[:, params_base + 4] = np.asarray(m.transmittance)[mat_id]
        attr[:, params_base + 5] = np.asarray(m.sheen)[mat_id]

    lt = scene.lights
    n_l = max(scene.num_lights, 1)
    lp = -(-n_l // 8) * 8
    lights = np.zeros((lp, 24), np.float32)
    lights[:n_l, 0:3] = np.asarray(lt.v0)[:n_l]
    lights[:n_l, 3:6] = np.asarray(lt.v1)[:n_l]
    lights[:n_l, 6:9] = np.asarray(lt.v2)[:n_l]
    lights[:n_l, 9:12] = np.asarray(lt.emission)[:n_l]
    lights[:n_l, 12:15] = np.asarray(lt.normal)[:n_l]
    lights[:n_l, 15] = np.asarray(lt.area)[:n_l]
    # f32 arithmetic end-to-end: pick_light_power subtracts f32 CDF values,
    # so the baked per-light pick probability must round identically
    cdf = np.asarray(lt.power_cdf, np.float32)[:n_l]
    prev = np.concatenate([np.zeros(1, np.float32), cdf[:-1]])
    lights[:n_l, 16] = cdf - prev
    return (jnp.asarray(np.ascontiguousarray(attr.T)),
            jnp.asarray(np.ascontiguousarray(lights.T)))


MAX_ATLAS_TEXELS = 1 << 15  # quad_t VMEM budget (~1.5 MB at 32k texels)


def build_texture_tables(atlas):
    """(quad_t [12*AW, AH], meta_t [8, T]) for the in-kernel bilinear fetch.

    quad_t row layout: sublane = c * AW + x for component c of the 2x2
    footprint (rgb00 rgb01 rgb10 rgb11), so one onehot-row matmul + a
    lane-modulus column select implements the gather (see _tex_fetch)."""
    quad = np.asarray(atlas.quad, np.float32)  # [AH*AW, 12]
    ah, aw = atlas.data.shape[:2]
    quad_t = (quad.reshape(ah, aw, 12).transpose(2, 1, 0)
              .reshape(12 * aw, ah))
    meta = np.asarray(atlas.meta, np.float32)  # [T, 6]
    t = meta.shape[0]
    meta_t = np.zeros((8, t), np.float32)
    meta_t[:6] = meta.T
    return (jnp.asarray(np.ascontiguousarray(quad_t)),
            jnp.asarray(meta_t))


def _rnd(state_f):
    """One LCG draw on a uint32-bits column carried as f32 bitcast.
    Returns (new_state_f, uniform [RT,1] f32)."""
    s = pltpu.bitcast(state_f, jnp.uint32)
    s = jnp.uint32(_LCG_A) * s + jnp.uint32(_LCG_C)
    # Mosaic lacks uint32->f32 casts; the masked 24-bit value fits int32
    bits = pltpu.bitcast(s & jnp.uint32(0x00FFFFFF), jnp.int32)
    u = bits.astype(jnp.float32) * _INV_2_24
    return pltpu.bitcast(s, jnp.float32), u


def _rnd_masked(state_f, mask):
    new_f, u = _rnd(state_f)
    return jnp.where(mask, new_f, state_f), u


def _onehot_fetch_t(id_row, table_t_ref):
    """[1, RT] float ids -> [16, RT] field rows via one-hot matmul on the
    MXU against a TRANSPOSED table [16, N] — results land lanes-major so
    all downstream shading math runs at full 128-lane width."""
    n = table_t_ref.shape[1]
    rt = id_row.shape[1]
    ids = jax.lax.broadcasted_iota(jnp.int32, (n, rt), 0).astype(jnp.float32)
    onehot = (ids == id_row).astype(jnp.float32)  # [N, RT]
    # HIGHEST precision: the default MXU f32 path truncates the table
    # values toward bf16, which perturbs normals/albedo enough to bias RR
    return jnp.dot(table_t_ref[:], onehot, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _normalize3(x, y, z, eps=1e-20):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, eps))
    return x * inv, y * inv, z * inv, inv


def _wrap_axis(c, size, mode):
    """Base texel index + frac along one axis (scene/texture.py
    _wrap_footprint semantics) on [1, RT] f32 rows; mode 0/1/2 as float."""
    cm = jnp.where(mode == 2.0, 1.0 - jnp.abs(jnp.mod(c, 2.0) - 1.0), c)
    repeat = mode == 0.0
    cc = jnp.where(repeat, cm - jnp.floor(cm), cm)
    sc = cc * size - 0.5
    sc = jnp.where(repeat, sc, jnp.clip(sc, 0.0, size - 1.0))
    i0 = jnp.floor(sc)
    frac = sc - i0
    i0 = jnp.where(repeat, jnp.mod(i0, size), i0)
    return i0, frac


def _tex_fetch(u, v, tid, meta_ref, quad_ref, ah, aw):
    """Per-lane wrap-mode bilinear fetch from the single-gather quad table.

    The TPU "texture unit": a [12*AW, AH] table row-gathered by one-hot
    matmul on the MXU (y select), then a lane-modulus mask + block-sum
    matmul (x select). Cost 2*RT*AH*12*AW flops at MXU rate per fetch —
    ~1-3 us/tile for atlases within MAX_ATLAS_TEXELS.

    u, v, tid: [1, RT] f32 rows. Returns rgb as three [1, RT] rows (black
    where tid < 0, matching sample_texture_bilinear).
    """
    rt = u.shape[1]
    m = _onehot_fetch_t(jnp.maximum(tid, 0.0), meta_ref)  # [8, RT]
    y0, x0 = m[0:1], m[1:2]
    th, tw = m[2:3], m[3:4]
    wt_m, ws_m = m[5:6], m[4:5]
    iu0, fu = _wrap_axis(u, tw, ws_m)
    iv0, fv = _wrap_axis(v, th, wt_m)
    yy = y0 + iv0  # exact small ints in f32
    xx = x0 + iu0

    y_iota = jax.lax.broadcasted_iota(jnp.int32, (ah, rt), 0)
    onehot_y = (y_iota.astype(jnp.float32) == yy).astype(jnp.float32)
    # y-select: [12*AW, AH] @ [AH, RT]. HIGHEST keeps the f32 texel values
    # exact (one-hot weights are exact in every bf16 pass).
    mid = jnp.dot(quad_ref[:], onehot_y,
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)  # [12*AW, RT]
    lane12 = jax.lax.broadcasted_iota(jnp.int32, (12 * aw, rt), 0)
    x_mask = ((lane12 % aw).astype(jnp.float32) == xx).astype(jnp.float32)
    q = jnp.sum((mid * x_mask).reshape(12, aw, rt), axis=1)  # [12, RT]

    inv_fu = 1.0 - fu
    inv_fv = 1.0 - fv
    rgb = []
    for c in range(3):
        rgb.append(
            q[c:c + 1] * inv_fu * inv_fv
            + q[3 + c:4 + c] * fu * inv_fv
            + q[6 + c:7 + c] * inv_fu * fv
            + q[9 + c:10 + c] * fu * fv
        )
    present = tid >= 0.0
    return [jnp.where(present, ch, 0.0) for ch in rgb]


def _make_shade_kernel(n_tiles_static, num_lights, bg, shadow_tmin,
                       shadow_eps, max_depth, textured=False, ah=0, aw=0,
                       dispatch=False, params_base=16, power_cdf=None,
                       motion=False, closest_in_kernel=False, aov=False,
                       uv_xform=False, nmap_base=0, normal_maps=False,
                       external=False, inst_base=0, t_misc=False,
                       pre_tex=False, pre_base=0, refill_cfg=None):
    """power_cdf: static tuple of per-light CDF values enables the power
    light sampler (in-kernel searchsorted as an unrolled compare-sum);
    None = uniform pick. dispatch: full 4-type material dispatch
    (integrate/bsdf.py semantics) instead of the reference Lambertian.
    motion: 2-key scenes — the shadow sweep lerps triangles to the
    per-ray occlusion time (the seed-fork peek, closehit_radiance.cu:123);
    shading attributes stay key 0 like the SBT pointers.

    The kernel is the pool integrator's whole post-trace stage: it consumes
    the packed per-lane state (MISC_LAYOUT below) and emits the COMPLETE
    next-iteration state — accumulation, depth, aliveness, and RR all
    resolve in-kernel, so the XLA loop body keeps only refill + flush
    (integrate/path.py _render_pool_fused).

    closest_in_kernel: the MEGAKERNEL variant — the closest-hit sweep runs
    in-kernel over the same VMEM-resident soup before shading (no hit_ref
    input, no [R, 4] HBM round trip, one launch per pool iteration).
    Static scenes only; motion keeps the two-kernel split.

    aov: the misc blob widens to 24 columns; 16-18/19-21 carry first-hit
    albedo/shading-normal accumulators (integrate/path.py _shade_and_nee's
    sh_albedo/sh_normal at depth 0), feeding film/denoise.py's guides."""
    bgx, bgy, bgz = (float(b) for b in bg)
    _E7 = 1e-7

    def kernel(count_ref, *rest):
        rest = list(rest)
        if refill_cfg is not None:
            # in-kernel refill scalars: sci = (next_work, pixel_base,
            # subframe_index, pad) i32; scf = (eye, u, v, w) f32 rows
            sci_ref = rest.pop(0)
            scf_ref = rest.pop(0)
        rays_ref = rest.pop(0)
        time_ref = rest.pop(0) if (closest_in_kernel and motion) else None
        hit_ref = None if closest_in_kernel else rest.pop(0)
        misc_ref = rest.pop(0)
        stash_ref = (rest.pop(0)
                     if refill_cfg is not None and refill_cfg["use_stash"]
                     else None)
        if external:
            # external mode: the soup never enters the kernel — closest
            # and the shadow occlusion run OUTSIDE (any tracer backend);
            # attrs arrive pre-gathered per ray, shadow rays exit
            tris_ref = tris1_ref = aabb_ref = super_ref = None
        else:
            tris_ref = rest.pop(0)
            tris1_ref = rest.pop(0) if motion else None
            aabb_ref = rest.pop(0)
            super_ref = rest.pop(0)
        attr_ref = rest.pop(0)
        lights_ref = rest.pop(0)
        if textured and not pre_tex:
            quad_ref = rest.pop(0)
            meta_ref = rest.pop(0)
        time_out = None
        if refill_cfg is not None:
            scr_ref = rest.pop()     # SMEM scratch rides after the outputs
            stats_out = rest.pop()
            if motion:
                time_out = rest.pop()
            stash_out = rest.pop() if refill_cfg["use_stash"] else None
            rays_out, misc_out = rest
        elif external:
            rays_out, misc_out, shadow_out = rest
        else:
            rays_out, misc_out = rest
        i = pl.program_id(0)
        rt = rays_ref.shape[0]
        live_tile = i * RAY_TILE < count_ref[0]

        if closest_in_kernel:
            # --- in-kernel closest sweep (the _closest_kernel body) ---
            ccols = tuple(rays_ref[:, c:c + 1] for c in range(8))
            cinv = _inv_cols(ccols[3], ccols[4], ccols[5])
            cinit = (
                ccols[7],                                # best_t = tmax
                jnp.full((rt, 1), -1.0, jnp.float32),    # best_prim
                jnp.zeros((rt, 1), jnp.float32),
                jnp.zeros((rt, 1), jnp.float32),
            )

            if motion:
                tcol_c = time_ref[:, 0:1]

            def c_tile(k, carry):
                best_t, best_prim, best_u, best_v = carry
                if motion:
                    # per-ray time-lerped triangles (2-key motion; the
                    # union cull boxes cover both keys)
                    t, u, v, hit, prim_f = _mt_test_motion(
                        ccols[:7] + (best_t,), tcol_c, tris_ref[k],
                        tris1_ref[k], jnp.int32(k * tris_ref.shape[2])
                    )
                else:
                    t, u, v, hit, prim_f = _mt_test_cols(
                        ccols[:7] + (best_t,), tris_ref[k],
                        jnp.int32(k * tris_ref.shape[2])
                    )
                t = jnp.where(hit, t, 1e30)
                t_c = jnp.min(t, axis=1, keepdims=True)
                at_min = t <= t_c
                prim_cc = jnp.min(jnp.where(at_min, prim_f, 1e30), axis=1,
                                  keepdims=True)
                one = at_min & (prim_f == prim_cc)
                u_c = jnp.sum(jnp.where(one, u, 0.0), axis=1, keepdims=True)
                v_c = jnp.sum(jnp.where(one, v, 0.0), axis=1, keepdims=True)
                better = t_c < best_t
                return (
                    jnp.where(better, t_c, best_t),
                    jnp.where(better, prim_cc, best_prim),
                    jnp.where(better, u_c, best_u),
                    jnp.where(better, v_c, best_v),
                )

            cb_t, cb_prim, cb_u, cb_v = _culled_sweep(
                aabb_ref, super_ref, n_tiles_static, ccols[0:3], cinv,
                ccols[6], lambda c: c[0], c_tile, cinit, live_tile,
            )
            # miss lanes keep best_t == tmax (the sweep's init), matching
            # trace_closest_mt_raw's raw output exactly
            hit4_cols = jnp.concatenate([cb_t, cb_prim, cb_u, cb_v], axis=1)

        # Lanes-major shading: transpose per-lane state to [C, RT] so every
        # elementwise op runs on [1, RT] rows at full 128-lane width (the
        # [RT, 1] column form wastes 127/128 lanes per op). The MT sweep
        # keeps its rays-in-sublanes layout via one transpose at the
        # boundary.
        rays_t = jnp.transpose(rays_ref[:], (1, 0))   # [8, RT]
        if closest_in_kernel:
            hit_t = jnp.transpose(hit4_cols, (1, 0))  # [4, RT]
        else:
            hit_t = jnp.transpose(hit_ref[:], (1, 0))
        # t_misc (external only): misc arrives/leaves C-major [C, RT] so
        # the walk-pool boundary's per-column reads/writes are dense
        # sublane slices instead of lane-strided [W, C] column extracts
        # (measured 70us per boundary at W=8192 for the 19-column shred)
        misc_t = (misc_ref[:] if t_misc
                  else jnp.transpose(misc_ref[:], (1, 0)))  # [16, RT]

        def row(m, c):
            return m[c:c + 1, :]

        ox, oy, oz = row(rays_t, 0), row(rays_t, 1), row(rays_t, 2)
        dx, dy, dz = row(rays_t, 3), row(rays_t, 4), row(rays_t, 5)
        t_hit = row(hit_t, 0)
        prim_f = row(hit_t, 1)
        bu = row(hit_t, 2)
        bv = row(hit_t, 3)
        seed = row(misc_t, 0)
        atten = [row(misc_t, c) for c in (1, 2, 3)]
        last_at = [row(misc_t, c) for c in (4, 5, 6)]
        prev_delta = row(misc_t, 7)
        depth = row(misc_t, 8)
        alive = row(misc_t, 9) > 0.0
        acc = [row(misc_t, c) for c in (10, 11, 12)]
        # emission collects at depth 0 and after delta chains
        emit_gate = jnp.where((depth == 0.0) | (prev_delta > 0.0), 1.0, 0.0)

        is_hit = prim_f >= 0.0
        prim_c = jnp.maximum(prim_f, 0.0)

        # --- attribute fetch: transposed one-hot matmul -> [16, RT], or
        # (external) the pre-gathered per-ray attr block as-is ---
        a = attr_ref[:, :] if external else _onehot_fetch_t(prim_c, attr_ref)
        w0 = 1.0 - bu - bv
        ngx = w0 * row(a, 0) + bu * row(a, 3) + bv * row(a, 6)
        ngy = w0 * row(a, 1) + bu * row(a, 4) + bv * row(a, 7)
        ngz = w0 * row(a, 2) + bu * row(a, 5) + bv * row(a, 8)
        ngx, ngy, ngz, _ = _normalize3(ngx, ngy, ngz)
        if inst_base:
            # two-level AS: object-space normal -> world via the instance
            # inverse-transpose (9 extra pre-gathered attr rows; identity
            # substituted XLA-side for missing instances). Same op order as
            # path.py:103-107: normalize-interp, transform, re-normalize.
            nx2 = (row(a, inst_base + 0) * ngx + row(a, inst_base + 1) * ngy
                   + row(a, inst_base + 2) * ngz)
            ny2 = (row(a, inst_base + 3) * ngx + row(a, inst_base + 4) * ngy
                   + row(a, inst_base + 5) * ngz)
            nz2 = (row(a, inst_base + 6) * ngx + row(a, inst_base + 7) * ngy
                   + row(a, inst_base + 8) * ngz)
            ngx, ngy, ngz, _ = _normalize3(nx2, ny2, nz2)
        if textured:
            tid = row(a, 22)
            if not pre_tex:
                tu = w0 * row(a, 16) + bu * row(a, 18) + bv * row(a, 20)
                tv = w0 * row(a, 17) + bu * row(a, 19) + bv * row(a, 21)
                if uv_xform:
                    # uv' = offset + M @ uv (MaterialData.h texture desc /
                    # KHR_texture_transform), op order as path.py:113-115
                    tu2 = row(a, 23) * tu + row(a, 24) * tv + row(a, 27)
                    tv2 = row(a, 25) * tu + row(a, 26) * tv + row(a, 28)
                    tu, tv = tu2, tv2
        if normal_maps:
            # tangent-space normal mapping on the interpolated normal,
            # pre-faceforward (path.py:116-148 order; raw tangents baked
            # per face, Gram-Schmidt against ng in-kernel)
            ntex = row(a, nmap_base + 3)
            if pre_tex:
                # pre-sampled normal-map texel rows (tex fetch ran outside
                # the kernel over the gathered attrs — see make_tex_presampler)
                n_rgb = [row(a, pre_base + 3 + c) for c in range(3)]
            else:
                n_rgb = _tex_fetch(tu, tv, ntex, meta_ref, quad_ref, ah, aw)
            ntsx = n_rgb[0] * 2.0 - 1.0
            ntsy = n_rgb[1] * 2.0 - 1.0
            ntsz = n_rgb[2] * 2.0 - 1.0
            tgx = row(a, nmap_base + 0)
            tgy = row(a, nmap_base + 1)
            tgz = row(a, nmap_base + 2)
            if inst_base:
                # two-level AS: the baked raw tangent is object-space;
                # push it through the instance's forward linear part
                # (9 rows after the inverse-transpose block) BEFORE the
                # Gram-Schmidt against the world ng — path.py:129-136
                # order; exact because the tangent is linear in the edges
                tx2 = (row(a, inst_base + 9) * tgx
                       + row(a, inst_base + 10) * tgy
                       + row(a, inst_base + 11) * tgz)
                ty2 = (row(a, inst_base + 12) * tgx
                       + row(a, inst_base + 13) * tgy
                       + row(a, inst_base + 14) * tgz)
                tz2 = (row(a, inst_base + 15) * tgx
                       + row(a, inst_base + 16) * tgy
                       + row(a, inst_base + 17) * tgz)
                tgx, tgy, tgz = tx2, ty2, tz2
            d_tn = tgx * ngx + tgy * ngy + tgz * ngz
            tgx = tgx - ngx * d_tn
            tgy = tgy - ngy * d_tn
            tgz = tgz - ngz * d_tn
            tgx, tgy, tgz, _ = _normalize3(tgx, tgy, tgz, eps=1e-12)
            btx = ngy * tgz - ngz * tgy
            bty = ngz * tgx - ngx * tgz
            btz = ngx * tgy - ngy * tgx
            mgx = ntsx * tgx + ntsy * btx + ntsz * ngx
            mgy = ntsx * tgy + ntsy * bty + ntsz * ngy
            mgz = ntsx * tgz + ntsy * btz + ntsz * ngz
            mgx, mgy, mgz, _ = _normalize3(mgx, mgy, mgz, eps=1e-12)
            has_nm = ntex >= 0.0
            ngx = jnp.where(has_nm, mgx, ngx)
            ngy = jnp.where(has_nm, mgy, ngy)
            ngz = jnp.where(has_nm, mgz, ngz)
        # faceforward onto the -d hemisphere
        side = jnp.where(-(dx * ngx + dy * ngy + dz * ngz) >= 0.0, 1.0, -1.0)
        nsx, nsy, nsz = ngx * side, ngy * side, ngz * side
        px = ox + t_hit * dx
        py = oy + t_hit * dy
        pz = oz + t_hit * dz
        hit_f = is_hit.astype(jnp.float32)
        emitted = [row(a, 9 + c) * emit_gate * hit_f for c in range(3)]
        albedo = [row(a, 12 + c) for c in range(3)]
        if textured:
            if pre_tex:
                tex_rgb = [row(a, pre_base + c) for c in range(3)]
            else:
                tex_rgb = _tex_fetch(tu, tv, tid, meta_ref, quad_ref, ah, aw)
            present = tid >= 0.0
            albedo = [jnp.where(present, tex_rgb[c], albedo[c])
                      for c in range(3)]

        # --- BSDF sample (cosine hemisphere; reference draw order) ---
        adv = is_hit & alive  # dead lanes' seeds/state pass through
        seed, _z1 = _rnd_masked(seed, adv)
        seed, _z2 = _rnd_masked(seed, adv)
        seed, u1 = _rnd_masked(seed, adv)
        seed, u2 = _rnd_masked(seed, adv)
        r = jnp.sqrt(u1)
        phi = (2.0 * math.pi) * u2
        wx = r * jnp.cos(phi)
        wy = r * jnp.sin(phi)
        wz = jnp.sqrt(jnp.maximum(1.0 - wx * wx - wy * wy, 0.0))
        # ONB about ns (shader_common.h:15-48 branch as a select)
        use_x = jnp.abs(nsx) > jnp.abs(nsz)
        bx0 = jnp.where(use_x, -nsy, 0.0)
        by0 = jnp.where(use_x, nsx, -nsz)
        bz0 = jnp.where(use_x, 0.0, nsy)
        bx0, by0, bz0, _ = _normalize3(bx0, by0, bz0)
        txx = by0 * nsz - bz0 * nsy
        txy = bz0 * nsx - bx0 * nsz
        txz = bx0 * nsy - by0 * nsx
        if not dispatch:
            # reference Lambertian: attenuation = albedo*(1/pi)/(cos/pi)
            wix, wiy, wiz = wx, wy, wz
            inv_cos = 1.0 / jnp.maximum(wz * _INV_PI, 1e-12) * _INV_PI
            at_fac = [albedo[c] * inv_cos for c in range(3)]
            is_delta = jnp.zeros_like(wz) > 1.0  # all false
        else:
            # --- full material dispatch (integrate/bsdf.py, lanes-major) ---
            pb = params_base
            mt_r = row(a, pb + 0)
            rough = row(a, pb + 1)
            metal = row(a, pb + 2)
            ior = row(a, pb + 3)
            transm = row(a, pb + 4)
            sheen_r = row(a, pb + 5)
            is_spec = mt_r == 1.0   # MaterialType.SPECULAR
            is_glass = mt_r == 2.0  # FRESNEL_TRANSMISSIVE
            is_prin = mt_r == 3.0   # PRINCIPLED
            is_diff = ~(is_spec | is_glass | is_prin)
            is_delta = is_spec | is_glass

            # wo = -d in the (t, b, n) local frame
            wox = -(dx * txx + dy * txy + dz * txz)
            woy = -(dx * bx0 + dy * by0 + dz * bz0)
            woz = -(dx * nsx + dy * nsy + dz * nsz)
            cos_o = jnp.maximum(woz, _E7)

            alpha = jnp.maximum(rough * rough, 1e-4)
            a2 = alpha * alpha
            r0 = (ior - 1.0) / (ior + 1.0)
            f0d = r0 * r0
            f0 = [f0d * (1.0 - metal) + albedo[c] * metal for c in range(3)]
            spec_w = 0.30 * f0[0] + 0.59 * f0[1] + 0.11 * f0[2]
            diff_w = (0.30 * albedo[0] + 0.59 * albedo[1]
                      + 0.11 * albedo[2]) * (1.0 - metal)
            p_spec = jnp.clip(
                spec_w / jnp.maximum(spec_w + diff_w, 1e-9), 0.05, 0.98
            )

            def smith_g1(cos_v):
                c2 = jnp.clip(cos_v * cos_v, 1e-12, 1.0)
                return 2.0 / (1.0 + jnp.sqrt(1.0 + a2 * (1.0 - c2) / c2))

            def prin_eval(wix_l, wiy_l, wiz_l):
                """(f rgb rows, pdf row) — _principled_eval_local."""
                cos_i = wiz_l
                valid = (cos_i > _E7) & (woz > _E7)
                hx, hy, hz, _ = _normalize3(wox + wix_l, woy + wiy_l,
                                            woz + wiz_l, eps=1e-20)
                cos_h = hz
                cos_oh = wox * hx + woy * hy + woz * hz
                denom = cos_h * cos_h * (a2 - 1.0) + 1.0
                d_g = a2 / jnp.maximum(math.pi * denom * denom, 1e-12)
                g_sm = smith_g1(cos_i) * smith_g1(woz)
                spec_s = d_g * g_sm / jnp.maximum(4.0 * cos_i * woz, 1e-9)
                swc = jnp.clip(1.0 - jnp.clip(cos_oh, 0.0, 1.0), 0.0, 1.0)
                sw = (swc * swc) * (swc * swc) * swc
                sw_oh_c = jnp.clip(1.0 - cos_oh, 0.0, 1.0)
                sw_oh = (sw_oh_c * sw_oh_c) * (sw_oh_c * sw_oh_c) * sw_oh_c
                f_sheen = sheen_r * sw_oh
                f = [
                    jnp.where(
                        valid,
                        albedo[c] * ((1.0 - metal) * _INV_PI)
                        + (f0[c] + (1.0 - f0[c]) * sw) * spec_s
                        + f_sheen,
                        0.0,
                    )
                    for c in range(3)
                ]
                pdf_spec = (d_g * jnp.maximum(cos_h, 0.0)
                            / jnp.maximum(4.0 * jnp.abs(cos_oh), 1e-12))
                pdf = jnp.where(
                    valid,
                    p_spec * pdf_spec
                    + (1.0 - p_spec) * jnp.maximum(cos_i, 0.0) * _INV_PI,
                    0.0,
                )
                return f, pdf

            # SPECULAR mirror (local)
            mir_x, mir_y, mir_z = -wox, -woy, woz
            # FRESNEL_TRANSMISSIVE (exact dielectric fresnel at cos_o)
            cos_ci = jnp.clip(cos_o, 0.0, 1.0)
            sin2_t = (1.0 - cos_ci * cos_ci) / jnp.maximum(ior * ior, 1e-12)
            tir = sin2_t >= 1.0
            cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
            r_par = (ior * cos_ci - cos_t) / jnp.maximum(
                ior * cos_ci + cos_t, 1e-12)
            r_perp = (cos_ci - ior * cos_t) / jnp.maximum(
                cos_ci + ior * cos_t, 1e-12)
            f_diel = jnp.where(tir, 1.0,
                               0.5 * (r_par * r_par + r_perp * r_perp))
            eta = 1.0 / ior
            sin2_r = eta * eta * jnp.maximum(1.0 - cos_o * cos_o, 0.0)
            cos_rt = jnp.sqrt(jnp.maximum(1.0 - sin2_r, 0.0))
            choose_refl = _z1 < f_diel
            gl_x = jnp.where(choose_refl, mir_x, -eta * wox)
            gl_y = jnp.where(choose_refl, mir_y, -eta * woy)
            gl_z = jnp.where(choose_refl, mir_z, -cos_rt)
            w_glass = [
                jnp.where(choose_refl, 1.0,
                          albedo[c] * transm + (1.0 - transm))
                for c in range(3)
            ]
            # PRINCIPLED one-sample mix (sample_ggx_half(u1, u2, alpha))
            phi_g = (2.0 * math.pi) * u1
            den_g = 1.0 + (a2 - 1.0) * u2
            cos_hg = jnp.sqrt(jnp.clip(
                (1.0 - u2) / jnp.maximum(den_g, 1e-12), 0.0, 1.0))
            sin_hg = jnp.sqrt(jnp.maximum(1.0 - cos_hg * cos_hg, 0.0))
            hgx = sin_hg * jnp.cos(phi_g)
            hgy = sin_hg * jnp.sin(phi_g)
            hgz = cos_hg
            cos_ohg = wox * hgx + woy * hgy + woz * hgz
            sp_x = 2.0 * cos_ohg * hgx - wox
            sp_y = 2.0 * cos_ohg * hgy - woy
            sp_z = 2.0 * cos_ohg * hgz - woz
            take_spec = _z1 < p_spec
            pr_x = jnp.where(take_spec, sp_x, wx)
            pr_y = jnp.where(take_spec, sp_y, wy)
            pr_z = jnp.where(take_spec, sp_z, wz)
            f_pr, pdf_pr = prin_eval(pr_x, pr_y, pr_z)
            w_scale = (jnp.maximum(pr_z, 0.0)
                       / jnp.maximum(pdf_pr, _E7))  # cos/pdf first (XLA order)
            w_prin = [
                jnp.where(pdf_pr > _E7, f_pr[c] * w_scale, 0.0)
                for c in range(3)
            ]

            def pick4(spec_v, glass_v, prin_v, diff_v):
                return jnp.where(
                    is_spec, spec_v,
                    jnp.where(is_glass, glass_v,
                              jnp.where(is_prin, prin_v, diff_v)),
                )

            wix = pick4(mir_x, gl_x, pr_x, wx)
            wiy = pick4(mir_y, gl_y, pr_y, wy)
            wiz = pick4(mir_z, gl_z, pr_z, wz)
            at_fac = [
                pick4(albedo[c], w_glass[c], w_prin[c], albedo[c])
                for c in range(3)
            ]

        ndx = wix * txx + wiy * bx0 + wiz * nsx
        ndy = wix * txy + wiy * by0 + wiz * nsy
        ndz = wix * txz + wiy * bz0 + wiz * nsz

        # --- NEE (uniform light pick; closehit_radiance.cu:117-156) ---
        seed, u_pick = _rnd_masked(seed, adv)
        seed, lu = _rnd_masked(seed, adv)
        seed, lv = _rnd_masked(seed, adv)
        if power_cdf is None:
            lidx = jnp.minimum(
                jnp.floor(u_pick * float(num_lights)), float(num_lights - 1)
            )
        else:
            # power pick: searchsorted(cdf, u, 'right') as an unrolled
            # compare-sum over the STATIC per-scene CDF values
            lidx = jnp.zeros_like(u_pick)
            for c in power_cdf:
                lidx = lidx + (u_pick >= float(c)).astype(jnp.float32)
            lidx = jnp.minimum(lidx, float(num_lights - 1))
        lrow = _onehot_fetch_t(lidx, lights_ref)  # [24, RT]
        su = jnp.sqrt(lu)
        b0 = 1.0 - su
        b1 = lv * su
        b2 = 1.0 - b0 - b1
        lpx = b0 * row(lrow, 0) + b1 * row(lrow, 3) + b2 * row(lrow, 6)
        lpy = b0 * row(lrow, 1) + b1 * row(lrow, 4) + b2 * row(lrow, 7)
        lpz = b0 * row(lrow, 2) + b1 * row(lrow, 5) + b2 * row(lrow, 8)
        lvx, lvy, lvz = lpx - px, lpy - py, lpz - pz
        dist2 = lvx * lvx + lvy * lvy + lvz * lvz
        sdist2 = jnp.maximum(dist2, 1e-20)
        inv_d = jax.lax.rsqrt(sdist2)
        ldist = sdist2 * inv_d
        ldx, ldy, ldz = lvx * inv_d, lvy * inv_d, lvz * inv_d
        cos_l = jnp.abs(
            ldx * row(lrow, 12) + ldy * row(lrow, 13) + ldz * row(lrow, 14)
        )
        omega = cos_l * row(lrow, 15) / sdist2
        degen = (dist2 < 1e-5) | (omega < 1e-5)
        le = [jnp.where(degen, 0.0, row(lrow, 9 + c) * omega)
              for c in range(3)]
        pick_pdf = (row(lrow, 16) if power_cdf is not None
                    else 1.0 / float(num_lights))
        pdf_light = jnp.where(degen, 1.0, 1.0 / jnp.maximum(omega, 1e-20)) \
            * pick_pdf
        n_dl = nsx * ldx + nsy * ldy + nsz * ldz
        want_shadow = adv & (n_dl > 0.0)
        if dispatch:
            want_shadow = want_shadow & ~is_delta

        # --- shadow rays: in-kernel sweep, or handed to the caller ---
        # boundary transpose: the MT sweep wants rays in sublanes
        tmax_s = jnp.where(want_shadow, ldist - shadow_eps, 0.0)
        stmin = jnp.full((1, rt), shadow_tmin, jnp.float32)
        sh_rows = [px, py, pz, ldx, ldy, ldz, stmin, tmax_s]
        if motion:
            # shadow-ray time: peek of the post-NEE stream (the seed fork
            # that never rejoins, closehit_radiance.cu:123-138)
            _, occl_time = _rnd(seed)
            sh_rows.append(occl_time)
        if external and len(sh_rows) < shadow_out.shape[1]:
            sh_rows.append(jnp.zeros(
                (shadow_out.shape[1] - len(sh_rows), rt), jnp.float32))
        sh_mat = jnp.concatenate(sh_rows, axis=0)  # [8|9|16, RT]
        sh_cols = jnp.transpose(sh_mat, (1, 0))  # [RT, 8|9|16]

        if external:
            # occlusion resolves outside: emit the shadow rays; the NEE
            # contribution leaves via extra misc columns, gated by the
            # caller on ~occluded (see ExternalPipeline.trace_shade)
            shadow_out[:, :] = sh_cols
            lit = want_shadow
        else:
            lit = None  # set after the sweep below

        def col(c):
            return sh_cols[:, c:c + 1]

        cols = tuple(col(c) for c in range(8))
        inv_sd = _inv_cols(cols[3], cols[4], cols[5])

        if motion and not external:
            tcol_sh = sh_cols[:, 8:9]

            def mt_tile(k, occ):
                _, _, _, hit, _ = _mt_test_motion(
                    cols, tcol_sh, tris_ref[k], tris1_ref[k],
                    jnp.int32(k * tris_ref.shape[2])
                )
                return jnp.maximum(
                    occ,
                    jnp.max(hit.astype(jnp.float32), axis=1, keepdims=True),
                )
        elif not external:
            def mt_tile(k, occ):
                _, _, _, hit, _ = _mt_test_cols(
                    cols, tris_ref[k],
                    jnp.int32(k * tris_ref.shape[2])
                )
                return jnp.maximum(
                    occ,
                    jnp.max(hit.astype(jnp.float32), axis=1, keepdims=True),
                )

        if not external:
            # compaction gating: tiles past the live count skip the sweep
            live = live_tile
            occ_col = _culled_sweep(
                aabb_ref, super_ref, n_tiles_static, cols[0:3], inv_sd,
                cols[6], lambda c: cols[7], mt_tile,
                jnp.zeros((rt, 1), jnp.float32), live,
            )
            occ = jnp.transpose(occ_col, (1, 0))  # [1, RT]
            lit = want_shadow & (occ < 0.5)

        if not dispatch:
            # weight = albedo/pi * powerHeuristic(pdf_light, |n.l|/pi)
            pdf_sc = jnp.abs(n_dl) * _INV_PI
            ph = (pdf_light * pdf_light) / jnp.maximum(
                pdf_light * pdf_light + pdf_sc * pdf_sc, 1e-20
            )
            radiance = [
                jnp.where(lit, le[c] * albedo[c] * (ph * _INV_PI), 0.0)
                for c in range(3)
            ]
        else:
            # general NEE: Le*omega * f(wo, wl) * n.l / pick_pdf
            # (no MIS — NEE is the only direct-light sampler on non-delta
            # lobes, integrate/path.py:_shade_and_nee general branch)
            wlx = ldx * txx + ldy * txy + ldz * txz
            wly = ldx * bx0 + ldy * by0 + ldz * bz0
            wlz = ldx * nsx + ldy * nsy + ldz * nsz
            f_pr_l, _ = prin_eval(wlx, wly, wlz)
            f_ev = [
                jnp.where(is_prin, f_pr_l[c],
                          jnp.where(is_diff, albedo[c] * _INV_PI, 0.0))
                for c in range(3)
            ]
            scale = n_dl / jnp.maximum(pick_pdf, 1e-12)
            radiance = [
                jnp.where(lit, le[c] * f_ev[c] * scale, 0.0)
                for c in range(3)
            ]
        if external:
            # the NEE term is provisional (gated on want_shadow only);
            # split it out for the caller to apply after the external
            # occlusion trace — the in-kernel accumulator takes only
            # emission + the miss background
            nee_out = [radiance[c] * last_at[c] for c in range(3)]
            radiance = [jnp.zeros_like(r) for r in radiance]
        # miss lanes collect the constant background callable
        radiance = [
            jnp.where(is_hit, radiance[c], b)
            for c, b in zip(range(3), (bgx, bgy, bgz))
        ]
        contrib = [emitted[c] + radiance[c] * last_at[c] for c in range(3)]

        new_at = [jnp.where(adv, atten[c] * at_fac[c], atten[c])
                  for c in range(3)]
        alive_f = alive.astype(jnp.float32)
        new_last = [jnp.where(alive, new_at[c], last_at[c])
                    for c in range(3)]

        # --- RR (raygen.cu:62-66): draw only on hit lanes ---
        p_rr = 0.30 * new_at[0] + 0.59 * new_at[1] + 0.11 * new_at[2]
        seed, u_rr = _rnd_masked(seed, adv)
        survive = adv & (u_rr <= p_rr)
        inv_p = 1.0 / jnp.maximum(p_rr, 1e-12)
        new_at = [jnp.where(survive, new_at[c] * inv_p, new_at[c])
                  for c in range(3)]

        # --- complete next-iteration state (the pool's post-shade stage) ---
        acc_new = [acc[c] + jnp.where(alive, contrib[c], 0.0)
                   for c in range(3)]
        depth_new = depth + alive_f
        alive_new = (survive
                     & (depth_new < float(max_depth))).astype(jnp.float32)
        pdelta_new = jnp.where(alive, is_delta.astype(jnp.float32),
                               prev_delta)

        aov_rows = None
        if aov:
            first = adv & (depth == 0.0)
            ns_rows = (nsx, nsy, nsz)
            aov_rows = [
                row(misc_t, 16 + c) + jnp.where(first, albedo[c], 0.0)
                for c in range(3)
            ] + [
                row(misc_t, 19 + c) + jnp.where(first, ns_rows[c], 0.0)
                for c in range(3)
            ]

        if refill_cfg is None:
            rays_o = jnp.concatenate(
                [
                    jnp.where(survive, px, ox),
                    jnp.where(survive, py, oy),
                    jnp.where(survive, pz, oz),
                    jnp.where(survive, ndx, dx),
                    jnp.where(survive, ndy, dy),
                    jnp.where(survive, ndz, dz),
                    rays_t[6:8, :],
                ],
                axis=0,
            )  # [8, RT]
            rays_out[:, :] = jnp.transpose(rays_o, (1, 0))

            misc_rows = (
                [seed] + new_at + new_last
                + [pdelta_new, depth_new, alive_new]
                + acc_new + [
                    row(misc_t, 13),  # pixel: pass-through
                    row(misc_t, 14),  # samp: pass-through
                    want_shadow.astype(jnp.float32),
                ]
            )
            if aov:
                misc_rows += aov_rows + [jnp.zeros((2, rt), jnp.float32)]
            if external:
                # pending NEE contribution rides extra output columns
                # (misc_w..misc_w+2), zero-padded to the 8-aligned width
                misc_rows += nee_out
            misc_o = jnp.concatenate(misc_rows, axis=0)  # [16|24(+3), RT]
            out_w = misc_out.shape[0] if t_misc else misc_out.shape[1]
            if external and misc_o.shape[0] < out_w:
                misc_o = jnp.concatenate(
                    [misc_o, jnp.zeros(
                        (out_w - misc_o.shape[0], rt),
                        jnp.float32)], axis=0)
            misc_out[:, :] = (misc_o if t_misc
                              else jnp.transpose(misc_o, (1, 0)))
            return

        # ==== in-kernel retire + refill epilogue (megakernel only) ====
        # The XLA pool body's whole work-assignment stage — retire stash,
        # work-counter pixel claim, tea seeding, per-sample LCG jump,
        # camera-ray generation — runs HERE, so the loop body outside is
        # just the kernel launch (+ the per-window flush). An SMEM scratch
        # carries the work counter across the sequential grid: tile claim
        # order equals the XLA cumsum's lane order, and pixel->stream
        # mapping is by PIXEL id (tea), so per-pixel RNG streams and the
        # accumulated image are unchanged (wavefront.cpp:203-222
        # persistent-threads analog).
        rc = refill_cfg
        spp_n = rc["spp"]
        n_pix = rc["n_pix"]
        use_stash = rc["use_stash"]
        jump = rc["jump"]
        width_i = rc["width"]
        pixf = row(misc_t, 13)
        sampf = row(misc_t, 14)
        alive_b = alive_new > 0.0
        deadr = ~alive_b
        accs = list(acc_new)

        if use_stash:
            st_t = jnp.transpose(stash_ref[:], (1, 0))  # [16, RT]
            completed = deadr & (pixf >= 0.0) & (sampf >= float(spp_n))
            can_stash = completed & (st_t[0:1] < 0.0)
            new_st = [jnp.where(can_stash, pixf, st_t[0:1])]
            new_st += [jnp.where(can_stash, accs[c], st_t[1 + c:2 + c])
                       for c in range(3)]
            accs = [jnp.where(can_stash, 0.0, a) for a in accs]
            if aov:
                new_st += [jnp.where(can_stash, aov_rows[c],
                                     st_t[4 + c:5 + c]) for c in range(6)]
                aov_rows = [jnp.where(can_stash, 0.0, a) for a in aov_rows]
            pad_n = 16 - len(new_st)
            new_st.append(jnp.zeros((pad_n, rt), jnp.float32))
            stash_out[:, :] = jnp.transpose(
                jnp.concatenate(new_st, axis=0), (1, 0))
            pixf = jnp.where(can_stash, -1.0, pixf)
            sampf = jnp.where(can_stash, 0.0, sampf)

        @pl.when(i == 0)
        def _seed_scratch():
            scr_ref[0] = sci_ref[0]  # work counter resumes from next_work
            scr_ref[1] = 0           # count hint (max live lane + 1)
            scr_ref[2] = 0           # live-lane count (n_rad increment)

        ctr = scr_ref[0]
        idle = deadr & (pixf < 0.0)
        # prefix-sum rank along lanes via a triangular MXU matmul (one-hot
        # exact); incl[i] = #idle lanes at or before i
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 0)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 1)
        tri = (iota_r <= iota_c).astype(jnp.float32)
        incl = jnp.dot(idle.astype(jnp.float32), tri,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)  # [1, RT]
        wpixf = ctr.astype(jnp.float32) + (incl - 1.0)
        take_px = idle & (wpixf < float(n_pix))
        base_f = sci_ref[1].astype(jnp.float32)
        pixf = jnp.where(
            take_px, base_f + jnp.clip(wpixf, 0.0, float(n_pix - 1)), pixf)
        sampf = jnp.where(take_px, 0.0, sampf)
        scr_ref[0] = ctr + jnp.sum(take_px.astype(jnp.int32))

        take = deadr & (pixf >= 0.0) & (sampf < float(spp_n))
        samp_idx = sampf  # this sample's index feeds the RNG jump
        sampf = jnp.where(take, sampf + 1.0, sampf)
        npix_i = jnp.maximum(pixf, 0.0).astype(jnp.int32)

        # tea(new_pixel, subframe_index) on uint32 rows (math/rng.py:26-48)
        v0r = pltpu.bitcast(npix_i, jnp.uint32)
        v1r = pltpu.bitcast(jnp.zeros((1, rt), jnp.int32) + sci_ref[2],
                            jnp.uint32)
        for k in range(4):
            s0 = jnp.uint32((0x9E3779B9 * (k + 1)) & 0xFFFFFFFF)
            v0r = v0r + (((v1r << 4) + jnp.uint32(0xA341316C))
                         ^ (v1r + s0)
                         ^ ((v1r >> 5) + jnp.uint32(0xC8013EA4)))
            v1r = v1r + (((v0r << 4) + jnp.uint32(0xAD90777D))
                         ^ (v0r + s0)
                         ^ ((v0r >> 5) + jnp.uint32(0x7E95761E)))
        st = v0r
        if rc["seed_rot"]:
            st = st ^ jnp.uint32(rc["seed_rot"])
        # per-sample LCG jump: static constants, select chain
        aj = jnp.zeros((1, rt), jnp.uint32) + jnp.uint32(jump[0][0])
        cj = jnp.zeros((1, rt), jnp.uint32) + jnp.uint32(jump[0][1])
        for si in range(1, spp_n):
            sel = samp_idx == float(si)
            aj = jnp.where(sel, jnp.uint32(jump[si][0]), aj)
            cj = jnp.where(sel, jnp.uint32(jump[si][1]), cj)
        st = aj * st + cj

        def _draw(s_u):
            s_u = jnp.uint32(_LCG_A) * s_u + jnp.uint32(_LCG_C)
            bits = pltpu.bitcast(s_u & jnp.uint32(0x00FFFFFF), jnp.int32)
            return s_u, bits.astype(jnp.float32) * _INV_2_24

        st, jxr = _draw(st)
        st, jyr = _draw(st)
        pxc = (npix_i % width_i).astype(jnp.float32)
        pyc = (npix_i // width_i).astype(jnp.float32)
        dxc = 2.0 * ((pxc + jxr) / rc["width_f"]) - 1.0
        dyc = 2.0 * ((pyc + jyr) / rc["height_f"]) - 1.0
        cdx = dxc * scf_ref[3] + dyc * scf_ref[6] + scf_ref[9]
        cdy = dxc * scf_ref[4] + dyc * scf_ref[7] + scf_ref[10]
        cdz = dxc * scf_ref[5] + dyc * scf_ref[8] + scf_ref[11]
        cdx, cdy, cdz, _ = _normalize3(cdx, cdy, cdz)

        seed_u = pltpu.bitcast(seed, jnp.uint32)
        seed_u = jnp.where(take, st, seed_u)
        alive2 = alive_b | take
        # per-ray motion time draw (masked, integrate/path.py:1038)
        s_adv, t_draw = _draw(seed_u)
        seed_u = jnp.where(alive2, s_adv, seed_u)
        seed_f = pltpu.bitcast(seed_u, jnp.float32)
        if time_out is not None:
            time_out[:, :] = jnp.broadcast_to(
                jnp.transpose(t_draw, (1, 0)), (rt, 8))

        rays_o = jnp.concatenate(
            [
                jnp.where(take, scf_ref[0], jnp.where(survive, px, ox)),
                jnp.where(take, scf_ref[1], jnp.where(survive, py, oy)),
                jnp.where(take, scf_ref[2], jnp.where(survive, pz, oz)),
                jnp.where(take, cdx, jnp.where(survive, ndx, dx)),
                jnp.where(take, cdy, jnp.where(survive, ndy, dy)),
                jnp.where(take, cdz, jnp.where(survive, ndz, dz)),
                jnp.full((1, rt), rc["tmin"], jnp.float32),
                jnp.full((1, rt), rc["tmax"], jnp.float32),
            ],
            axis=0,
        )
        rays_out[:, :] = jnp.transpose(rays_o, (1, 0))

        misc_rows = (
            [seed_f]
            + [jnp.where(take, 1.0, new_at[c]) for c in range(3)]
            + [jnp.where(take, 1.0, new_last[c]) for c in range(3)]
            + [jnp.where(take, 0.0, pdelta_new),
               jnp.where(take, 0.0, depth_new),
               alive2.astype(jnp.float32)]
            + accs
            + [pixf, sampf, want_shadow.astype(jnp.float32)]
        )
        if aov:
            misc_rows += aov_rows + [jnp.zeros((2, rt), jnp.float32)]
        misc_out[:, :] = jnp.transpose(
            jnp.concatenate(misc_rows, axis=0), (1, 0))

        # per-tile stats into SMEM; every tile writes the outputs (the
        # last tile's values are the launch totals)
        lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, rt), 1)
        live_idx = jnp.max(jnp.where(alive2, lane_row, -1))
        scr_ref[1] = jnp.maximum(
            scr_ref[1],
            jnp.where(live_idx >= 0, i * RAY_TILE + live_idx + 1, 0))
        scr_ref[2] = scr_ref[2] + jnp.sum(alive2.astype(jnp.int32))
        stats_out[0] = scr_ref[0]
        stats_out[1] = scr_ref[1]
        stats_out[2] = scr_ref[2]
        stats_out[3] = 0

    return kernel


def _fused_texture_state(scene) -> str:
    """'none' (untextured), 'diffuse' (fused-supported), 'unsupported'."""
    atlas = scene.atlas
    if atlas.data.shape[:2] == (1, 1):
        return "none"
    mats = scene.materials
    ok = (
        atlas.quad is not None
        and atlas.data.shape[0] * atlas.data.shape[1] <= MAX_ATLAS_TEXELS
        and not np.asarray(mats.roughness_tex >= 0).any()
        and not np.asarray(mats.emissive_tex >= 0).any()
    )
    return "diffuse" if ok else "unsupported"


def fused_shade_eligible(scene, cfg) -> bool:
    return (
        scene.num_keys in (1, 2)
        and scene.num_lights >= 1
        and _fused_texture_state(scene) != "unsupported"
        and (not getattr(scene, "any_normal_map", False)
             or _fused_texture_state(scene) == "diffuse")
        and getattr(scene, "env", None) is None
        and cfg.light_sampler in ("uniform", "power")
        and cfg.throughput_model == "reference"
        and scene.geom.mat_id.shape[0] <= MAX_ONEHOT_FACES
        and getattr(scene, "instances", None) is None
    )


def make_fused_shader(scene, cfg, soup, soup1=None,
                      interpret: bool | None = None, merged=False,
                      refill=None):
    """Returns shade(rays, hit4, misc16, count) -> (rays_out, misc_out16),
    or with merged=True the megakernel trace_shade(rays, misc16, count)
    (closest sweep in-kernel; static scenes only).

    refill (merged only): dict(n_pix=, use_stash=) — builds the
    IN-KERNEL-REFILL megakernel instead: the work-assignment stage
    (retire stash, pixel claim via an SMEM work counter, tea seeding,
    camera-ray generation) runs in the kernel epilogue, so the XLA loop
    body is one launch. Returns trace_shade_refill(rays, misc, stash,
    count, sci, scf[, time8]) -> (rays2, misc2[, stash2][, time8b],
    stats i32[4] = (next_work, count_hint, n_live, 0)).

    soup: the closest kernel's TriSoup (tiles + cull AABBs, shared).
    soup1: key-1 soup for 2-key motion scenes (shadow rays lerp)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    refill_cfg = None
    if refill is not None:
        assert merged, "in-kernel refill requires the megakernel path"
        from ..integrate.path import _lcg_advance_table

        jump_np = _lcg_advance_table(cfg.samples_per_launch)
        refill_cfg = dict(
            n_pix=int(refill["n_pix"]),
            spp=int(cfg.samples_per_launch),
            use_stash=bool(refill["use_stash"]),
            jump=tuple((int(a), int(c)) for a, c in jump_np),
            width=int(cfg.width), width_f=float(cfg.width),
            height_f=float(cfg.height),
            tmin=float(cfg.primary_tmin), tmax=float(cfg.primary_tmax),
            seed_rot=int(cfg.seed or 0),
        )
    motion = soup1 is not None
    textured = _fused_texture_state(scene) == "diffuse"
    dispatch = not getattr(scene, "all_diffuse", False)
    uv_xform = textured and bool(getattr(scene, "any_uv_transform", False))
    normal_maps = (textured
                   and bool(getattr(scene, "any_normal_map", False)))
    f_limit = soup.tris.shape[0] * soup.tris.shape[2]
    attr, lights = build_shade_tables(scene, textured=textured,
                                      dispatch=dispatch, f_limit=f_limit,
                                      uv_xform=uv_xform,
                                      normal_maps=normal_maps)
    power_cdf = None
    if cfg.light_sampler == "power":
        power_cdf = tuple(
            float(c)
            for c in np.asarray(scene.lights.power_cdf)[: scene.num_lights]
        )
    tex_tables = ()
    ah = aw = 0
    if textured:
        quad_t, meta_t = build_texture_tables(scene.atlas)
        tex_tables = (quad_t, meta_t)
        ah, aw = scene.atlas.data.shape[:2]
    soup_tris = soup.tris
    if motion:
        soup_aabb, soup_super = motion_union_aabbs(soup, soup1)
    else:
        soup_aabb = soup.aabb
        soup_super = soup.super_aabb
    n_tiles = soup_tris.shape[0]
    if soup_aabb is None:  # cull disabled: everything-boxes pass every test
        n_pad = -(-n_tiles // SUPER_TILE) * SUPER_TILE
        soup_aabb = (jnp.zeros((n_pad, 8), jnp.float32)
                     .at[:, 0:3].set(-1e30).at[:, 3:6].set(1e30))
        soup_super = (jnp.zeros((n_pad // SUPER_TILE, 8), jnp.float32)
                      .at[:, 0:3].set(-1e30).at[:, 3:6].set(1e30))
    tris_tables = (soup_tris, soup1.tris) if motion else (soup_tris,)
    kernel = _make_shade_kernel(
        n_tiles, scene.num_lights, cfg.bg_radiance,
        cfg.shadow_tmin, cfg.shadow_tmax_eps, cfg.max_depth,
        textured=textured, ah=ah, aw=aw,
        dispatch=dispatch,
        params_base=attr_params_base(textured, uv_xform, normal_maps),
        power_cdf=power_cdf, motion=motion, closest_in_kernel=merged,
        aov=cfg.aov, uv_xform=uv_xform,
        nmap_base=(29 if uv_xform else 23), normal_maps=normal_maps,
        refill_cfg=refill_cfg,
    )
    misc_w = 24 if cfg.aov else 16
    hit_specs = [] if merged else [
        pl.BlockSpec((RAY_TILE, 4), lambda i, *_: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    time_specs = [
        pl.BlockSpec((RAY_TILE, 8), lambda i, *_: (i, 0),
                     memory_space=pltpu.VMEM),
    ] if (merged and motion) else []

    @functools.partial(jax.jit, static_argnames=())
    def shade(rays, hit4, misc16, count, time8=None):
        r_pad = rays.shape[0]
        count = jnp.asarray(count, jnp.int32).reshape(1)
        time_ops = (time8,) if (merged and motion) else ()
        hit_ops = () if merged else (hit4,)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(r_pad // RAY_TILE,),
                in_specs=[
                    pl.BlockSpec((RAY_TILE, 8), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM),
                ] + time_specs + hit_specs + [
                    pl.BlockSpec((RAY_TILE, misc_w), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM),
                ] + [
                    pl.BlockSpec((n_tiles, 9, soup_tris.shape[2]),
                                 lambda i, *_: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
                    for _t in tris_tables
                ] + [
                    pl.BlockSpec((soup_aabb.shape[0], 8),
                                 lambda i, *_: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((soup_super.shape[0], 8),
                                 lambda i, *_: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(attr.shape, lambda i, *_: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(lights.shape, lambda i, *_: (0, 0),
                                 memory_space=pltpu.VMEM),
                ] + [
                    pl.BlockSpec(t.shape, lambda i, *_: (0, 0),
                                 memory_space=pltpu.VMEM)
                    for t in tex_tables
                ],
                out_specs=(
                    pl.BlockSpec((RAY_TILE, 8), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((RAY_TILE, misc_w), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM),
                ),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((r_pad, 8), jnp.float32),
                jax.ShapeDtypeStruct((r_pad, misc_w), jnp.float32),
            ),
            interpret=interpret,
        )(count, rays, *time_ops, *hit_ops, misc16, *tris_tables,
          soup_aabb, soup_super, attr, lights, *tex_tables)

    if refill_cfg is not None:
        use_stash = refill_cfg["use_stash"]

        @jax.jit
        def trace_shade_refill(rays, misc16, stash, count, sci, scf,
                               time8=None):
            r_pad = rays.shape[0]
            count = jnp.asarray(count, jnp.int32).reshape(1)
            sci = jnp.asarray(sci, jnp.int32).reshape(4)
            scf = jnp.asarray(scf, jnp.float32).reshape(12)
            time_in = (time8,) if motion else ()
            stash_in = (stash,) if use_stash else ()
            io_spec = lambda w: pl.BlockSpec(  # noqa: E731
                (RAY_TILE, w), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM)
            out_specs = [io_spec(8), io_spec(misc_w)]
            out_shape = [
                jax.ShapeDtypeStruct((r_pad, 8), jnp.float32),
                jax.ShapeDtypeStruct((r_pad, misc_w), jnp.float32),
            ]
            if use_stash:
                out_specs.append(io_spec(16))
                out_shape.append(
                    jax.ShapeDtypeStruct((r_pad, 16), jnp.float32))
            if motion:
                out_specs.append(io_spec(8))
                out_shape.append(
                    jax.ShapeDtypeStruct((r_pad, 8), jnp.float32))
            out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            out_shape.append(jax.ShapeDtypeStruct((4,), jnp.int32))
            # alias the per-lane state buffers in->out (indices count the
            # scalar-prefetch operands): each grid step reads and writes
            # only its own tile, so in-place HBM update is hazard-free and
            # XLA drops the three per-iteration carry copies the while
            # loop otherwise pays (~150us/iter at 65k lanes, r5 profile).
            # RT3C_KALIAS=0 reverts for A/B.
            aliases = {3: 0}  # rays -> rays_out
            nin = 4
            if motion:
                time_in_idx = nin
                nin += 1
            aliases[nin] = 1  # misc16 -> misc_out
            nin += 1
            out_i = 2
            if use_stash:
                aliases[nin] = out_i
                nin += 1
                out_i += 1
            if motion:
                aliases[time_in_idx] = out_i
            if _os.environ.get("RT3C_KALIAS", "1") == "0":
                aliases = {}
            return pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=3,
                    grid=(r_pad // RAY_TILE,),
                    in_specs=[io_spec(8)] + (
                        [io_spec(8)] if motion else []
                    ) + [io_spec(misc_w)] + (
                        [io_spec(16)] if use_stash else []
                    ) + [
                        pl.BlockSpec((n_tiles, 9, soup_tris.shape[2]),
                                     lambda i, *_: (0, 0, 0),
                                     memory_space=pltpu.VMEM)
                        for _t in tris_tables
                    ] + [
                        pl.BlockSpec((soup_aabb.shape[0], 8),
                                     lambda i, *_: (0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((soup_super.shape[0], 8),
                                     lambda i, *_: (0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec(attr.shape, lambda i, *_: (0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec(lights.shape, lambda i, *_: (0, 0),
                                     memory_space=pltpu.VMEM),
                    ] + [
                        pl.BlockSpec(t.shape, lambda i, *_: (0, 0),
                                     memory_space=pltpu.VMEM)
                        for t in tex_tables
                    ],
                    out_specs=tuple(out_specs),
                    scratch_shapes=[pltpu.SMEM((4,), jnp.int32)],
                ),
                out_shape=tuple(out_shape),
                input_output_aliases=aliases,
                interpret=interpret,
            )(count, sci, scf, rays, *time_in, misc16, *stash_in,
              *tris_tables, soup_aabb, soup_super, attr, lights,
              *tex_tables)

        return trace_shade_refill

    if merged:
        def trace_shade(rays, misc16, count, time8=None):
            return shade(rays, None, misc16, count, time8)

        return trace_shade
    return shade


class FusedPipeline:
    """closest-raw + fused-shade kernel pair for the pool integrator.

    Recognized by integrate/path.py's pool schedule as a drop-in replacement
    for the (trace, shade, shadow) stage stack."""

    def __init__(self, scene, cfg, interpret: bool | None = None):
        from .pallas_mt import (build_tri_soup, trace_closest_mt_motion_raw,
                                trace_closest_mt_raw)

        if not fused_shade_eligible(scene, cfg):
            raise ValueError(
                "scene/cfg outside the fused fast path (needs <= 2 motion "
                "keys, uniform/power sampler, reference throughput, "
                f"<= {MAX_ONEHOT_FACES} faces; textures only as diffuse "
                f"maps over atlases <= {MAX_ATLAS_TEXELS} texels)"
            )
        if interpret is None:
            interpret = jax.devices()[0].platform != "tpu"
        soup = build_tri_soup(scene.geom, num_faces=scene.num_faces)
        self.soup = soup._replace(num_faces=scene.num_faces)
        self.num_faces = scene.num_faces
        self.motion = scene.num_keys == 2
        self.merged = True
        # in-kernel-refill megakernels, built lazily per (n_pix, stash)
        # (n_pix is only known at render time; XLA caches the compiles)
        self._scene = scene
        self._cfg = cfg
        self._interpret = interpret
        self._refill_cache = {}
        # megakernel: closest + shade + NEE + shadow + RR in ONE launch
        # per pool iteration (motion lerps the closest sweep by the per-ray
        # time column)
        if self.motion:
            soup1 = build_tri_soup(scene.geom, key=1,
                                   num_faces=scene.num_faces)
            self.soup1 = soup1._replace(num_faces=scene.num_faces)
            self.trace_shade = make_fused_shader(scene, cfg, self.soup,
                                                 self.soup1,
                                                 interpret=interpret,
                                                 merged=True)
            self._closest_motion_raw = functools.partial(
                trace_closest_mt_motion_raw, interpret=interpret
            )
        else:
            self.trace_shade = make_fused_shader(scene, cfg, self.soup,
                                                 interpret=interpret,
                                                 merged=True)
            self._closest_raw = functools.partial(
                trace_closest_mt_raw, interpret=interpret
            )

    def closest_raw(self, rays_padded, count, time_col=None):
        if self.motion:
            return self._closest_motion_raw(self.soup, self.soup1,
                                            rays_padded, time_col, count)
        return self._closest_raw(self.soup, rays_padded, count)

    def refill_shader(self, n_pix: int, use_stash: bool):
        """The in-kernel-refill megakernel for this pipeline (see
        make_fused_shader's refill doc); cached per pool geometry.

        Built lazily (n_pix is a render-time shape) but possibly under an
        active jit trace — ensure_compile_time_eval keeps the table build
        concrete (its inputs are the pipeline's concrete scene arrays)."""
        key = (int(n_pix), bool(use_stash))
        if key not in self._refill_cache:
            with jax.ensure_compile_time_eval():
                self._refill_cache[key] = make_fused_shader(
                    self._scene, self._cfg, self.soup,
                    soup1=self.soup1 if self.motion else None,
                    interpret=self._interpret, merged=True,
                    refill=dict(n_pix=n_pix, use_stash=use_stash))
        return self._refill_cache[key]


def make_fused_pipeline(scene, cfg, interpret: bool | None = None):
    return FusedPipeline(scene, cfg, interpret=interpret)


def external_shade_eligible(scene, cfg) -> bool:
    """Kernel-side eligibility for the EXTERNAL pipeline: the fused-path
    constraints minus everything the in-kernel trace imposed — no face
    limit (attrs arrive pre-gathered) and any motion handled by the
    caller's tracer."""
    return (
        scene.num_keys in (1, 2)
        and scene.num_lights >= 1
        and _fused_texture_state(scene) != "unsupported"
        and (not getattr(scene, "any_normal_map", False)
             or _fused_texture_state(scene) == "diffuse")
        and getattr(scene, "env", None) is None
        and cfg.light_sampler in ("uniform", "power")
        and cfg.throughput_model == "reference"
        # trace-time instanced scenes shade in-kernel too: 9 extra
        # inverse-transpose attr rows transform the normal, 9 more
        # forward-linear rows transform the tangent under normal maps,
        # and 2-key matrix motion only adds the shadow-time column
        and (getattr(scene, "instances", None) is None
             or scene.num_keys in (1, 2))
    )


def _pack_hp(h: int) -> int:
    """Packed row width for pack_rows128/take_packed (must agree).

    Default: the tightest divisor of 128 >= h (k = 128/hp rows per
    gathered 128-lane row). RT3C_ATTR_PACK_K forces a smaller k (wider
    hp): the gather's output traffic is unchanged ([W, 128] either way),
    but the k-way sub-row select tree after it halves per halving of k —
    HBM capacity (k x smaller packing density) is the only cost."""
    hp = h
    while 128 % hp:
        hp += 1
    k_env = int(_os.environ.get("RT3C_ATTR_PACK_K", "0"))
    if k_env and 128 // k_env >= hp:
        hp = 128 // k_env
    return hp


def pack_rows128(tab):
    """Pack a narrow [F, H] row table into [F/k, 128] rows of k consecutive
    source rows (k = 128 // H', H' = H zero-padded per _pack_hp).

    Measured on v5e inside the walk-pool loop (384^2 profile): a 16k-row
    gather from the [F,16] attr table cost 209us per boundary while the
    [N,128] node-row gather in the same loop cost 25us — narrow-row
    gathers fall off XLA's fast wide-row fetch path, and zero-padding the
    minor dim is undone by the gather simplifier (it shrinks slice_sizes
    back to the consumed prefix). Packing k rows per 128-lane row is not
    simplifiable: gather row id // k on the wide path, then take_packed
    selects the id %% k sub-block in registers."""
    f, h = tab.shape
    if h >= 128:
        return tab, h
    hp = _pack_hp(h)
    k = 128 // hp
    fp = -(-f // k) * k
    buf = jnp.zeros((fp, hp), tab.dtype)
    buf = buf.at[:f, :h].set(tab)
    return buf.reshape(fp // k, 128), hp


def inst_attr_pack(scene):
    """Per-instance attr rows for the shade kernel, pack_rows128'd.

    Always the key-0 inverse-transpose (in-kernel normal transform,
    path.py:103-107); scenes with normal maps on the kernel path append
    the key-0 forward linear part (in-kernel tangent transform,
    path.py:129-136). Returns (packed, width, identity_row) — the
    identity substitutes for missing instances (hit_inst < 0)."""
    import numpy as np

    inst = scene.instances
    it9 = np.asarray(inst.inv_t[:, 0]).reshape(-1, 9)
    textured = _fused_texture_state(scene) == "diffuse"
    nmap = textured and bool(getattr(scene, "any_normal_map", False))
    eye = [1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0]
    if nmap:
        m9 = np.asarray(inst.m[:, 0, :, :3]).reshape(-1, 9)
        rows = np.concatenate([it9, m9], axis=1)
        iden = eye + eye
    else:
        rows = it9
        iden = eye
    packed, _ = pack_rows128(jnp.asarray(rows))
    return packed, rows.shape[1], jnp.asarray(iden, jnp.float32)


def gather_inst_rows(packed, w, iden, hit_inst):
    """[R] instance ids -> [R, w] kernel transform rows (identity where
    the lane has no instance hit)."""
    g = take_packed(packed, jnp.maximum(hit_inst, 0), w)
    return jnp.where((hit_inst >= 0)[:, None], g, iden[None, :])


def instanced_attr_t(attr_rows, attr_w, inst_pack, hit_prim, hit_inst,
                     presample=None, bu=None, bv=None):
    """Assemble the transposed per-ray attr block for an instanced shade
    kernel call: per-face attrs gathered by prim id + optional pre-sampled
    texel columns (make_tex_presampler over the gathered block and the
    barycentrics) + the per-instance transform rows (inst_attr_pack)
    gathered by instance id — the kernel's pre_base / inst_base layout."""
    attr_g = take_packed(attr_rows, jnp.maximum(hit_prim, 0), attr_w)
    packed, w, iden = inst_pack
    rows = gather_inst_rows(packed, w, iden, hit_inst)
    parts = ([attr_g] if presample is None
             else [attr_g, presample(attr_g, bu, bv)]) + [rows]
    return jnp.transpose(jnp.concatenate(parts, axis=1), (1, 0))


def take_packed(packed, idx, h):
    """Row fetch from a pack_rows128 table: [R] ids -> [R, h] rows."""
    r = idx.shape[0]
    # recover the padded row width the packer chose (same _pack_hp rule —
    # pack and take always run in one process, so the env agrees)
    hp = _pack_hp(h)
    k = 128 // hp
    if k == 1:
        # barrier the full-width gather: without it the gather simplifier
        # shrinks slice_sizes to the consumed [:, :h] prefix and the fetch
        # falls off the wide-row fast path (the 209us narrow-gather cliff)
        g = jax.lax.optimization_barrier(jnp.take(packed, idx, axis=0))
        return g[:, :h]
    g = jnp.take(packed, idx // k, axis=0).reshape(r, k, hp)
    lane = jax.lax.iota(jnp.int32, k)[None, :, None]
    sel = lane == (idx % k)[:, None, None]
    return jnp.sum(jnp.where(sel, g, 0.0), axis=1)[:, :h]


def _np_pack_rows128(tab: np.ndarray) -> np.ndarray:
    """Host-side (numpy) pack_rows128 — scene-load packing without paying
    eager remote-device round trips per op (CLAUDE.md environment rule)."""
    f, h = tab.shape
    hp = _pack_hp(h)
    k = 128 // hp
    fp = -(-f // k) * k
    buf = np.zeros((fp, hp), tab.dtype)
    buf[:f, :h] = tab
    return buf.reshape(fp // k, 128)


def _wrap_axis_xla(c, size, mode):
    """XLA mirror of the kernel's _wrap_axis (f32 arithmetic, float modes):
    base texel index + frac along one axis."""
    cm = jnp.where(mode == 2.0, 1.0 - jnp.abs(jnp.mod(c, 2.0) - 1.0), c)
    repeat = mode == 0.0
    cc = jnp.where(repeat, cm - jnp.floor(cm), cm)
    sc = cc * size - 0.5
    sc = jnp.where(repeat, sc, jnp.clip(sc, 0.0, size - 1.0))
    i0 = jnp.floor(sc)
    frac = sc - i0
    i0 = jnp.where(repeat, jnp.mod(i0, size), i0)
    return i0, frac


def make_tex_presampler(scene, uv_xform: bool, normal_maps: bool,
                        nmap_base: int):
    """XLA-side texture pre-sampling for the EXTERNAL shade kernel.

    The in-kernel _tex_fetch is a pair of one-hot matmuls over the WHOLE
    atlas per ray tile (~2*RT*AH*12*AW flops) — measured ~25% of the
    textured walk-pool subframe as two full-width launches per boundary
    (round-4 profile). In external mode the attrs already arrive
    pre-gathered per ray, so the texture fetch moves out too: interpolate
    UV from the gathered attr columns, then ONE packed row-gather from the
    quad table (same single-gather footprint as
    scene/texture.py sample_texture_bilinear) per texture — O(W) instead
    of O(W * atlas texels). Arithmetic mirrors the kernel's _wrap_axis +
    quad combine, so results are unchanged.

    Returns (presample, n_pre): presample(attr_g [W,H], bu [W], bv [W]) ->
    [W, n_pre] extra attr columns (diffuse rgb, + normal-map rgb when the
    scene carries normal maps) appended to the gathered block; the kernel
    reads them at pre_base (rows are zero where tid < 0, matching
    _tex_fetch's black-out, and the kernel's present mask gates use)."""
    atlas = scene.atlas
    aw = int(atlas.data.shape[1])
    quad_packed = jnp.asarray(
        _np_pack_rows128(np.asarray(atlas.quad, np.float32)))
    meta_packed = jnp.asarray(
        _np_pack_rows128(np.asarray(atlas.meta, np.float32)))

    def sample(tid, u, v):
        m = take_packed(meta_packed,
                        jnp.maximum(tid, 0.0).astype(jnp.int32), 6)
        y0, x0 = m[:, 0], m[:, 1]
        th, tw = m[:, 2], m[:, 3]
        ws_m, wt_m = m[:, 4], m[:, 5]
        iu0, fu = _wrap_axis_xla(u, tw, ws_m)
        iv0, fv = _wrap_axis_xla(v, th, wt_m)
        flat = ((y0 + iv0) * float(aw) + (x0 + iu0)).astype(jnp.int32)
        q = take_packed(quad_packed, flat, 12)
        fu = fu[:, None]
        fv = fv[:, None]
        rgb = (q[:, 0:3] * (1.0 - fu) * (1.0 - fv)
               + q[:, 3:6] * fu * (1.0 - fv)
               + q[:, 6:9] * (1.0 - fu) * fv
               + q[:, 9:12] * fu * fv)
        return jnp.where((tid >= 0.0)[:, None], rgb, 0.0)

    def presample(attr_g, bu, bv):
        w0 = 1.0 - bu - bv
        tu = w0 * attr_g[:, 16] + bu * attr_g[:, 18] + bv * attr_g[:, 20]
        tv = w0 * attr_g[:, 17] + bu * attr_g[:, 19] + bv * attr_g[:, 21]
        if uv_xform:
            tu2 = (attr_g[:, 23] * tu + attr_g[:, 24] * tv
                   + attr_g[:, 27])
            tv2 = (attr_g[:, 25] * tu + attr_g[:, 26] * tv
                   + attr_g[:, 28])
            tu, tv = tu2, tv2
        cols = [sample(attr_g[:, 22], tu, tv)]
        if normal_maps:
            cols.append(sample(attr_g[:, nmap_base + 3], tu, tv))
        return jnp.concatenate(cols, axis=1)

    return presample, (6 if normal_maps else 3)


def make_external_shader(scene, cfg, motion: bool,
                         interpret: bool | None = None,
                         transposed: bool = False):
    """The packed-state shade kernel WITHOUT an in-kernel trace stage.

    Returns (shade, attr_rows) where
      shade(rays, hit8, misc, attr_t, count) ->
          (rays_out [R,8], misc_out [R, misc_w+8], shadow_out [R, 8|16])

    transposed: misc input/output are C-major ([misc_w, R] in,
    [misc_w+8, R] out) so per-column access outside the kernel is a dense
    sublane slice — the walk-pool boundary protocol (integrate/walkpool.py
    keeps lane state as 1-D columns; the 2-D shred cost 70us/boundary).
    and attr_rows is the UNtransposed [F, H] attribute table the caller
    row-gathers by hit prim id (attr_t = gathered[H-major]). The closest
    hit arrives as hit8 [R, 8] (t, prim, u, v, 0...), the shadow rays
    leave as ray columns (o, d, tmin, tmax[, time]) for the caller's
    any-hit tracer, and the pending NEE contribution rides misc columns
    misc_w..misc_w+2 (already scaled by last_atten), to be added to acc
    on unoccluded lanes. Same per-path arithmetic and RNG streams as the
    fused megakernel (closehit_radiance.cu:60-160)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    textured = _fused_texture_state(scene) == "diffuse"
    dispatch = not getattr(scene, "all_diffuse", False)
    uv_xform = textured and bool(getattr(scene, "any_uv_transform", False))
    normal_maps = (textured
                   and bool(getattr(scene, "any_normal_map", False)))
    instanced = getattr(scene, "instances", None) is not None
    attr_t, lights = build_shade_tables(scene, textured=textured,
                                        dispatch=dispatch, f_limit=None,
                                        uv_xform=uv_xform,
                                        normal_maps=normal_maps)
    attr_rows = jnp.transpose(attr_t, (1, 0))  # [F, H] for the row gather
    power_cdf = None
    if cfg.light_sampler == "power":
        power_cdf = tuple(
            float(c)
            for c in np.asarray(scene.lights.power_cdf)[: scene.num_lights]
        )
    # pre-sampled textures (default): the tex fetch runs OUTSIDE the kernel
    # over the gathered attrs (make_tex_presampler) and its rgb rides extra
    # attr rows — the kernel shrinks to the untextured cost. RT3C_PRETEX=0
    # keeps the in-kernel one-hot fetch for A/B.
    import os as _os

    pre_tex = textured and _os.environ.get("RT3C_PRETEX", "1") == "1"
    presample = None
    n_pre = 0
    nmap_base = 29 if uv_xform else 23
    if pre_tex:
        presample, n_pre = make_tex_presampler(
            scene, uv_xform, normal_maps, nmap_base)
    tex_tables = ()
    ah = aw = 0
    if textured and not pre_tex:
        quad_t, meta_t = build_texture_tables(scene.atlas)
        tex_tables = (quad_t, meta_t)
        ah, aw = scene.atlas.data.shape[:2]
    kernel = _make_shade_kernel(
        0, scene.num_lights, cfg.bg_radiance,
        cfg.shadow_tmin, cfg.shadow_tmax_eps, cfg.max_depth,
        textured=textured, ah=ah, aw=aw,
        dispatch=dispatch,
        params_base=attr_params_base(textured, uv_xform, normal_maps),
        power_cdf=power_cdf, motion=motion, closest_in_kernel=False,
        aov=cfg.aov, uv_xform=uv_xform,
        nmap_base=nmap_base, normal_maps=normal_maps,
        external=True,
        inst_base=(attr_t.shape[0] + n_pre) if instanced else 0,
        t_misc=transposed,
        pre_tex=pre_tex, pre_base=attr_t.shape[0],
    )
    misc_w = 24 if cfg.aov else 16
    misc_out_w = misc_w + 8  # +3 pending-NEE columns, 8-aligned
    shadow_w = 16 if motion else 8
    # instanced scenes append 9 inverse-transpose rows per ray (gathered
    # by hit instance id alongside the per-face attrs); with normal maps
    # the key-0 forward linear rides 9 more (in-kernel tangent transform);
    # pre-sampled texel rgb rows sit between the attrs and the inst rows
    h = (attr_t.shape[0] + n_pre
         + ((18 if normal_maps else 9) if instanced else 0))

    misc_in_spec = (
        pl.BlockSpec((misc_w, RAY_TILE), lambda i, *_: (0, i),
                     memory_space=pltpu.VMEM)
        if transposed else
        pl.BlockSpec((RAY_TILE, misc_w), lambda i, *_: (i, 0),
                     memory_space=pltpu.VMEM))
    misc_out_spec = (
        pl.BlockSpec((misc_out_w, RAY_TILE), lambda i, *_: (0, i),
                     memory_space=pltpu.VMEM)
        if transposed else
        pl.BlockSpec((RAY_TILE, misc_out_w), lambda i, *_: (i, 0),
                     memory_space=pltpu.VMEM))

    @jax.jit
    def shade(rays, hit8, misc, attr_g_t, count):
        r_pad = rays.shape[0]
        count = jnp.asarray(count, jnp.int32).reshape(1)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(r_pad // RAY_TILE,),
                in_specs=[
                    pl.BlockSpec((RAY_TILE, 8), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((RAY_TILE, 8), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM),
                    misc_in_spec,
                    # per-ray pre-gathered attrs, params-major
                    pl.BlockSpec((h, RAY_TILE), lambda i, *_: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(lights.shape, lambda i, *_: (0, 0),
                                 memory_space=pltpu.VMEM),
                ] + [
                    pl.BlockSpec(t.shape, lambda i, *_: (0, 0),
                                 memory_space=pltpu.VMEM)
                    for t in tex_tables
                ],
                out_specs=(
                    pl.BlockSpec((RAY_TILE, 8), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM),
                    misc_out_spec,
                    pl.BlockSpec((RAY_TILE, shadow_w), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM),
                ),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((r_pad, 8), jnp.float32),
                jax.ShapeDtypeStruct(
                    (misc_out_w, r_pad) if transposed
                    else (r_pad, misc_out_w), jnp.float32),
                jax.ShapeDtypeStruct((r_pad, shadow_w), jnp.float32),
            ),
            interpret=interpret,
        )(count, rays, hit8, misc, attr_g_t, lights, *tex_tables)

    return shade, attr_rows, presample


class ExternalPipeline:
    """Packed-state shade kernel driven by an EXTERNAL tracer pair.

    The TPU answer to OptiX's one-pipeline-any-scene property
    (shader_common.h:74-94 + closehit_radiance.cu): shading, NEE, RR, and
    state updates stay in the single Pallas kernel while closest/any-hit
    run OUTSIDE it through whatever traversal backend fits the scene —
    the per-ray leaf walk for large soups, the tile-cull sweep for motion,
    instanced TLAS kernels, anything exposing the standard
    (o, d, tmin, tmax, time, count) tracer signature. Drop-in for the
    pool integrator's packed-state loop (path.py _render_pool_fused)."""

    def __init__(self, scene, cfg, tracer, interpret: bool | None = None):
        if not external_shade_eligible(scene, cfg):
            raise ValueError(
                "scene/cfg outside the external shade path (needs "
                "uniform/power sampler, reference throughput, no env map; "
                "textures only as diffuse maps over atlases <= "
                f"{MAX_ATLAS_TEXELS} texels)"
            )
        self.motion = scene.num_keys == 2
        self.merged = True  # pool loop contract: one trace_shade per iter
        self._closest, self._any = tracer
        self._shade, attr_rows, self._presample = make_external_shader(
            scene, cfg, motion=self.motion, interpret=interpret
        )
        self._attr_w = attr_rows.shape[1]
        self._attr_rows, _ = pack_rows128(attr_rows)  # fast-gather layout
        self._misc_w = 24 if cfg.aov else 16
        # trace-time instanced scenes: per-hit transform rows ride the
        # attr block (kernel transforms the object-space normal, and the
        # raw tangent when the scene carries normal maps)
        if getattr(scene, "instances", None) is not None:
            self._inst_pack = inst_attr_pack(scene)
        else:
            self._inst_pack = None

    def trace_shade(self, rays, misc, count, time8=None):
        time_col = time8[:, 0] if time8 is not None else None
        hit = self._closest(rays[:, 0:3], rays[:, 3:6], rays[:, 6],
                            rays[:, 7], time_col, count)
        hit8 = jnp.concatenate(
            [
                hit.t[:, None],
                hit.prim.astype(jnp.float32)[:, None],
                hit.u[:, None],
                hit.v[:, None],
                jnp.zeros((rays.shape[0], 4), jnp.float32),
            ],
            axis=1,
        )
        if self._inst_pack is not None:
            attr_t = instanced_attr_t(self._attr_rows, self._attr_w,
                                      self._inst_pack, hit.prim, hit.inst,
                                      presample=self._presample,
                                      bu=hit.u, bv=hit.v)
        else:
            attr_g = take_packed(self._attr_rows, jnp.maximum(hit.prim, 0),
                                 self._attr_w)
            if self._presample is not None:
                attr_g = jnp.concatenate(
                    [attr_g, self._presample(attr_g, hit.u, hit.v)], axis=1)
            attr_t = jnp.transpose(attr_g, (1, 0))
        rays2, misc_e, sh = self._shade(rays, hit8, misc, attr_t, count)
        occ = self._any(sh[:, 0:3], sh[:, 3:6], sh[:, 6], sh[:, 7],
                        sh[:, 8] if self.motion else None, count)
        w = self._misc_w
        nee = jnp.where(occ[:, None], 0.0, misc_e[:, w:w + 3])
        return rays2, jnp.concatenate(
            [misc_e[:, :10], misc_e[:, 10:13] + nee, misc_e[:, 13:w]],
            axis=1,
        )


def make_external_pipeline(scene, cfg, tracer,
                           interpret: bool | None = None):
    return ExternalPipeline(scene, cfg, tracer, interpret=interpret)
