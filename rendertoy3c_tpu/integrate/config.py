"""Render configuration.

The reference hardcodes all of these (768x768 + 8 spp at
src/wavefront.cpp:300,55; tmin/tmax at raygen.cu:54-55 and
closehit_radiance.cu:137-138; unbounded RR depth). Promoted here to a real
config object per SURVEY.md S5 (config/flag system).
"""
from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class RenderConfig:
    width: int = 768
    height: int = 768
    samples_per_launch: int = 8

    # The reference's bounce loop is unbounded, terminated only by Russian
    # roulette / miss (raygen.cu:48-72). A jit-compiled loop needs a static
    # cap; 32 keeps the truncated mass negligible for physical albedos.
    max_depth: int = 32

    primary_tmin: float = 0.01  # raygen.cu:54
    primary_tmax: float = 1e16  # raygen.cu:55
    shadow_tmin: float = 0.001  # closehit_radiance.cu:137
    shadow_tmax_eps: float = 0.01  # closehit_radiance.cu:138 (Ldist - eps)

    # Constant ambient background returned by the miss program's direct
    # callable (src/shader/test.cu:3-6, miss.cu:30).
    bg_radiance: tuple = (0.01, 0.01, 0.01)

    # Wavefront execution shape: rays are processed in blocks of this size
    # (bounds the [block, tri_chunk] intersection working set in HBM).
    ray_block: int = 1 << 16
    tri_chunk: int = 256

    # Execution schedule: "wave" = per-(block, sample) bounce loops with
    # reference-ordered accumulation (bit-reproducible; golden tests);
    # "pool" = persistent ray pool at ~100% lane occupancy (fast path;
    # identical per-path arithmetic, sample sums in pool-flush order).
    integrator: str = "wave"

    # Pool-only: pixel-major work order — a lane renders ALL its pixel's
    # samples before flushing, cutting framebuffer scatter-adds by ~spp and
    # letting them run every flush_every iterations (completed lanes wait at
    # most flush_every-1 iterations to be recycled). 0 = auto: 16 for
    # small framebuffers, 8 once n_pix > 32x the pool (measured optimum
    # flips at ~1080p with a 32k pool).
    pool_pixel_major: bool = False
    flush_every: int = 0
    # Fused-pool retire stash: 1 = on (completed lanes park (pixel, acc)
    # in a dense slot and refill the same iteration), 0 = off (completed
    # lanes wait parked for the flush — the stash's ~6 per-iteration
    # selects cost ~2-7% on shade-bound small-pool configs, VERDICT r3
    # weak #4), -1 = auto (on; trace/auto.tune_config turns it off where
    # measured better). Walk-pool integrators always stash.
    pool_stash: int = -1

    # Walk-pool only (integrate/walkpool.py): traversal rounds between
    # phase boundaries (shade/NEE + RR/refill). Lanes finishing a walk wait
    # <= K-1 rounds; larger K amortizes the boundary, smaller K cuts the
    # wait. 0 = auto (pipelined pool: 32 above 512k faces, 12 for sub-100k
    # variable-ordered scenes, else 16; classic pool: 16). Keep K a
    # multiple of 4 — the round loop unrolls 4x and K=14/10 measured
    # 16.4/14.8 vs 19.6/19.4 Mray/s at K=12/16 on the same scene.
    walk_phase_every: int = 0

    # Walk-pool only: paths per lane. 2 = software-pipelined pool (each
    # lane time-shares its walk scratch between two independent paths, so
    # a finished walk hands the scratch to the sibling instead of idling
    # until the boundary; integrate/walkpool._render_pipepool). 1 = the
    # classic walk pool. 0 = auto = 2 — bit-identical to 1 per pixel and
    # measured faster across the board (non-instanced ~1.4x; instanced
    # field 9.7 -> 11.1, motion field 8.9 -> 9.8 Mray/s). P=3/4 measured
    # slower everywhere (the extra boundary passes eat the gain).
    pool_paths: int = 0

    # Pool-only: re-sort live lanes by direction-octant Morton keys each
    # iteration. Costs an argsort + state permutation; pays off for tracers
    # with coherence-dependent culling (the instanced TLAS kernel) — the TPU
    # analog of SER ray reordering (optixReorder, shader_common.h:89).
    sort_rays: bool = False

    # 'uniform' (reference, closehit_radiance.cu:10-15) or 'power'
    # (reference roadmap: power light sampler, README.md:19).
    light_sampler: str = "uniform"

    # Global RNG stream offset XORed into every per-pixel tea() seed
    # (rot_seed semantics, cuda/random.h:74-77). 0 reproduces the reference
    # stream exactly.
    seed: int = 0

    # Collect first-hit AOV buffers (albedo + shading normal) alongside the
    # beauty pass — the denoiser's SVGF-style guide inputs (the reference's
    # realtime-denoiser roadmap item, README.md:20, needs the same buffers).
    aov: bool = False

    # BSDF evaluation model:
    #   'reference' reproduces the shipped closest-hit exactly, including its
    #   missing-cosine throughput quirk (attenuation *= albedo * bsdf/pdf
    #   with pdf = cos/pi at closehit_radiance.cu:95-111, i.e. *= albedo/cos)
    #   and cosine-less NEE weight (closehit_radiance.cu:142-152);
    #   'physical' applies the textbook cosine factors instead.
    throughput_model: str = "reference"
