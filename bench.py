"""Benchmark harness: Mrays/sec (radiance + shadow) on the BASELINE suite.

Measures the BASELINE.md north-star metric — rays traced per wall-clock
second through the full wavefront integrator (primary + bounce radiance
rays plus NEE shadow probes, the counting rule of BASELINE.md) — on the
reference's default workload shape (768x768 / 8 spp, src/wavefront.cpp:300,
55) plus the five BASELINE.md configs rendered from REAL .obj assets
(io/genassets.py writes them; io/obj.py loads them like the reference's
mesh.cpp does).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so vs_baseline is the
ratio against OUR OWN first-round figure (BENCH_TARGET below) — a
self-relative progress tracker, NOT a cross-vendor comparison. Per-config
details (best AND median rates) land in BENCH_DETAILS.json.

Before timing, a parity gate renders one small frame through the fused
Pallas pipeline AND the plain XLA integrator on the chip and fails loudly
on mismatch — Mosaic-compiled regressions can't hide behind fast numbers
(CI runs the kernels in interpret mode only).
"""
from __future__ import annotations

import dataclasses
import json
import os
import statistics
import sys
import time

# First recorded TPU number for this workload; kept fixed so vs_baseline
# tracks progress across rounds (self-relative, see module docstring).
BENCH_TARGET_MRAYS = 13.5  # round-1 recorded figure (Pallas MT + ray pool)

ASSET_DIR = os.path.expanduser("~/.cache/rendertoy3c_assets")


def _bench_step(step, cam, film_create_fn, warmup, timed):
    """Run warmup+timed subframes, timing each separately. Returns
    (best_mrays, median_mrays, best_spp_s, median_spp_s) — best because the
    remote-TPU tunnel adds occasional multi-100ms scheduling noise, median
    so the record stays honest about typical rates."""
    import jax

    film = film_create_fn()
    for _ in range(warmup):
        film, stats = step(cam, film)
    jax.block_until_ready(film.accum)
    rates = []
    dts = []
    for _ in range(timed):
        t0 = time.perf_counter()
        film, stats = step(cam, film)
        jax.block_until_ready(film.accum)
        dt = time.perf_counter() - t0
        rays = int(stats.radiance_rays) + int(stats.shadow_rays)
        rates.append(rays / dt / 1e6)
        dts.append(dt)
    return (max(rates), statistics.median(rates), min(dts),
            statistics.median(dts), stats)


def _parity_gate(cfg_kwargs):
    """Fused Pallas pipeline vs plain XLA pool on one small frame (both on
    the chip). Identical per-path arithmetic; sums differ only in float
    order, so the images must agree tightly. Raises on mismatch."""
    import dataclasses as dc

    import jax
    import numpy as np

    from rendertoy3c_tpu.film.film import film_create
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import make_render_fn
    from rendertoy3c_tpu.scene.builtin import cornell_box
    from rendertoy3c_tpu.scene.scene import build_scene
    from rendertoy3c_tpu.trace.pallas_shade import (
        fused_shade_eligible, make_fused_pipeline,
    )

    cfg = RenderConfig(width=96, height=96, samples_per_launch=2,
                      max_depth=6, ray_block=4096, integrator="pool",
                      pool_pixel_major=True)
    meshes, camera = cornell_box()
    camera.aspect_ratio = 1.0
    scene = build_scene(meshes)
    assert fused_shade_eligible(scene, cfg)
    cam = camera.params()

    def render(tracer):
        step = make_render_fn(scene, cfg, tracer=tracer)
        film, _ = step(cam, film_create(cfg.height, cfg.width))
        return np.asarray(film.accum[..., :3])

    img_fused = render(make_fused_pipeline(scene, cfg))
    # explicit brute pair: tracer=None now routes through the auto ladder
    # on TPU (r5), which would compare the fused pipeline against itself
    from rendertoy3c_tpu.trace.intersect import make_bruteforce_tracer

    img_xla = render(make_bruteforce_tracer(scene, chunk=cfg.tri_chunk))
    diff = np.abs(img_fused - img_xla)
    # The two integrators share per-path semantics but not float op order
    # (Mosaic vs XLA rsqrt/fma, and the in-kernel refill computes the
    # camera ray in-kernel), so a last-ulp RR/p_rr difference occasionally
    # flips one sample's survival and that pixel diverges by O(L) at
    # 2 spp. Measured r5: 4-5 isolated pixels per 96^2 frame either way
    # (max 0.21 XLA-refill, 2.31 in-kernel refill); a 64-subframe average
    # converges to mean|d| 1.8e-6, max 9.6e-4 — unbiased noise, not a
    # bug. The gate therefore bounds the MEAN tightly and allows a
    # handful of isolated outlier pixels; systematic disagreement (wrong
    # shading, dropped/duplicated samples) moves the mean or floods the
    # outlier count.
    outliers = int((diff.max(axis=-1) > 0.35).sum())
    if diff.mean() > 2e-3 or outliers > 8 or diff.max() > 8.0:
        raise RuntimeError(
            f"fused-vs-XLA parity gate FAILED: mean|d|={diff.mean():.4g} "
            f"max|d|={diff.max():.4g} outliers={outliers} — Mosaic "
            "kernels disagree with the XLA integrator on hardware"
        )
    print(f"parity gate ok: mean|d|={diff.mean():.2e} "
          f"max|d|={diff.max():.2e}", file=sys.stderr)

    # hierwalk gate at PRODUCTION POOL WIDTH on a production-size table:
    # XLA miscompiled the walk's while_loop at >= 98304 lanes on the TPU
    # backend (silent mostly-miss results at the 49k-scene table size while
    # every width <= 81920 was exact; see trace/hierwalk._WALK_CHUNK) —
    # trace a full-width wavefront and demand exact prim parity vs brute.
    import jax.numpy as jnp

    from rendertoy3c_tpu.accel.lbvh import split_order_scene
    from rendertoy3c_tpu.integrate.path import _camera_ray
    from rendertoy3c_tpu.scene.camera import Camera as _Cam
    from rendertoy3c_tpu.trace.auto import POOL_BLOCK_LARGE
    from rendertoy3c_tpu.trace.hierwalk import HIER_LEAF, make_hierwalk_tracer
    from rendertoy3c_tpu.trace.intersect import make_bruteforce_tracer

    sc = split_order_scene(_box_field_scene(), leaf=HIER_LEAF)
    hc, _ = make_hierwalk_tracer(sc)
    bc, _ = make_bruteforce_tracer(sc)
    # gate at >= the miscompile width so the _WALK_CHUNK guard stays
    # covered even while production pools are narrower
    R = max(POOL_BLOCK_LARGE, 131072)
    cam_gate = _Cam(eye=(0, 20, 45), lookat=(0, 0, 0), fov_y=50.0,
                    aspect_ratio=1.0).params()
    px = jnp.arange(R) % 768
    py = (jnp.arange(R) // 768) % 768
    o, d = _camera_ray(cam_gate, px, py, jnp.zeros(R), jnp.zeros(R),
                       jnp.float32(768), jnp.float32(768))
    hp = np.asarray(hc(o, d, 1e-2, 1e16, None, None).prim)
    bp = np.asarray(bc(o, d, 1e-2, 1e16, None, None).prim)
    bad = int((hp != bp).sum())
    if bad:
        raise RuntimeError(
            f"hierwalk parity gate FAILED at width {R}: {bad}/{R} prim "
            "mismatches vs brute force — the walk miscompiled at "
            "production pool width")
    print(f"hierwalk gate ok at width {R} "
          f"({int((hp >= 0).sum())}/{R} hits)", file=sys.stderr)

    # walkpool gate: one small frame through the walk-pool integrator
    # (resumable-walk rounds + Mosaic shade kernel) vs the classic pool
    # over the same hierwalk tracer — catches compiled-kernel/layout
    # regressions on hardware before any timing runs
    import dataclasses as _dc

    from rendertoy3c_tpu.film.film import film_create as _fc
    from rendertoy3c_tpu.integrate.path import make_render_fn as _mrf
    from rendertoy3c_tpu.integrate.walkpool import make_walkpool_pipeline

    wp_cfg = RenderConfig(width=96, height=96, samples_per_launch=2,
                          max_depth=5, ray_block=4096, integrator="pool",
                          pool_pixel_major=True)

    def _render_small(tracer):
        step = _mrf(sc, wp_cfg, tracer=tracer)
        film, _ = step(cam_gate, _fc(wp_cfg.height, wp_cfg.width))
        return np.asarray(film.accum[..., :3])

    img_wp = _render_small(make_walkpool_pipeline(sc, wp_cfg))
    img_cl = _render_small(make_hierwalk_tracer(sc))
    dwp = np.abs(img_wp - img_cl)
    if dwp.mean() > 5e-3 or dwp.max() > 0.35:
        raise RuntimeError(
            f"walkpool parity gate FAILED: mean|d|={dwp.mean():.4g} "
            f"max|d|={dwp.max():.4g} — the walk-pool integrator disagrees "
            "with the classic pool on hardware")
    print(f"walkpool gate ok: mean|d|={dwp.mean():.2e} "
          f"max|d|={dwp.max():.2e}", file=sys.stderr)

    # instanced gate: the TLAS gather walk (world dirs -> instance rows ->
    # shared mesh subtrees, trace/hier_instanced.py) vs the unrolled XLA
    # instance loop (trace/instanced.py — per-instance inverse transform +
    # full-range MT, the direct transcription of cuda_accel.h IAS
    # semantics) — EXACT prim+instance parity on camera rays at the
    # >= 131072 lane width that once miscompiled the static walk.
    from rendertoy3c_tpu.trace.hier_instanced import (
        make_inst_hierwalk_tracer, split_order_instanced,
    )
    from rendertoy3c_tpu.trace.instanced import make_instanced_tracer

    isc, icam = _instance_field_scene(grid=8)
    isc = split_order_instanced(isc)
    ihc, _ = make_inst_hierwalk_tracer(isc)
    ibc, _ = make_instanced_tracer(isc)
    icam.aspect_ratio = 1.0
    icp = icam.params()
    o, d = _camera_ray(icp, px, py, jnp.zeros(R), jnp.zeros(R),
                       jnp.float32(768), jnp.float32(768))
    hi_ = ihc(o, d, 1e-2, 1e16, None, None)
    bi_ = ibc(o, d, 1e-2, 1e16, None, None)
    badp = int((np.asarray(hi_.prim) != np.asarray(bi_.prim)).sum())
    badi = int((np.asarray(hi_.inst) != np.asarray(bi_.inst)).sum())
    if badp or badi:
        raise RuntimeError(
            f"instanced parity gate FAILED at width {R}: {badp} prim / "
            f"{badi} instance mismatches vs the unrolled instance loop")
    print(f"instanced gate ok at width {R} "
          f"({int((np.asarray(hi_.prim) >= 0).sum())}/{R} hits)",
          file=sys.stderr)


def _box_field_scene():
    """The 64x64 box field (49k faces) shared by the hierwalk parity gate
    and the large_scene_49k config."""
    import numpy as np

    from rendertoy3c_tpu.scene.builtin import box_mesh, quad
    from rendertoy3c_tpu.scene.material import Material
    from rendertoy3c_tpu.scene.mesh import Mesh
    from rendertoy3c_tpu.scene.scene import build_scene

    rng = np.random.default_rng(0)
    white = Material(diffuse=(0.7, 0.7, 0.7))
    v_all, f_all, off = [], [], 0
    for gx in range(64):
        for gz in range(64):
            m = box_mesh([gx - 32, 0, gz - 32],
                         [gx - 31.2, rng.uniform(0.3, 2.0), gz - 31.2],
                         white)
            v_all.append(m.vertices[0])
            f_all.append(m.indices + off)
            off += m.vertices.shape[1]
    big = Mesh(vertices=np.concatenate(v_all)[None],
               indices=np.concatenate(f_all), material=white)
    lv, lf = quad([-6, 25, -6], [-6, 25, 6], [6, 25, 6], [6, 25, -6])
    lamp = Mesh(vertices=lv[None], indices=lf,
                material=Material(emissive=(40.0, 40.0, 40.0)))
    return build_scene([big, lamp])


def _instance_field_scene(motion=False, grid=24):
    """578 instances of one 81-box tower mesh on a floor under a lamp —
    562k effective faces from 1.3k stored ones (trace-time two-level AS
    at scale). motion=True gives every tower a second transform key
    (small per-instance drift + yaw: the matrix-motion TLAS walk,
    cuda_accel.h motion IAS)."""
    import numpy as np

    from rendertoy3c_tpu.scene.builtin import box_mesh, quad
    from rendertoy3c_tpu.scene.camera import Camera
    from rendertoy3c_tpu.scene.instanced import build_instanced_scene
    from rendertoy3c_tpu.scene.material import Material
    from rendertoy3c_tpu.scene.mesh import Mesh
    from rendertoy3c_tpu.scene.scene import Instance

    rng = np.random.default_rng(0)
    white = Material(diffuse=(0.7, 0.7, 0.7))
    v_all, f_all, off = [], [], 0
    for _ in range(81):
        x, y, z = rng.uniform(0, 0.8, 3)
        m = box_mesh([x, y * 2, z], [x + 0.15, y * 2 + 0.3, z + 0.15],
                     white)
        v_all.append(m.vertices[0])
        f_all.append(m.indices + off)
        off += m.vertices.shape[1]
    tower = Mesh(vertices=np.concatenate(v_all)[None],
                 indices=np.concatenate(f_all), material=white)
    lv, lf = quad([-8, 20, -8], [-8, 20, 8], [8, 20, 8], [8, 20, -8])
    lamp = Mesh(vertices=lv[None], indices=lf,
                material=Material(emissive=(40.0, 40.0, 40.0)))
    fv, ff = quad([-30, 0, -30], [30, 0, -30], [30, 0, 30], [-30, 0, 30])
    floor = Mesh(vertices=fv[None], indices=ff, material=white)
    inst = [Instance(mesh_index=1), Instance(mesh_index=2)]
    for gx in range(grid):
        for gz in range(grid):
            t = np.zeros((3, 4), np.float32)
            t[:, :3] = np.eye(3)
            t[:, 3] = (gx - grid // 2, 0, gz - grid // 2)
            if motion:
                ang = rng.uniform(-0.35, 0.35)
                c, s = np.cos(ang), np.sin(ang)
                t1 = np.zeros((3, 4), np.float32)
                t1[:, :3] = np.asarray(
                    [[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
                t1[:, 3] = t[:, 3] + rng.uniform(-0.3, 0.3, 3)
                inst.append(Instance(mesh_index=0,
                                     transforms=np.stack([t, t1])))
            else:
                inst.append(Instance(mesh_index=0, transforms=t))
    cam = Camera(eye=(0.0, 16.0, 34.0), lookat=(0.0, 0.5, 0.0),
                 fov_y=50.0)
    return build_instanced_scene([tower, lamp, floor], inst), cam


def _town_scene(faces, two_key=False, untextured=False, principled=False):
    """Load the generated town .obj through the real asset path."""
    import numpy as np

    from rendertoy3c_tpu.io.genassets import generate_town
    from rendertoy3c_tpu.io.obj import load_obj
    from rendertoy3c_tpu.scene.camera import Camera
    from rendertoy3c_tpu.scene.material import Material, MaterialType
    from rendertoy3c_tpu.scene.scene import build_scene

    paths, camkw = generate_town(ASSET_DIR, faces_target=faces,
                                 two_key=two_key)
    meshes, textures = load_obj(paths if two_key else paths[:1])
    if untextured:
        for m in meshes:
            m.material = dataclasses.replace(
                m.material, diffuse_texture_id=-1, emissive_texture_id=-1,
                roughness_texture_id=-1, normal_texture_id=-1)
        textures = []
    if principled:
        rng = np.random.default_rng(5)
        for i, m in enumerate(meshes):
            if max(m.material.emissive) > 0:
                continue
            m.material = dataclasses.replace(
                m.material, material_type=MaterialType.PRINCIPLED,
                roughness=float(rng.uniform(0.15, 0.7)),
                metallic=float(rng.uniform(0.0, 0.9)))
    scene = build_scene(meshes, textures=textures or None)
    cam = Camera(**camkw)
    return scene, cam


def _auto_tracer(scene, cfg, on_tpu):
    """The shared backend ladder (trace/auto.py); returns (scene, tracer)
    — the scene may be re-ordered to match the tracer's face ids."""
    from rendertoy3c_tpu.trace.auto import choose_tracer

    return choose_tracer(scene, cfg, on_tpu=on_tpu)


def _kernel_floor_profiled(step, cam_p, mk_film):
    """(kernel_ms, total_ms) for one profiled megakernel subframe: the
    device-side sum of the pallas trace_shade ops ('shade.*' — the only
    kernel in the fused/external pool loop) vs the whole jitted step.
    Device timings sidestep the remote tunnel's wall-clock jitter, and
    the in-loop kernel keeps its real live-count tile early-exit and
    cull behavior (a zeroed standalone micro measured 2x slower: rays
    (0,0,0) defeat the tri-tile cull)."""
    from rendertoy3c_tpu.utils.profiling import profile_step

    rows = profile_step(lambda f: step(cam_p, f), top=400,
                        rearm=lambda: (mk_film(),))
    # the in-kernel-refill megakernel lowers as trace_shade_refill.*;
    # the classic fused/external kernels as shade.*
    kernel = sum(ms for name, ms, _c in rows
                 if name.startswith(("shade", "trace_shade")))
    total = max((ms for name, ms, _c in rows
                 if name.startswith("jit_step")), default=0.0)
    return kernel, total


def run_config_suite(cfg_kwargs, warmup, timed):
    """The BASELINE.md workloads; returns {name: stats}."""
    import jax
    import numpy as np

    from rendertoy3c_tpu.film.film import film_create
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import _next_pow2, make_render_fn
    from rendertoy3c_tpu.scene.builtin import cornell_box
    from rendertoy3c_tpu.scene.instanced import build_instanced_scene
    from rendertoy3c_tpu.scene.material import Material
    from rendertoy3c_tpu.scene.scene import Instance, build_scene
    from rendertoy3c_tpu.trace.instanced import make_instanced_tracer

    on_tpu = jax.devices()[0].platform == "tpu"
    results = {}
    cfg = RenderConfig(**cfg_kwargs)

    def record(name, scene, cam, cfg_c, tracer=None, timed_c=None,
               warmup_c=None):
        t0 = time.perf_counter()
        if tracer is None:
            from rendertoy3c_tpu.trace.auto import tune_config

            cfg_c = tune_config(scene, cfg_c, on_tpu=on_tpu)
            scene, tracer = _auto_tracer(scene, cfg_c, on_tpu)
        step = make_render_fn(scene, cfg_c, tracer=tracer)
        cam.aspect_ratio = cfg_c.width / cfg_c.height
        best, med, bdt, mdt, stats = _bench_step(
            step, cam.params(),
            lambda: film_create(cfg_c.height, cfg_c.width),
            warmup_c or warmup, timed_c or timed,
        )
        spp = cfg_c.samples_per_launch
        results[name] = {
            "mrays_per_sec": round(best, 3),
            "mrays_per_sec_median": round(med, 3),
            "spp_per_sec": round(spp / bdt, 3),
            "spp_per_sec_median": round(spp / mdt, 3),
        }
        # Roofline accounting for the walk-pool band: the traversal round
        # is one [pool, 128]-f32 row gather per lane, and the measured
        # machine floor is ~3 ns/row (DMA-descriptor-rate bound,
        # trace/hierwalk.py:7-10, scripts/micro_gather.py) — so rows
        # gathered/ray, bytes/ray, and % of that floor are the absolute
        # yardstick "fast" is judged against (the CUDA reference publishes
        # no numbers, BASELINE.md).
        rounds = int(stats.walk_rounds)
        if rounds > 0:
            rays = int(stats.radiance_rays) + int(stats.shadow_rays)
            # mirror the integrator's pool sizing (walkpool.py:544-546:
            # next_pow2 + the RAY_TILE=256 floor), not the raw pixel count
            pool_w = max(min(cfg_c.ray_block,
                             _next_pow2(cfg_c.width * cfg_c.height * spp)),
                         256)
            rows = rounds * pool_w
            gather_floor_s = rows * 3e-9
            results[name].update({
                "walk_rounds": rounds,
                "pool_width": pool_w,
                "rows_gathered_per_ray": round(rows / max(rays, 1), 2),
                "bytes_gathered_per_ray": round(512.0 * rows / max(rays, 1)),
                "gather_floor_ms": round(gather_floor_s * 1e3, 2),
                "pct_of_gather_floor": round(100.0 * gather_floor_s / mdt, 1),
            })
            if on_tpu:
                # boundary/shade breakdown (VERDICT r5 #8): the walk-pool
                # loop nests outer-while > flush-window fori > K-round
                # fori, so the three largest while.* device times split
                # the subframe into rounds / boundary stages / flush+glue,
                # and the shade.* kernels are the boundary's Pallas share.
                from rendertoy3c_tpu.utils.profiling import profile_step

                prows = profile_step(lambda f: step(cam.params(), f),
                                     top=400,
                                     rearm=lambda: (film_create(
                                         cfg_c.height, cfg_c.width),))
                shade_ms = sum(ms for nm, ms, _c in prows
                               if nm.startswith("shade"))
                tot_ms = max((ms for nm, ms, _c in prows
                              if nm.startswith("jit_step")), default=0.0)
                whiles = sorted((ms for nm, ms, _c in prows
                                 if nm.startswith("while.")), reverse=True)
                if tot_ms > 0 and len(whiles) >= 3:
                    results[name].update({
                        "rounds_ms": round(whiles[2], 2),
                        "boundary_ms": round(whiles[1] - whiles[2], 2),
                        "flush_glue_ms": round(tot_ms - whiles[1], 2),
                        "shade_kernel_ms": round(shade_ms, 2),
                        "pct_shade_kernel": round(
                            100.0 * shade_ms / tot_ms, 1),
                    })
        # Megakernel-band yardstick: kernel launches x standalone
        # per-iteration trace_shade cost = the work floor; the remainder
        # of the subframe is refill/flush/XLA glue (VERDICT r3 #3).
        iters = int(getattr(stats, "pool_iters", 0) or 0)
        if rounds == 0 and iters > 0 and on_tpu:
            from rendertoy3c_tpu.trace.pallas_shade import (
                ExternalPipeline, FusedPipeline,
            )

            if isinstance(tracer, (FusedPipeline, ExternalPipeline)):
                k_ms, tot_ms = _kernel_floor_profiled(
                    step, cam.params(),
                    lambda: film_create(cfg_c.height, cfg_c.width))
                if tot_ms > 0:
                    if isinstance(tracer, FusedPipeline):
                        # one megakernel per iteration: its share IS the
                        # work floor; the rest is refill/flush/XLA glue
                        results[name].update({
                            "pool_iters": iters,
                            "kernel_ms_floor": round(k_ms, 2),
                            "glue_ms": round(tot_ms - k_ms, 2),
                            "pct_of_kernel_floor": round(
                                100.0 * k_ms / tot_ms, 1),
                        })
                    else:
                        # external pipeline: the closest pass rides XLA
                        # ops the profiler can't attribute by name, so
                        # only the SHADE kernel's share is reported
                        results[name].update({
                            "pool_iters": iters,
                            "shade_kernel_ms": round(k_ms, 2),
                            "pct_shade_kernel": round(
                                100.0 * k_ms / tot_ms, 1),
                        })
        print(f"  {name}: best {best:.2f} / median {med:.2f} Mray/s "
              f"({time.perf_counter() - t0:.0f}s incl. build+compile)"
              + (f" | {results[name]['rows_gathered_per_ray']} rows/ray, "
                 f"{results[name]['pct_of_gather_floor']}% of gather floor"
                 if rounds > 0 else "")
              + (f" | {results[name]['pct_of_kernel_floor']}% of kernel "
                 f"floor"
                 if "pct_of_kernel_floor" in results[name] else "")
              + (f" | shade kernel {results[name]['pct_shade_kernel']}%"
                 if "pct_shade_kernel" in results[name] else ""),
              file=sys.stderr)

    # BASELINE config 1: single static .obj mesh, Lambertian + NEE, 1080p
    scene, cam = _town_scene(50000, untextured=True)
    cfg_1080 = dataclasses.replace(cfg, width=1920, height=1080)
    record("static_obj_1080p", scene, cam, cfg_1080, timed_c=2)

    # BASELINE config 2: textured multi-material .obj scene with NEE
    scene, cam = _town_scene(50000)
    cfg_sorted = dataclasses.replace(cfg, sort_rays=True)
    record("textured_obj", scene, cam, cfg_sorted)

    # BASELINE config 5: principled BSDF + power light sampler on the .obj
    scene, cam = _town_scene(50000, principled=True)
    cfg_p = dataclasses.replace(cfg, light_sampler="power", sort_rays=True)
    record("principled_power_obj", scene, cam, cfg_p)

    # BASELINE config 4: motion blur (2-key vertex motion from keyframed
    # .obj files, the reference's motion format)
    scene, cam = _town_scene(50000, two_key=True)
    cfg_m = dataclasses.replace(cfg, sort_rays=True)
    record("obj_motion_2key", scene, cam, cfg_m, timed_c=2)

    # scale sweep: 200k-face static .obj
    scene, cam = _town_scene(200000, untextured=True)
    record("large_scene_200k", scene, cam, cfg_sorted, timed_c=2)

    # scale sweep: 1M-face static .obj (the OptiX flat-cost story —
    # traversal degrades sub-linearly while brute force would be ~20x)
    scene, cam = _town_scene(1000000, untextured=True)
    record("large_scene_1M", scene, cam, cfg_sorted, timed_c=2)

    # scale sweep: instancing at scale — 578 instances sharing one
    # 972-face mesh (562k effective faces; cuda_accel.h:92-150 IAS
    # semantics). Static fields auto-bake a pre-transformed world-space
    # TABLE (r5: scene arrays stay single-copy, the acceleration table
    # duplicates leaf rows — 13.0 -> 18.5 Mray/s); the space-switching
    # trace-time walk remains measured by multi_instance_motion and
    # multi_instance_tracetime below.
    iscene_big, icam_big = _instance_field_scene()
    record("multi_instance_large", iscene_big, icam_big, cfg, timed_c=2)

    # matrix-motion variant: every tower gets a second transform key; the
    # motion instanced TLAS walk inverts the time-lerped transform per
    # lane (trace/hier_instanced.py, cuda_accel.h motion IAS)
    iscene_mot, icam_mot = _instance_field_scene(motion=True)
    record("multi_instance_motion", iscene_mot, icam_mot, cfg, timed_c=2)

    # legacy continuity configs (round-1 records): builtin Cornell shapes
    meshes, ccam = cornell_box()
    scene = build_scene(meshes)
    record("static_lambert_nee", scene, ccam, cfg)
    record("static_1080p", scene, ccam,
           dataclasses.replace(cfg, width=1920, height=1080), timed_c=2)

    # BASELINE config 3: two-level AS multi-instance (baked: small static
    # instanced scenes flatten onto the fused path — the TPU-first TLAS
    # answer; the trace-time TLAS kernels are tracked separately)
    meshes, ccam = cornell_box(with_blocks=False)
    xs = []
    for gx in (-0.6, 0.0, 0.6):
        for gz in (-0.6, 0.0, 0.6):
            t = np.zeros((3, 4), np.float32)
            t[:, :3] = np.eye(3) * 0.25
            t[:, 3] = (gx, 0.2, gz)
            xs.append(t)
    inst = [Instance(mesh_index=i) for i in range(len(meshes))]
    inst += [Instance(mesh_index=0, transforms=t) for t in xs]
    scene_baked = build_scene(meshes, instances=inst)
    record("multi_instance_tlas", scene_baked, ccam, cfg)

    # trace-time instancing now rides the auto ladder (the instanced TLAS
    # walk for static scenes; trace/hier_instanced.py)
    iscene = build_instanced_scene(meshes, inst)
    if on_tpu:
        record("multi_instance_tracetime", iscene, ccam, cfg)
    else:
        record("multi_instance_tracetime", iscene, ccam,
               dataclasses.replace(cfg, sort_rays=True),
               tracer=make_instanced_tracer(iscene))

    # 49k box field (round-1 scaling record, hierwalk path)
    from rendertoy3c_tpu.scene.camera import Camera as _Camera

    big_scene = _box_field_scene()
    bcam = _Camera(eye=(0, 20, 45), lookat=(0, 0, 0), fov_y=50.0)
    record("large_scene_49k", big_scene, bcam, cfg_sorted, timed_c=2)

    return results


def main():
    import jax

    # persistent XLA compilation cache (the NVRTC SourceCache analog,
    # sutil/sutil.cpp:1046-1055): repeated runs skip the 15-45s compiles
    _cache = os.path.expanduser("~/.cache/rendertoy3c_jax")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rendertoy3c_tpu.film.film import film_create
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import make_render_fn
    from rendertoy3c_tpu.scene.builtin import cornell_box
    from rendertoy3c_tpu.scene.scene import build_scene

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        cfg = RenderConfig(width=768, height=768, samples_per_launch=8,
                           max_depth=16, ray_block=32768, integrator="pool",
                           pool_pixel_major=True)
        warmup, timed = 1, 4
        _parity_gate(None)
    else:  # CI smoke mode
        cfg = RenderConfig(width=96, height=96, samples_per_launch=1,
                           max_depth=4, ray_block=4096, integrator="pool",
                           pool_pixel_major=True)
        warmup, timed = 1, 1

    meshes, camera = cornell_box()
    camera.aspect_ratio = cfg.width / cfg.height
    scene = build_scene(meshes)
    scene, tracer = _auto_tracer(scene, cfg, on_tpu)
    step = make_render_fn(scene, cfg, tracer=tracer)
    cam = camera.params()

    mrays, mrays_med, _, _, _ = _bench_step(
        step, cam, lambda: film_create(cfg.height, cfg.width), warmup, timed
    )

    # full BASELINE.md config suite -> BENCH_DETAILS.json (stderr progress)
    try:
        details = run_config_suite(
            dict(width=cfg.width, height=cfg.height,
                 samples_per_launch=cfg.samples_per_launch,
                 max_depth=cfg.max_depth, ray_block=cfg.ray_block,
                 integrator=cfg.integrator,
                 pool_pixel_major=cfg.pool_pixel_major,
                 flush_every=cfg.flush_every),
            warmup, timed,
        )
        details["headline_cornell_768_8spp"] = {
            "mrays_per_sec": round(mrays, 3),
            "mrays_per_sec_median": round(mrays_med, 3),
        }
        details["_baseline_note"] = (
            "vs_baseline is self-relative (this repo's first-round figure, "
            f"{BENCH_TARGET_MRAYS} Mray/s); the CUDA reference publishes no "
            "numbers (BASELINE.md)"
        )
        with open("BENCH_DETAILS.json", "w") as f:
            json.dump(details, f, indent=1)
    except Exception as e:  # details are best-effort; the headline must print
        print(f"config suite failed: {e!r}", file=sys.stderr)

    print(json.dumps({
        "metric": "mrays_per_sec_cornell_768_8spp",
        "value": round(mrays, 3),
        "unit": "Mray/s",
        "vs_baseline": round(mrays / BENCH_TARGET_MRAYS, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
