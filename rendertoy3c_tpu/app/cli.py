"""Command-line renderer — the TPU-native application driver.

The reference's `main()` hardcodes its scene path, 768x768 resolution and
8 spp (src/wavefront.cpp:290-302, :55) and exposes no flags; SURVEY.md S5
calls for promoting all of that to a real CLI: scene, size, spp, max depth,
seed, output path, tracer backend, light sampler, device-mesh shape, and
checkpoint/resume.

Examples:
  python -m rendertoy3c_tpu.app.cli --scene cornell --size 256x256 --spp 8 \
      --subframes 16 -o out.png
  python -m rendertoy3c_tpu.app.cli --scene model.obj model_key2.obj \
      --spp 4 --subframes 64 --tracer bvh -o out.exr
  python -m rendertoy3c_tpu.app.cli --scene cornell --mesh-shape 4x2 -o out.png
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="rendertoy3c_tpu",
        description="TPU-native progressive Monte-Carlo path tracer",
    )
    p.add_argument(
        "--scene", nargs="+", required=True,
        help=".obj path(s) (N files = N motion keyframes, like the reference "
             "loader) or a builtin: cornell, cornell-empty, textured, prims "
             "(analytic primitives; renders via the direct renderer)",
    )
    p.add_argument("--size", default="768x768", help="WxH (reference default 768x768)")
    p.add_argument("--spp", type=int, default=8, help="samples per launch")
    p.add_argument("--subframes", type=int, default=16,
                   help="progressive launches to accumulate")
    p.add_argument("--max-depth", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tracer",
                   choices=["auto", "pallas", "hierwalk", "leafwalk",
                            "residentwalk", "bvh", "brute"],
                   default="auto",
                   help="auto = per-ray leaf walk for large static scenes "
                        "on TPU, fused pallas tile-cull kernels for the "
                        "rest, brute-force off-TPU; residentwalk = the "
                        "VMEM-resident-table block walk (a measured-slower "
                        "backend kept selectable for comparison)")
    p.add_argument("--renderer", choices=["path", "direct"], default="path",
                   help="path = progressive path tracer (primary stack); "
                        "direct = GGX direct lighting with point+ambient "
                        "lights (legacy whitted stack)")
    p.add_argument("--integrator", choices=["pool", "wave"], default="pool",
                   help="path-tracer schedule: persistent ray pool (fast) or "
                        "per-block waves (reference-ordered)")
    p.add_argument("--pool-paths", type=int, default=0,
                   help="walk-pool paths per lane (0=auto: 2, the "
                        "software-pipelined pool; 1=classic)")
    p.add_argument("--walk-phase-every", type=_positive_or_zero,
                   default=0,
                   help="walk-pool traversal rounds between shade "
                        "boundaries (0=auto by scene; keep a multiple "
                        "of 4, the round unroll)")
    p.add_argument("--flush-every", type=int, default=0,
                   help="pool schedule: framebuffer flush cadence, 0 = "
                        "auto by frame/pool size (pixel-major lanes "
                        "retire through a stash and refill immediately)")
    p.add_argument("--ambient", type=_vec3, default=(0.35, 0.35, 0.35),
                   help="ambient light for --renderer direct")
    p.add_argument("--light-sampler", choices=["uniform", "power"],
                   default="uniform")
    p.add_argument("--throughput", choices=["reference", "physical"],
                   default="reference")
    p.add_argument("--tonemap", choices=["aces", "none"], default="none",
                   help="aces matches the reference's GL display shader")
    p.add_argument("--denoise", type=int, default=0, metavar="N",
                   help="apply N a-trous denoiser iterations before saving "
                        "(uses the AOV guide buffers when --aov is on)")
    p.add_argument("--aov", action="store_true",
                   help="also accumulate first-hit albedo/normal AOVs; "
                        "written as <output>.albedo/.normal and used as "
                        "denoiser guides")
    p.add_argument("--env", default=None, metavar="IMG",
                   help="lat-long environment map (.exr/.png/.ppm) used by "
                        "the miss program instead of the constant ambient")
    p.add_argument("--env-scale", type=float, default=1.0)
    p.add_argument("--anim-times", default=None, metavar="T0[,T1,...]",
                   help="glTF animation timestamps (seconds); each becomes "
                        "one motion keyframe (two = motion blur over the "
                        "shutter interval)")
    p.add_argument("--animation", type=int, default=0,
                   help="glTF animation clip index for --anim-times")
    p.add_argument("-o", "--output", default="out.png",
                   help="output path; format by extension (.png/.ppm/.exr)")
    p.add_argument("--eye", type=_vec3, default=None)
    p.add_argument("--lookat", type=_vec3, default=None)
    p.add_argument("--up", type=_vec3, default=None)
    p.add_argument("--fov", type=float, default=None, help="vertical fov, degrees")
    p.add_argument("--mesh-shape", default=None,
                   help="TILExSPP device mesh, e.g. 4x2 (default: single device)")
    p.add_argument("--num-hosts", type=int, default=1,
                   help="multi-host SPMD: total process count (launch one "
                        "copy of this CLI per host with --host-id 0..N-1; "
                        "the (tile, spp) mesh then spans every host's "
                        "devices over DCN)")
    p.add_argument("--host-id", type=int, default=0,
                   help="this process's id in the multi-host job")
    p.add_argument("--coordinator", default="localhost:29511",
                   help="host:port of process 0's coordination service")
    p.add_argument("--checkpoint", default=None,
                   help="save film checkpoint here after rendering")
    p.add_argument("--resume", default=None,
                   help="resume film from this checkpoint")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="also checkpoint every N subframes")
    p.add_argument("--stats", action="store_true",
                   help="print per-phase timings and Mrays/s")
    p.add_argument("--profile", action="store_true",
                   help="capture a device trace of one warmed render step "
                        "and print the top-op cost table (trace kept under "
                        "--profile-dir for TensorBoard/xprof)")
    p.add_argument("--profile-dir", default="/tmp/rt3c_prof",
                   help="where --profile writes the device trace")
    p.add_argument("--interactive", action="store_true",
                   help="open the GLFW viewer (falls back to a headless "
                        "turntable when no display exists)")
    p.add_argument("--turntable", type=int, default=0, metavar="N",
                   help="render an N-frame orbit to frame_###.png")
    p.add_argument("--ray-block", type=int, default=1 << 16)
    return p


def _positive_or_zero(s: str) -> int:
    """argparse type: int >= 0 (a negative K would run zero traversal
    rounds per phase and hang the walk-pool loop on-device)."""
    import argparse

    v = int(s)
    if v < 0:
        raise argparse.ArgumentTypeError("must be >= 0 (0 = auto)")
    if v and v % 4:
        print("warning: walk-phase cadence should be a multiple of 4 "
              "(the round unroll); measured 15-25% slower otherwise",
              file=sys.stderr)
    return v


def _vec3(s: str):
    parts = [float(x) for x in s.split(",")]
    if len(parts) != 3:
        raise argparse.ArgumentTypeError("expected x,y,z")
    return tuple(parts)


def _load_scene(args):
    """Returns (scene_meshes, textures, camera, point_lights, prims)."""
    from ..scene.builtin import (
        cornell_box,
        primitives_scene,
        textured_quad_scene,
    )

    names = args.scene
    if len(names) == 1 and names[0] in ("cornell", "cornell-empty",
                                        "textured", "prims"):
        name = names[0]
        if name == "textured":
            meshes, textures, camera = textured_quad_scene()
            return meshes, textures, camera, [], None
        if name == "prims":
            meshes, prims, camera, lights = primitives_scene()
            return meshes, [], camera, lights, prims
        meshes, camera = cornell_box(with_blocks=(name == "cornell"))
        return meshes, [], camera, [], None

    from ..scene.camera import Camera

    if len(names) == 1 and names[0].endswith((".gltf", ".glb")):
        from ..io.gltf import load_gltf

        times = (tuple(float(x) for x in args.anim_times.split(","))
                 if args.anim_times else None)
        meshes, textures, cameras, lights = load_gltf(
            names[0], times=times, animation=args.animation)
        camera = cameras[0] if cameras else Camera(
            eye=(5.0, 5.0, 5.0), lookat=(0.0, 1.0, 0.0), fov_y=45.0
        )
        return meshes, textures, camera, lights, None

    from ..io.obj import load_obj

    meshes, textures = load_obj(names)
    # Default framing mirrors the reference app (eye (5,5,5) toward (0,1,0),
    # fov 45 — src/wavefront.cpp:238-253).
    camera = Camera(eye=(5.0, 5.0, 5.0), lookat=(0.0, 1.0, 0.0), fov_y=45.0)
    return meshes, textures, camera, [], None


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    # persistent XLA compilation cache (the NVRTC SourceCache analog,
    # sutil/sutil.cpp:1046-1055): repeated runs skip the 15-45s compiles
    import os as _os

    _cache = _os.path.expanduser("~/.cache/rendertoy3c_jax")
    _os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.num_hosts > 1:
        # join the multi-controller job BEFORE any backend use; all hosts
        # run this same program (SPMD) and the mesh below spans them
        from ..parallel.multihost import init_multihost

        init_multihost(args.coordinator, args.num_hosts, args.host_id)

    from ..film.film import film_create
    from ..film.image import write_exr, write_png, write_ppm
    from ..film.tonemap import aces_tonemap, make_color
    from ..integrate.config import RenderConfig
    from ..integrate.path import make_render_fn
    from ..scene.scene import build_scene
    from ..utils.checkpoint import load_checkpoint, save_checkpoint
    from ..utils.timers import PhaseTimers

    try:
        w, h = (int(x) for x in args.size.lower().split("x"))
    except ValueError:
        print(f"bad --size {args.size!r}, expected WxH", file=sys.stderr)
        return 2

    if args.aov and args.renderer == "direct":
        print("--aov is a path-renderer feature; ignoring for --renderer "
              "direct", file=sys.stderr)
        args.aov = False

    timers = PhaseTimers()
    cfg = RenderConfig(
        width=w, height=h, samples_per_launch=args.spp,
        max_depth=args.max_depth, seed=args.seed,
        light_sampler=args.light_sampler, throughput_model=args.throughput,
        ray_block=args.ray_block, integrator=args.integrator,
        pool_pixel_major=(args.integrator == "pool"),
        flush_every=args.flush_every, aov=args.aov,
        pool_paths=args.pool_paths,
        walk_phase_every=args.walk_phase_every,
    )

    with timers.phase("load"):
        meshes, textures, camera, point_lights, prims = _load_scene(args)
        if prims and args.renderer != "direct":
            print("analytic primitives render through the whitted-stack "
                  "direct renderer (cuda/geometry.cu parity); forcing "
                  "--renderer direct", file=sys.stderr)
            args.renderer = "direct"
            args.tracer = "brute" if args.tracer == "auto" else args.tracer
        if args.eye:
            camera.eye = args.eye
        if args.lookat:
            camera.lookat = args.lookat
        if args.up:
            camera.up = args.up
        if args.fov:
            camera.fov_y = args.fov
        camera.aspect_ratio = w / h
        env_map = None
        if args.env:
            from ..film.image import load_image
            from ..scene.envmap import build_env_map

            env_map = build_env_map(load_image(args.env), scale=args.env_scale)
        scene = build_scene(meshes, textures=textures or None,
                            env_map=env_map, prims=prims)

    with timers.phase("accel"):
        tracer_kind = args.tracer
        if tracer_kind == "auto":
            import jax as _jax

            on_tpu = _jax.devices()[0].platform == "tpu"
            if on_tpu and scene.num_keys <= 2:
                # the shared ladder (trace/auto.py): fused megakernel,
                # external-shade pipelines over leafwalk / tile-cull, or a
                # bare pallas tracer — by scene size and eligibility
                from ..trace.auto import choose_tracer, tune_config

                # pipeline tracers shard cleanly (the pool rebases its
                # flush targets per shard), so --mesh-shape keeps them
                want_pipe = args.renderer == "path"
                cfg = tune_config(scene, cfg, on_tpu=True)
                scene, tracer = choose_tracer(scene, cfg, on_tpu=True,
                                              want_pipeline=want_pipe)
                tracer_kind = None
            else:
                tracer_kind = "brute"
        if tracer_kind is None:
            pass
        elif tracer_kind == "leafwalk":
            from ..accel.lbvh import split_order_scene
            from ..trace.leafwalk import make_leafwalk_tracer

            scene = split_order_scene(scene)
            tracer = make_leafwalk_tracer(scene)
        elif tracer_kind == "hierwalk":
            from ..accel.lbvh import split_order_scene
            from ..trace.hierwalk import (
                HIER_LEAF, HIER_LEAF_MOTION, make_hierwalk_tracer,
            )

            leaf = HIER_LEAF if scene.num_keys == 1 else HIER_LEAF_MOTION
            scene = split_order_scene(scene, leaf=leaf)
            tracer = make_hierwalk_tracer(scene)
        elif tracer_kind == "pallas":
            from ..trace.pallas_mt import make_pallas_mt_tracer
            from ..trace.pallas_shade import (
                fused_shade_eligible,
                make_fused_pipeline,
            )

            if scene.num_faces > 512 and scene.num_keys == 1:
                # spatially coherent face order tightens the kernels'
                # per-tile cull AABBs (must happen before tracer build so
                # prim ids match the shaded scene)
                from ..accel.lbvh import morton_order_scene

                scene = morton_order_scene(scene)

            if (args.renderer == "path" and cfg.integrator == "pool"
                    and fused_shade_eligible(scene, cfg)
                    and cfg.ray_block % 256 == 0):
                tracer = make_fused_pipeline(scene, cfg)
            else:
                tracer = make_pallas_mt_tracer(scene)
        elif tracer_kind == "residentwalk":
            from ..accel.lbvh import split_order_scene
            from ..trace.pallas_walk import make_walk_tracer

            scene = split_order_scene(scene)
            tracer = make_walk_tracer(scene)
        elif tracer_kind == "bvh":
            from ..trace.bvh_traverse import build_scene_bvh, make_bvh_tracer

            scene, bvh, _ = build_scene_bvh(scene)
            tracer = make_bvh_tracer(scene, bvh)
        else:
            tracer = None

    if args.renderer == "direct":
        from ..integrate.direct import make_direct_render_fn

        step = make_direct_render_fn(
            scene, cfg, point_lights=point_lights, ambient=args.ambient,
            tracer=tracer,
        )
        make_film = lambda: film_create(cfg.height, cfg.width)  # noqa: E731
    elif args.mesh_shape:
        n_tile, n_spp = (int(x) for x in args.mesh_shape.lower().split("x"))
        from ..parallel.dist import (
            film_create_sharded,
            make_mesh,
            make_render_fn_dist,
        )

        mesh = make_mesh(n_tile=n_tile, n_spp=n_spp)
        factory = (lambda s, aux, c: tracer) if tracer else None
        step, mesh = make_render_fn_dist(scene, cfg, mesh, tracer_factory=factory)
        if args.num_hosts > 1:
            from ..parallel.multihost import film_create_multihost

            make_film = lambda: film_create_multihost(cfg, mesh)  # noqa: E731
        else:
            make_film = lambda: film_create_sharded(cfg, mesh)  # noqa: E731
    else:
        step = make_render_fn(scene, cfg, tracer=tracer)
        make_film = lambda: film_create(cfg.height, cfg.width,  # noqa: E731
                                        aov=cfg.aov)
    film = make_film()

    if args.resume:
        if args.num_hosts > 1:
            # a host-local film cannot be rebuilt into the multihost tile
            # sharding; fail fast instead of crashing at step time
            print("--resume is not supported with --num-hosts > 1",
                  file=sys.stderr)
            return 2
        film = load_checkpoint(args.resume, cfg)
        print(f"resumed at subframe {int(film.subframe_index)}")

    def _save_ckpt(path, film_now):
        """Checkpoint save that works on multihost-sharded films: assemble
        over DCN (collective — every process calls this), host 0 writes."""
        if film_now.accum.is_fully_addressable:
            save_checkpoint(path, film_now, cfg)
            return
        from ..film.film import Film as _Film
        from ..parallel.multihost import assemble_film

        gathered = _Film(
            accum=assemble_film(film_now.accum),
            subframe_index=np.asarray(film_now.subframe_index),
            albedo=(None if film_now.albedo is None
                    else assemble_film(film_now.albedo)),
            normal=(None if film_now.normal is None
                    else assemble_film(film_now.normal)),
        )
        if jax.process_index() == 0:
            save_checkpoint(path, gathered, cfg)

    if args.interactive or args.turntable:
        from .viewer import Viewer

        viewer = Viewer(step, camera, cfg)
        viewer.film = film
        if args.turntable:
            paths = viewer.run_turntable(n_frames=args.turntable)
            print(f"wrote {len(paths)} turntable frames")
            return 0
        if viewer.run():
            return 0
        print("no display available; rendering a headless turntable instead",
              file=sys.stderr)
        viewer.run_turntable(n_frames=4)
        return 0

    if args.profile:
        from ..utils.profiling import profile_step

        # throwaway films: the step donates its film input, so each profiled
        # call gets a fresh one and the real accumulator is untouched
        with timers.phase("profile"):
            rows = profile_step(
                step, log_dir=args.profile_dir,
                rearm=lambda: (camera.params(), make_film()),
            )
        print(f"device profile (top ops, trace in {args.profile_dir}):",
              file=sys.stderr)
        for name, ms, n in rows:
            print(f"  {ms:9.3f} ms  x{n:<5d} {name}", file=sys.stderr)

    total_rays = 0
    render_t0 = time.perf_counter()
    for i in range(args.subframes):
        with timers.phase("render"):
            film, stats = step(camera.params(), film)
            jax.block_until_ready(film.accum)
        total_rays += int(stats.radiance_rays) + int(stats.shadow_rays)
        if args.checkpoint_every and (i + 1) % args.checkpoint_every == 0:
            with timers.phase("checkpoint"):
                _save_ckpt(args.checkpoint or "film.ckpt.npz", film)
        if args.stats:
            line = timers.maybe_report()
            if line:
                print(f"[{i+1}/{args.subframes}] {line}", file=sys.stderr)

    render_dt = time.perf_counter() - render_t0

    if args.checkpoint:
        _save_ckpt(args.checkpoint, film)

    with timers.phase("save"):
        accum_dev = film.accum
        if args.denoise:
            import jax.numpy as jnp

            from ..film.denoise import atrous_denoise

            if cfg.aov:
                # SVGF-style guided filter: albedo demodulation (texture
                # detail rides the albedo, not the noisy irradiance) +
                # normal-buffer edge stopping
                alb = jnp.maximum(film.albedo, 1e-3)
                accum_dev = atrous_denoise(
                    accum_dev / alb, normal=film.normal,
                    iterations=args.denoise,
                ) * alb
            else:
                accum_dev = atrous_denoise(accum_dev, iterations=args.denoise)
        albedo_dev, normal_dev = film.albedo, film.normal
        if not accum_dev.is_fully_addressable:
            # multi-host: tile shards live on other hosts; allgather over
            # DCN (parallel/multihost.py) — collectives run on EVERY
            # process, then only host 0 writes files
            from ..parallel.multihost import assemble_film

            accum_dev = assemble_film(accum_dev)
            if cfg.aov:
                albedo_dev = assemble_film(albedo_dev)
                normal_dev = assemble_film(normal_dev)
            if jax.process_index() != 0:
                return 0
        accum = np.asarray(accum_dev)[::-1]  # film row 0 is image bottom
        out = args.output

        if cfg.aov:
            stem, ext = _os.path.splitext(out)
            for name, buf in (("albedo", albedo_dev), ("normal", normal_dev)):
                img = np.asarray(buf)[::-1]
                path = f"{stem}.{name}{ext or '.png'}"
                if path.endswith(".exr"):
                    write_exr(path, img.astype(np.float32))
                else:
                    if name == "normal":  # [-1,1] -> display range
                        img = img * 0.5 + 0.5
                    rgb8 = np.asarray(make_color(img, alpha=False))
                    (write_ppm if path.endswith(".ppm") else write_png)(
                        path, rgb8
                    )
        if out.endswith(".exr"):
            write_exr(out, accum.astype(np.float32))
        else:
            rgb = accum
            if args.tonemap == "aces":
                rgb = np.asarray(aces_tonemap(rgb))
            img = np.asarray(make_color(rgb, alpha=False))
            (write_ppm if out.endswith(".ppm") else write_png)(out, img)

    spp_total = int(film.subframe_index) * cfg.samples_per_launch
    print(
        f"wrote {args.output}: {w}x{h}, {spp_total} spp accumulated, "
        f"{total_rays/1e6:.1f} Mrays in {render_dt:.2f}s "
        f"({total_rays/render_dt/1e6:.1f} Mray/s)"
    )
    if args.stats:
        print(timers.summary())
    return 0


if __name__ == "__main__":
    sys.exit(main())
