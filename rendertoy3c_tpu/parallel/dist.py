"""Multi-chip rendering over a jax.sharding.Mesh.

The reference's entire multi-device story is a static image-tile interleave
across GPUs plus pinned-host / NVLink output-buffer transport
(sutil/WorkDistribution.h:34-91, sutil/CUDAOutputBuffer.h:45-51) — and it is
dead code in the shipped app. The TPU design generalizes it to a 2-axis SPMD
decomposition compiled by XLA, with collectives riding ICI:

  * "tile" axis — spatial data parallelism: the image's rows are sharded
    across devices; each device owns its film shard permanently (no
    framebuffer gather on the hot path, exactly the role of the reference's
    per-GPU tile assignment).
  * "spp"  axis — sample parallelism: the samples_per_launch budget is split
    across devices rendering the SAME pixels with decorrelated RNG streams;
    their estimates are averaged with a `pmean` over ICI.

Scene/BVH arrays are replicated (they are read-only; the reference likewise
replicates the whole scene per GPU). Ray/path state never crosses chips:
paths are pixel-local, so the only collectives are the spp-axis `pmean` and
the scalar ray-counter `psum` — both tiny.

RNG decorrelation across the spp axis reuses the progressive-accumulation
stream: spp-shard r of subframe n seeds with tea(pixel, n*n_spp + r), i.e.
the distributed render consumes the same per-pixel stream sequence that a
single chip would across n_spp successive subframes. With n_spp == 1 the
sharded render is bit-identical to the single-chip render (SURVEY.md S4.4).
"""
from __future__ import annotations

from dataclasses import replace
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..film.film import Film, film_accumulate
from ..integrate.config import RenderConfig
from ..integrate.path import RenderStats, render_pixels
from ..scene.camera import CameraParams
from ..scene.scene import Scene
from ..trace.intersect import make_bruteforce_tracer


def make_mesh(
    n_tile: Optional[int] = None,
    n_spp: int = 1,
    devices=None,
) -> Mesh:
    """Build the ("tile", "spp") device mesh.

    Defaults to all visible devices on the tile axis (pure spatial data
    parallelism, the reference's WorkDistribution strategy).
    """
    if devices is None:
        devices = jax.devices()
    if n_tile is None:
        n_tile = len(devices) // n_spp
    devices = np.asarray(devices[: n_tile * n_spp]).reshape(n_tile, n_spp)
    return Mesh(devices, axis_names=("tile", "spp"))


def _bruteforce_factory(scene: Scene, aux, cfg: RenderConfig):
    return make_bruteforce_tracer(scene, chunk=cfg.tri_chunk)


def _bvh_factory(scene: Scene, aux, cfg: RenderConfig):
    from ..trace.bvh_traverse import make_bvh_tracer

    return make_bvh_tracer(scene, aux)


def prepare_tracer_factory(scene: Scene, cfg: RenderConfig, kind: str = "auto",
                           interpret: bool | None = None):
    """Host-side prep for a FAST sharded backend; returns (scene, factory).

    The Pallas backends' tables are deterministic host-side transforms of
    the replicated scene, so they are built ONCE here and embedded as jit
    constants — XLA replicates them onto every device, exactly like the
    scene pytree itself. The returned scene may be re-ordered
    (Morton/median-split) so prim ids match the tables: always render the
    RETURNED scene. kind:

      "auto"     — trace/auto.py's ladder, platform-independent (tests run
                   the same selection in interpret mode on the CPU mesh)
      "fused"    — fused megakernel pipeline (small static/motion scenes)
      "walkpool" — walk-pool integrator marker over the hier node table
                   (the auto pick for large pool scenes; pure XLA, so the
                   sharded step is identical on CPU-mesh tests and TPU)
      "external" — external shade pipeline over hierwalk (large) or
                   tile-cull MT (small)
      "hierwalk" — bare ordered-DFS hierarchical walk pair
      "leafwalk" — bare per-ray leaf walk pair
      "pallas"   — bare tile-cull MT pair
      "brute"    — the jnp brute-force pair (built in-shard, the default)

    InstancedScene inputs route to the trace-time two-level backends
    regardless of kind ("auto" picks the instanced walk pool past the
    effective-face threshold, else the inst hierwalk pair / external
    pipeline; "pallas" or >2 transform keys -> the pallas_instanced
    kernels) — the generic ladder below would ignore instance transforms.

    The factory ignores the traced scene_rep/aux arguments (tables are
    already bound); samples_per_launch is the only cfg field the sharded
    caller rewrites per-shard, and no kernel reads it.
    """
    from ..trace.auto import LEAFWALK_MIN_FACES, _is_instanced
    from ..trace.pallas_shade import (
        external_shade_eligible,
        fused_shade_eligible,
        make_external_pipeline,
        make_fused_pipeline,
    )

    if _is_instanced(scene):
        # Trace-time two-level AS under the mesh (the reference's IAS,
        # src/cuda/cuda_accel.h:92-150, under its tile splitter
        # sutil/WorkDistribution.h:34-91): route to the instanced TLAS-walk
        # backends — the generic ladder below would trace the OBJECT-space
        # concatenated geometry with transforms ignored (wrong results).
        if scene.num_keys > 2 or kind == "pallas":
            from ..trace.pallas_instanced import make_pallas_instanced_tracer

            tracer = make_pallas_instanced_tracer(scene, interpret=interpret)
            return scene, lambda scene_rep, aux, cfg_local: tracer
        from ..trace.hier_instanced import (
            make_inst_hierwalk_tracer, split_order_instanced,
        )

        scene = split_order_instanced(scene)
        inst_pool_ok = (cfg.integrator == "pool"
                        and cfg.ray_block % 256 == 0)
        eff_faces = sum(scene.mesh_ranges[m][1] for m in scene.instance_mesh)
        if (kind == "walkpool"
                or (kind == "auto" and inst_pool_ok
                    and eff_faces > LEAFWALK_MIN_FACES)):
            from ..integrate.walkpool import make_inst_walkpool_pipeline

            tracer = make_inst_walkpool_pipeline(scene, cfg)
        else:
            tracer = make_inst_hierwalk_tracer(scene)
            if (kind in ("auto", "external") and inst_pool_ok
                    and external_shade_eligible(scene, cfg)):
                tracer = make_external_pipeline(scene, cfg, tracer,
                                                interpret=interpret)
        return scene, lambda scene_rep, aux, cfg_local: tracer

    pool_ok = (cfg.integrator == "pool" and cfg.ray_block % 256 == 0
               and getattr(scene, "instances", None) is None)
    big = scene.num_faces > LEAFWALK_MIN_FACES
    large = scene.num_keys <= 2 and big
    if kind == "auto":
        if large:
            if (cfg.integrator == "pool"
                    and getattr(scene, "instances", None) is None):
                kind = "walkpool"
            else:
                kind = ("external"
                        if pool_ok and external_shade_eligible(scene, cfg)
                        else "leafwalk")
        elif big:
            # >2-key piecewise-linear vertex motion at scale: the
            # stacked-segment hierwalk tables (trace/auto.py's ladder
            # routing, hierwalk.build_hier_table_nkey)
            kind = "hierwalk"
        elif pool_ok and fused_shade_eligible(scene, cfg):
            kind = "fused"
        elif pool_ok and external_shade_eligible(scene, cfg):
            kind = "external"
        elif scene.num_keys <= 2:
            kind = "pallas"
        else:
            kind = "brute"

    if kind == "brute":
        return scene, _bruteforce_factory

    if kind == "walkpool":
        # walk-pool integrator marker (integrate/walkpool.py); the shade
        # kernel runs interpret-mode off-TPU, so the sharded step works on
        # CPU-mesh tests and real chips alike
        from ..accel.lbvh import split_order_scene
        from ..integrate.walkpool import make_walkpool_pipeline
        from ..trace.hierwalk import HIER_LEAF, HIER_LEAF_MOTION

        leaf = HIER_LEAF if scene.num_keys == 1 else HIER_LEAF_MOTION
        scene = split_order_scene(scene, leaf=leaf)
        tracer = make_walkpool_pipeline(scene, cfg)
        return scene, lambda scene_rep, aux, cfg_local: tracer

    pair = None
    if kind == "leafwalk" and scene.num_keys == 1:
        from ..accel.lbvh import split_order_scene
        from ..trace.leafwalk import make_leafwalk_tracer

        scene = split_order_scene(scene)
        pair = make_leafwalk_tracer(scene)
    elif kind == "hierwalk" or (kind == "external" and large):
        from ..accel.lbvh import split_order_scene
        from ..trace.hierwalk import (
            HIER_LEAF, HIER_LEAF_MOTION, make_hierwalk_tracer,
        )

        leaf = HIER_LEAF if scene.num_keys == 1 else HIER_LEAF_MOTION
        scene = split_order_scene(scene, leaf=leaf)
        pair = make_hierwalk_tracer(scene)
    else:
        if scene.num_faces > 512 and scene.num_keys == 1:
            from ..accel.lbvh import morton_order_scene

            scene = morton_order_scene(scene)
        if kind != "fused":
            from ..trace.pallas_mt import make_pallas_mt_tracer

            pair = make_pallas_mt_tracer(scene, interpret=interpret)

    if kind == "fused":
        tracer = make_fused_pipeline(scene, cfg, interpret=interpret)
    elif kind == "external":
        tracer = make_external_pipeline(scene, cfg, pair, interpret=interpret)
    else:
        tracer = pair
    return scene, lambda scene_rep, aux, cfg_local: tracer


def make_render_fn_dist(
    scene: Scene,
    cfg: RenderConfig,
    mesh: Mesh,
    tracer_factory: Callable = None,
    tracer_aux=None,
) -> Callable:
    """jit-compiled distributed subframe step: (cam, film) -> (film, stats).

    The film accumulator lives sharded across the "tile" axis and is donated,
    so progressive accumulation never moves pixels between chips. The tracer
    is constructed *inside* the sharded region from the replicated scene
    pytree (tracer_factory(scene, tracer_aux, cfg) -> (closest, any)), so any
    backend — brute force, wide-BVH, Pallas — shards identically.
    """
    if tracer_factory is None:
        tracer_factory = _bruteforce_factory

    n_tile = mesh.shape["tile"]
    n_spp = mesh.shape["spp"]
    if cfg.height % n_tile:
        raise ValueError(f"height {cfg.height} not divisible by tile axis {n_tile}")
    if cfg.samples_per_launch % n_spp:
        raise ValueError(
            f"samples_per_launch {cfg.samples_per_launch} not divisible by "
            f"spp axis {n_spp}"
        )
    cfg_local = replace(cfg, samples_per_launch=cfg.samples_per_launch // n_spp)
    rows = cfg.height // n_tile
    shard_pixels = rows * cfg.width

    img_spec = P("tile", None, None)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(img_spec,
                   (img_spec, img_spec) if cfg.aov else P(),
                   P(), P(), P()),
        # The integrator's scan/while carries mix replicated inits with
        # axis_index-derived varying state; skip the VMA type check rather
        # than pvary-annotating every carry leaf.
        check_vma=False,
    )
    def subframe_shard(scene_rep: Scene, cam: CameraParams, subframe_index):
        tile_r = jax.lax.axis_index("tile")
        spp_r = jax.lax.axis_index("spp")
        tracer = tracer_factory(scene_rep, tracer_aux, cfg_local)
        base = tile_r * shard_pixels
        pix = base + jnp.arange(shard_pixels, dtype=jnp.int32)
        sub_eff = subframe_index * n_spp + spp_r
        rgb, aov, n_rad, n_shad, n_round = render_pixels(
            scene_rep, cfg_local, cam, tracer, pix, sub_eff
        )
        rgb = jax.lax.pmean(rgb.reshape(rows, cfg.width, 3), "spp")
        if aov is not None:
            aov = tuple(
                jax.lax.pmean(a.reshape(rows, cfg.width, 3), "spp")
                for a in aov
            )
        n_rad = jax.lax.psum(n_rad, ("tile", "spp"))
        n_shad = jax.lax.psum(n_shad, ("tile", "spp"))
        n_round = jax.lax.psum(n_round, ("tile", "spp"))
        return rgb, aov, n_rad, n_shad, n_round

    # render_pixels' 5th output is pool_iters for megakernel pipelines and
    # walk_rounds otherwise (integrate/path.py render_subframe routing);
    # probe the factory once host-side so distributed stats agree and the
    # bench's rows/ray / kernel-floor accounting stays valid under the mesh.
    from ..trace.pallas_shade import ExternalPipeline, FusedPipeline

    probe = tracer_factory(scene, tracer_aux, cfg_local)
    round_field = ("pool_iters"
                   if isinstance(probe, (FusedPipeline, ExternalPipeline))
                   else "walk_rounds")

    def step(cam: CameraParams, film: Film):
        rgb, aov, n_rad, n_shad, n_round = subframe_shard(
            scene, cam, film.subframe_index
        )
        film = film_accumulate(film, rgb, aov=aov)
        return film, RenderStats(radiance_rays=n_rad, shadow_rays=n_shad,
                                 **{round_field: n_round})

    return jax.jit(step, donate_argnames=("film",)), mesh


def film_create_sharded(cfg: RenderConfig, mesh: Mesh) -> Film:
    """Film whose accumulator rows live sharded across the tile axis."""
    sharding = NamedSharding(mesh, P("tile", None, None))

    def img():
        return jax.device_put(
            jnp.zeros((cfg.height, cfg.width, 3), jnp.float32), sharding
        )

    subframe = jax.device_put(
        jnp.zeros((), jnp.int32), NamedSharding(mesh, P())
    )
    return Film(accum=img(), subframe_index=subframe,
                albedo=img() if cfg.aov else None,
                normal=img() if cfg.aov else None)


def render_distributed(
    scene: Scene,
    cam: CameraParams,
    cfg: RenderConfig,
    mesh: Optional[Mesh] = None,
    subframes: int = 1,
    tracer_factory: Callable = None,
    tracer_aux=None,
):
    """Offline distributed progressive render. Returns (film, stats)."""
    if mesh is None:
        mesh = make_mesh()
    step, mesh = make_render_fn_dist(
        scene, cfg, mesh, tracer_factory=tracer_factory, tracer_aux=tracer_aux
    )
    film = film_create_sharded(cfg, mesh)
    total_rad = 0
    total_shad = 0
    for _ in range(subframes):
        film, stats = step(cam, film)
        total_rad += int(stats.radiance_rays)
        total_shad += int(stats.shadow_rays)
    return film, RenderStats(
        radiance_rays=jnp.asarray(total_rad), shadow_rays=jnp.asarray(total_shad)
    )
