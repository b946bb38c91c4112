"""Backend auto-selection: one ladder shared by the CLI, bench, and tests.

The TPU analog of OptiX building one pipeline for any scene
(sutil/Scene.cpp + shader_common.h:74-94): pick the traversal backend by
scene shape, then wrap it with the packed-state Pallas shade kernel
whenever the scene/config allow, so every eligible workload runs the
megakernel pool loop regardless of scene size:

  small static/motion  -> fused megakernel (closest in-kernel, pallas_shade)
  mid-size static      -> tile-cull Pallas MT closest + EXTERNAL shade
  large static (>16k)  -> ordered-DFS hierarchical walk + EXTERNAL shade
  motion past fused    -> tile-cull motion kernels + EXTERNAL shade
  ineligible shading   -> bare tracer + the general XLA pool

Returns (scene, tracer): the scene may be re-ordered (Morton/median-split)
so face ids match the shade tables — always render the RETURNED scene.
"""
from __future__ import annotations

import dataclasses

import jax

# Measured crossover (v5e, round 1): tile-granular culling degenerates to a
# dense sweep on incoherent bounce wavefronts past ~16k faces, while the
# per-ray walks keep scaling (round 2: the ordered-DFS hierwalk beats the
# flat leafwalk end-to-end at 49k and 197k faces).
LEAFWALK_MIN_FACES = 16384

# Pool width for the large-scene walks. The walk's while_loop pays the MAX
# round count over the wavefront while useful work scales with the MEAN,
# and max round count grows with width — so NARROW pools run at better
# straggler efficiency until per-iteration fixed costs dominate. Measured
# on v5e with the retire-stash walk pool (sort on, flush 8), best Mray/s
# by width 4096/8192/16384: 49k field 9.53/9.48/8.57; 200k town
# 7.63/7.76/6.03; 1M town 2.54/5.77/4.46 (the 39MB table needs >=8k rows
# in flight to cover HBM gather latency); 562k instance field
# 7.87/7.67/6.62. 8192 is the single best default across the band. (A
# 128k pool once measured 5-10x faster — that was the >=98304-lane
# while_loop miscompile producing all-miss renders; see
# hierwalk._WALK_CHUNK. Chunked-correct 128k pools LOSE: the chunks pay
# max-rounds per chunk while pool glue grows.)
POOL_BLOCK_LARGE = 8192


def tune_config(scene, cfg, on_tpu: bool | None = None):
    """Scene-aware pool-schedule knobs (the measured v5e optimum for the
    large-scene walk band): 16k-lane pool (straggler efficiency, see
    above), coherence re-sort on (the row gathers are locality-sensitive:
    49k field 3.75 vs 3.47 unsorted), flush cadence 8. Callers apply this
    BEFORE choose_tracer so the pipeline kernels bake the same config."""
    if on_tpu is None:
        on_tpu = jax.devices()[0].platform == "tpu"
    if not (on_tpu and cfg.integrator == "pool"):
        return cfg
    if _is_instanced(scene) and scene.num_keys <= 2:
        # instanced TLAS walk: sort costs more than its gather locality
        # buys on the small shared tables (9.8 vs 7.3 Mray/s on the
        # trace-time cornell config). Static fields that take the baked
        # world-space table walk like flat scenes and amortize per-op
        # launch gaps over wider rounds (v5e 562k towers: 18.5@16k vs
        # 17.8@8k; sort measured par — the instance-major leaf order is
        # already camera-coherent).
        from .hier_instanced import baked_world_eligible

        eff = sum(scene.mesh_ranges[m][1] for m in scene.instance_mesh)
        wide = baked_world_eligible(scene) and eff > LEAFWALK_MIN_FACES
        return dataclasses.replace(
            cfg,
            ray_block=min(cfg.ray_block,
                          2 * POOL_BLOCK_LARGE if wide else POOL_BLOCK_LARGE),
            sort_rays=False,
            flush_every=cfg.flush_every or 8,
        )
    if (not _is_instanced(scene)
            and scene.num_faces > LEAFWALK_MIN_FACES):
        # the walk pool ignores sort_rays (lanes never re-sort: walk state
        # rides in place). Width by scene size (v5e, SAH order, pipelined
        # pool): sub-100k scenes amortize per-op launch gaps over wider
        # rounds (49k field 16.8@16k vs 16.6@8k) while bigger tables pay
        # more straggler rounds than the gap amortization saves (200k town
        # 11.1@16k vs 11.7@8k, 1M 7.9@16k vs 8.7@8k).
        wide = scene.num_faces < 100_000
        return dataclasses.replace(
            cfg,
            ray_block=min(cfg.ray_block,
                          2 * POOL_BLOCK_LARGE if wide else POOL_BLOCK_LARGE),
            flush_every=cfg.flush_every or 8,
        )
    return cfg


def _is_instanced(scene) -> bool:
    """True for InstancedScene (trace-time two-level AS)."""
    return hasattr(scene, "instance_mesh")


def choose_tracer(scene, cfg, on_tpu: bool | None = None,
                  want_pipeline: bool = True):
    """Pick (scene, tracer) for the path renderer.

    want_pipeline: allow Fused/External pipeline tracers (pool integrator
    only). Off for the wave integrator or callers that need a bare
    (closest, any) pair.
    """
    if on_tpu is None:
        on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        return scene, None

    from .pallas_mt import make_pallas_mt_tracer
    from .pallas_shade import (
        external_shade_eligible,
        fused_shade_eligible,
        make_external_pipeline,
        make_fused_pipeline,
    )

    if _is_instanced(scene):
        # trace-time two-level AS: the instanced TLAS walk for static and
        # 2-key matrix-motion scenes (9.8 vs 6.3 Mray/s over the unrolled
        # pallas kernels on the trace-time cornell config; motion instance
        # rows invert the time-lerped transform per ray), pallas kernels
        # for >2 transform keys
        if scene.num_keys <= 2:
            from .hier_instanced import (
                make_inst_hierwalk_tracer, split_order_instanced,
            )

            scene = split_order_instanced(scene)
            inst_pipeline_ok = (want_pipeline and cfg.integrator == "pool"
                                and cfg.ray_block % 256 == 0)
            # effective workload = every instance's mesh footprint: the
            # walk pool wins once walks get long (measured 560k-effective
            # instance field: 3.0 -> 6.6 Mray/s), while short walks favor
            # one shade boundary per whole segment (cornell-scale
            # trace-time config: 27.6 classic vs 12.3 walk pool)
            eff_faces = sum(scene.mesh_ranges[m][1]
                            for m in scene.instance_mesh)
            if inst_pipeline_ok and eff_faces > LEAFWALK_MIN_FACES:
                from ..integrate.walkpool import make_inst_walkpool_pipeline

                return scene, make_inst_walkpool_pipeline(scene, cfg)
            tracer = make_inst_hierwalk_tracer(scene)
            if inst_pipeline_ok and external_shade_eligible(scene, cfg):
                # packed-state shade kernel with in-kernel instance
                # normal transform (9 inverse-transpose attr rows)
                return scene, make_external_pipeline(scene, cfg, tracer)
            return scene, tracer
        from .pallas_instanced import make_pallas_instanced_tracer

        return scene, make_pallas_instanced_tracer(scene)

    pipeline_ok = (want_pipeline and cfg.integrator == "pool"
                   and cfg.ray_block % 256 == 0
                   and getattr(scene, "instances", None) is None)

    if scene.num_faces > LEAFWALK_MIN_FACES:
        from ..accel.lbvh import split_order_scene
        from .hierwalk import (
            HIER_LEAF, HIER_LEAF_MOTION, build_hier_table,
            make_hierwalk_tracer,
        )

        leaf = HIER_LEAF if scene.num_keys == 1 else HIER_LEAF_MOTION
        scene = split_order_scene(scene, leaf=leaf)
        if scene.num_keys <= 2 and want_pipeline and cfg.integrator == "pool":
            # walk-pool integrator: the traversal round is the pool step
            # (mean-visits-bound lane utilization, integrate/walkpool.py)
            from ..integrate.walkpool import make_walkpool_pipeline

            return scene, make_walkpool_pipeline(scene, cfg)
        # >2-key piecewise-linear motion rides the stacked-segment
        # hierwalk tables (hierwalk.build_hier_table_nkey) through the
        # classic pool — the fast-path answer to the reference's N-key
        # motion GAS (cuda_mesh.h:85-88)
        tracer = make_hierwalk_tracer(scene)
        if (scene.num_keys <= 2 and pipeline_ok
                and external_shade_eligible(scene, cfg)):
            return scene, make_external_pipeline(scene, cfg, tracer)
        return scene, tracer

    if scene.num_faces > 512 and scene.num_keys == 1:
        # spatially coherent face order tightens the per-tile cull AABBs
        # (must happen before tracer build so prim ids match the tables)
        from ..accel.lbvh import morton_order_scene

        scene = morton_order_scene(scene)

    if pipeline_ok and fused_shade_eligible(scene, cfg):
        return scene, make_fused_pipeline(scene, cfg)
    tracer = make_pallas_mt_tracer(scene)
    if pipeline_ok and external_shade_eligible(scene, cfg):
        return scene, make_external_pipeline(scene, cfg, tracer)
    return scene, tracer
