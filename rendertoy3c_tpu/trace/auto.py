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

import jax

# Measured crossover (v5e, round 1): tile-granular culling degenerates to a
# dense sweep on incoherent bounce wavefronts past ~16k faces, while the
# per-ray walks keep scaling (round 2: the ordered-DFS hierwalk beats the
# flat leafwalk end-to-end at 49k and 197k faces).
LEAFWALK_MIN_FACES = 16384


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

    pipeline_ok = (want_pipeline and cfg.integrator == "pool"
                   and cfg.ray_block % 256 == 0
                   and getattr(scene, "instances", None) is None)

    if scene.num_keys == 1 and scene.num_faces > LEAFWALK_MIN_FACES:
        from ..accel.lbvh import split_order_scene
        from .hierwalk import HIER_LEAF, make_hierwalk_tracer

        scene = split_order_scene(scene, leaf=HIER_LEAF)
        tracer = make_hierwalk_tracer(scene)
        if pipeline_ok and external_shade_eligible(scene, cfg):
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
