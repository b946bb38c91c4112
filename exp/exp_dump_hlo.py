"""Dump the compiled HLO of the walkpool step (49k bench shape) so the
per-round copy.* ops seen in the profile can be attributed to state
arrays.

Usage: python exp/exp_dump_hlo.py [K=12] [W=16384] [outdir=/tmp/hlo]

Defaults match trace.auto.tune_config's large_scene_49k schedule (W=16384,
flush_every=8); the already-jitted step is lowered DIRECTLY (step.lower)
so film donation and the cam-params runtime argument survive into the
dumped HLO — an outer jax.jit wrapper would drop donate_argnames aliasing
and bake cam in as a constant, changing the very copy/alias structure this
script exists to attribute.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from bench_tracers import box_field


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    outdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/hlo"

    from rendertoy3c_tpu.accel.lbvh import split_order_scene
    from rendertoy3c_tpu.film.film import film_create
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import make_render_fn
    from rendertoy3c_tpu.integrate.walkpool import make_walkpool_pipeline
    from rendertoy3c_tpu.scene.camera import Camera
    from rendertoy3c_tpu.trace.hierwalk import HIER_LEAF

    scene = split_order_scene(box_field(64), leaf=HIER_LEAF)
    cam = Camera(eye=(0.0, 20.0, 45.0), lookat=(0.0, 0.0, 0.0),
                 up=(0.0, 1.0, 0.0), fov_y=50.0, aspect_ratio=1.0)
    cfg = RenderConfig(width=768, height=768, samples_per_launch=8,
                       max_depth=16, ray_block=w, integrator="pool",
                       pool_pixel_major=True, walk_phase_every=k,
                       flush_every=8)
    wp = make_walkpool_pipeline(scene, cfg)
    step = make_render_fn(scene, cfg, tracer=wp)
    cp = cam.params()
    film = film_create(cfg.height, cfg.width)
    # lower the production jitted step directly: keeps film donation and
    # cam as a runtime argument (ADVICE.md round 2)
    lowered = step.lower(cp, film)
    compiled = lowered.compile()
    txt = compiled.as_text()
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, "walkpool_49k.hlo.txt")
    with open(path, "w") as f:
        f.write(txt)
    print(f"wrote {path} ({len(txt)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
