"""Profile one external-pipeline subframe on the 49k box field (TPU)."""
import sys

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from rendertoy3c_tpu.film.film import film_create
from rendertoy3c_tpu.integrate.config import RenderConfig
from rendertoy3c_tpu.integrate.path import make_render_fn
from rendertoy3c_tpu.scene.camera import Camera
from rendertoy3c_tpu.trace.auto import choose_tracer
from rendertoy3c_tpu.utils.profiling import profile_step
from scripts.bench_tracers import box_field

scene = box_field(64)
cfg = RenderConfig(width=768, height=768, samples_per_launch=8,
                   max_depth=16, ray_block=32768, integrator="pool",
                   pool_pixel_major=True, sort_rays=True)
scene, tracer = choose_tracer(scene, cfg, on_tpu=True)
print("tracer:", type(tracer).__name__, flush=True)
step = make_render_fn(scene, cfg, tracer=tracer)
cam = Camera(eye=(0, 20, 45), lookat=(0, 0, 0), fov_y=50.0,
             aspect_ratio=1.0).params()

rows = profile_step(step, log_dir="/tmp/rt3c_prof49", top=30,
                    rearm=lambda: (cam, film_create(cfg.height, cfg.width)))
for name, ms, cnt in rows:
    print(f"{ms:9.2f} ms  x{cnt:5d}  {name[:90]}")
