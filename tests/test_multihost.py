"""Multi-host (multi-process) rendering: two CPU processes x 4 virtual
devices on one machine (jax.distributed + gloo collectives) must produce
the single-process image bit-for-bit (SURVEY.md S2.6's DCN story,
parallel/multihost.py).

Runs in subprocesses: jax.distributed.initialize is process-global and
cannot share the pytest process (conftest already initialized a backend).
"""
import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
from rendertoy3c_tpu.parallel.multihost import (
    assemble_film, init_multihost, make_render_fn_multihost)
init_multihost("localhost:" + port, 2, pid)
assert jax.device_count() == 8 and jax.local_device_count() == 4

from rendertoy3c_tpu.integrate.config import RenderConfig
from rendertoy3c_tpu.scene.builtin import cornell_box
from rendertoy3c_tpu.scene.scene import build_scene

cfg = RenderConfig(width=32, height=32, samples_per_launch=2, max_depth=3,
                   ray_block=256)
meshes, camera = cornell_box()
camera.aspect_ratio = 1.0
scene = build_scene(meshes)
step, mesh, film = make_render_fn_multihost(scene, cfg, tracer_kind="brute")
rays = 0
for _ in range(2):
    film, stats = step(camera.params(), film)
    rays += int(stats.radiance_rays)
import numpy as np
img = assemble_film(film.accum)
np.save(outdir + "/img%d.npy" % pid, np.asarray(img))
open(outdir + "/rays%d.txt" % pid, "w").write(str(rays))
print("worker", pid, "ok", flush=True)
"""


def test_two_process_render_bit_identical(tmp_path):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    port = "29581"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), port, str(tmp_path)],
            env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for pr in procs:
        try:
            out, _ = pr.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out")
        outs.append(out)
    for pid, (pr, out) in enumerate(zip(procs, outs)):
        assert pr.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"

    img0 = np.load(tmp_path / "img0.npy")
    img1 = np.load(tmp_path / "img1.npy")
    np.testing.assert_array_equal(img0, img1)
    assert int(open(tmp_path / "rays0.txt").read()) > 0

    # single-process reference: the (8-tile, 1-spp) mesh is bit-identical
    # to a single device, so the two-process image must match it too
    from rendertoy3c_tpu.film.film import film_create
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import render_frame
    from rendertoy3c_tpu.scene.builtin import cornell_box
    from rendertoy3c_tpu.scene.scene import build_scene

    cfg = RenderConfig(width=32, height=32, samples_per_launch=2,
                       max_depth=3, ray_block=256)
    meshes, camera = cornell_box()
    camera.aspect_ratio = 1.0
    scene = build_scene(meshes)
    film_ref, _ = render_frame(scene, camera.params(), cfg, subframes=2)
    np.testing.assert_array_equal(img0, np.asarray(film_ref.accum))


_WORKER_WALKPOOL = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
from rendertoy3c_tpu.parallel.multihost import (
    assemble_film, init_multihost, make_render_fn_multihost)
init_multihost("localhost:" + port, 2, pid)
assert jax.device_count() == 8 and jax.local_device_count() == 4

from rendertoy3c_tpu.integrate.config import RenderConfig
from rendertoy3c_tpu.scene.builtin import cornell_box
from rendertoy3c_tpu.scene.scene import build_scene

cfg = RenderConfig(width=32, height=32, samples_per_launch=2, max_depth=3,
                   ray_block=256, integrator="pool")
meshes, camera = cornell_box()
camera.aspect_ratio = 1.0
scene = build_scene(meshes)
step, mesh, film = make_render_fn_multihost(scene, cfg,
                                            tracer_kind="walkpool")
for _ in range(2):
    film, stats = step(camera.params(), film)
import numpy as np
img = assemble_film(film.accum)
np.save(outdir + "/wp_img%d.npy" % pid, np.asarray(img))
print("worker", pid, "ok", flush=True)
"""


def test_two_process_walkpool_bit_identical(tmp_path):
    """A PRODUCTION pool backend (the walk-pool factory) over the
    two-process gloo mesh — the process-spanning mesh + the resumable
    walk state is exactly the combination most likely to break (VERDICT
    r3 weak #5). Must be bit-identical to the same 8-device sharded run
    in one process."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    port = "29583"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER_WALKPOOL,
             str(pid), port, str(tmp_path)],
            env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for pr in procs:
        try:
            out, _ = pr.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host walkpool worker timed out")
        outs.append(out)
    for pid, (pr, out) in enumerate(zip(procs, outs)):
        assert pr.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"

    img0 = np.load(tmp_path / "wp_img0.npy")
    img1 = np.load(tmp_path / "wp_img1.npy")
    np.testing.assert_array_equal(img0, img1)

    # single-process reference over the SAME 8-way (tile, spp) mesh and
    # the same walkpool factory: per-shard work is identical, so the
    # two-process image must match bit for bit
    import jax

    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.parallel.dist import (
        film_create_sharded, make_mesh, make_render_fn_dist,
        prepare_tracer_factory,
    )
    from rendertoy3c_tpu.scene.builtin import cornell_box
    from rendertoy3c_tpu.scene.scene import build_scene

    cfg = RenderConfig(width=32, height=32, samples_per_launch=2,
                       max_depth=3, ray_block=256, integrator="pool")
    meshes, camera = cornell_box()
    camera.aspect_ratio = 1.0
    scene = build_scene(meshes)
    scene2, fac = prepare_tracer_factory(scene, cfg, kind="walkpool")
    mesh = make_mesh(n_spp=1)
    step, mesh = make_render_fn_dist(scene2, cfg, mesh, tracer_factory=fac)
    film = film_create_sharded(cfg, mesh)
    for _ in range(2):
        film, _stats = step(camera.params(), film)
    np.testing.assert_array_equal(img0, np.asarray(film.accum))
