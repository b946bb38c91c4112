"""First-hit AOV buffers (albedo + shading normal) — the denoiser guide
inputs (the reference's realtime-denoiser roadmap item needs the same;
README.md:20)."""
import numpy as np
import pytest

from rendertoy3c_tpu.integrate.config import RenderConfig
from rendertoy3c_tpu.integrate.path import render_frame
from rendertoy3c_tpu.scene.builtin import cornell_box
from rendertoy3c_tpu.scene.scene import build_scene

_BASE = dict(width=24, height=24, samples_per_launch=2, max_depth=3,
             ray_block=576, aov=True)


def _render(integrator, **kw):
    meshes, cam = cornell_box()
    scene = build_scene(meshes)
    cfg = RenderConfig(integrator=integrator, **_BASE, **kw)
    film, _ = render_frame(scene, cam.params(), cfg, subframes=2)
    return film


def test_aov_wave_buffers():
    film = _render("wave")
    alb = np.asarray(film.albedo)
    nrm = np.asarray(film.normal)
    assert np.isfinite(alb).all() and np.isfinite(nrm).all()
    # every camera ray hits the closed cornell box: albedo > 0 everywhere
    assert (alb.sum(axis=-1) > 0).mean() > 0.95
    # the buffer is a mean of unit normals: |n| <= 1, and == 1 wherever all
    # of a pixel's samples hit the same plane (most of a cornell box)
    ln = np.linalg.norm(nrm, axis=-1)
    assert ln.max() <= 1.0 + 1e-4
    assert (np.abs(ln - 1.0) < 1e-4).mean() > 0.5
    # the back wall faces the camera: +z-dominant normals are common
    assert (nrm[..., 2] > 0.9).mean() > 0.2
    # left wall pixels carry the red diffuse albedo
    red = (alb[..., 0] > 0.5) & (alb[..., 1] < 0.1)
    assert red.any()


def test_aov_pool_matches_wave():
    f_wave = _render("wave")
    f_pool = _render("pool", pool_pixel_major=True)
    # first-hit AOVs use the same jitter streams: identical up to float
    # summation order across samples
    np.testing.assert_allclose(np.asarray(f_pool.albedo),
                               np.asarray(f_wave.albedo), atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_pool.normal),
                               np.asarray(f_wave.normal), atol=1e-5)


def test_aov_pool_sample_major():
    f_wave = _render("wave")
    f_pool = _render("pool", pool_pixel_major=False)
    np.testing.assert_allclose(np.asarray(f_pool.albedo),
                               np.asarray(f_wave.albedo), atol=1e-5)


def test_aov_off_leaves_film_plain():
    meshes, cam = cornell_box()
    scene = build_scene(meshes)
    cfg = RenderConfig(width=16, height=16, samples_per_launch=1,
                       max_depth=2, ray_block=256)
    film, _ = render_frame(scene, cam.params(), cfg, subframes=1)
    assert film.albedo is None and film.normal is None


def test_aov_distributed():
    from rendertoy3c_tpu.parallel.dist import make_mesh, render_distributed

    meshes, cam = cornell_box()
    scene = build_scene(meshes)
    cfg = RenderConfig(width=16, height=16, samples_per_launch=2,
                       max_depth=2, ray_block=256, aov=True)
    mesh = make_mesh(n_tile=4, n_spp=2)
    film, _ = render_distributed(scene, cam.params(), cfg, mesh=mesh,
                                 subframes=1)
    alb = np.asarray(film.albedo)
    assert np.isfinite(alb).all()
    assert (alb.sum(axis=-1) > 0).mean() > 0.9


def test_aov_cli_writes_guides_and_denoises(tmp_path):
    from rendertoy3c_tpu.app.cli import main

    out = str(tmp_path / "out.png")
    rc = main([
        "--scene", "cornell", "--size", "20x20", "--spp", "1",
        "--subframes", "2", "--max-depth", "3", "--tracer", "brute",
        "--ray-block", "512", "--aov", "--denoise", "2", "-o", out,
    ])
    assert rc == 0
    import os

    assert os.path.exists(str(tmp_path / "out.albedo.png"))
    assert os.path.exists(str(tmp_path / "out.normal.png"))


def test_aov_checkpoint_roundtrip(tmp_path):
    from rendertoy3c_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    film = _render("wave")
    cfg = RenderConfig(integrator="wave", **_BASE)
    p = str(tmp_path / "f.npz")
    save_checkpoint(p, film, cfg)
    f2 = load_checkpoint(p, cfg)
    np.testing.assert_array_equal(np.asarray(f2.albedo),
                                  np.asarray(film.albedo))


def test_aov_fused_matches_pool():
    """The fused pipeline's in-kernel first-hit AOV accumulators match the
    unfused pool's (_shade_and_nee sh_albedo/sh_normal at depth 0)."""
    from rendertoy3c_tpu.trace.pallas_shade import make_fused_pipeline

    meshes, cam = cornell_box()
    scene = build_scene(meshes)
    cfg = RenderConfig(integrator="pool", pool_pixel_major=True,
                       width=16, height=16, samples_per_launch=2,
                       max_depth=3, ray_block=512, aov=True)
    film_ref, _ = render_frame(scene, cam.params(), cfg, subframes=2)
    pipe = make_fused_pipeline(scene, cfg, interpret=True)
    film_got, _ = render_frame(scene, cam.params(), cfg, subframes=2,
                               tracer=pipe)
    np.testing.assert_allclose(np.asarray(film_got.accum),
                               np.asarray(film_ref.accum),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(film_got.albedo),
                               np.asarray(film_ref.albedo),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(film_got.normal),
                               np.asarray(film_ref.normal),
                               rtol=1e-4, atol=1e-5)


def test_aov_fused_motion_matches_pool():
    """Motion megakernel + AOV accumulators together (time-lerped closest
    in-kernel, first-hit guides at the time-sampled hit)."""
    from rendertoy3c_tpu.scene.scene import Instance, build_scene as _bs
    from rendertoy3c_tpu.trace.pallas_shade import make_fused_pipeline

    meshes, cam = cornell_box()
    two_key = np.zeros((2, 3, 4), np.float32)
    two_key[:, :, :3] = np.eye(3)
    two_key[1, 0, 3] = 0.25
    inst = [Instance(mesh_index=i) for i in range(len(meshes) - 1)]
    inst.append(Instance(mesh_index=len(meshes) - 1, transforms=two_key))
    scene = _bs(meshes, instances=inst)
    assert scene.num_keys == 2
    cfg = RenderConfig(integrator="pool", pool_pixel_major=True,
                       width=16, height=16, samples_per_launch=2,
                       max_depth=3, ray_block=512, aov=True)
    film_ref, _ = render_frame(scene, cam.params(), cfg, subframes=2)
    pipe = make_fused_pipeline(scene, cfg, interpret=True)
    film_got, _ = render_frame(scene, cam.params(), cfg, subframes=2,
                               tracer=pipe)
    np.testing.assert_allclose(np.asarray(film_got.accum),
                               np.asarray(film_ref.accum),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(film_got.albedo),
                               np.asarray(film_ref.albedo),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(film_got.normal),
                               np.asarray(film_ref.normal),
                               rtol=1e-4, atol=1e-5)
