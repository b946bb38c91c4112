"""CLI + checkpoint/resume tests (SURVEY.md S5 config & checkpoint items)."""
import os

import numpy as np
import pytest

from rendertoy3c_tpu.app.cli import main
from rendertoy3c_tpu.film.film import film_create
from rendertoy3c_tpu.integrate.config import RenderConfig
from rendertoy3c_tpu.integrate.path import render_frame
from rendertoy3c_tpu.scene.builtin import cornell_box
from rendertoy3c_tpu.scene.scene import build_scene
from rendertoy3c_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def test_cli_renders_png(tmp_path):
    out = str(tmp_path / "out.png")
    rc = main([
        "--scene", "cornell", "--size", "24x24", "--spp", "1",
        "--subframes", "2", "--max-depth", "3", "--tracer", "brute",
        "--ray-block", "256", "-o", out,
    ])
    assert rc == 0
    data = open(out, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert len(data) > 100


def test_cli_profile_prints_op_table(tmp_path, capsys):
    out = str(tmp_path / "prof.png")
    rc = main([
        "--scene", "cornell-empty", "--size", "16x16", "--spp", "1",
        "--subframes", "1", "--max-depth", "2", "--tracer", "brute",
        "--ray-block", "256", "--profile",
        "--profile-dir", str(tmp_path / "trace"), "-o", out,
    ])
    assert rc == 0
    err = capsys.readouterr().err
    assert "device profile" in err


def test_cli_bvh_and_exr(tmp_path):
    out = str(tmp_path / "out.exr")
    rc = main([
        "--scene", "cornell-empty", "--size", "16x16", "--spp", "1",
        "--subframes", "1", "--max-depth", "2", "--tracer", "bvh",
        "--ray-block", "256", "-o", out,
    ])
    assert rc == 0
    assert open(out, "rb").read(4) == b"\x76\x2f\x31\x01"  # EXR magic


def test_cli_distributed_mesh(tmp_path):
    out = str(tmp_path / "dist.png")
    rc = main([
        "--scene", "cornell", "--size", "32x32", "--spp", "2",
        "--subframes", "1", "--max-depth", "2", "--tracer", "brute",
        "--ray-block", "256", "--mesh-shape", "4x2", "-o", out,
    ])
    assert rc == 0
    assert os.path.exists(out)


def test_checkpoint_resume_bit_exact(tmp_path):
    meshes, camera = cornell_box()
    scene = build_scene(meshes)
    cfg = RenderConfig(width=16, height=16, samples_per_launch=1,
                       max_depth=3, ray_block=256)
    cam = camera.params()

    film_full, _ = render_frame(scene, cam, cfg, subframes=4)

    film_half, _ = render_frame(scene, cam, cfg, subframes=2)
    ckpt = str(tmp_path / "film.npz")
    save_checkpoint(ckpt, film_half, cfg)
    film_resumed = load_checkpoint(ckpt, cfg)
    assert int(film_resumed.subframe_index) == 2
    film_done, _ = render_frame(
        scene, cam, cfg, subframes=2, film=film_resumed
    )

    np.testing.assert_array_equal(
        np.asarray(film_done.accum), np.asarray(film_full.accum)
    )


def test_checkpoint_validates_config(tmp_path):
    film = film_create(8, 8)
    cfg = RenderConfig(width=8, height=8)
    ckpt = str(tmp_path / "film.npz")
    save_checkpoint(ckpt, film, cfg)
    with pytest.raises(ValueError):
        load_checkpoint(ckpt, RenderConfig(width=16, height=16))
    with pytest.raises(ValueError):
        load_checkpoint(ckpt, RenderConfig(width=8, height=8, seed=7))


def test_seed_decorrelates():
    meshes, camera = cornell_box()
    scene = build_scene(meshes)
    cam = camera.params()
    base = dict(width=16, height=16, samples_per_launch=1, max_depth=3,
                ray_block=256)
    f0, _ = render_frame(scene, cam, RenderConfig(**base), subframes=1)
    f1, _ = render_frame(scene, cam, RenderConfig(seed=123, **base), subframes=1)
    a0 = np.asarray(f0.accum)
    a1 = np.asarray(f1.accum)
    assert not np.array_equal(a0, a1)
    assert abs(a0.mean() - a1.mean()) < 0.2  # same scene statistics


def test_cli_obj_file_end_to_end(tmp_path):
    """Render an actual .obj scene through the CLI (the reference app's
    whole pipeline: loadOBJ -> build -> render -> save)."""
    (tmp_path / "scene.obj").write_text(
        "mtllib scene.mtl\n"
        "v -2 0 -2\nv 2 0 -2\nv 2 0 2\nv -2 0 2\n"
        "v -0.5 2.5 -0.5\nv -0.5 2.5 0.5\nv 0.5 2.5 0.5\nv 0.5 2.5 -0.5\n"
        "usemtl white\nf 1 2 3\nf 1 3 4\n"
        "usemtl lamp\nf 5 6 7\nf 5 7 8\n"
    )
    (tmp_path / "scene.mtl").write_text(
        "newmtl white\nKd 0.7 0.7 0.7\n"
        "newmtl lamp\nKd 0 0 0\nKe 15 15 15\n"
    )
    out = str(tmp_path / "obj.png")
    rc = main([
        "--scene", str(tmp_path / "scene.obj"), "--size", "16x16",
        "--spp", "1", "--subframes", "1", "--max-depth", "3",
        "--tracer", "brute", "--ray-block", "256",
        "--eye", "0,2,5", "--lookat", "0,0.5,0", "-o", out,
    ])
    assert rc == 0
    import numpy as np
    from rendertoy3c_tpu.film.image import read_png

    img = read_png(out)
    assert img[..., :3].max() > 0  # something rendered


def test_cli_residentwalk_tracer(tmp_path):
    """--tracer residentwalk selects the VMEM-resident-table block walk."""
    out = str(tmp_path / "rw.png")
    rc = main([
        "--scene", "cornell-empty", "--size", "16x16", "--spp", "1",
        "--subframes", "1", "--max-depth", "2", "--tracer", "residentwalk",
        "--ray-block", "256", "-o", out,
    ])
    assert rc == 0
    assert open(out, "rb").read(8) == b"\x89PNG\r\n\x1a\n"
