"""OBJ/MTL loader parity with the reference loader's behavior
(src/mesh.cpp:37-210): per-material split, vertex dedup, keyframe stacking,
texture loading with v-flip."""
import os

import numpy as np
import pytest

from rendertoy3c_tpu.io import load_obj, parse_mtl
from rendertoy3c_tpu.scene import build_scene


OBJ_1 = """
mtllib test.mtl
o quad
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 0 1
usemtl red
f 1/1/1 2/2/1 3/3/1 4/4/1
usemtl lamp
f -4/-4/-1 -3/-3/-1 -2/-2/-1
"""

MTL = """
newmtl red
Kd 0.8 0.1 0.1
Ni 1.5
Pr 0.3
newmtl lamp
Kd 0 0 0
Ke 10 10 10
"""


@pytest.fixture
def obj_dir(tmp_path):
    (tmp_path / "test.obj").write_text(OBJ_1)
    (tmp_path / "test.mtl").write_text(MTL)
    return tmp_path


def test_load_splits_per_material(obj_dir):
    meshes, textures = load_obj(str(obj_dir / "test.obj"))
    assert len(meshes) == 2  # red + lamp
    by_mat = {tuple(m.material.diffuse): m for m in meshes}
    red = by_mat[(0.8, 0.1, 0.1)]
    assert red.num_faces == 2  # quad fan-triangulated
    assert red.material.ior == 1.5
    assert red.material.roughness == pytest.approx(0.3)
    lamp = by_mat[(0.0, 0.0, 0.0)]
    assert lamp.num_faces == 1
    assert lamp.material.emissive == (10.0, 10.0, 10.0)


def test_vertex_dedup(obj_dir):
    meshes, _ = load_obj(str(obj_dir / "test.obj"))
    red = [m for m in meshes if m.material.diffuse == (0.8, 0.1, 0.1)][0]
    # quad = 2 triangles sharing 2 verts -> 4 unique vertices
    assert red.vertices.shape == (1, 4, 3)
    assert red.texcoords.shape == (4, 2)


def test_negative_indices(obj_dir):
    meshes, _ = load_obj(str(obj_dir / "test.obj"))
    lamp = [m for m in meshes if m.material.emissive == (10.0, 10.0, 10.0)][0]
    np.testing.assert_allclose(lamp.vertices[0][0], [0, 0, 0])
    np.testing.assert_allclose(lamp.vertices[0][1], [1, 0, 0])


def test_keyframes(tmp_path):
    (tmp_path / "k0.obj").write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n"
    )
    (tmp_path / "k1.obj").write_text(
        "v 2 0 0\nv 3 0 0\nv 2 1 0\nf 1 2 3\n"
    )
    meshes, _ = load_obj([str(tmp_path / "k0.obj"), str(tmp_path / "k1.obj")])
    assert len(meshes) == 1
    m = meshes[0]
    assert m.num_keys == 2
    np.testing.assert_allclose(m.vertices[1] - m.vertices[0],
                               [[2, 0, 0]] * 3)
    scene = build_scene(meshes)
    assert scene.num_keys == 2


def test_texture_loading(tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    img = np.zeros((4, 4, 3), np.uint8)
    img[0, 0] = (255, 0, 0)  # top-left red in file
    PIL.fromarray(img).save(tmp_path / "tex.png")
    (tmp_path / "t.obj").write_text(
        "mtllib t.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 0 1\nusemtl m\nf 1/1 2/2 3/3\n"
    )
    (tmp_path / "t.mtl").write_text("newmtl m\nKd 1 1 1\nmap_Kd tex.png\n")
    meshes, textures = load_obj(str(tmp_path / "t.obj"))
    assert len(textures) == 1
    assert meshes[0].material.diffuse_texture_id == 0
    tex = textures[0]
    assert tex.shape == (4, 4, 4)
    # v-flip: the file's top-left red pixel lands at the bottom row
    np.testing.assert_array_equal(tex[3, 0, :3], [255, 0, 0])


def test_missing_texture_is_minus_one(tmp_path):
    (tmp_path / "t.obj").write_text(
        "mtllib t.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\nusemtl m\nf 1 2 3\n"
    )
    (tmp_path / "t.mtl").write_text("newmtl m\nmap_Kd nonexistent.png\n")
    meshes, textures = load_obj(str(tmp_path / "t.obj"))
    assert meshes[0].material.diffuse_texture_id == -1
    assert textures == []


def test_obj_to_scene_end_to_end(obj_dir):
    meshes, textures = load_obj(str(obj_dir / "test.obj"))
    scene = build_scene(meshes, textures=textures)
    assert scene.num_faces == 3
    assert scene.num_lights == 1  # lamp triangle
