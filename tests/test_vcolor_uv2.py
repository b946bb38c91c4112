"""COLOR_0 vertex colors + second texcoord set (legacy whitted-stack parity:
cuda/GeometryData.h:55-80 num_texcoords=2 + colors, LocalGeometry.h:97-139
interpolation, MaterialData.h:68 per-texture texcoord index, whitted.cu:157
base-color fold, sutil/Scene.cpp:503-529 loading)."""
import base64
import json

import numpy as np

from rendertoy3c_tpu.integrate.config import RenderConfig
from rendertoy3c_tpu.integrate.direct import render_direct
from rendertoy3c_tpu.io.gltf import load_gltf
from rendertoy3c_tpu.scene.builtin import quad
from rendertoy3c_tpu.scene.camera import Camera
from rendertoy3c_tpu.scene.material import Material
from rendertoy3c_tpu.scene.mesh import Mesh
from rendertoy3c_tpu.scene.scene import build_scene


def _gltf_with_color_uv1(tmp_path):
    """Quad with COLOR_0 (float VEC4), TEXCOORD_0+1, and a material whose
    emissive texture selects texcoord set 1."""
    pos = np.array([[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]],
                   np.float32)
    uv0 = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    uv1 = 0.5 * uv0
    col = np.array([[1, 0, 0, 1], [0, 1, 0, 0.5],
                    [0, 0, 1, 1], [1, 1, 1, 0.25]], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    buf = (pos.tobytes() + uv0.tobytes() + uv1.tobytes() + col.tobytes()
           + idx.tobytes())
    j = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "TEXCOORD_0": 1, "TEXCOORD_1": 2,
                           "COLOR_0": 3},
            "indices": 4, "material": 0,
        }]}],
        # image decode may be unavailable (no PIL) — texCoord parsing is
        # independent of it, so no "images" entry is needed
        "materials": [{
            "pbrMetallicRoughness": {"baseColorFactor": [1, 1, 1, 1]},
            "emissiveFactor": [1, 1, 1],
            "emissiveTexture": {"index": 0, "texCoord": 1},
        }],
        "textures": [{}],
        "buffers": [{"byteLength": len(buf), "uri":
                     "data:application/octet-stream;base64,"
                     + base64.b64encode(buf).decode()}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 32},
            {"buffer": 0, "byteOffset": 80, "byteLength": 32},
            {"buffer": 0, "byteOffset": 112, "byteLength": 64},
            {"buffer": 0, "byteOffset": 176, "byteLength": 12},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4,
             "type": "VEC2"},
            {"bufferView": 2, "componentType": 5126, "count": 4,
             "type": "VEC2"},
            {"bufferView": 3, "componentType": 5126, "count": 4,
             "type": "VEC4"},
            {"bufferView": 4, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
    }
    path = tmp_path / "colored.gltf"
    path.write_text(json.dumps(j))
    return str(path)


def test_gltf_loads_color0_and_texcoord1(tmp_path):
    meshes, _, _, _ = load_gltf(_gltf_with_color_uv1(tmp_path))
    (mesh,) = meshes
    assert mesh.colors is not None and mesh.colors.shape == (4, 4)
    np.testing.assert_allclose(mesh.colors[1], [0, 1, 0, 0.5])
    assert mesh.texcoords1 is not None and mesh.texcoords1.shape == (4, 2)
    # u channel is unflipped: set 1 was authored at half of set 0
    np.testing.assert_allclose(mesh.texcoords1[:, 0],
                               0.5 * mesh.texcoords[:, 0])
    assert mesh.material.emissive_tex_uv == 1
    assert mesh.material.diffuse_tex_uv == 0

    scene = build_scene(meshes)
    assert scene.geom.c0 is not None and scene.geom.uv0b is not None
    assert int(np.asarray(scene.materials.tex_uv)[0, 2]) == 1


def test_vec3_color0_widens_to_rgba():
    m = Mesh(vertices=np.zeros((1, 3, 3), np.float32),
             indices=np.array([[0, 1, 2]]),
             colors=np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32))
    assert m.colors.shape == (3, 4)
    np.testing.assert_allclose(m.colors[:, 3], 1.0)


def test_scene_without_color_has_none_fields():
    v, f = quad([-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1])
    scene = build_scene([Mesh(vertices=v[None], indices=f)])
    g = scene.geom
    assert g.c0 is None and g.uv0b is None


def _overhead_cam():
    return Camera(eye=(0, 3, 0.01), lookat=(0, 0, 0), up=(0, 0, -1),
                  fov_y=60.0, aspect_ratio=1.0)


def test_vertex_color_modulates_base(tmp_path):
    """whitted.cu:157: base_color *= interpolated COLOR_0 — an all-green
    vertex-colored white quad must shade green under ambient light."""
    v, f = quad([-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1])
    cols = np.tile(np.array([[0.0, 1.0, 0.0, 1.0]], np.float32), (4, 1))
    mesh = Mesh(vertices=v[None], indices=f, colors=cols,
                material=Material(diffuse=(1.0, 1.0, 1.0)))
    scene = build_scene([mesh])
    cfg = RenderConfig(width=16, height=16, samples_per_launch=1,
                       ray_block=256)
    film, _ = render_direct(scene, _overhead_cam().params(), cfg,
                            ambient=(1.0, 1.0, 1.0), subframes=1)
    img = np.asarray(film.accum)
    # image-center pixels see the quad (bg pixels carry bg_radiance)
    center = img[7:9, 7:9].reshape(-1, 3)
    assert (center[:, 1] > 0.2).all()       # green channel survives
    np.testing.assert_allclose(center[:, 0], 0.0, atol=1e-6)  # red killed
    np.testing.assert_allclose(center[:, 2], 0.0, atol=1e-6)  # blue killed


def test_emissive_texture_on_second_uv_set():
    """MaterialData.h:68 Texture.texcoord: an emissive texture bound to
    set 1 must sample set-1 coordinates (white half), not set 0 (black)."""
    # texture: left half black, right half white
    tex = np.zeros((4, 4, 4), np.uint8)
    tex[:, 2:] = 255
    v, f = quad([-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1])
    uv_left = np.tile(np.array([[0.25, 0.5]], np.float32), (4, 1))
    uv_right = np.tile(np.array([[0.75, 0.5]], np.float32), (4, 1))

    def render(uv_set):
        mesh = Mesh(
            vertices=v[None], indices=f,
            texcoords=uv_left, texcoords1=uv_right,
            material=Material(diffuse=(0.0, 0.0, 0.0),
                              emissive=(1.0, 1.0, 1.0),
                              emissive_texture_id=0,
                              emissive_tex_uv=uv_set))
        scene = build_scene([mesh], textures=[tex])
        cfg = RenderConfig(width=16, height=16, samples_per_launch=1,
                           ray_block=256)
        film, _ = render_direct(scene, _overhead_cam().params(), cfg,
                                ambient=(0.0, 0.0, 0.0), subframes=1)
        return np.asarray(film.accum)

    img0 = render(0)   # set 0 -> black half
    img1 = render(1)   # set 1 -> white half
    assert img1.max() > 0.5
    assert img0.max() < 0.1


def test_split_order_preserves_vcolor_and_uv2():
    """SAH reorder must permute the optional attribute slabs with the faces
    (uv0b/c0 stay paired with uv0)."""
    from rendertoy3c_tpu.accel.lbvh import split_order_scene

    rng = np.random.default_rng(0)
    nv = 300
    v = rng.uniform(-1, 1, (nv, 3)).astype(np.float32)
    f = np.arange(nv, dtype=np.int32).reshape(-1, 3)
    uv = rng.uniform(0, 1, (nv, 2)).astype(np.float32)
    mesh = Mesh(vertices=v[None], indices=f, texcoords=uv,
                texcoords1=2.0 * uv,
                colors=np.concatenate([uv, uv], axis=1))
    scene = split_order_scene(build_scene([mesh]))
    g = scene.geom
    assert g.uv0b is not None and g.c0 is not None
    np.testing.assert_allclose(np.asarray(g.uv0b),
                               2.0 * np.asarray(g.uv0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g.c0)[:, :2],
                               np.asarray(g.uv0), atol=1e-6)


def test_localgeom_uv_set_selects_parameterization():
    from rendertoy3c_tpu.integrate.localgeom import local_geometry_derivs

    v, f = quad([0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1])
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    mesh = Mesh(vertices=v[None], indices=f, texcoords=uv,
                texcoords1=0.5 * uv)
    scene = build_scene([mesh])
    prim = np.zeros((1,), np.int32)
    dpdu0, _, _, _ = local_geometry_derivs(scene.geom, prim, uv_set=0)
    dpdu1, _, _, _ = local_geometry_derivs(scene.geom, prim, uv_set=1)
    # halving the UV scale doubles dp/du
    np.testing.assert_allclose(np.asarray(dpdu1), 2.0 * np.asarray(dpdu0),
                               atol=1e-5)
