"""GLTF loader + GGX direct-lighting renderer tests (legacy whitted stack
parity, SURVEY.md S2.4/S3.4)."""
import base64
import json
import struct

import numpy as np
import pytest

from rendertoy3c_tpu.io.gltf import PointLight, load_gltf
from rendertoy3c_tpu.integrate.config import RenderConfig
from rendertoy3c_tpu.integrate.direct import render_direct
from rendertoy3c_tpu.scene.builtin import cornell_box
from rendertoy3c_tpu.scene.camera import Camera
from rendertoy3c_tpu.scene.material import MaterialType
from rendertoy3c_tpu.scene.scene import build_scene


def _quad_gltf(tmp_path, glb=False):
    """Two-triangle quad with normals/uvs, a perspective camera and a point
    light, positions in an embedded buffer."""
    pos = np.array([[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]], np.float32)
    nrm = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    buf = pos.tobytes() + nrm.tobytes() + uv.tobytes() + idx.tobytes()
    j = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1, 2]}],
        "nodes": [
            {"mesh": 0, "translation": [0, 0, 0]},
            {"camera": 0, "translation": [0, 2, 4]},
            {"extensions": {"KHR_lights_punctual": {"light": 0}},
             "translation": [0, 3, 0]},
        ],
        "extensions": {"KHR_lights_punctual": {"lights": [
            {"type": "point", "color": [1, 0.9, 0.8], "intensity": 20.0},
        ]}},
        "cameras": [{"type": "perspective",
                     "perspective": {"yfov": 0.7, "aspectRatio": 1.0}}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3, "material": 0,
        }]}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorFactor": [0.8, 0.2, 0.2, 1.0],
            "metallicFactor": 0.1, "roughnessFactor": 0.6,
        }, "emissiveFactor": [0.0, 0.0, 0.0]}],
        "buffers": [{"byteLength": len(buf)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 48},
            {"buffer": 0, "byteOffset": 96, "byteLength": 32},
            {"buffer": 0, "byteOffset": 128, "byteLength": 12},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
    }
    if glb:
        jj = json.dumps(j).encode()
        jj += b" " * (-len(jj) % 4)
        bin_c = buf + b"\x00" * (-len(buf) % 4)
        body = (
            struct.pack("<II", len(jj), 0x4E4F534A) + jj
            + struct.pack("<II", len(bin_c), 0x004E4942) + bin_c
        )
        data = struct.pack("<III", 0x46546C67, 2, 12 + len(body)) + body
        path = tmp_path / "scene.glb"
        path.write_bytes(data)
    else:
        j["buffers"][0]["uri"] = (
            "data:application/octet-stream;base64,"
            + base64.b64encode(buf).decode()
        )
        path = tmp_path / "scene.gltf"
        path.write_text(json.dumps(j))
    return str(path)


@pytest.mark.parametrize("glb", [False, True])
def test_load_gltf_quad(tmp_path, glb):
    meshes, textures, cameras, lights = load_gltf(_quad_gltf(tmp_path, glb))
    assert len(meshes) == 1
    m = meshes[0]
    assert m.num_faces == 2
    assert m.vertices.shape == (1, 4, 3)
    assert m.material.material_type == MaterialType.PRINCIPLED
    np.testing.assert_allclose(m.material.diffuse, (0.8, 0.2, 0.2))
    assert m.material.roughness == 0.6
    assert len(cameras) == 1
    np.testing.assert_allclose(cameras[0].eye, (0, 2, 4))
    assert len(lights) == 1
    np.testing.assert_allclose(lights[0].position, (0, 3, 0))
    assert lights[0].intensity == 20.0


def test_gltf_node_transform(tmp_path):
    path = _quad_gltf(tmp_path)
    j = json.loads(open(path).read())
    j["nodes"][0]["translation"] = [5.0, 0.0, 0.0]
    j["nodes"][0]["scale"] = [2.0, 2.0, 2.0]
    open(path, "w").write(json.dumps(j))
    meshes, _, _, _ = load_gltf(path)
    v = meshes[0].vertices[0]
    np.testing.assert_allclose(v[0], [3.0, 0.0, -2.0], atol=1e-6)


def test_gltf_render_direct(tmp_path):
    meshes, textures, cameras, lights = load_gltf(_quad_gltf(tmp_path))
    scene = build_scene(meshes, textures=textures or None)
    cam = cameras[0]
    cam.lookat = (0, 0, 0)
    cfg = RenderConfig(width=24, height=24, samples_per_launch=2,
                       ray_block=576)
    film, stats = render_direct(
        scene, cam.params(), cfg, point_lights=lights,
        ambient=(0.1, 0.1, 0.1), subframes=1,
    )
    img = np.asarray(film.accum)
    assert np.isfinite(img).all()
    assert img.max() > 0.05  # lit quad visible
    assert int(stats.shadow_rays) > 0


def test_direct_shadowing():
    """A box between light and floor must darken the floor beneath it."""
    meshes, camera = cornell_box(with_blocks=True)
    scene = build_scene(meshes)
    light = PointLight(position=(0.0, 1.9, 0.0), intensity=6.0)
    cfg = RenderConfig(width=32, height=32, samples_per_launch=1,
                       ray_block=1024)
    film, _ = render_direct(
        scene, camera.params(), cfg, point_lights=[light],
        ambient=(0.0, 0.0, 0.0), subframes=1,
    )
    img = np.asarray(film.accum)
    assert np.isfinite(img).all()
    lum = img.mean(axis=-1)
    assert lum.max() > 0.05
    assert (lum == 0).any()  # fully shadowed texels exist with no ambient


def test_alpha_mask_cutout():
    """A MASK-mode checkerboard-alpha quad lets rays through transparent
    texels (whitted anyhit alpha parity)."""
    import jax.numpy as jnp
    from rendertoy3c_tpu.scene.builtin import quad
    from rendertoy3c_tpu.scene.material import Material
    from rendertoy3c_tpu.scene.mesh import Mesh
    from rendertoy3c_tpu.scene.camera import Camera
    from rendertoy3c_tpu.integrate.direct import render_direct

    # 2x2 alpha checker: opaque red / transparent
    tex = np.zeros((2, 2, 4), np.uint8)
    tex[0, 0] = (255, 0, 0, 255)
    tex[1, 1] = (255, 0, 0, 255)
    # (other texels alpha 0)
    v, f = quad([-1, 1, -1], [1, 1, -1], [1, 1, 1], [-1, 1, 1])
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    masked = Mesh(vertices=v[None], indices=f, texcoords=uvs,
                  material=Material(diffuse=(1, 1, 1), diffuse_texture_id=0,
                                    alpha_mode="MASK"))
    fv, ff = quad([-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2])
    floor = Mesh(vertices=fv[None], indices=ff,
                 material=Material(diffuse=(0.0, 0.8, 0.0)))
    scene = build_scene([masked, floor], textures=[tex])

    from rendertoy3c_tpu.io.gltf import PointLight

    cam = Camera(eye=(0, 4.0, 0.01), lookat=(0, 0, 0), fov_y=60.0)
    cfg = RenderConfig(width=16, height=16, samples_per_launch=4,
                       ray_block=256)
    film, _ = render_direct(
        scene, cam.params(), cfg,
        point_lights=[PointLight(position=(0, 6, 0), intensity=30.0)],
        ambient=(0.2, 0.2, 0.2), subframes=1,
    )
    img = np.asarray(film.accum)
    assert np.isfinite(img).all()
    # both the red quad (opaque texels) and the green floor (through
    # transparent texels) must be visible
    red_px = (img[..., 0] > 2 * img[..., 1]) & (img[..., 0] > 0.01)
    green_px = (img[..., 1] > 2 * img[..., 0]) & (img[..., 1] > 0.01)
    assert red_px.sum() > 5, red_px.sum()
    assert green_px.sum() > 5, green_px.sum()


def _tiny_png_uri():
    import io as _io

    from PIL import Image

    im = Image.fromarray(np.full((2, 2, 4), 200, np.uint8))
    b = _io.BytesIO()
    im.save(b, "PNG")
    return "data:image/png;base64," + base64.b64encode(b.getvalue()).decode()


def test_gltf_sampler_wrap_modes(tmp_path):
    """Sampler wrapS/wrapT ride into the atlas per texture; the same image
    under two samplers gets two atlas entries."""
    from rendertoy3c_tpu.scene.texture import (
        WRAP_CLAMP, WRAP_MIRROR, WRAP_REPEAT, TextureImage,
    )

    path = _quad_gltf(tmp_path)
    j = json.loads(open(path).read())
    j["images"] = [{"uri": _tiny_png_uri()}]
    j["samplers"] = [{"wrapS": 33071, "wrapT": 33648}, {}]
    j["textures"] = [{"source": 0, "sampler": 0}, {"source": 0, "sampler": 1}]
    j["materials"][0]["pbrMetallicRoughness"]["baseColorTexture"] = {"index": 0}
    j["materials"][0]["emissiveTexture"] = {"index": 1}
    open(path, "w").write(json.dumps(j))
    meshes, textures, _, _ = load_gltf(path)
    assert len(textures) == 2  # same image, two samplers
    assert isinstance(textures[0], TextureImage)
    assert textures[0].wrap_s == WRAP_CLAMP
    assert textures[0].wrap_t == WRAP_MIRROR
    assert textures[1].wrap_s == WRAP_REPEAT
    m = meshes[0].material
    assert m.diffuse_texture_id == 0
    assert m.emissive_texture_id == 1
    # the atlas builder accepts the sampler-tagged entries directly
    scene = build_scene(meshes, textures=textures)
    assert int(np.asarray(scene.atlas.meta)[0, 4]) == WRAP_CLAMP


def test_gltf_khr_material_extensions(tmp_path):
    path = _quad_gltf(tmp_path)
    j = json.loads(open(path).read())
    j["materials"][0]["emissiveFactor"] = [0.2, 0.1, 0.0]
    j["materials"][0]["extensions"] = {
        "KHR_materials_emissive_strength": {"emissiveStrength": 5.0},
        "KHR_materials_ior": {"ior": 1.8},
    }
    j["materials"].append({
        "pbrMetallicRoughness": {"baseColorFactor": [1, 1, 1, 1]},
        "extensions": {
            "KHR_materials_transmission": {"transmissionFactor": 0.9},
        },
    })
    j["meshes"][0]["primitives"].append(
        dict(j["meshes"][0]["primitives"][0], material=1)
    )
    open(path, "w").write(json.dumps(j))
    meshes, _, _, _ = load_gltf(path)
    m0 = meshes[0].material
    np.testing.assert_allclose(m0.emissive, (1.0, 0.5, 0.0))
    assert m0.ior == 1.8
    assert m0.material_type == MaterialType.PRINCIPLED
    m1 = meshes[1].material
    assert m1.material_type == MaterialType.FRESNEL_TRANSMISSIVE
    assert m1.transmittance == 0.9


def _buffer_gltf(tmp_path, j, chunks):
    """Assemble bufferViews/accessors-by-chunk and write a .gltf file.

    chunks: list of np arrays; returns their bufferView indices in order."""
    buf = b""
    views = []
    for arr in chunks:
        views.append({"buffer": 0, "byteOffset": len(buf),
                      "byteLength": arr.nbytes})
        buf += arr.tobytes()
    j["buffers"] = [{
        "byteLength": len(buf),
        "uri": ("data:application/octet-stream;base64,"
                + base64.b64encode(buf).decode()),
    }]
    j["bufferViews"] = views
    path = tmp_path / "anim.gltf"
    path.write_text(json.dumps(j))
    return str(path)


def _skinned_gltf(tmp_path):
    """A 2-triangle strip skinned to two joints; joint 2 is animated from
    rest y=1 to y=2 over t in [0, 1]."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    joints = np.array([[0, 0, 0, 0], [0, 0, 0, 0],
                       [1, 0, 0, 0], [1, 0, 0, 0]], np.uint16)
    weights = np.array([[1, 0, 0, 0]] * 4, np.float32)
    idx = np.array([0, 1, 2, 1, 3, 2], np.uint16)
    # inverse bind: joint0 identity; joint1 rest world = translate(0,1,0)
    ibm0 = np.eye(4, dtype=np.float32)
    ibm1 = np.eye(4, dtype=np.float32)
    ibm1[3, 1] = -1.0  # column-major storage: translation in the 4th column
    ibms = np.stack([ibm0, ibm1]).astype(np.float32)
    anim_t = np.array([0.0, 1.0], np.float32)
    anim_v = np.array([[0, 1, 0], [0, 2, 0]], np.float32)

    j = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {"mesh": 0, "skin": 0},
            {"children": [2]},                      # joint 0 (root)
            {"translation": [0.0, 1.0, 0.0]},       # joint 1
        ],
        "skins": [{"joints": [1, 2], "inverseBindMatrices": 4}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "JOINTS_0": 1, "WEIGHTS_0": 2},
            "indices": 3,
        }]}],
        "animations": [{
            "samplers": [{"input": 5, "output": 6,
                          "interpolation": "LINEAR"}],
            "channels": [{"sampler": 0,
                          "target": {"node": 2, "path": "translation"}}],
        }],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 4,
             "type": "VEC4"},
            {"bufferView": 2, "componentType": 5126, "count": 4,
             "type": "VEC4"},
            {"bufferView": 3, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
            {"bufferView": 4, "componentType": 5126, "count": 2,
             "type": "MAT4"},
            {"bufferView": 5, "componentType": 5126, "count": 2,
             "type": "SCALAR"},
            {"bufferView": 6, "componentType": 5126, "count": 2,
             "type": "VEC3"},
        ],
    }
    return _buffer_gltf(tmp_path, j,
                        [pos, joints, weights, idx, ibms, anim_t, anim_v])


def test_gltf_skinning_rest_pose(tmp_path):
    meshes, _, _, _ = load_gltf(_skinned_gltf(tmp_path))
    assert len(meshes) == 1
    # at rest, joint matrices are identity: vertices unchanged
    np.testing.assert_allclose(
        meshes[0].vertices[0],
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], atol=1e-6)


def test_gltf_skinning_animated_two_keys(tmp_path):
    meshes, _, _, _ = load_gltf(_skinned_gltf(tmp_path), times=(0.0, 1.0))
    m = meshes[0]
    assert m.num_keys == 2
    np.testing.assert_allclose(
        m.vertices[0],
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], atol=1e-6)
    # at t=1 joint 1 moved up by 1: only the top vertices follow
    np.testing.assert_allclose(
        m.vertices[1],
        [[0, 0, 0], [1, 0, 0], [0, 2, 0], [1, 2, 0]], atol=1e-6)


def test_gltf_node_animation_interpolations(tmp_path):
    """LINEAR samples halfway between keys; STEP holds; clamped outside."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([0, 1, 2], np.uint16)
    anim_t = np.array([0.0, 1.0], np.float32)
    anim_v = np.array([[0, 0, 0], [4, 0, 0]], np.float32)
    j = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0}, "indices": 1,
        }]}],
        "animations": [{
            "samplers": [{"input": 2, "output": 3,
                          "interpolation": "LINEAR"}],
            "channels": [{"sampler": 0,
                          "target": {"node": 0, "path": "translation"}}],
        }],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
            {"bufferView": 2, "componentType": 5126, "count": 2,
             "type": "SCALAR"},
            {"bufferView": 3, "componentType": 5126, "count": 2,
             "type": "VEC3"},
        ],
    }
    path = _buffer_gltf(tmp_path, j, [pos, idx, anim_t, anim_v])

    meshes, _, _, _ = load_gltf(path, times=(0.5, 2.0))
    np.testing.assert_allclose(meshes[0].vertices[0][0], [2, 0, 0], atol=1e-6)
    np.testing.assert_allclose(meshes[0].vertices[1][0], [4, 0, 0], atol=1e-6)

    jj = json.loads(open(path).read())
    jj["animations"][0]["samplers"][0]["interpolation"] = "STEP"
    open(path, "w").write(json.dumps(jj))
    meshes, _, _, _ = load_gltf(path, times=(0.5,))
    np.testing.assert_allclose(meshes[0].vertices[0][0], [0, 0, 0], atol=1e-6)


def test_gltf_animated_motion_blur_renders(tmp_path):
    """2-key animated glTF feeds the motion-blur pipeline end to end."""
    from rendertoy3c_tpu.integrate.path import render_frame

    meshes, _, _, _ = load_gltf(_skinned_gltf(tmp_path), times=(0.0, 1.0))
    lamp_v = np.array([[-1, 3, -1], [-1, 3, 1], [1, 3, 1], [1, 3, -1]],
                      np.float32)
    lamp_f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    from rendertoy3c_tpu.scene.material import Material
    from rendertoy3c_tpu.scene.mesh import Mesh

    lamp = Mesh(vertices=np.stack([lamp_v, lamp_v]), indices=lamp_f,
                material=Material(emissive=(10, 10, 10)))
    scene = build_scene(meshes + [lamp])
    assert scene.num_keys == 2
    cam = Camera(eye=(0.5, 1.0, 4.0), lookat=(0.5, 1.0, 0.0), fov_y=60.0)
    cfg = RenderConfig(width=16, height=16, samples_per_launch=2,
                       max_depth=2, ray_block=256)
    film, _ = render_frame(scene, cam.params(), cfg, subframes=1)
    img = np.asarray(film.accum)
    assert np.isfinite(img).all()
    assert img.max() > 0


def test_gltf_alpha_mode_parsed(tmp_path):
    path = _quad_gltf(tmp_path)
    j = json.loads(open(path).read())
    j["materials"][0]["alphaMode"] = "MASK"
    j["materials"][0]["alphaCutoff"] = 0.25
    open(path, "w").write(json.dumps(j))
    meshes, _, _, _ = load_gltf(path)
    assert meshes[0].material.alpha_mode == "MASK"
    assert meshes[0].material.alpha_cutoff == 0.25
