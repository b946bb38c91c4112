"""GLTF 2.0 scene import — parity with the reference's legacy GLTF stack
(sutil/Scene.cpp:267-551 `loadScene` + `processGLTFNode` :125-263, built on
tinygltf).

Supports .gltf (JSON + external/embedded buffers) and .glb containers:
  * node hierarchy with TRS/matrix transforms, flattened to world space
    (the reference likewise bakes node transforms into instance matrices);
  * mesh primitives: POSITION / NORMAL / TEXCOORD_0 accessors, u8/u16/u32
    indices, non-indexed fallback, per-primitive material split (same
    granularity as processGLTFNode);
  * pbrMetallicRoughness materials -> PRINCIPLED Material rows
    (baseColor factor+texture, metallic/roughness factors, emissive factor+
    texture, normal texture id carried);
  * textures decoded via PIL (PNG/JPEG) from files, embedded base64 URIs, or
    GLB buffer views; sampler wrapS/wrapT (REPEAT / CLAMP_TO_EDGE /
    MIRRORED_REPEAT) carried per texture into the atlas;
  * KHR_materials_emissive_strength / _ior / _transmission mapped onto the
    principled/transmissive BSDF fields;
  * cameras (perspective) -> Camera;
  * KHR_lights_punctual point lights -> PointLight list (the reference's
    whitted pipeline consumes point+ambient lights, cuda/Light.h:31-71).

Pure host-side numpy; returns the same (meshes, textures) building blocks the
OBJ loader produces, plus cameras and point lights.
"""
from __future__ import annotations

import base64
import json
import os
import struct
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..scene.camera import Camera
from ..scene.material import Material, MaterialType
from ..scene.mesh import Mesh

_COMPONENT_DTYPES = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16,
    5123: np.uint16, 5125: np.uint32, 5126: np.float32,
}
_TYPE_COUNTS = {
    "SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4,
    "MAT2": 4, "MAT3": 9, "MAT4": 16,
}


@dataclass
class PointLight:
    """cuda/Light.h:31-50 Point light (color, intensity, position)."""

    position: tuple
    color: tuple = (1.0, 1.0, 1.0)
    intensity: float = 1.0


def _load_glb(path: str):
    with open(path, "rb") as f:
        data = f.read()
    magic, version, _length = struct.unpack_from("<III", data, 0)
    if magic != 0x46546C67:
        raise ValueError(f"{path}: not a GLB file")
    if version != 2:
        raise ValueError(f"{path}: unsupported GLB version {version}")
    offset = 12
    gltf = None
    bin_chunk = b""
    while offset < len(data):
        clen, ctype = struct.unpack_from("<II", data, offset)
        chunk = data[offset + 8: offset + 8 + clen]
        if ctype == 0x4E4F534A:  # JSON
            gltf = json.loads(chunk.decode("utf-8"))
        elif ctype == 0x004E4942:  # BIN
            bin_chunk = chunk
        offset += 8 + clen + (-clen % 4)
    if gltf is None:
        raise ValueError(f"{path}: GLB missing JSON chunk")
    return gltf, bin_chunk


def _read_uri(uri: str, base_dir: str) -> bytes:
    if uri.startswith("data:"):
        _, payload = uri.split(",", 1)
        return base64.b64decode(payload)
    from urllib.parse import unquote

    with open(os.path.join(base_dir, unquote(uri)), "rb") as f:
        return f.read()


class _GltfDoc:
    def __init__(self, path: str):
        self.base_dir = os.path.dirname(os.path.abspath(path))
        if path.endswith(".glb"):
            self.j, bin_chunk = _load_glb(path)
        else:
            with open(path) as f:
                self.j = json.load(f)
            bin_chunk = b""
        self.buffers = []
        for buf in self.j.get("buffers", []):
            if "uri" in buf:
                self.buffers.append(_read_uri(buf["uri"], self.base_dir))
            else:
                self.buffers.append(bin_chunk)

    def buffer_view(self, idx: int) -> Tuple[bytes, int]:
        bv = self.j["bufferViews"][idx]
        buf = self.buffers[bv["buffer"]]
        off = bv.get("byteOffset", 0)
        return buf[off: off + bv["byteLength"]], bv.get("byteStride", 0)

    def accessor(self, idx: int) -> np.ndarray:
        acc = self.j["accessors"][idx]
        dtype = _COMPONENT_DTYPES[acc["componentType"]]
        ncomp = _TYPE_COUNTS[acc["type"]]
        count = acc["count"]
        if "bufferView" not in acc:
            return np.zeros((count, ncomp), dtype)
        raw, stride = self.buffer_view(acc["bufferView"])
        off = acc.get("byteOffset", 0)
        itemsize = np.dtype(dtype).itemsize * ncomp
        if stride and stride != itemsize:
            out = np.empty((count, ncomp), dtype)
            for i in range(count):
                out[i] = np.frombuffer(
                    raw, dtype, count=ncomp, offset=off + i * stride
                )
            arr = out
        else:
            arr = np.frombuffer(
                raw, dtype, count=count * ncomp, offset=off
            ).reshape(count, ncomp)
        if acc.get("normalized"):
            arr = arr.astype(np.float32) / np.iinfo(dtype).max
        return arr

    def image_rgba(self, image_idx: int) -> Optional[np.ndarray]:
        import io as _io

        try:
            from PIL import Image
        except ImportError:
            return None
        img = self.j["images"][image_idx]
        if "uri" in img:
            raw = _read_uri(img["uri"], self.base_dir)
        else:
            raw, _ = self.buffer_view(img["bufferView"])
        with Image.open(_io.BytesIO(raw)) as im:
            rgba = np.asarray(im.convert("RGBA"), np.uint8)
        # the scene convention stores textures bottom-up (stbi vertical flip,
        # src/mesh.cpp:131)
        return rgba[::-1].copy()


def _quat_matrix(q) -> np.ndarray:
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ], np.float32)


def _node_matrix(node: dict, overrides: Optional[dict] = None) -> np.ndarray:
    """Local transform; `overrides` replaces animated TRS properties."""
    ov = overrides or {}
    if "matrix" in node and not ov:
        return np.asarray(node["matrix"], np.float32).reshape(4, 4).T
    m = np.eye(4, dtype=np.float32)
    scale = ov.get("scale", node.get("scale"))
    if scale is not None:
        m[:3, :3] *= np.asarray(scale, np.float32)
    rot = ov.get("rotation", node.get("rotation"))
    if rot is not None:
        m[:3, :3] = _quat_matrix(rot) @ m[:3, :3]
    trans = ov.get("translation", node.get("translation"))
    if trans is not None:
        m[:3, 3] = trans
    return m


# --- animation sampling (glTF 2.0 "animations"; the reference has no
# animation support at all — its motion blur is N obj files. done+) ---


def _slerp(q0: np.ndarray, q1: np.ndarray, f: float) -> np.ndarray:
    d = float(np.dot(q0, q1))
    if d < 0.0:  # shortest path
        q1 = -q1
        d = -d
    if d > 0.9995:  # nearly parallel: nlerp
        q = q0 + f * (q1 - q0)
        return q / np.linalg.norm(q)
    th = np.arccos(np.clip(d, -1.0, 1.0))
    return (np.sin((1 - f) * th) * q0 + np.sin(f * th) * q1) / np.sin(th)


def _sample_channel(times: np.ndarray, values: np.ndarray, interp: str,
                    path: str, t: float):
    """Evaluate one animation sampler at time t (clamped to the key range)."""
    n = len(times)
    if interp == "CUBICSPLINE":
        values = values.reshape(n, 3, -1)  # (in-tangent, value, out-tangent)
    if t <= times[0]:
        v = values[0, 1] if interp == "CUBICSPLINE" else values[0]
        return np.asarray(v, np.float32)
    if t >= times[-1]:
        v = values[-1, 1] if interp == "CUBICSPLINE" else values[-1]
        return np.asarray(v, np.float32)
    i1 = int(np.searchsorted(times, t, side="right"))
    i0 = i1 - 1
    dt = float(times[i1] - times[i0])
    f = 0.0 if dt <= 0 else (t - float(times[i0])) / dt
    if interp == "STEP":
        return np.asarray(values[i0], np.float32)
    if interp == "CUBICSPLINE":
        p0, m0 = values[i0, 1], values[i0, 2] * dt
        p1, m1 = values[i1, 1], values[i1, 0] * dt
        f2, f3 = f * f, f * f * f
        v = ((2 * f3 - 3 * f2 + 1) * p0 + (f3 - 2 * f2 + f) * m0
             + (-2 * f3 + 3 * f2) * p1 + (f3 - f2) * m1)
        if path == "rotation":
            v = v / max(np.linalg.norm(v), 1e-20)
        return np.asarray(v, np.float32)
    # LINEAR
    if path == "rotation":
        return _slerp(np.asarray(values[i0], np.float64),
                      np.asarray(values[i1], np.float64), f).astype(np.float32)
    return np.asarray((1 - f) * values[i0] + f * values[i1], np.float32)


def _animation_channels(doc: "_GltfDoc", animation: int) -> dict:
    """node_idx -> {path: (times, values, interpolation)} for one clip."""
    anims = doc.j.get("animations", [])
    if not anims or animation >= len(anims):
        return {}
    out: dict = {}
    clip = anims[animation]
    samplers = clip.get("samplers", [])
    for ch in clip.get("channels", []):
        tgt = ch.get("target", {})
        node = tgt.get("node")
        path = tgt.get("path")
        if node is None or path not in ("translation", "rotation", "scale"):
            continue  # morph-target "weights" unsupported
        smp = samplers[ch["sampler"]]
        times = np.asarray(doc.accessor(smp["input"]), np.float32).reshape(-1)
        values = np.asarray(doc.accessor(smp["output"]), np.float32)
        out.setdefault(node, {})[path] = (
            times, values, smp.get("interpolation", "LINEAR")
        )
    return out


def _world_matrices(j: dict, roots, channels: dict,
                    t: Optional[float]) -> dict:
    """node_idx -> world 4x4 at animation time t (t=None: static TRS)."""
    worlds: dict = {}

    def rec(i, parent):
        node = j["nodes"][i]
        ov = None
        if t is not None and i in channels:
            ov = {path: _sample_channel(*spec, path, t)
                  for path, spec in channels[i].items()}
        world = parent @ _node_matrix(node, ov)
        worlds[i] = world
        for c in node.get("children", []):
            rec(c, world)

    identity = np.eye(4, dtype=np.float32)
    for r in roots:
        rec(r, identity)
    return worlds


def _skin_vertices(doc: "_GltfDoc", skin: dict, worlds: dict,
                   joints_idx: np.ndarray, weights: np.ndarray,
                   pos: np.ndarray, nrm: Optional[np.ndarray]):
    """Linear-blend skinning: world pos (and normal) for one evaluation.

    joint matrix J = worldJoint @ inverseBindMatrix (glTF skins; skinned
    vertices ignore the mesh node's own transform per spec)."""
    joints = skin["joints"]
    if "inverseBindMatrices" in skin:
        ibm = np.asarray(doc.accessor(skin["inverseBindMatrices"]),
                         np.float32).reshape(-1, 4, 4).transpose(0, 2, 1)
    else:
        ibm = np.tile(np.eye(4, dtype=np.float32), (len(joints), 1, 1))
    jm = np.stack([worlds[joints[k]] @ ibm[k] for k in range(len(joints))])

    w = weights / np.maximum(weights.sum(axis=1, keepdims=True), 1e-20)
    # per-vertex blended matrix [V, 4, 4]
    blended = np.einsum("vc,vcij->vij", w, jm[joints_idx])
    pos_w = np.einsum("vij,vj->vi", blended[:, :3, :3], pos) + blended[:, :3, 3]
    nrm_w = None
    if nrm is not None:
        lin_it = np.linalg.inv(blended[:, :3, :3]).transpose(0, 2, 1)
        nrm_w = np.einsum("vij,vj->vi", lin_it, nrm)
        nrm_w /= np.maximum(np.linalg.norm(nrm_w, axis=-1, keepdims=True),
                            1e-20)
    return pos_w.astype(np.float32), (
        None if nrm_w is None else nrm_w.astype(np.float32)
    )


def _material_from_gltf(doc: _GltfDoc, mat_idx: Optional[int],
                        texture_of_image) -> Material:
    if mat_idx is None:
        return Material(material_type=MaterialType.PRINCIPLED,
                        diffuse=(0.8, 0.8, 0.8), roughness=1.0, metallic=0.0)
    m = doc.j["materials"][mat_idx]
    pbr = m.get("pbrMetallicRoughness", {})
    base = pbr.get("baseColorFactor", [1, 1, 1, 1])

    def tex_id(tinfo):
        if tinfo is None:
            return -1
        tex = doc.j["textures"][tinfo["index"]]
        src = tex.get("source")
        if src is None:
            return -1
        from ..scene.texture import WRAP_REPEAT, wrap_from_gl

        ws = wt = WRAP_REPEAT
        if "sampler" in tex:
            smp = doc.j.get("samplers", [])[tex["sampler"]]
            ws = wrap_from_gl(smp.get("wrapS", 10497))
            wt = wrap_from_gl(smp.get("wrapT", 10497))
        return texture_of_image(src, ws, wt)

    def tex_uv(tinfo):
        # per-texture texcoord-set index (glTF textureInfo.texCoord;
        # sutil/Scene.cpp:220 carries it into MaterialData::Texture and
        # :254-257 clamps indices past num_texcoords=2 back to 0)
        if tinfo is None:
            return 0
        i = int(tinfo.get("texCoord", 0))
        return i if i in (0, 1) else 0

    # KHR_texture_transform on the base color texture -> material uv xform
    xform = (
        pbr.get("baseColorTexture", {})
        .get("extensions", {})
        .get("KHR_texture_transform", {})
    )

    # KHR_materials_* extensions consumed by the principled/transmissive
    # BSDFs (the reference's tinygltf loader parses these but its whitted
    # shader ignores them — done+ here)
    ext = m.get("extensions", {})
    emissive_strength = float(
        ext.get("KHR_materials_emissive_strength", {})
        .get("emissiveStrength", 1.0)
    )
    ior = float(ext.get("KHR_materials_ior", {}).get("ior", 1.5))
    transmission = float(
        ext.get("KHR_materials_transmission", {}).get("transmissionFactor", 0.0)
    )
    mtype = (MaterialType.FRESNEL_TRANSMISSIVE if transmission > 0.0
             else MaterialType.PRINCIPLED)

    return Material(
        material_type=mtype,
        diffuse=tuple(base[:3]),
        diffuse_texture_id=tex_id(pbr.get("baseColorTexture")),
        roughness=float(pbr.get("roughnessFactor", 1.0)),
        metallic=float(pbr.get("metallicFactor", 1.0)),
        roughness_texture_id=tex_id(pbr.get("metallicRoughnessTexture")),
        ior=ior,
        transmittance=transmission,
        emissive=tuple(emissive_strength * c
                       for c in m.get("emissiveFactor", [0, 0, 0])),
        emissive_texture_id=tex_id(m.get("emissiveTexture")),
        normal_texture_id=tex_id(m.get("normalTexture")),
        diffuse_tex_uv=tex_uv(pbr.get("baseColorTexture")),
        roughness_tex_uv=tex_uv(pbr.get("metallicRoughnessTexture")),
        emissive_tex_uv=tex_uv(m.get("emissiveTexture")),
        normal_tex_uv=tex_uv(m.get("normalTexture")),
        tex_offset=tuple(xform.get("offset", [0.0, 0.0])),
        tex_rotation=float(xform.get("rotation", 0.0)),
        tex_scale=tuple(xform.get("scale", [1.0, 1.0])),
        alpha_mode=(m.get("alphaMode", "OPAQUE")
                    if m.get("alphaMode") in ("MASK", "BLEND") else "OPAQUE"),
        # cutoff is only meaningful in MASK mode (sutil/Scene.cpp:357-366
        # leaves it 0 otherwise, so BLEND never cuts out in radiance anyhit)
        alpha_cutoff=(float(m.get("alphaCutoff", 0.5))
                      if m.get("alphaMode") == "MASK" else 0.0),
        alpha=float(base[3]) if len(base) > 3 else 1.0,
    )


def load_gltf(path: str, times=None, animation: int = 0):
    """Load a .gltf/.glb file.

    times: optional sequence of animation timestamps (seconds). Each becomes
    one motion keyframe: node TRS channels of clip `animation` are sampled
    and skins deformed at every time, so `times=(t, t + shutter)` yields the
    2-key motion format the tracers consume (the reference's only motion
    input is N obj files, src/mesh.cpp:39-55; glTF animation + skinning is
    done+). times=None bakes the static pose.

    Returns (meshes, textures, cameras, point_lights):
      meshes: list[Mesh], one per primitive occurrence (node x primitive),
              with node transforms (and skinning) baked to world space;
      textures: list[TextureImage] RGBA8 + sampler wrap, indexed by material
              texture ids;
      cameras: list[Camera] (world-posed perspective cameras, first key);
      point_lights: list[PointLight] from KHR_lights_punctual (first key).
    """
    doc = _GltfDoc(path)
    j = doc.j

    from ..scene.texture import WRAP_REPEAT, TextureImage

    textures: List[TextureImage] = []
    image_to_texture = {}
    image_cache = {}

    def texture_of_image(image_idx: int, wrap_s: int = WRAP_REPEAT,
                         wrap_t: int = WRAP_REPEAT) -> int:
        # dedupe by (image, sampler wrap) — the same image under two
        # samplers needs two atlas entries
        key = (image_idx, wrap_s, wrap_t)
        if key in image_to_texture:
            return image_to_texture[key]
        if image_idx not in image_cache:
            image_cache[image_idx] = doc.image_rgba(image_idx)
        rgba = image_cache[image_idx]
        tid = -1
        if rgba is not None:
            tid = len(textures)
            textures.append(TextureImage(rgba, wrap_s, wrap_t))
        image_to_texture[key] = tid
        return tid

    meshes: List[Mesh] = []
    cameras: List[Camera] = []
    point_lights: List[PointLight] = []

    ext_lights = (
        j.get("extensions", {}).get("KHR_lights_punctual", {}).get("lights", [])
    )

    scene_idx = j.get("scene", 0)
    scenes = j.get("scenes", [{}])
    roots = scenes[scene_idx].get("nodes", []) if scenes else []
    if not roots:  # no scene graph: every non-child node is a root
        all_children = {
            c for n in j.get("nodes", []) for c in n.get("children", [])
        }
        roots = [i for i in range(len(j.get("nodes", [])))
                 if i not in all_children]

    channels = _animation_channels(doc, animation) if times is not None else {}
    eval_times = list(times) if times is not None else [None]
    # world matrices cover orphan subtrees too (skin joints may sit outside
    # the rendered scene's roots)
    all_children = {
        c for n in j.get("nodes", []) for c in n.get("children", [])
    }
    mat_roots = list(dict.fromkeys(
        roots + [i for i in range(len(j.get("nodes", [])))
                 if i not in all_children and i not in roots]
    ))
    worlds_k = [_world_matrices(j, mat_roots, channels, t)
                for t in eval_times]
    worlds0 = worlds_k[0]

    def bake_prim(node_idx: int, node: dict, prim: dict):
        attrs = prim["attributes"]
        pos = doc.accessor(attrs["POSITION"]).astype(np.float32)
        nrm = (doc.accessor(attrs["NORMAL"]).astype(np.float32)
               if "NORMAL" in attrs else None)
        skin = (j["skins"][node["skin"]]
                if "skin" in node and "JOINTS_0" in attrs
                and "WEIGHTS_0" in attrs else None)
        if skin is not None:
            joints_idx = doc.accessor(attrs["JOINTS_0"]).astype(np.int32)
            weights = doc.accessor(attrs["WEIGHTS_0"]).astype(np.float32)

        pos_keys, nrm_keys = [], []
        for worlds in worlds_k:
            if skin is not None:
                pk, nk = _skin_vertices(doc, skin, worlds, joints_idx,
                                        weights, pos, nrm)
            else:
                world = worlds[node_idx]
                pk = pos @ world[:3, :3].T + world[:3, 3]
                nk = None
                if nrm is not None:
                    lin_it = np.linalg.inv(world[:3, :3]).T
                    nk = nrm @ lin_it.T
                    nk /= np.maximum(
                        np.linalg.norm(nk, axis=-1, keepdims=True), 1e-20
                    )
            pos_keys.append(pk.astype(np.float32))
            if nk is not None:
                nrm_keys.append(nk.astype(np.float32))

        def read_uv(name):
            if name not in attrs:
                return None
            a = doc.accessor(attrs[name]).astype(np.float32)
            # glTF uv origin is top-left; flipped textures expect
            # bottom-left (matches the OBJ/stbi convention)
            return np.stack([a[:, 0], 1.0 - a[:, 1]], axis=1)

        uv = read_uv("TEXCOORD_0")
        # second UV set (GeometryData.h num_texcoords=2,
        # sutil/Scene.cpp:503-516 loads TEXCOORD_0..1)
        uv1 = read_uv("TEXCOORD_1")
        # COLOR_0 vertex colors (sutil/Scene.cpp:520-529); VEC3 widens to
        # RGBA w=1 and normalized u8/u16 rescale in accessor()
        colors = (doc.accessor(attrs["COLOR_0"]).astype(np.float32)
                  if "COLOR_0" in attrs else None)
        if "indices" in prim:
            idx = doc.accessor(prim["indices"]).reshape(-1)
            idx = idx.astype(np.int32).reshape(-1, 3)
        else:
            idx = np.arange(len(pos), dtype=np.int32).reshape(-1, 3)
        material = _material_from_gltf(
            doc, prim.get("material"), texture_of_image
        )
        mesh = Mesh(
            vertices=np.stack(pos_keys),
            indices=idx,
            normals=np.stack(nrm_keys) if nrm_keys else None,
            texcoords=uv,
            texcoords1=uv1,
            colors=colors,
            material=material,
        )
        if not nrm_keys:
            mesh = mesh.with_computed_normals()
        meshes.append(mesh)

    def visit(node_idx: int):
        node = j["nodes"][node_idx]
        world = worlds0[node_idx]

        if "mesh" in node:
            gmesh = j["meshes"][node["mesh"]]
            for prim in gmesh.get("primitives", []):
                if prim.get("mode", 4) != 4:  # TRIANGLES only
                    continue
                bake_prim(node_idx, node, prim)

        if "camera" in node:
            cam = j["cameras"][node["camera"]]
            if cam.get("type") == "perspective":
                import math as _math

                p = cam["perspective"]
                eye = world[:3, 3]
                fwd = -world[:3, 2]  # glTF cameras look down -z
                up = world[:3, 1]
                cameras.append(Camera(
                    eye=tuple(eye.tolist()),
                    lookat=tuple((eye + fwd).tolist()),
                    up=tuple(up.tolist()),
                    fov_y=_math.degrees(p.get("yfov", 0.8)),
                    aspect_ratio=float(p.get("aspectRatio", 1.0)),
                ))

        light_idx = (
            node.get("extensions", {})
            .get("KHR_lights_punctual", {})
            .get("light")
        )
        if light_idx is not None and light_idx < len(ext_lights):
            li = ext_lights[light_idx]
            if li.get("type") == "point":
                point_lights.append(PointLight(
                    position=tuple(world[:3, 3].tolist()),
                    color=tuple(li.get("color", [1, 1, 1])),
                    intensity=float(li.get("intensity", 1.0)),
                ))

        for child in node.get("children", []):
            visit(child)

    for r in roots:
        visit(r)

    return meshes, textures, cameras, point_lights
