"""Built-in test scenes (the reference has none — its scene path is a
hardcoded .obj, src/wavefront.cpp:290-293). These serve the roles of golden
fixtures, benchmarks, and examples.
"""
from __future__ import annotations

import numpy as np

from .camera import Camera
from .material import Material
from .mesh import Mesh


def quad(p0, p1, p2, p3) -> tuple[np.ndarray, np.ndarray]:
    """Two-triangle quad: vertices [4,3], indices [2,3]."""
    v = np.asarray([p0, p1, p2, p3], np.float32)
    f = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    return v, f


def _quad_mesh(p0, p1, p2, p3, material: Material) -> Mesh:
    v, f = quad(p0, p1, p2, p3)
    return Mesh(vertices=v[None], indices=f, material=material)


def box_mesh(lo, hi, material: Material) -> Mesh:
    """Axis-aligned box with outward normals."""
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    x0, y0, z0 = lo
    x1, y1, z1 = hi
    v = np.array(
        [
            [x0, y0, z0], [x1, y0, z0], [x1, y1, z0], [x0, y1, z0],
            [x0, y0, z1], [x1, y0, z1], [x1, y1, z1], [x0, y1, z1],
        ],
        np.float32,
    )
    f = np.array(
        [
            [4, 5, 6], [4, 6, 7],  # +z
            [1, 0, 3], [1, 3, 2],  # -z
            [5, 1, 2], [5, 2, 6],  # +x
            [0, 4, 7], [0, 7, 3],  # -x
            [3, 7, 6], [3, 6, 2],  # +y
            [0, 1, 5], [0, 5, 4],  # -y
        ],
        np.int32,
    )
    return Mesh(vertices=v[None], indices=f, material=material)


def cornell_box(light_emission=(15.0, 15.0, 15.0), with_blocks: bool = True):
    """Classic Cornell-style box in [-1,1]x[0,2]x[-1,1], open toward +z camera.

    Returns (meshes, camera). One mesh per material, matching the reference
    loader's per-material split (src/mesh.cpp:63-71).
    """
    white = Material(diffuse=(0.73, 0.73, 0.73))
    red = Material(diffuse=(0.65, 0.05, 0.05))
    green = Material(diffuse=(0.12, 0.45, 0.15))
    light = Material(diffuse=(0.0, 0.0, 0.0), emissive=tuple(light_emission))

    meshes = [
        _quad_mesh([-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1], white),  # floor
        _quad_mesh([-1, 2, -1], [-1, 2, 1], [1, 2, 1], [1, 2, -1], white),  # ceiling
        _quad_mesh([-1, 0, -1], [-1, 2, -1], [1, 2, -1], [1, 0, -1], white),  # back
        _quad_mesh([-1, 0, -1], [-1, 0, 1], [-1, 2, 1], [-1, 2, -1], red),  # left
        _quad_mesh([1, 0, -1], [1, 2, -1], [1, 2, 1], [1, 0, 1], green),  # right
        _quad_mesh(
            [-0.4, 1.99, -0.4], [-0.4, 1.99, 0.4], [0.4, 1.99, 0.4],
            [0.4, 1.99, -0.4], light,
        ),
    ]
    if with_blocks:
        meshes.append(box_mesh([-0.6, 0.0, -0.55], [-0.05, 1.1, 0.0], white))
        meshes.append(box_mesh([0.1, 0.0, 0.0], [0.65, 0.55, 0.5], white))

    camera = Camera(
        eye=(0.0, 1.0, 3.4),
        lookat=(0.0, 1.0, 0.0),
        up=(0.0, 1.0, 0.0),
        fov_y=45.0,
        aspect_ratio=1.0,
    )
    return meshes, camera


def instanced_cornell():
    """Cornell shell + one block mesh placed three times via instance
    transforms (the two-level AS demo: IAS over per-mesh GAS,
    src/cuda/cuda_accel.h:15-120). Returns (meshes, instances, camera)."""
    from .scene import Instance

    meshes, camera = cornell_box(with_blocks=False)
    block = box_mesh([-0.25, 0.0, -0.25], [0.25, 0.5, 0.25],
                     Material(diffuse=(0.73, 0.73, 0.73)))
    meshes.append(block)
    block_id = len(meshes) - 1

    def xform(tx, tz, angle_deg, scale=1.0):
        a = np.deg2rad(angle_deg)
        c, s = np.cos(a, dtype=np.float32), np.sin(a, dtype=np.float32)
        m = np.zeros((3, 4), np.float32)
        m[:, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]],
                            np.float32) * scale
        m[:, 3] = (tx, 0.0, tz)
        return m

    instances = [Instance(mesh_index=i) for i in range(block_id)]
    instances += [
        Instance(mesh_index=block_id, transforms=xform(-0.45, -0.3, 20.0)),
        Instance(mesh_index=block_id, transforms=xform(0.4, 0.25, -15.0)),
        Instance(mesh_index=block_id,
                 transforms=xform(0.0, 0.55, 35.0, scale=0.6)),
    ]
    return meshes, instances, camera


def textured_quad_scene(checker_size: int = 64):
    """A textured quad + area light, for texture-path tests/benches
    (BASELINE.md config 2)."""
    tex = np.zeros((checker_size, checker_size, 4), np.uint8)
    yy, xx = np.mgrid[0:checker_size, 0:checker_size]
    checker = ((xx // 8 + yy // 8) % 2).astype(np.uint8)
    tex[..., 0] = 255 * checker
    tex[..., 1] = 128
    tex[..., 2] = 255 * (1 - checker)
    tex[..., 3] = 255

    textured = Material(diffuse=(1, 1, 1), diffuse_texture_id=0)
    light = Material(emissive=(10.0, 10.0, 10.0))

    v, f = quad([-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1])
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    floor = Mesh(vertices=v[None], indices=f, texcoords=uvs, material=textured)

    lv, lf = quad([-0.3, 1.5, -0.3], [-0.3, 1.5, 0.3], [0.3, 1.5, 0.3], [0.3, 1.5, -0.3])
    lamp = Mesh(vertices=lv[None], indices=lf, material=light)

    camera = Camera(
        eye=(0.0, 1.2, 2.2), lookat=(0.0, 0.2, 0.0), fov_y=45.0, aspect_ratio=1.0
    )
    return [floor, lamp], [tex], camera


def primitives_scene():
    """Analytic-primitive demo: sphere + sphere shell + parallelogram
    mirror + a Catmull-Rom curve over a triangle floor — the builtin
    counterpart of the whitted stack's hand-built custom-primitive scenes
    (cuda/geometry.cu, sphere.cu, curve.h; whitted SBT wiring in
    sutil/Scene.cpp:1214-1452). Renders through --renderer direct.

    Returns (meshes, prims, camera, point_lights)."""
    from ..io.gltf import PointLight
    from ..scene.camera import Camera
    from ..scene.primitives import Curve, Parallelogram, Sphere, SphereShell

    v, f = quad([-6, 0, -6], [-6, 0, 6], [6, 0, 6], [6, 0, -6])
    floor = Mesh(
        vertices=v[None], indices=f,
        texcoords=np.asarray([[0, 0], [0, 1], [1, 1], [1, 0]], np.float32),
        material=Material(diffuse=(0.8, 0.8, 0.8),
                          checker_color2=(0.25, 0.3, 0.35),
                          checker_inv_size=(8.0, 8.0)),
    )
    prims = [
        Sphere(center=(-1.6, 1.0, 0.0), radius=1.0,
               material=Material(diffuse=(0.8, 0.3, 0.25),
                                 roughness=0.35, metallic=0.1)),
        SphereShell(center=(1.6, 1.0, 0.0), r_inner=0.6, r_outer=0.95,
                    material=Material(diffuse=(0.3, 0.55, 0.85),
                                      roughness=0.15, metallic=0.6)),
        Parallelogram(anchor=(-2.5, 0.01, -3.0), v1=(5.0, 0.0, 0.0),
                      v2=(0.0, 0.0, 1.8),
                      material=Material(diffuse=(0.9, 0.8, 0.35),
                                        roughness=0.6)),
        Curve(kind="catmull_rom",
              ctrl=np.asarray([[-2.5, 0.2, 2.2], [-1.0, 1.8, 2.4],
                               [1.0, 0.4, 2.6], [2.5, 1.6, 2.2]],
                              np.float32),
              radii=np.asarray([0.18, 0.28, 0.22, 0.12], np.float32),
              material=Material(diffuse=(0.35, 0.75, 0.4),
                                roughness=0.45)),
    ]
    camera = Camera(eye=(0.0, 3.2, 8.5), lookat=(0.0, 0.9, 0.0),
                    fov_y=45.0)
    lights = [
        PointLight(position=(4.0, 6.0, 4.0), color=(1.0, 1.0, 1.0),
                   intensity=14.0),
        PointLight(position=(-5.0, 4.0, -2.0), color=(0.9, 0.95, 1.0),
                   intensity=7.0),
    ]
    return [floor], prims, camera, lights
