"""Scene build: SoA layout, padding, lights, materials, camera."""
import math

import numpy as np
import jax.numpy as jnp

from rendertoy3c_tpu.scene import build_scene, Mesh, Material, Camera, Instance
from rendertoy3c_tpu.scene.builtin import cornell_box
from rendertoy3c_tpu.scene.scene import FACE_ALIGN


def test_cornell_build():
    meshes, cam = cornell_box()
    scene = build_scene(meshes)
    # 6 quads (12 tris) + 2 boxes (24 tris)
    assert scene.num_faces == 36
    assert scene.geom.mat_id.shape[0] % FACE_ALIGN == 0
    assert scene.num_materials == 8
    assert scene.num_lights == 2  # emissive quad = 2 triangles
    # light table geometry: area of each light tri = 0.5 * 0.8 * 0.8
    area = np.asarray(scene.lights.area[:2])
    np.testing.assert_allclose(area, 0.32, rtol=1e-5)
    np.testing.assert_allclose(
        np.abs(np.asarray(scene.lights.normal[:2, 1])), 1.0, atol=1e-6
    )


def test_padding_faces_are_degenerate():
    meshes, _ = cornell_box(with_blocks=False)
    scene = build_scene(meshes)
    pad = np.asarray(scene.geom.e1[0, scene.num_faces:])
    np.testing.assert_array_equal(pad, 0.0)


def test_camera_uvw():
    cam = Camera(eye=(0, 0, 5), lookat=(0, 0, 0), up=(0, 1, 0),
                 fov_y=90.0, aspect_ratio=2.0)
    u, v, w = cam.uvw_frame()
    np.testing.assert_allclose(w, [0, 0, -5], atol=1e-6)
    # vlen = |W| * tan(45 deg) = 5; ulen = vlen * aspect = 10
    np.testing.assert_allclose(np.linalg.norm(v), 5.0, rtol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(u), 10.0, rtol=1e-6)
    # right-handed: U x V ~ -W direction? U=(−10,0,0)? check orthogonality
    assert abs(np.dot(u, v)) < 1e-4
    assert abs(np.dot(u, w)) < 1e-4


def test_instances_transform():
    tri = Mesh(vertices=np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32),
               indices=[[0, 1, 2]])
    t = np.zeros((1, 3, 4), np.float32)
    t[0, :, :3] = np.eye(3)
    t[0, :, 3] = [5, 0, 0]
    scene = build_scene([tri, tri], instances=[
        Instance(mesh_index=0),
        Instance(mesh_index=1, transforms=t),
    ])
    assert scene.num_faces == 2
    v0 = np.asarray(scene.geom.v0[0, :2])
    np.testing.assert_allclose(v0[0], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(v0[1], [5, 0, 0], atol=1e-6)


def test_normals_computed_when_missing():
    tri = Mesh(vertices=np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32),
               indices=[[0, 1, 2]])
    scene = build_scene([tri])
    n = np.asarray(scene.geom.n0[0, 0])
    np.testing.assert_allclose(n, [0, 0, 1], atol=1e-6)


def test_emissive_light_threshold():
    dark = Mesh(
        vertices=np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32),
        indices=[[0, 1, 2]],
        material=Material(emissive=(1e-7, 0, 0)),
    )
    scene = build_scene([dark])
    assert scene.num_lights == 0


def test_trackball_orbit():
    from rendertoy3c_tpu.scene import Trackball

    cam = Camera(eye=(0, 0, 5), lookat=(0, 0, 0))
    tb = Trackball(camera=cam)
    r0 = np.linalg.norm(np.asarray(cam.eye) - np.asarray(cam.lookat))
    tb.start_tracking(0, 0)
    tb.update_tracking(100, 30)
    r1 = np.linalg.norm(np.asarray(cam.eye) - np.asarray(cam.lookat))
    np.testing.assert_allclose(r0, r1, rtol=1e-5)  # orbit preserves radius
    assert not np.allclose(np.asarray(cam.eye), [0, 0, 5])
    tb.zoom(+1)
    r2 = np.linalg.norm(np.asarray(cam.eye) - np.asarray(cam.lookat))
    np.testing.assert_allclose(r2, r1 / 1.1, rtol=1e-5)
