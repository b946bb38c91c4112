"""Two-level AS (trace-time instancing) vs the baked single-level path."""
import numpy as np
import jax.numpy as jnp
import pytest

from rendertoy3c_tpu.integrate.config import RenderConfig
from rendertoy3c_tpu.integrate.path import render_frame
from rendertoy3c_tpu.scene.builtin import box_mesh, cornell_box, quad
from rendertoy3c_tpu.scene.instanced import build_instanced_scene
from rendertoy3c_tpu.scene.material import Material
from rendertoy3c_tpu.scene.mesh import Mesh
from rendertoy3c_tpu.scene.scene import Instance, build_scene
from rendertoy3c_tpu.trace.instanced import make_instanced_tracer


def _xform(translate=(0, 0, 0), scale=1.0):
    t = np.zeros((3, 4), np.float32)
    t[:, :3] = np.eye(3) * scale
    t[:, 3] = translate
    return t


def _render(scene, camera, tracer=None, **kw):
    base = dict(width=24, height=24, samples_per_launch=2, max_depth=4,
                ray_block=512)
    base.update(kw)
    cfg = RenderConfig(**base)
    film, stats = render_frame(scene, camera.params(), cfg, subframes=1,
                               tracer=tracer)
    return np.asarray(film.accum), stats


def test_identity_instances_match_baked():
    meshes, camera = cornell_box()
    baked = build_scene(meshes)
    instances = [Instance(mesh_index=i) for i in range(len(meshes))]
    inst_scene = build_instanced_scene(meshes, instances)
    tracer = make_instanced_tracer(inst_scene)

    img_baked, s_b = _render(baked, camera)
    img_inst, s_i = _render(inst_scene, camera, tracer=tracer)
    # Prim numbering differs between the two layouts, so rays that land
    # exactly on shared triangle edges may tie-break to the other triangle
    # and their MC paths diverge — allow a tiny fraction of such pixels.
    close = np.isclose(img_inst, img_baked, rtol=1e-5, atol=1e-5)
    assert close.mean() > 0.995, f"only {close.mean():.4f} matched"
    np.testing.assert_allclose(img_inst.mean(), img_baked.mean(), rtol=1e-3)


def test_transformed_instances_match_baked():
    """Same box placed twice via instance transforms == baked duplicates."""
    white = Material(diffuse=(0.7, 0.7, 0.7))
    light = Material(emissive=(12.0, 12.0, 12.0))
    box = box_mesh([-0.3, 0.0, -0.3], [0.3, 0.6, 0.3], white)
    lv, lf = quad([-0.4, 2.0, -0.4], [-0.4, 2.0, 0.4], [0.4, 2.0, 0.4],
                  [0.4, 2.0, -0.4])
    lamp = Mesh(vertices=lv[None], indices=lf, material=light)
    fv, ff = quad([-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2])
    floor = Mesh(vertices=fv[None], indices=ff, material=white)

    instances = [
        Instance(mesh_index=0, transforms=_xform((-0.7, 0, 0))),
        Instance(mesh_index=0, transforms=_xform((0.7, 0, 0), scale=0.5)),
        Instance(mesh_index=1),
        Instance(mesh_index=2),
    ]
    inst_scene = build_instanced_scene([box, lamp, floor], instances)
    tracer = make_instanced_tracer(inst_scene)

    baked = build_scene([box, lamp, floor], instances=instances)

    from rendertoy3c_tpu.scene.camera import Camera

    camera = Camera(eye=(0, 1.5, 4.0), lookat=(0, 0.5, 0), fov_y=45.0)
    img_i, _ = _render(inst_scene, camera, tracer=tracer)
    img_b, _ = _render(baked, camera)
    np.testing.assert_allclose(img_i, img_b, rtol=2e-4, atol=2e-4)


def test_instance_normals_under_scale():
    """Non-uniform-ish scaling must shade with inverse-transpose normals:
    a scaled floor still has an upward normal and gets lit."""
    white = Material(diffuse=(0.8, 0.8, 0.8))
    light = Material(emissive=(15.0, 15.0, 15.0))
    fv, ff = quad([-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1])
    floor = Mesh(vertices=fv[None], indices=ff, material=white)
    lv, lf = quad([-0.3, 1.6, -0.3], [-0.3, 1.6, 0.3], [0.3, 1.6, 0.3],
                  [0.3, 1.6, -0.3])
    lamp = Mesh(vertices=lv[None], indices=lf, material=light)
    t = np.zeros((3, 4), np.float32)
    t[0, 0], t[1, 1], t[2, 2] = 3.0, 1.0, 0.5  # non-uniform scale
    inst_scene = build_instanced_scene(
        [floor, lamp],
        [Instance(mesh_index=0, transforms=t), Instance(mesh_index=1)],
    )
    tracer = make_instanced_tracer(inst_scene)

    from rendertoy3c_tpu.scene.camera import Camera

    camera = Camera(eye=(0, 1.2, 2.5), lookat=(0, 0, 0), fov_y=50.0)
    img, _ = _render(inst_scene, camera, tracer=tracer)
    assert np.isfinite(img).all()
    assert img.mean() > 0.02  # floor is lit (normals valid)


def test_instance_matrix_motion_matches_baked():
    """2-key instance matrix motion vs the baked motion path."""
    white = Material(diffuse=(0.75, 0.75, 0.75))
    light = Material(emissive=(14.0, 14.0, 14.0))
    box = box_mesh([-0.2, 0.0, -0.2], [0.2, 0.4, 0.2], white)
    lv, lf = quad([-0.4, 1.8, -0.4], [-0.4, 1.8, 0.4], [0.4, 1.8, 0.4],
                  [0.4, 1.8, -0.4])
    lamp = Mesh(vertices=lv[None], indices=lf, material=light)
    two_key = np.stack([_xform((-0.5, 0, 0)), _xform((0.5, 0, 0))])
    instances = [
        Instance(mesh_index=0, transforms=two_key),
        Instance(mesh_index=1),
    ]
    inst_scene = build_instanced_scene([box, lamp], instances)
    assert inst_scene.num_keys == 2
    tracer = make_instanced_tracer(inst_scene)
    baked = build_scene([box, lamp], instances=instances)
    assert baked.num_keys == 2

    from rendertoy3c_tpu.scene.camera import Camera

    camera = Camera(eye=(0, 1.0, 3.0), lookat=(0, 0.3, 0), fov_y=45.0)
    img_i, _ = _render(inst_scene, camera, tracer=tracer, samples_per_launch=4)
    img_b, _ = _render(baked, camera, samples_per_launch=4)
    np.testing.assert_allclose(img_i, img_b, rtol=2e-4, atol=2e-4)


def test_instanced_normal_maps_match_baked():
    """Normal-mapped shading under a rotated+scaled instance matches the
    baked equivalent: tangents must ride the instance linear transform."""
    from rendertoy3c_tpu.scene.camera import Camera

    # bumpy normal map: smooth sinusoidal perturbation around +Z
    h, w = 16, 16
    yy, xx = np.mgrid[0:h, 0:w] / 8.0 * np.pi
    n = np.stack([0.45 * np.sin(xx), 0.45 * np.cos(yy),
                  np.sqrt(1.0 - 0.45 ** 2) * np.ones_like(xx)], axis=-1)
    ntex = np.concatenate(
        [((n * 0.5 + 0.5) * 255).astype(np.uint8),
         np.full((h, w, 1), 255, np.uint8)], axis=-1)

    white = Material(diffuse=(0.7, 0.7, 0.7), normal_texture_id=0)
    fv, ff = quad([-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1])
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    bumpy = Mesh(vertices=fv[None], indices=ff, texcoords=uvs,
                 material=white)
    lv, lf = quad([-0.5, 2.5, -0.5], [-0.5, 2.5, 0.5], [0.5, 2.5, 0.5],
                  [0.5, 2.5, -0.5])
    lamp = Mesh(vertices=lv[None], indices=lf,
                material=Material(emissive=(15.0, 15.0, 15.0)))

    # rotate the bumpy quad 40 degrees about Y and scale anisotropically
    c, s = np.cos(0.7), np.sin(0.7)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    t = np.zeros((3, 4), np.float32)
    t[:, :3] = rot @ np.diag([1.3, 1.0, 0.8]).astype(np.float32)
    instances = [Instance(mesh_index=0, transforms=t), Instance(mesh_index=1)]

    inst_scene = build_instanced_scene([bumpy, lamp], instances,
                                       textures=[ntex])
    tracer = make_instanced_tracer(inst_scene)
    baked = build_scene([bumpy, lamp], instances=instances, textures=[ntex])
    assert inst_scene.any_normal_map and baked.any_normal_map

    camera = Camera(eye=(0, 2.2, 3.2), lookat=(0, 0, 0), fov_y=45.0)
    img_i, _ = _render(inst_scene, camera, tracer=tracer, max_depth=3)
    img_b, _ = _render(baked, camera, max_depth=3)
    np.testing.assert_allclose(img_i, img_b, rtol=2e-4, atol=2e-4)

    # and the map visibly changes shading vs the unmapped scene
    flat = Mesh(vertices=fv[None], indices=ff, texcoords=uvs,
                material=Material(diffuse=(0.7, 0.7, 0.7)))
    img_flat, _ = _render(
        build_scene([flat, lamp], instances=instances), camera, max_depth=3)
    assert np.abs(img_b - img_flat).max() > 0.01
