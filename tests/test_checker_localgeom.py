"""Procedural checker (cuda/shading.cu:169-205) and LocalGeometry
dpdu/dpdv/dndu/dndv (cuda/LocalGeometry.h:125-162) parity tests."""
import numpy as np

from rendertoy3c_tpu.integrate.config import RenderConfig
from rendertoy3c_tpu.integrate.direct import render_direct
from rendertoy3c_tpu.integrate.localgeom import local_geometry_derivs
from rendertoy3c_tpu.scene.builtin import quad
from rendertoy3c_tpu.scene.camera import Camera
from rendertoy3c_tpu.scene.material import Material, build_material_table
from rendertoy3c_tpu.scene.mesh import Mesh
from rendertoy3c_tpu.scene.scene import build_scene

_RED = (0.9, 0.1, 0.1)
_BLUE = (0.1, 0.1, 0.9)


def _checker_scene():
    v, f = quad([-3, 0, -3], [3, 0, -3], [3, 0, 3], [-3, 0, 3])
    uv = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    mesh = Mesh(
        vertices=v[None], indices=f, texcoords=uv,
        material=Material(diffuse=_RED, checker_color2=_BLUE,
                          checker_inv_size=(2.0, 2.0)),
    )
    return build_scene([mesh])


def test_checker_table_gate():
    t = build_material_table([Material(), Material(checker_color2=_BLUE)])
    assert not bool(np.asarray(t.checker)[0])
    assert bool(np.asarray(t.checker)[1])


def test_checker_pattern_direct():
    """uv in [0,1]^2 over inv_size (2,2) -> a 2x2 checkerboard: diagonal
    quadrants match, adjacent quadrants flip between the two diffuse sets
    (which_check parity, shading.cu:184-199)."""
    scene = _checker_scene()
    cfg = RenderConfig(width=8, height=8, samples_per_launch=1,
                       ray_block=64, bg_radiance=(0, 0, 0))
    cam = Camera(eye=(0, 4.0, 0.01), lookat=(0, 0, 0), fov_y=50.0,
                 aspect_ratio=1.0).params()
    film, _ = render_direct(scene, cam, cfg, ambient=(1.0, 1.0, 1.0),
                            subframes=1)
    img = np.asarray(film.accum)[..., :3]
    # quadrant centers (rows x cols); image y may be flipped — assert the
    # checker structure, not an absolute orientation
    a = img[2, 2]
    b = img[2, 5]
    c = img[5, 2]
    d = img[5, 5]
    np.testing.assert_allclose(a, d, atol=1e-5)
    np.testing.assert_allclose(b, c, atol=1e-5)
    assert not np.allclose(a, b, atol=1e-3)
    got = {tuple(np.round(a, 3)), tuple(np.round(b, 3))}
    want = {tuple(np.float32(_RED)), tuple(np.float32(_BLUE))}
    assert got == want


def _deriv_scene(with_uv: bool):
    v = np.asarray([[-3, 0, -3], [3, 0, -3], [3, 0, 3]], np.float32)
    f = np.asarray([[0, 1, 2]], np.int32)
    uv = np.asarray([[0, 0], [1, 0], [1, 1]], np.float32) if with_uv else None
    return build_scene([Mesh(vertices=v[None], indices=f, texcoords=uv)])


def test_local_geometry_derivs_analytic():
    """P(U,V) = P0 + (U-V) e1 + V e2 for uv = ((0,0),(1,0),(1,1)):
    dpdu = e1, dpdv = e2 - e1; flat normals -> dndu = dndv = 0."""
    scene = _deriv_scene(with_uv=True)
    prim = np.zeros((1,), np.int32)
    dpdu, dpdv, dndu, dndv = local_geometry_derivs(scene.geom, prim)
    np.testing.assert_allclose(np.asarray(dpdu)[0], [6, 0, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(dpdv)[0], [0, 0, 6], atol=1e-5)
    np.testing.assert_allclose(np.asarray(dndu)[0], [0, 0, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(dndv)[0], [0, 0, 0], atol=1e-5)


def test_local_geometry_derivs_degenerate_fallback():
    """No texcoords -> uv all zero -> det 0: the reference's no-texcoord
    branch (LocalGeometry.h:155-162): dpdu = -dp1 = e2, dpdv = -dp1 + dp2
    = e1."""
    scene = _deriv_scene(with_uv=False)
    prim = np.zeros((1,), np.int32)
    dpdu, dpdv, _, _ = local_geometry_derivs(scene.geom, prim)
    e1 = np.asarray(scene.geom.e1)[0, 0]
    e2 = np.asarray(scene.geom.e2)[0, 0]
    np.testing.assert_allclose(np.asarray(dpdu)[0], e2, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dpdv)[0], e1, atol=1e-5)
