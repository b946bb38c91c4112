"""Analytic primitives end-to-end: scene slabs, combined tracing, direct
rendering, and the CLI.

Parity targets: the whitted custom-primitive programs
(cuda/geometry.cu:38-144, cuda/sphere.cu:37-96, cuda/curve.h) wired into
renderable scenes via sutil/Scene.cpp:1214-1452 — here via
Scene.prims + the direct renderer's combined tracer.
"""
import numpy as np

from rendertoy3c_tpu.scene.builtin import primitives_scene
from rendertoy3c_tpu.scene.material import Material
from rendertoy3c_tpu.scene.primitives import (
    Curve, Parallelogram, Sphere, SphereShell,
)
from rendertoy3c_tpu.scene.scene import build_scene


def _prim_demo_scene():
    meshes, prims, camera, lights = primitives_scene()
    return build_scene(meshes, prims=prims), camera, lights


def test_build_scene_prim_slabs():
    scene, _cam, _lights = _prim_demo_scene()
    p = scene.prims
    assert p is not None
    assert p.sph_center.shape == (1, 3)
    assert p.shell_radii.shape == (1, 2)
    assert p.par_anchor.shape == (1, 3)
    assert len(p.curves) == 1 and p.curves[0].kind == "catmull_rom"
    # primitive materials append to the mesh material table
    assert scene.num_materials == 5
    assert int(p.sph_mat[0]) == 1


def test_trace_prims_sphere_and_par():
    import jax.numpy as jnp

    from rendertoy3c_tpu.trace.primitives import trace_prims, trace_prims_any

    scene, _cam, _ = _prim_demo_scene()
    # ray straight at the sphere center (-1.6, 1, 0) from +z
    o = jnp.asarray([[-1.6, 1.0, 8.0], [0.0, 5.0, 0.01]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, -1.0, 0.0]], jnp.float32)
    t, n, uv, mat, hit = trace_prims(scene.prims, o, d, 1e-3, 1e16)
    # sphere front hit: t = dist - radius, normal facing +z
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 7.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(n[0]), [0, 0, 1], atol=1e-4)
    assert int(mat[0]) == 1  # first prim material
    # the downward ray at x=z~0 passes between every primitive -> miss
    assert not bool(hit[1])
    occ = trace_prims_any(scene.prims, o, d, 1e-3, jnp.asarray([7.5, 1e16]))
    assert bool(occ[0]) and not bool(occ[1])


def test_direct_render_prims_image():
    import jax.numpy as jnp

    from rendertoy3c_tpu.film.film import film_create
    from rendertoy3c_tpu.integrate.direct import make_direct_render_fn
    from rendertoy3c_tpu.integrate.config import RenderConfig

    scene, camera, lights = _prim_demo_scene()
    cfg = RenderConfig(width=64, height=64, samples_per_launch=2,
                       max_depth=1)
    camera.aspect_ratio = 1.0
    step = make_direct_render_fn(scene, cfg, point_lights=lights,
                                 ambient=(0.3, 0.3, 0.3))
    film, stats = step(camera.params(), film_create(64, 64))
    img = np.asarray(film.accum[..., :3])
    assert np.isfinite(img).all()
    # the floor + primitives cover most of the frame from this camera
    assert (img.sum(axis=-1) > 1e-4).mean() > 0.5
    # the red sphere is visible: some pixels are strongly red-dominant
    red = (img[..., 0] > img[..., 1] * 1.5) & (img[..., 0] > 0.05)
    assert red.mean() > 0.01
    # the curve's green is visible too
    green = (img[..., 1] > img[..., 0] * 1.4) & (img[..., 1] > 0.03)
    assert green.mean() > 0.003


def test_prim_shadows_cast_on_floor():
    """The sphere must occlude the point light: compare the floor
    brightness with and without primitives present."""
    import jax.numpy as jnp

    from rendertoy3c_tpu.film.film import film_create
    from rendertoy3c_tpu.integrate.direct import make_direct_render_fn
    from rendertoy3c_tpu.integrate.config import RenderConfig

    meshes, prims, camera, lights = primitives_scene()
    camera.aspect_ratio = 1.0
    cfg = RenderConfig(width=48, height=48, samples_per_launch=1,
                       max_depth=1)
    imgs = {}
    for key, p in (("with", prims), ("without", None)):
        scene = build_scene(meshes, prims=p)
        step = make_direct_render_fn(scene, cfg, point_lights=lights,
                                     ambient=(0.3, 0.3, 0.3))
        film, _ = step(camera.params(), film_create(48, 48))
        imgs[key] = np.asarray(film.accum[..., :3])
    # some floor pixels darken when primitives cast shadows
    darker = (imgs["with"].sum(-1) < imgs["without"].sum(-1) - 0.05)
    assert darker.mean() > 0.01


def test_cli_prims_scene(tmp_path):
    from rendertoy3c_tpu.app.cli import main

    out = tmp_path / "prims.png"
    rc = main(["--scene", "prims", "--size", "48x48", "--spp", "1",
               "--subframes", "1", "-o", str(out)])
    assert rc in (0, None)
    assert out.exists()
