"""Distributed rendering tests on the virtual 8-device CPU mesh
(SURVEY.md S4 item 4): tile-sharded rendering must be bit-identical to
single-device; tile x spp sharding must agree statistically."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rendertoy3c_tpu.film.film import film_create
from rendertoy3c_tpu.integrate.config import RenderConfig
from rendertoy3c_tpu.integrate.path import render_frame
from rendertoy3c_tpu.parallel.dist import (
    film_create_sharded,
    make_mesh,
    make_render_fn_dist,
)
from rendertoy3c_tpu.scene.builtin import cornell_box
from rendertoy3c_tpu.scene.scene import build_scene


def _small_cfg(**kw):
    base = dict(
        width=32, height=32, samples_per_launch=2, max_depth=3, ray_block=256
    )
    base.update(kw)
    return RenderConfig(**base)


@pytest.fixture(scope="module")
def cornell():
    meshes, camera = cornell_box()
    return build_scene(meshes), camera


def test_tile_sharded_bit_identical(cornell):
    scene, camera = cornell
    cfg = _small_cfg()
    camera.aspect_ratio = 1.0
    cam = camera.params()

    film_ref, _ = render_frame(scene, cam, cfg, subframes=2)

    mesh = make_mesh(n_tile=8, n_spp=1)
    step, mesh = make_render_fn_dist(scene, cfg, mesh)
    film = film_create_sharded(cfg, mesh)
    for _ in range(2):
        film, _ = step(cam, film)

    np.testing.assert_array_equal(
        np.asarray(film.accum), np.asarray(film_ref.accum)
    )
    assert int(film.subframe_index) == 2


def test_tile_spp_mesh_statistics(cornell):
    scene, camera = cornell
    cfg = _small_cfg(samples_per_launch=4)
    cam = camera.params()

    mesh = make_mesh(n_tile=4, n_spp=2)
    step, mesh = make_render_fn_dist(scene, cfg, mesh)
    film = film_create_sharded(cfg, mesh)
    film, stats = step(cam, film)

    film_ref, _ = render_frame(scene, cam, cfg, subframes=1)
    a = np.asarray(film.accum)
    b = np.asarray(film_ref.accum)
    assert np.all(np.isfinite(a))
    assert int(stats.radiance_rays) > 0
    assert int(stats.shadow_rays) > 0
    # Same scene, decorrelated sample sets: images agree in the mean.
    assert abs(a.mean() - b.mean()) < 0.05 * max(b.mean(), 1e-6)


def _dist_vs_single(scene, camera, cfg, factory, strict=True):
    """Sharded render vs single-chip render over the SAME prebuilt backend."""
    camera.aspect_ratio = 1.0
    cam = camera.params()
    tracer = factory(scene, None, cfg)
    film_ref, s_ref = render_frame(scene, cam, cfg, subframes=1,
                                   tracer=tracer)
    mesh = make_mesh(n_tile=8, n_spp=1)
    step, mesh = make_render_fn_dist(scene, cfg, mesh,
                                     tracer_factory=factory)
    film = film_create_sharded(cfg, mesh)
    film, stats = step(cam, film)
    a = np.asarray(film.accum)
    b = np.asarray(film_ref.accum)
    if strict:
        np.testing.assert_array_equal(a, b)
    else:
        # pool flush order differs with the shard pool shape; per-path
        # arithmetic is identical (same backend both sides)
        close = np.isclose(a, b, rtol=3e-5, atol=3e-5)
        assert close.mean() > 0.98, f"only {close.mean():.4f} matched"
        np.testing.assert_allclose(a.mean(), b.mean(), rtol=5e-3)
    assert int(stats.radiance_rays) == int(s_ref.radiance_rays)


def test_pallas_factory_bit_identical(cornell):
    """Tile-sharded pallas MT tracer == single-chip, bitwise (wave)."""
    from rendertoy3c_tpu.parallel.dist import prepare_tracer_factory

    scene, camera = cornell
    cfg = _small_cfg()
    scene2, fac = prepare_tracer_factory(scene, cfg, kind="pallas")
    _dist_vs_single(scene2, camera, cfg, fac, strict=True)


def test_fused_factory_dist(cornell):
    """The fused megakernel pipeline under the 8-device tile mesh."""
    from rendertoy3c_tpu.parallel.dist import prepare_tracer_factory
    from rendertoy3c_tpu.trace.pallas_shade import FusedPipeline

    scene, camera = cornell
    cfg = _small_cfg(integrator="pool", ray_block=256)
    scene2, fac = prepare_tracer_factory(scene, cfg, kind="auto")
    assert isinstance(fac(scene2, None, cfg), FusedPipeline)
    _dist_vs_single(scene2, camera, cfg, fac, strict=False)


def test_external_factory_dist(cornell):
    """External shade pipeline (pallas MT closest/any) under the mesh."""
    from rendertoy3c_tpu.parallel.dist import prepare_tracer_factory
    from rendertoy3c_tpu.trace.pallas_shade import ExternalPipeline

    scene, camera = cornell
    cfg = _small_cfg(integrator="pool", ray_block=256)
    scene2, fac = prepare_tracer_factory(scene, cfg, kind="external")
    assert isinstance(fac(scene2, None, cfg), ExternalPipeline)
    _dist_vs_single(scene2, camera, cfg, fac, strict=False)


def test_mesh_shape_validation(cornell):
    scene, _ = cornell
    mesh = make_mesh(n_tile=8, n_spp=1)
    with pytest.raises(ValueError):
        make_render_fn_dist(scene, _small_cfg(height=36), mesh)
    mesh2 = make_mesh(n_tile=4, n_spp=2)
    with pytest.raises(ValueError):
        make_render_fn_dist(scene, _small_cfg(samples_per_launch=3), mesh2)


def test_hierwalk_factory_bit_identical(cornell):
    """Tile-sharded ordered-DFS hierwalk pair == single-chip, bitwise."""
    from rendertoy3c_tpu.parallel.dist import prepare_tracer_factory

    scene, camera = cornell
    cfg = _small_cfg()
    scene2, fac = prepare_tracer_factory(scene, cfg, kind="hierwalk")
    _dist_vs_single(scene2, camera, cfg, fac, strict=True)


def test_walkpool_factory_dist(cornell):
    """Walk-pool integrator marker under the 8-device tile mesh."""
    from rendertoy3c_tpu.integrate.walkpool import WalkPoolPipeline
    from rendertoy3c_tpu.parallel.dist import prepare_tracer_factory

    scene, camera = cornell
    cfg = _small_cfg(integrator="pool", ray_block=256, max_depth=3)
    scene2, fac = prepare_tracer_factory(scene, cfg, kind="walkpool")
    assert isinstance(fac(scene2, None, cfg), WalkPoolPipeline)
    _dist_vs_single(scene2, camera, cfg, fac, strict=False)


@pytest.fixture(scope="module")
def inst_cornell():
    from rendertoy3c_tpu.scene.builtin import instanced_cornell
    from rendertoy3c_tpu.scene.instanced import build_instanced_scene

    meshes, instances, camera = instanced_cornell()
    return build_instanced_scene(meshes, instances), camera


def test_instanced_factory_routes_to_tlas_walk(inst_cornell):
    """An InstancedScene must NOT fall through to the object-space pallas
    MT ladder (transforms ignored -> wrong image); auto picks the
    instanced TLAS walk and the sharded render is bit-identical."""
    from rendertoy3c_tpu.parallel.dist import prepare_tracer_factory

    iscene, camera = inst_cornell
    cfg = _small_cfg()
    scene2, fac = prepare_tracer_factory(iscene, cfg, kind="auto")
    tracer = fac(scene2, None, cfg)
    # bare (closest, any) pair from make_inst_hierwalk_tracer
    assert isinstance(tracer, tuple) and len(tracer) == 2
    _dist_vs_single(scene2, camera, cfg, fac, strict=True)


def test_instanced_walkpool_factory_dist(inst_cornell):
    """Instanced walk-pool pipeline under the 8-device tile mesh."""
    from rendertoy3c_tpu.integrate.walkpool import WalkPoolPipeline
    from rendertoy3c_tpu.parallel.dist import prepare_tracer_factory

    iscene, camera = inst_cornell
    cfg = _small_cfg(integrator="pool", ray_block=256, max_depth=3)
    scene2, fac = prepare_tracer_factory(iscene, cfg, kind="walkpool")
    tracer = fac(scene2, None, cfg)
    assert isinstance(tracer, WalkPoolPipeline) and tracer.instanced
    _dist_vs_single(scene2, camera, cfg, fac, strict=False)


def test_baked_instanced_walkpool_factory_dist(inst_cornell,
                                               monkeypatch):
    """The BAKED world-space instanced walk pool under the mesh
    (RT3C_INST_BAKE=2 forces the bake at test scale): the plain-round
    walk + eff-id boundary decode must shard bit-identically."""
    from rendertoy3c_tpu.integrate.walkpool import WalkPoolPipeline
    from rendertoy3c_tpu.parallel.dist import prepare_tracer_factory

    monkeypatch.setenv("RT3C_INST_BAKE", "2")
    iscene, camera = inst_cornell
    cfg = _small_cfg(integrator="pool", ray_block=256, max_depth=3)
    scene2, fac = prepare_tracer_factory(iscene, cfg, kind="walkpool")
    tracer = fac(scene2, None, cfg)
    assert isinstance(tracer, WalkPoolPipeline)
    assert tracer.instanced and tracer.inst_stride > 0
    _dist_vs_single(scene2, camera, cfg, fac, strict=False)


@pytest.fixture(scope="module")
def town16k(tmp_path_factory):
    """A reduced genassets town: >=16k faces -> a multi-level hier table
    with DP-grouped variable directories (the production walk-band table
    shape, which the Cornell-scale cases above never exercise)."""
    from rendertoy3c_tpu.io.genassets import generate_town
    from rendertoy3c_tpu.io.obj import load_obj

    out = tmp_path_factory.mktemp("town")
    paths, _cam = generate_town(str(out), faces_target=17000)
    meshes, textures = load_obj(paths[0])
    from rendertoy3c_tpu.scene.camera import Camera

    camera = Camera(eye=(38.0, 26.0, 46.0), lookat=(0.0, 1.5, 0.0),
                    fov_y=42.0, aspect_ratio=1.0)
    return build_scene(meshes, textures=textures or None), camera


def test_multilevel_walkpool_factory_dist(town16k):
    """The multi-level walk band under the mesh: a >=3-level DP-grouped
    table through the walk-pool pipeline, sharded == single-chip."""
    from rendertoy3c_tpu.integrate.walkpool import WalkPoolPipeline
    from rendertoy3c_tpu.parallel.dist import prepare_tracer_factory

    scene, camera = town16k
    cfg = _small_cfg(width=16, height=16, samples_per_launch=1,
                     max_depth=2, integrator="pool", ray_block=256)
    scene2, fac = prepare_tracer_factory(scene, cfg, kind="walkpool")
    pipe = fac(scene2, None, cfg)
    assert isinstance(pipe, WalkPoolPipeline)
    assert pipe.n_levels >= 3  # multi-level, not the Cornell 1-level table
    _dist_vs_single(scene2, camera, cfg, fac, strict=False)


def test_nkey_hierwalk_factory_dist(town16k):
    """>2-key vertex motion at scale routes to the stacked-segment
    hierwalk tables under the mesh (auto ladder), bit-identical."""
    import dataclasses as _dc

    from rendertoy3c_tpu.parallel.dist import prepare_tracer_factory
    from rendertoy3c_tpu.scene.scene import GeometrySoA

    scene, camera = town16k
    # synthesize a 3-key scene: key 1 shifts, key 2 shifts further
    g = scene.geom

    def keys3(a):
        a0 = np.asarray(a)[0]
        sh = np.zeros_like(a0)
        sh[:, 1] = 0.15
        return jnp.asarray(np.stack([a0, a0 + sh, a0 + 2 * sh]))

    g3 = GeometrySoA(
        v0=keys3(g.v0), e1=jnp.tile(g.e1[:1], (3, 1, 1)),
        e2=jnp.tile(g.e2[:1], (3, 1, 1)),
        n0=jnp.tile(g.n0[:1], (3, 1, 1)),
        n1=jnp.tile(g.n1[:1], (3, 1, 1)),
        n2=jnp.tile(g.n2[:1], (3, 1, 1)),
        uv0=g.uv0, uv1=g.uv1, uv2=g.uv2, mat_id=g.mat_id,
    )
    scene3 = _dc.replace(scene, geom=g3, num_keys=3)
    cfg = _small_cfg(width=16, height=16, samples_per_launch=1, max_depth=2)
    scene2, fac = prepare_tracer_factory(scene3, cfg, kind="auto")
    tracer = fac(scene2, None, cfg)
    assert isinstance(tracer, tuple) and len(tracer) == 2  # hierwalk pair
    _dist_vs_single(scene2, camera, cfg, fac, strict=True)


def test_instanced_fanout20_walkpool_dist():
    """A deep instanced table that auto-picks the 20-ary tier, through the
    instanced walk pool under the mesh."""
    from rendertoy3c_tpu.integrate.walkpool import WalkPoolPipeline
    from rendertoy3c_tpu.parallel.dist import prepare_tracer_factory
    from rendertoy3c_tpu.scene.instanced import build_instanced_scene
    from rendertoy3c_tpu.scene.mesh import Mesh
    from rendertoy3c_tpu.scene.scene import Instance
    from rendertoy3c_tpu.scene.camera import Camera
    from rendertoy3c_tpu.scene.material import Material
    from rendertoy3c_tpu.trace.hier_instanced import _resolve_inst_fanout

    # tower mesh: tessellated box, ~3.6k faces
    rng = np.random.default_rng(3)
    s = 19
    vs, fs = [], []
    for j in range(s + 1):
        for i in range(s + 1):
            vs.append((i / s, (i + j) % 3 * 0.1, j / s))
    for j in range(s):
        for i in range(s):
            a = j * (s + 1) + i
            fs += [(a, a + 1, a + s + 2), (a, a + s + 2, a + s + 1)]
    mesh = Mesh(vertices=np.asarray(vs, np.float32)[None],
                indices=np.asarray(fs, np.int32),
                material=Material(diffuse=(0.7, 0.7, 0.7)))
    lamp = Mesh(
        vertices=np.asarray([[4, 9, 4], [12, 9, 4], [12, 9, 12], [4, 9, 12]],
                            np.float32)[None],
        indices=np.asarray([[0, 1, 2], [0, 2, 3]], np.int32),
        material=Material(diffuse=(0, 0, 0), emissive=(30, 30, 30)))
    instances = []
    for gz in range(18):
        for gx in range(18):
            t = np.zeros((3, 4), np.float32)
            t[0, 0] = t[1, 1] = t[2, 2] = 1.0
            t[0, 3] = gx * 0.9
            t[2, 3] = gz * 0.9
            t[1, 3] = rng.uniform(0, 0.3)
            instances.append(Instance(mesh_index=0, transforms=t))
    instances.append(Instance(mesh_index=1))
    iscene = build_instanced_scene([mesh, lamp], instances)
    assert _resolve_inst_fanout(iscene) == 20  # the 20-ary tier engages

    camera = Camera(eye=(20.0, 14.0, 22.0), lookat=(8.0, 0.5, 8.0),
                    fov_y=45.0, aspect_ratio=1.0)
    cfg = _small_cfg(width=16, height=16, samples_per_launch=1,
                     max_depth=2, integrator="pool", ray_block=256)
    scene2, fac = prepare_tracer_factory(iscene, cfg, kind="walkpool")
    pipe = fac(scene2, None, cfg)
    assert isinstance(pipe, WalkPoolPipeline) and pipe.instanced
    assert pipe.fanout == 20
    _dist_vs_single(scene2, camera, cfg, fac, strict=False)
