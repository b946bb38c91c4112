"""Walk-pool integrator (integrate/walkpool.py) parity tests.

The walk-pool restructures the pool loop around resumable traversal rounds;
per-path RNG draw order matches the fused/external pipelines exactly, and
the traversal itself is bit-exact vs trace_closest_hier/trace_any_hier
(property tests below). Whole-image parity vs the classic pool is tight at
shallow depth and statistical at deep depth: the shade stage's float-op
order (Pallas kernel / restructured XLA) differs from the classic pool's
by ulps, and a 1-ulp direction difference at a grazing hit can escalate to
a different (equally valid) path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rendertoy3c_tpu.accel.lbvh import split_order_scene
from rendertoy3c_tpu.integrate.config import RenderConfig
from rendertoy3c_tpu.integrate.path import render_pixels
from rendertoy3c_tpu.integrate.walkpool import (
    _BIG,
    FANOUT,
    _walk_round,
    make_walkpool_pipeline,
)
from rendertoy3c_tpu.scene.builtin import cornell_box, textured_quad_scene
from rendertoy3c_tpu.scene.scene import build_scene
from rendertoy3c_tpu.trace.hierwalk import (
    HIER_LEAF,
    build_hier_table,
    make_hierwalk_tracer,
    trace_any_hier,
    trace_closest_hier,
)


@pytest.fixture(scope="module")
def cornell_split():
    meshes, camera = cornell_box()
    camera.aspect_ratio = 1.0
    scene = split_order_scene(build_scene(meshes), leaf=HIER_LEAF)
    tab = build_hier_table(scene.geom, scene.num_faces)
    return scene, camera, tab


def _render(scene, camera, tracer, **kw):
    """tracer=None + walkpool=True builds the pipeline from (scene, cfg)."""
    walkpool = kw.pop("walkpool", False)
    kw.setdefault("ray_block", 1024)
    cfg = RenderConfig(width=24, height=24, integrator="pool",
                       pool_pixel_major=True, samples_per_launch=2, **kw)
    if walkpool:
        tracer = make_walkpool_pipeline(scene, cfg)
    pix = jnp.arange(cfg.width * cfg.height, dtype=jnp.int32)
    cam = camera.params()
    rgb, _aov, n_rad, n_shad, _rounds = jax.jit(
        lambda c: render_pixels(scene, cfg, c, tracer, pix, jnp.uint32(0))
    )(cam)
    return np.asarray(rgb), int(n_rad), int(n_shad)


def _drive_walk(tab, o, d, tmin, tmax, shadow=False):
    """Run _walk_round to completion as a standalone tracer."""
    r = o.shape[0]
    n_levels = len(tab.level_starts)
    tmax_c = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    rays = jnp.concatenate(
        [o, d, jnp.full((r, 1), jnp.float32(tmin)), tmax_c[:, None]],
        axis=1)
    s = dict(
        rays=rays,
        wtime=jnp.zeros((r,)), cur=jnp.zeros((r,), jnp.int32),
        wmode=jnp.full((r,), shadow),
        wfound=jnp.zeros((r,), bool),
        wb_t=tmax_c,
        wb_prim=jnp.full((r,), -1, jnp.int32),
        wb_u=jnp.zeros((r,)), wb_v=jnp.zeros((r,)),
        ents=[jnp.full((r, FANOUT), jnp.float32(_BIG))
              for _ in range(n_levels)],
        bases=[jnp.zeros((r,), jnp.int32) for _ in range(n_levels)],
        phase=jnp.zeros((r,), jnp.int32),
    )
    step = jax.jit(lambda s: _walk_round(tab, s, False))
    for _ in range(256):
        if not bool(jnp.any(s["cur"] >= 0)):
            break
        s = step(s)
    return s


def _random_rays(scene, n, seed=3):
    rng = np.random.default_rng(seed)
    v0 = np.asarray(scene.geom.v0[0][: scene.num_faces])
    lo, hi = v0.min(axis=0) - 0.5, v0.max(axis=0) + 0.5
    o = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_walk_round_closest_bitexact(cornell_split):
    scene, _cam, tab = cornell_split
    o, d = _random_rays(scene, 2048)
    s = _drive_walk(tab, o, d, 1e-3, 1e16)
    h = jax.jit(lambda o, d: trace_closest_hier(tab, o, d, 1e-3, 1e16))(o, d)
    prim_w = np.asarray(s["wb_prim"])
    prim_w = np.where(prim_w < tab.num_faces, prim_w, -1)
    assert (np.asarray(h.prim) == prim_w).all()
    hitm = np.asarray(h.prim) >= 0
    assert (np.asarray(h.t)[hitm] == np.asarray(s["wb_t"])[hitm]).all()
    assert (np.asarray(h.u)[hitm] == np.asarray(s["wb_u"])[hitm]).all()
    assert (np.asarray(h.v)[hitm] == np.asarray(s["wb_v"])[hitm]).all()


def test_walk_round_any_bitexact(cornell_split):
    scene, _cam, tab = cornell_split
    o, d = _random_rays(scene, 2048, seed=5)
    tmax = jnp.asarray(
        np.random.default_rng(6).uniform(0.5, 5.0, (2048,)), jnp.float32)
    s = _drive_walk(tab, o, d, 1e-3, tmax, shadow=True)
    occ = jax.jit(lambda o, d, t: trace_any_hier(tab, o, d, 1e-3, t))(
        o, d, tmax)
    assert (np.asarray(occ) == np.asarray(s["wfound"])).all()


def test_walkpool_matches_pool_shallow(cornell_split):
    """Depth-2 paths: same rays, same RNG, images to float tolerance."""
    scene, camera, _tab = cornell_split
    hier = make_hierwalk_tracer(scene)
    ref, nr1, ns1 = _render(scene, camera, hier, max_depth=2)
    out, nr2, ns2 = _render(scene, camera, None, max_depth=2,
                            walk_phase_every=5, walkpool=True)
    # the shade stage's float-op order differs from the classic pool's by
    # ulps; a near-tangent n.l can flip one lane's want_shadow (weight ~ 0)
    assert nr1 == nr2 and abs(ns1 - ns2) <= 2
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_walkpool_statistical_deep(cornell_split):
    """Deep paths: ulp-level float-order differences can reroute rare
    grazing bounces, so the comparison is statistical (same estimator)."""
    scene, camera, _tab = cornell_split
    hier = make_hierwalk_tracer(scene)
    ref, nr1, ns1 = _render(scene, camera, hier, max_depth=12)
    out, nr2, ns2 = _render(scene, camera, None, max_depth=12,
                            walk_phase_every=7, walkpool=True)
    assert abs(nr1 - nr2) <= max(16, nr1 // 200)
    assert abs(ns1 - ns2) <= max(16, ns1 // 200)
    diff = np.abs(out - ref).max(axis=1)
    assert np.mean(diff) < 2e-3
    assert np.mean(diff > 1e-4) < 0.05
    assert abs(out.mean() - ref.mean()) < 2e-3


def test_walkpool_k_invariance(cornell_split):
    """The phase cadence K must not change path results (only waiting)."""
    scene, camera, _tab = cornell_split
    a, nr1, ns1 = _render(scene, camera, None, max_depth=4,
                          walk_phase_every=3, walkpool=True)
    b, nr2, ns2 = _render(scene, camera, None, max_depth=4,
                          walk_phase_every=16, walkpool=True)
    assert (nr1, ns1) == (nr2, ns2)
    np.testing.assert_array_equal(a, b)


def test_walkpool_textured_dispatch():
    """Textured + multi-material scene through the walk pool (the shade
    kernel runs the texture fetch + material dispatch)."""
    meshes, textures, camera = textured_quad_scene()
    camera.aspect_ratio = 1.0
    scene = split_order_scene(build_scene(meshes, textures=textures),
                              leaf=HIER_LEAF)
    hier = make_hierwalk_tracer(scene)
    ref, nr1, ns1 = _render(scene, camera, hier, max_depth=2)
    out, nr2, ns2 = _render(scene, camera, None, max_depth=2, walkpool=True)
    assert nr1 == nr2 and abs(ns1 - ns2) <= 2
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_walkpool_xla_stage_env_map():
    """Env-map scenes fall outside the shade kernel's eligibility; the XLA
    stage must keep the same results (kernel=False path)."""
    from rendertoy3c_tpu.scene.envmap import EnvMap

    meshes, camera = cornell_box()
    camera.aspect_ratio = 1.0
    h, w = 8, 16
    img = np.linspace(0.0, 1.0, h * w * 3,
                      dtype=np.float32).reshape(h, w, 3)
    scene = build_scene(meshes, env_map=EnvMap(data=jnp.asarray(img)))
    scene = split_order_scene(scene, leaf=HIER_LEAF)
    wp = make_walkpool_pipeline(scene, RenderConfig(integrator="pool"))
    assert not wp.kernel
    hier = make_hierwalk_tracer(scene)
    ref, nr1, ns1 = _render(scene, camera, hier, max_depth=2)
    out, nr2, ns2 = _render(scene, camera, None, max_depth=2, walkpool=True)
    assert nr1 == nr2 and abs(ns1 - ns2) <= 2
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_walkpool_small_pool():
    """Pool narrower than the work list exercises refill/flush churn."""
    meshes, camera = cornell_box()
    camera.aspect_ratio = 1.0
    scene = split_order_scene(build_scene(meshes), leaf=HIER_LEAF)
    hier = make_hierwalk_tracer(scene)
    ref, nr1, ns1 = _render(scene, camera, hier, max_depth=2, ray_block=256)
    out, nr2, ns2 = _render(scene, camera, None, max_depth=2, ray_block=256,
                            walkpool=True)
    assert nr1 == nr2 and abs(ns1 - ns2) <= 2
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_walkpool_aov():
    """AOV accumulators ride the kernel's misc columns 16-21."""
    meshes, camera = cornell_box()
    camera.aspect_ratio = 1.0
    scene = split_order_scene(build_scene(meshes), leaf=HIER_LEAF)
    hier = make_hierwalk_tracer(scene)
    cfgkw = dict(max_depth=3, aov=True)
    cfg = RenderConfig(width=24, height=24, integrator="pool",
                       pool_pixel_major=True, samples_per_launch=2,
                       ray_block=1024, **cfgkw)
    pix = jnp.arange(cfg.width * cfg.height, dtype=jnp.int32)
    cam = camera.params()
    ref, aov_ref, _, _, _ = jax.jit(
        lambda c: render_pixels(scene, cfg, c, hier, pix, jnp.uint32(0)))(cam)
    wp = make_walkpool_pipeline(scene, cfg)
    out, aov_out, _, _, _ = jax.jit(
        lambda c: render_pixels(scene, cfg, c, wp, pix, jnp.uint32(0)))(cam)
    np.testing.assert_allclose(np.asarray(aov_out[0]),
                               np.asarray(aov_ref[0]), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(aov_out[1]),
                               np.asarray(aov_ref[1]), rtol=2e-5, atol=2e-5)


def test_walkpool_motion_2key():
    """2-key vertex motion: the walk lerps leaf rows by the per-ray time."""
    import dataclasses

    from rendertoy3c_tpu.trace.hierwalk import HIER_LEAF_MOTION

    meshes, camera = cornell_box()
    camera.aspect_ratio = 1.0
    scene = build_scene(meshes)
    g = scene.geom
    sh = jnp.asarray((0.25, 0.1, -0.15), jnp.float32)
    geom = g._replace(
        v0=jnp.stack([g.v0[0], g.v0[0] + sh]),
        e1=jnp.concatenate([g.e1, g.e1], axis=0),
        e2=jnp.concatenate([g.e2, g.e2], axis=0),
        n0=jnp.concatenate([g.n0, g.n0], axis=0),
        n1=jnp.concatenate([g.n1, g.n1], axis=0),
        n2=jnp.concatenate([g.n2, g.n2], axis=0),
    )
    scene = dataclasses.replace(scene, geom=geom, num_keys=2)
    scene = split_order_scene(scene, leaf=HIER_LEAF_MOTION)
    hier = make_hierwalk_tracer(scene)
    ref, nr1, ns1 = _render(scene, camera, hier, max_depth=2)
    out, nr2, ns2 = _render(scene, camera, None, max_depth=2, walkpool=True)
    assert nr1 == nr2 and abs(ns1 - ns2) <= 2
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_auto_ladder_picks_walkpool():
    """The auto ladder routes >16k-face pool scenes to the walk pool (and
    the walk pool's shade stage picks the kernel for eligible scenes)."""
    import numpy as np

    from rendertoy3c_tpu.integrate.walkpool import WalkPoolPipeline
    from rendertoy3c_tpu.scene.builtin import box_mesh, quad
    from rendertoy3c_tpu.scene.material import Material
    from rendertoy3c_tpu.scene.mesh import Mesh
    from rendertoy3c_tpu.trace.auto import choose_tracer, tune_config

    rng = np.random.default_rng(0)
    white = Material(diffuse=(0.7, 0.7, 0.7))
    v_all, f_all, off = [], [], 0
    for gx in range(40):
        for gz in range(40):
            m = box_mesh([gx, 0, gz], [gx + 0.8, rng.uniform(0.3, 2.0),
                                       gz + 0.8], white)
            v_all.append(m.vertices[0])
            f_all.append(m.indices + off)
            off += m.vertices.shape[1]
    big = Mesh(vertices=np.concatenate(v_all)[None],
               indices=np.concatenate(f_all), material=white)
    lv, lf = quad([-6, 25, -6], [-6, 25, 6], [6, 25, 6], [6, 25, -6])
    lamp = Mesh(vertices=lv[None], indices=lf,
                material=Material(emissive=(40.0, 40.0, 40.0)))
    scene = build_scene([big, lamp])
    assert scene.num_faces > 16384

    cfg = RenderConfig(integrator="pool", ray_block=32768,
                       pool_pixel_major=True)
    cfg = tune_config(scene, cfg, on_tpu=True)
    from rendertoy3c_tpu.trace.auto import POOL_BLOCK_LARGE
    # scene-keyed width: sub-100k-face walk scenes ride the 2x pool
    expect = (2 * POOL_BLOCK_LARGE if scene.num_faces < 100_000
              else POOL_BLOCK_LARGE)
    assert cfg.ray_block == expect
    scene2, tracer = choose_tracer(scene, cfg, on_tpu=True)
    assert isinstance(tracer, WalkPoolPipeline)
    assert tracer.kernel  # all-diffuse untextured scene -> shade kernel
    # wave integrator callers still get a bare tracer pair
    cfg_w = RenderConfig(integrator="wave")
    _s, pair = choose_tracer(scene, cfg_w, on_tpu=True)
    assert isinstance(pair, tuple) and len(pair) == 2


def test_walkpool_instanced_matches_pool():
    """Instanced walk pool (resumable TLAS walks + in-kernel instance
    normal transform) vs the classic pool over the inst hierwalk pair."""
    import numpy as np

    from rendertoy3c_tpu.integrate.walkpool import make_inst_walkpool_pipeline
    from rendertoy3c_tpu.scene.instanced import build_instanced_scene
    from rendertoy3c_tpu.scene.scene import Instance
    from rendertoy3c_tpu.trace.hier_instanced import (
        make_inst_hierwalk_tracer,
        split_order_instanced,
    )

    meshes, camera = cornell_box(with_blocks=False)
    camera.aspect_ratio = 1.0
    inst = [Instance(mesh_index=i) for i in range(len(meshes))]
    for k, (gx, gz) in enumerate(((-0.5, 0.0), (0.4, -0.3), (0.1, 0.5))):
        t = np.zeros((3, 4), np.float32)
        t[0, 0] = 0.3
        t[1, 1] = 0.2 + 0.1 * k
        t[2, 2] = 0.25
        t[0, 1] = 0.1  # shear: non-trivial inverse-transpose
        t[:, 3] = (gx, 0.15, gz)
        inst.append(Instance(mesh_index=0, transforms=t))
    iscene = split_order_instanced(build_instanced_scene(meshes, inst))

    tracer = make_inst_hierwalk_tracer(iscene)
    ref, nr1, ns1 = _render(iscene, camera, tracer, max_depth=3)
    cfg = RenderConfig(width=24, height=24, integrator="pool",
                       pool_pixel_major=True, samples_per_launch=2,
                       ray_block=1024, max_depth=3)
    wp = make_inst_walkpool_pipeline(iscene, cfg)
    assert wp.instanced and wp.kernel
    pix = jnp.arange(cfg.width * cfg.height, dtype=jnp.int32)
    out, _aov, nr2, ns2, _rounds = jax.jit(
        lambda c: render_pixels(iscene, cfg, c, wp, pix, jnp.uint32(0))
    )(camera.params())
    out = np.asarray(out)
    assert nr1 == int(nr2) and abs(ns1 - int(ns2)) <= 2
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_pipepool_bitexact_vs_classic(cornell_split):
    """The P=2 pipelined pool reorders WHEN walks run, not what they
    compute: per-path RNG streams, shade inputs, and per-pixel sample
    order are identical to the classic walk pool, so ray/shadow counts
    match exactly and images match to the ulp (the two graphs fuse
    differently, so XLA may contract a different FMA here and there —
    observed 3/1728 elements off by 1 ulp under the 8-device conftest).
    """
    scene, camera, _tab = cornell_split
    a, nr1, ns1 = _render(scene, camera, None, max_depth=6,
                          walk_phase_every=4, walkpool=True, pool_paths=1)
    b, nr2, ns2 = _render(scene, camera, None, max_depth=6,
                          walk_phase_every=4, walkpool=True, pool_paths=2)
    assert (nr1, ns1) == (nr2, ns2)
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_pipepool_bitexact_motion_aov():
    """Pipelined pool parity on the 2-key-motion + AOV variant."""
    from rendertoy3c_tpu.scene.builtin import cornell_box as _cb
    from rendertoy3c_tpu.trace.hierwalk import HIER_LEAF_MOTION

    meshes, camera = _cb()
    camera.aspect_ratio = 1.0
    for m in meshes:
        v0 = m.vertices[0]
        m.vertices = np.stack([v0, v0 + np.float32([0.05, 0, 0])])
    scene = split_order_scene(build_scene(meshes), leaf=HIER_LEAF_MOTION)
    a, nr1, ns1 = _render(scene, camera, None, max_depth=3, aov=True,
                          walk_phase_every=5, walkpool=True, pool_paths=1)
    b, nr2, ns2 = _render(scene, camera, None, max_depth=3, aov=True,
                          walk_phase_every=5, walkpool=True, pool_paths=2)
    assert (nr1, ns1) == (nr2, ns2)
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
