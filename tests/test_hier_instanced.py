"""Instanced hierarchical walk vs the reference instanced tracer.

The TLAS walk (trace/hier_instanced.py) must agree with the unrolled
brute-force instanced tracer (trace/instanced.py) on (t, prim, inst) and
the occlusion mask for static scenes.
"""
import numpy as np
import pytest

from rendertoy3c_tpu.scene.builtin import box_mesh, cornell_box, quad
from rendertoy3c_tpu.scene.instanced import build_instanced_scene
from rendertoy3c_tpu.scene.material import Material
from rendertoy3c_tpu.scene.mesh import Mesh
from rendertoy3c_tpu.scene.scene import Instance
from rendertoy3c_tpu.trace.hier_instanced import (
    make_inst_hierwalk_tracer, split_order_instanced,
)
from rendertoy3c_tpu.trace.instanced import make_instanced_tracer


def _instanced_cornell():
    """The bench's trace-time config: cornell shell + a 3x3 grid of
    scaled boxes."""
    meshes, cam = cornell_box(with_blocks=False)
    xs = []
    for gx in (-0.6, 0.0, 0.6):
        for gz in (-0.6, 0.0, 0.6):
            t = np.zeros((3, 4), np.float32)
            t[:, :3] = np.eye(3) * 0.25
            t[:, 3] = (gx, 0.2, gz)
            xs.append(t)
    inst = [Instance(mesh_index=i) for i in range(len(meshes))]
    inst += [Instance(mesh_index=0, transforms=t) for t in xs]
    return build_instanced_scene(meshes, inst), cam


def _many_boxes(n=40, seed=0):
    """Many rotated/scaled instances of two meshes."""
    rng = np.random.default_rng(seed)
    red = Material(diffuse=(0.8, 0.2, 0.2))
    blue = Material(diffuse=(0.2, 0.2, 0.8))
    meshes = [box_mesh([-0.5, -0.5, -0.5], [0.5, 0.5, 0.5], red)]
    lv, lf = quad([-0.5, 0, -0.5], [-0.5, 0, 0.5], [0.5, 0, 0.5],
                  [0.5, 0, -0.5])
    meshes.append(Mesh(vertices=lv[None], indices=lf, material=blue))
    inst = []
    for _ in range(n):
        ang = rng.uniform(0, 2 * np.pi)
        c, s = np.cos(ang), np.sin(ang)
        sc = rng.uniform(0.4, 1.8)
        t = np.asarray([[c * sc, 0, s * sc, rng.uniform(-8, 8)],
                        [0, sc, 0, rng.uniform(0, 3)],
                        [-s * sc, 0, c * sc, rng.uniform(-8, 8)]],
                       np.float32)
        inst.append(Instance(mesh_index=int(rng.integers(0, 2)),
                             transforms=t))
    return build_instanced_scene(meshes, inst)


def _rand_rays(n, lo, hi, seed=1):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    o = rng.uniform(lo, hi, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _check(iscene, n_rays=2048, seed=2, count=None, span=8.0):
    import jax.numpy as jnp

    iscene = split_order_instanced(iscene)
    hc, ha = make_inst_hierwalk_tracer(iscene)
    bc, ba = make_instanced_tracer(iscene)
    o, d = _rand_rays(n_rays, -span, span, seed)
    h = hc(o, d, 1e-3, 1e16, None, count)
    b = bc(o, d, 1e-3, 1e16, None, count)
    n_live = n_rays if count is None else count
    np.testing.assert_array_equal(np.asarray(h.prim)[:n_live],
                                  np.asarray(b.prim)[:n_live])
    np.testing.assert_array_equal(np.asarray(h.inst)[:n_live],
                                  np.asarray(b.inst)[:n_live])
    np.testing.assert_allclose(np.asarray(h.t)[:n_live],
                               np.asarray(b.t)[:n_live],
                               rtol=2e-5, atol=2e-5)
    occ_h = np.asarray(ha(o, d, 1e-3, 4.0, None, count))
    occ_b = np.asarray(ba(o, d, 1e-3, 4.0, None, count))
    np.testing.assert_array_equal(occ_h[:n_live], occ_b[:n_live])


def test_instanced_cornell_matches():
    iscene, _cam = _instanced_cornell()
    _check(iscene, span=1.0)


def test_many_transformed_instances_match():
    _check(_many_boxes(40), seed=5)


def test_single_instance():
    _check(_many_boxes(1, seed=3), n_rays=512, seed=7)


def test_count_gating():
    _check(_many_boxes(20, seed=4), n_rays=1024, seed=9, count=700)


def test_render_parity_instanced():
    """A frame through the pool integrator over the instanced hierwalk ==
    the same frame over the unrolled instanced tracer."""
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import render_frame

    iscene, cam = _instanced_cornell()
    iscene = split_order_instanced(iscene)
    cam.aspect_ratio = 1.0
    cfg = RenderConfig(width=24, height=24, samples_per_launch=2,
                       max_depth=4, ray_block=512, integrator="pool")
    f_h, s_h = render_frame(iscene, cam.params(), cfg, subframes=1,
                            tracer=make_inst_hierwalk_tracer(iscene))
    f_b, s_b = render_frame(iscene, cam.params(), cfg, subframes=1,
                            tracer=make_instanced_tracer(iscene))
    np.testing.assert_allclose(np.asarray(f_h.accum), np.asarray(f_b.accum),
                               rtol=2e-3, atol=2e-3)


def _many_boxes_motion(n=24, seed=11):
    """Rotating/translating 2-key instances of two meshes."""
    rng = np.random.default_rng(seed)
    red = Material(diffuse=(0.8, 0.2, 0.2))
    blue = Material(diffuse=(0.2, 0.2, 0.8))
    meshes = [box_mesh([-0.5, -0.5, -0.5], [0.5, 0.5, 0.5], red)]
    lv, lf = quad([-0.5, 0, -0.5], [-0.5, 0, 0.5], [0.5, 0, 0.5],
                  [0.5, 0, -0.5])
    meshes.append(Mesh(vertices=lv[None], indices=lf, material=blue))
    inst = []
    for _ in range(n):
        keys = []
        for _k in range(2):
            ang = rng.uniform(0, 2 * np.pi)
            c, s = np.cos(ang), np.sin(ang)
            sc = rng.uniform(0.4, 1.8)
            keys.append([[c * sc, 0, s * sc, rng.uniform(-8, 8)],
                         [0, sc, 0, rng.uniform(0, 3)],
                         [-s * sc, 0, c * sc, rng.uniform(-8, 8)]])
        inst.append(Instance(mesh_index=int(rng.integers(0, 2)),
                             transforms=np.asarray(keys, np.float32)))
    return build_instanced_scene(meshes, inst)


def _check_motion(iscene, n_rays=2048, seed=2, span=8.0):
    import jax.numpy as jnp

    assert iscene.num_keys == 2
    iscene = split_order_instanced(iscene)
    hc, ha = make_inst_hierwalk_tracer(iscene)
    bc, ba = make_instanced_tracer(iscene)
    o, d = _rand_rays(n_rays, -span, span, seed)
    rng = np.random.default_rng(seed + 1)
    time = jnp.asarray(rng.uniform(0, 1, n_rays).astype(np.float32))
    h = hc(o, d, 1e-3, 1e16, time, None)
    b = bc(o, d, 1e-3, 1e16, time, None)
    np.testing.assert_array_equal(np.asarray(h.prim), np.asarray(b.prim))
    np.testing.assert_array_equal(np.asarray(h.inst), np.asarray(b.inst))
    np.testing.assert_allclose(np.asarray(h.t), np.asarray(b.t),
                               rtol=2e-4, atol=2e-4)
    occ_h = np.asarray(ha(o, d, 1e-3, 4.0, time, None))
    occ_b = np.asarray(ba(o, d, 1e-3, 4.0, time, None))
    np.testing.assert_array_equal(occ_h, occ_b)


def test_matrix_motion_instances_match():
    _check_motion(_many_boxes_motion(24), seed=13)


def test_matrix_motion_time_extremes():
    """t=0 and t=1 must reproduce the exact key transforms."""
    import jax.numpy as jnp

    iscene = split_order_instanced(_many_boxes_motion(8, seed=21))
    hc, _ha = make_inst_hierwalk_tracer(iscene)
    bc, _ba = make_instanced_tracer(iscene)
    o, d = _rand_rays(512, -8.0, 8.0, 3)
    for tv in (0.0, 1.0):
        time = jnp.full((512,), tv, jnp.float32)
        h = hc(o, d, 1e-3, 1e16, time, None)
        b = bc(o, d, 1e-3, 1e16, time, None)
        np.testing.assert_array_equal(np.asarray(h.prim),
                                      np.asarray(b.prim))
        np.testing.assert_allclose(np.asarray(h.t), np.asarray(b.t),
                                   rtol=2e-4, atol=2e-4)


def test_render_parity_instanced_motion():
    """A frame through the pool integrator over the motion inst hierwalk
    == the same frame over the unrolled instanced tracer, and the
    walk-pool pipeline path agrees too (integrate/walkpool.py)."""
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import render_frame
    from rendertoy3c_tpu.integrate.walkpool import (
        make_inst_walkpool_pipeline,
    )

    iscene = split_order_instanced(_many_boxes_motion(12, seed=31))
    from rendertoy3c_tpu.scene.camera import Camera

    cam = Camera(eye=(0.0, 6.0, 14.0), lookat=(0.0, 1.0, 0.0),
                 fov_y=45.0, aspect_ratio=1.0)
    cfg = RenderConfig(width=24, height=24, samples_per_launch=2,
                       max_depth=4, ray_block=512, integrator="pool")
    f_h, _ = render_frame(iscene, cam.params(), cfg, subframes=1,
                          tracer=make_inst_hierwalk_tracer(iscene))
    f_b, _ = render_frame(iscene, cam.params(), cfg, subframes=1,
                          tracer=make_instanced_tracer(iscene))
    np.testing.assert_allclose(np.asarray(f_h.accum), np.asarray(f_b.accum),
                               rtol=2e-3, atol=2e-3)
    cfg_wp = RenderConfig(width=24, height=24, samples_per_launch=2,
                          max_depth=4, ray_block=512, integrator="pool",
                          pool_pixel_major=True)
    f_w, _ = render_frame(iscene, cam.params(), cfg_wp, subframes=1,
                          tracer=make_inst_walkpool_pipeline(iscene, cfg_wp))
    np.testing.assert_allclose(np.asarray(f_w.accum), np.asarray(f_b.accum),
                               rtol=2e-3, atol=2e-3)


def test_instanced_normal_maps_kernel_path():
    """Instanced normal maps through the shade KERNEL (in-kernel tangent
    transform via the key-0 forward-linear attr rows) == the XLA shade
    path (path.py:129-136)."""
    import jax.numpy as jnp

    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import render_frame
    from rendertoy3c_tpu.integrate.walkpool import (
        make_inst_walkpool_pipeline,
    )
    from rendertoy3c_tpu.scene.camera import Camera
    from rendertoy3c_tpu.scene.mesh import Mesh
    from rendertoy3c_tpu.scene.builtin import quad as _quad

    h, w = 16, 16
    yy, xx = np.mgrid[0:h, 0:w] / 8.0 * np.pi
    n = np.stack([0.45 * np.sin(xx), 0.45 * np.cos(yy),
                  np.sqrt(1.0 - 0.45 ** 2) * np.ones_like(xx)], axis=-1)
    ntex = np.concatenate(
        [((n * 0.5 + 0.5) * 255).astype(np.uint8),
         np.full((h, w, 1), 255, np.uint8)], axis=-1)
    white = Material(diffuse=(0.7, 0.7, 0.7), normal_texture_id=0)
    fv, ff = _quad([-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1])
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    bumpy = Mesh(vertices=fv[None], indices=ff, texcoords=uvs,
                 material=white)
    lv, lf = _quad([-0.5, 2.5, -0.5], [-0.5, 2.5, 0.5], [0.5, 2.5, 0.5],
                   [0.5, 2.5, -0.5])
    lamp = Mesh(vertices=lv[None], indices=lf,
                material=Material(emissive=(15.0, 15.0, 15.0)))
    c, s = np.cos(0.7), np.sin(0.7)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    t = np.zeros((3, 4), np.float32)
    t[:, :3] = rot @ np.diag([1.3, 1.0, 0.8]).astype(np.float32)
    instances = [Instance(mesh_index=0, transforms=t),
                 Instance(mesh_index=1)]
    iscene = split_order_instanced(
        build_instanced_scene([bumpy, lamp], instances, textures=[ntex]))
    cam = Camera(eye=(0, 2.2, 3.2), lookat=(0, 0, 0), fov_y=45.0,
                 aspect_ratio=1.0)
    cfg = RenderConfig(width=24, height=24, samples_per_launch=2,
                       max_depth=3, ray_block=512, integrator="pool",
                       pool_pixel_major=True)
    wp = make_inst_walkpool_pipeline(iscene, cfg)
    assert wp.kernel, "instanced normal maps must ride the shade kernel"
    f_k, _ = render_frame(iscene, cam.params(), cfg, subframes=1,
                          tracer=wp)
    f_x, _ = render_frame(iscene, cam.params(), cfg, subframes=1,
                          tracer=make_instanced_tracer(iscene))
    np.testing.assert_allclose(np.asarray(f_k.accum), np.asarray(f_x.accum),
                               rtol=2e-3, atol=2e-3)


def test_instanced_motion_kernel_path():
    """2-key matrix-motion instanced scenes now ride the shade kernel
    (external_shade_eligible allows num_keys == 2 with instances); the
    scene needs an emissive light for kernel eligibility."""
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import render_frame
    from rendertoy3c_tpu.integrate.walkpool import (
        make_inst_walkpool_pipeline,
    )
    from rendertoy3c_tpu.scene.builtin import quad as _quad
    from rendertoy3c_tpu.scene.camera import Camera
    from rendertoy3c_tpu.scene.mesh import Mesh

    rng = np.random.default_rng(31)
    red = Material(diffuse=(0.8, 0.2, 0.2))
    meshes = [box_mesh([-0.5, -0.5, -0.5], [0.5, 0.5, 0.5], red)]
    lv, lf = _quad([-2, 8, -2], [-2, 8, 2], [2, 8, 2], [2, 8, -2])
    meshes.append(Mesh(vertices=lv[None], indices=lf,
                       material=Material(emissive=(25.0, 25.0, 25.0))))
    inst = [Instance(mesh_index=1)]
    for _ in range(12):
        keys = []
        for _k in range(2):
            ang = rng.uniform(0, 2 * np.pi)
            c, s = np.cos(ang), np.sin(ang)
            sc = rng.uniform(0.4, 1.8)
            keys.append([[c * sc, 0, s * sc, rng.uniform(-6, 6)],
                         [0, sc, 0, rng.uniform(0, 3)],
                         [-s * sc, 0, c * sc, rng.uniform(-6, 6)]])
        inst.append(Instance(mesh_index=0,
                             transforms=np.asarray(keys, np.float32)))
    iscene = split_order_instanced(build_instanced_scene(meshes, inst))
    cam = Camera(eye=(0.0, 6.0, 14.0), lookat=(0.0, 1.0, 0.0),
                 fov_y=45.0, aspect_ratio=1.0)
    cfg = RenderConfig(width=24, height=24, samples_per_launch=2,
                       max_depth=4, ray_block=512, integrator="pool",
                       pool_pixel_major=True)
    wp = make_inst_walkpool_pipeline(iscene, cfg)
    assert wp.kernel and wp.motion and wp.shadow_w == 16
    f_k, _ = render_frame(iscene, cam.params(), cfg, subframes=1,
                          tracer=wp)
    f_x, _ = render_frame(iscene, cam.params(), cfg, subframes=1,
                          tracer=make_instanced_tracer(iscene))
    np.testing.assert_allclose(np.asarray(f_k.accum), np.asarray(f_x.accum),
                               rtol=2e-3, atol=2e-3)


def _grid_mesh(n=43, mat=None):
    """Single plane mesh of n*n cells (2 tris each) — deep enough that its
    16-ary mesh subtree needs 3 levels (ceil(n*n*2/14) > 256 leaves)."""
    xs = np.linspace(-2.0, 2.0, n + 1, dtype=np.float32)
    vv, uu = np.meshgrid(xs, xs, indexing="ij")
    verts = np.stack([uu, 0.08 * np.sin(3 * uu) * np.cos(3 * vv), vv],
                     axis=-1).reshape(-1, 3)
    idx = np.arange((n + 1) * (n + 1)).reshape(n + 1, n + 1)
    a = idx[:-1, :-1].ravel()
    b = idx[:-1, 1:].ravel()
    c = idx[1:, 1:].ravel()
    d = idx[1:, :-1].ravel()
    faces = np.concatenate(
        [np.stack([a, b, c], 1), np.stack([a, c, d], 1)]).astype(np.int32)
    return Mesh(vertices=verts[None], indices=faces,
                material=mat or Material(diffuse=(0.6, 0.6, 0.6)))


def _deep_instance_field(n_inst=18, seed=17, grid_n=43):
    """>4-level-at-16 instance scene: 3 mesh levels + 2 world levels."""
    rng = np.random.default_rng(seed)
    meshes = [_grid_mesh(n=grid_n)]
    inst = []
    for _ in range(n_inst):
        ang = rng.uniform(0, 2 * np.pi)
        cc, ss = np.cos(ang), np.sin(ang)
        sc = rng.uniform(0.5, 1.5)
        t = np.asarray([[cc * sc, 0, ss * sc, rng.uniform(-10, 10)],
                        [0, sc, 0, rng.uniform(0, 4)],
                        [-ss * sc, 0, cc * sc, rng.uniform(-10, 10)]],
                       np.float32)
        inst.append(Instance(mesh_index=0, transforms=t))
    return build_instanced_scene(meshes, inst)


def test_inst_fanout_auto_resolution():
    """_resolve_inst_fanout keeps 16 through 4 levels (forced-32 on the
    shallow trace-time cornell measured 27.2 -> 16.9, ROADMAP), upgrades
    to the 20-ary EXACT-f32 rows when that restores <= 4 levels, and
    falls back to bf16 32-ary only past that."""
    from rendertoy3c_tpu.trace.hier_instanced import (
        _resolve_inst_fanout, build_inst_hier_table,
    )
    from rendertoy3c_tpu.trace.hierwalk import FANOUT, FANOUT20, FANOUT32

    shallow, _cam = _instanced_cornell()
    assert _resolve_inst_fanout(shallow) == FANOUT
    deep = _deep_instance_field()       # 5 levels at 16, 3 at 20
    assert _resolve_inst_fanout(deep) == FANOUT20
    tab = build_inst_hier_table(split_order_instanced(deep))
    assert tab.fanout == FANOUT20
    deeper = _deep_instance_field(n_inst=25, grid_n=55)  # 5 levels at 20
    assert _resolve_inst_fanout(deeper) == FANOUT32


def test_inst_fanout_auto_deep_field_exact():
    """The auto-fanout deep-field table (20-ary exact-f32 since r4)
    returns EXACTLY the unrolled instance loop's (t, prim, inst) +
    occlusion (trace/hier_instanced.py:60-95)."""
    _check(_deep_instance_field(), n_rays=512, seed=23, span=10.0)


def test_inst_fanout32_deep_field_exact():
    """The 32-ary bf16-packed instanced table returns EXACTLY the
    unrolled instance loop's (t, prim, inst) + occlusion: bf16 boxes
    round outward, so culling only loosens."""
    import jax.numpy as jnp

    from rendertoy3c_tpu.trace.hier_instanced import (
        build_inst_hier_table, trace_closest_inst_hier,
    )
    from rendertoy3c_tpu.trace.hierwalk import FANOUT32
    from rendertoy3c_tpu.trace.instanced import make_instanced_tracer

    iscene = split_order_instanced(_deep_instance_field())
    t32 = build_inst_hier_table(iscene, fanout=FANOUT32)
    assert t32.fanout == FANOUT32
    bc, _ba = make_instanced_tracer(iscene)
    o, d = _rand_rays(512, -10.0, 10.0, 23)
    h = trace_closest_inst_hier(t32, o, d, 1e-3, 1e16)
    b = bc(o, d, 1e-3, 1e16, None, None)
    np.testing.assert_array_equal(np.asarray(h.prim), np.asarray(b.prim))
    np.testing.assert_array_equal(np.asarray(h.inst), np.asarray(b.inst))


def test_inst_fanout32_matches_fanout16():
    """Same deep field, forced 16-ary vs auto 32-ary tables: identical
    hits lane for lane."""
    import jax.numpy as jnp

    from rendertoy3c_tpu.trace.hier_instanced import (
        build_inst_hier_table, trace_closest_inst_hier,
    )
    from rendertoy3c_tpu.trace.hierwalk import FANOUT, FANOUT32

    iscene = split_order_instanced(_deep_instance_field())
    t16 = build_inst_hier_table(iscene, fanout=FANOUT)
    t32 = build_inst_hier_table(iscene, fanout=FANOUT32)
    assert t16.fanout == FANOUT and t32.fanout == FANOUT32
    o, d = _rand_rays(512, -10.0, 10.0, 29)
    h16 = trace_closest_inst_hier(t16, o, d, 1e-3, 1e16)
    h32 = trace_closest_inst_hier(t32, o, d, 1e-3, 1e16)
    np.testing.assert_array_equal(np.asarray(h16.prim), np.asarray(h32.prim))
    np.testing.assert_array_equal(np.asarray(h16.inst), np.asarray(h32.inst))
    np.testing.assert_allclose(np.asarray(h16.t), np.asarray(h32.t),
                               rtol=1e-6, atol=1e-6)


def test_auto_ladder_picks_inst_hierwalk():
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.trace.auto import choose_tracer, tune_config

    iscene, _cam = _instanced_cornell()
    cfg = RenderConfig(integrator="pool", ray_block=32768,
                       pool_pixel_major=True)
    cfg2 = tune_config(iscene, cfg, on_tpu=True)
    from rendertoy3c_tpu.trace.auto import POOL_BLOCK_LARGE
    assert cfg2.ray_block == POOL_BLOCK_LARGE and not cfg2.sort_rays
    scene2, tracer = choose_tracer(iscene, cfg2, on_tpu=True)
    # static instanced scenes now ride the external shade pipeline over
    # the inst hierwalk pair (in-kernel instance normal transform)
    from rendertoy3c_tpu.trace.pallas_shade import ExternalPipeline

    assert isinstance(tracer, ExternalPipeline)
    # spot-check one trace through the wrapped closest backend
    import jax.numpy as jnp

    o = jnp.asarray([[0.0, 1.0, 2.5]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    h = tracer._closest(o, d, 1e-3, 1e16, None, None)
    assert int(h.prim[0]) >= 0
    # the wrapped pair must be the instanced TLAS walk (carries inst ids)
    assert h.inst is not None


def test_baked_world_table_hits():
    """The pre-transformed world-space baked table (plain hierwalk rounds
    over instance-expanded leaf rows, hier_instanced.
    build_baked_world_table) finds the hits of the brute instanced tracer.

    World-space MT arithmetic differs from the object-space walk's in the
    last ulps, so shared-edge ties may resolve to a different (face,
    instance) — a small disagreement budget covers those; t must agree
    closely wherever ids agree."""
    from rendertoy3c_tpu.trace.hier_instanced import (
        baked_world_eligible,
        build_baked_world_table,
    )
    from rendertoy3c_tpu.trace.hierwalk import (
        trace_any_hier,
        trace_closest_hier,
    )

    iscene = split_order_instanced(_many_boxes(24, seed=5))
    assert baked_world_eligible(iscene)
    tab, stride = build_baked_world_table(iscene)
    bc, ba = make_instanced_tracer(iscene)
    o, d = _rand_rays(2048, -8.0, 8.0, seed=3)
    h = trace_closest_hier(tab, o, d, 1e-3, 1e16)
    b = bc(o, d, 1e-3, 1e16, None, None)
    eff = np.asarray(h.prim)
    inst = np.where(eff >= 0, eff // stride, -1)
    prim = np.where(eff >= 0, eff - inst * stride, -1)
    mism = (prim != np.asarray(b.prim)) | (inst != np.asarray(b.inst))
    assert mism.mean() < 0.01, f"{mism.sum()} id mismatches"
    ok = ~mism & (prim >= 0)
    np.testing.assert_allclose(np.asarray(h.t)[ok], np.asarray(b.t)[ok],
                               rtol=2e-4, atol=2e-4)
    occ_h = np.asarray(trace_any_hier(tab, o, d, 1e-3, 4.0))
    occ_b = np.asarray(ba(o, d, 1e-3, 4.0, None, None))
    assert (occ_h != occ_b).mean() < 0.01


def test_baked_walkpool_matches_instanced():
    """The walk pool over the baked world table (RT3C_INST_BAKE=2 forces
    the bake on a test-sized scene) renders the same image as the classic
    pool over the brute instanced tracer, and the ray accounting stays
    consistent."""
    import jax
    import jax.numpy as jnp

    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import render_frame, render_pixels
    from rendertoy3c_tpu.integrate.walkpool import (
        make_inst_walkpool_pipeline,
    )
    from rendertoy3c_tpu.scene.camera import Camera

    iscene = split_order_instanced(_many_boxes(16, seed=9))
    cam = Camera(eye=(0.0, 6.0, 16.0), lookat=(0.0, 1.0, 0.0),
                 fov_y=45.0, aspect_ratio=1.0)
    cfg = RenderConfig(width=24, height=24, samples_per_launch=2,
                       max_depth=4, ray_block=512, integrator="pool",
                       pool_pixel_major=True)
    import os

    _prev = os.environ.get("RT3C_INST_BAKE")
    os.environ["RT3C_INST_BAKE"] = "2"
    try:
        wp = make_inst_walkpool_pipeline(iscene, cfg)
    finally:
        if _prev is None:
            del os.environ["RT3C_INST_BAKE"]
        else:
            os.environ["RT3C_INST_BAKE"] = _prev
    assert wp.inst_stride > 0 and wp.instanced and not wp.motion
    f_w, _ = render_frame(iscene, cam.params(), cfg, subframes=1,
                          tracer=wp)
    f_b, _ = render_frame(iscene, cam.params(), cfg, subframes=1,
                          tracer=make_instanced_tracer(iscene))
    d = np.abs(np.asarray(f_w.accum[..., :3])
               - np.asarray(f_b.accum[..., :3]))
    # world-space traversal arithmetic: a couple of edge-tie pixels may
    # flip, everything else matches to float noise (the bench-gate bound)
    assert d.mean() < 5e-3 and d.max() < 0.35, (d.mean(), d.max())
    # the single-path loop decodes at its own boundary — cover it too
    cfg1 = dataclasses_replace_pool_paths(cfg)
    pix = jnp.arange(cfg.width * cfg.height, dtype=jnp.int32)
    out1, _aov, _nr, _ns, _rounds = jax.jit(
        lambda c: render_pixels(iscene, cfg1, c, wp, pix, jnp.uint32(0))
    )(cam.params())
    d1 = np.abs(np.asarray(out1).reshape(cfg.height, cfg.width, 3)
                - np.asarray(f_b.accum[..., :3]))
    assert d1.mean() < 5e-3 and d1.max() < 0.35, (d1.mean(), d1.max())


def dataclasses_replace_pool_paths(cfg):
    import dataclasses

    return dataclasses.replace(cfg, pool_paths=1)


def test_baked_world_table_motion_hits():
    """2-key matrix motion through the baked world table: per-key world
    vertices + in-row lerp == the brute inverse-of-lerp tracer (a lerped
    affine is linear in its entries, so the surfaces are identical; only
    float order differs)."""
    from rendertoy3c_tpu.trace.hier_instanced import (
        baked_world_eligible,
        build_baked_world_table,
    )
    from rendertoy3c_tpu.trace.hierwalk import trace_closest_hier

    import os

    iscene = split_order_instanced(_many_boxes_motion(16, seed=7))
    # motion bakes are gated off the auto path (measured slower: baked
    # boxes bound ALL t) — RT3C_INST_BAKE=2 forces them for this parity
    assert iscene.num_keys == 2 and not baked_world_eligible(iscene)
    _prev = os.environ.get("RT3C_INST_BAKE")
    os.environ["RT3C_INST_BAKE"] = "2"
    try:
        assert baked_world_eligible(iscene)
        tab, stride = build_baked_world_table(iscene)
    finally:
        if _prev is None:
            del os.environ["RT3C_INST_BAKE"]
        else:
            os.environ["RT3C_INST_BAKE"] = _prev
    bc, _ba = make_instanced_tracer(iscene)
    o, d = _rand_rays(2048, -8.0, 8.0, seed=4)
    import jax.numpy as jnp

    for tv in (0.0, 0.37, 1.0):
        t_col = jnp.full((o.shape[0],), jnp.float32(tv))
        h = trace_closest_hier(tab, o, d, 1e-3, 1e16, time=t_col)
        b = bc(o, d, 1e-3, 1e16, t_col, None)
        eff = np.asarray(h.prim)
        inst = np.where(eff >= 0, eff // stride, -1)
        prim = np.where(eff >= 0, eff - inst * stride, -1)
        mism = (prim != np.asarray(b.prim)) | (inst != np.asarray(b.inst))
        assert mism.mean() < 0.01, f"t={tv}: {mism.sum()} id mismatches"
        ok = ~mism & (prim >= 0)
        np.testing.assert_allclose(np.asarray(h.t)[ok],
                                   np.asarray(b.t)[ok],
                                   rtol=5e-4, atol=5e-4)


def test_baked_walkpool_motion_matches_instanced():
    """The motion walk pool over the baked 2-key world table renders the
    brute instanced tracer's image (RT3C_INST_BAKE=2 forces the bake)."""
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import render_frame
    from rendertoy3c_tpu.integrate.walkpool import (
        make_inst_walkpool_pipeline,
    )
    from rendertoy3c_tpu.scene.camera import Camera

    iscene = split_order_instanced(_many_boxes_motion(12, seed=31))
    cam = Camera(eye=(0.0, 6.0, 14.0), lookat=(0.0, 1.0, 0.0),
                 fov_y=45.0, aspect_ratio=1.0)
    cfg = RenderConfig(width=24, height=24, samples_per_launch=2,
                       max_depth=4, ray_block=512, integrator="pool",
                       pool_pixel_major=True)
    import os

    _prev = os.environ.get("RT3C_INST_BAKE")
    os.environ["RT3C_INST_BAKE"] = "2"
    try:
        wp = make_inst_walkpool_pipeline(iscene, cfg)
    finally:
        if _prev is None:
            del os.environ["RT3C_INST_BAKE"]
        else:
            os.environ["RT3C_INST_BAKE"] = _prev
    assert wp.inst_stride > 0 and wp.motion and wp.shadow_w == 16
    f_w, _ = render_frame(iscene, cam.params(), cfg, subframes=1,
                          tracer=wp)
    f_b, _ = render_frame(iscene, cam.params(), cfg, subframes=1,
                          tracer=make_instanced_tracer(iscene))
    d = np.abs(np.asarray(f_w.accum[..., :3])
               - np.asarray(f_b.accum[..., :3]))
    assert d.mean() < 5e-3 and d.max() < 0.35, (d.mean(), d.max())
