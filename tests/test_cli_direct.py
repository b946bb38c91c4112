"""CLI smoke test for the direct-lighting renderer and explicit tracers."""
import os

from rendertoy3c_tpu.app.cli import main


def test_cli_direct_renderer(tmp_path):
    out = str(tmp_path / "direct.png")
    rc = main([
        "--scene", "cornell", "--size", "24x24", "--spp", "1",
        "--subframes", "1", "--renderer", "direct", "--tracer", "brute",
        "--ray-block", "576", "-o", out,
    ])
    assert rc == 0
    assert os.path.exists(out)


def test_cli_wave_integrator(tmp_path):
    out = str(tmp_path / "wave.png")
    rc = main([
        "--scene", "cornell-empty", "--size", "16x16", "--spp", "1",
        "--subframes", "1", "--integrator", "wave", "--tracer", "brute",
        "--max-depth", "2", "--ray-block", "256", "-o", out,
    ])
    assert rc == 0
    assert os.path.exists(out)


def test_direct_glass_recursion_sees_through():
    """Recursive whitted glass (cuda/shading.cu:226-325): a
    FRESNEL_TRANSMISSIVE slab with ior=1 transmits ~(1-F)^2 of the wall
    behind it (plus the fresnel-reflected share), so the through-glass
    view must be a dimmed version of the no-slab render — NOT an opaque
    PBR surface."""
    import numpy as np

    from rendertoy3c_tpu.film.film import film_create
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.direct import make_direct_render_fn
    from rendertoy3c_tpu.scene.builtin import box_mesh, cornell_box
    from rendertoy3c_tpu.scene.material import Material, MaterialType
    from rendertoy3c_tpu.scene.scene import build_scene

    meshes, camera = cornell_box(with_blocks=False)
    camera.aspect_ratio = 1.0
    cfg = RenderConfig(width=32, height=32, samples_per_launch=1,
                       max_depth=6, ray_block=1024)

    def render(ms):
        scene = build_scene(ms)
        step = make_direct_render_fn(scene, cfg, ambient=(0.4, 0.4, 0.4))
        film, _ = step(camera.params(), film_create(cfg.height, cfg.width))
        return np.asarray(film.accum)

    ref = render(meshes)
    glass = box_mesh([-0.5, 0.3, -0.1], [0.5, 1.3, 0.1],
                     Material(material_type=MaterialType.FRESNEL_TRANSMISSIVE,
                              ior=1.0, transmittance=0.98))
    img = render(meshes + [glass])
    assert np.isfinite(img).all()
    # center pixels look through the slab: dimmed background, not black
    # and not the opaque-PBR gray of the old routing
    c_ref = ref[12:20, 12:20].mean()
    c_glass = img[12:20, 12:20].mean()
    assert 0.4 * c_ref < c_glass < 1.05 * c_ref
    # pixels outside the slab are identical
    np.testing.assert_allclose(img[:2], ref[:2], atol=1e-5)


def test_direct_glass_shadow_attenuation():
    """Glass occlusion anyhit parity (cuda/shading.cu:327-352): a
    FRESNEL_TRANSMISSIVE caster between a point light and the floor
    multiplies shadow visibility by 1 - fresnel_schlick(|N.D|, 5,
    1 - shadow_attenuation, 1) per shell and continues the probe — a
    TRANSLUCENT shadow, strictly between the unshadowed floor and the
    opaque-caster shadow."""
    import numpy as np

    from rendertoy3c_tpu.film.film import film_create
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.direct import make_direct_render_fn
    from rendertoy3c_tpu.io.gltf import PointLight
    from rendertoy3c_tpu.scene.builtin import box_mesh
    from rendertoy3c_tpu.scene.camera import Camera
    from rendertoy3c_tpu.scene.material import Material, MaterialType
    from rendertoy3c_tpu.scene.scene import build_scene

    cfg = RenderConfig(width=24, height=24, samples_per_launch=1,
                       max_depth=6, ray_block=576)
    floor = box_mesh([-2.0, -0.2, -2.0], [2.0, 0.0, 2.0],
                     Material(diffuse=(0.8, 0.8, 0.8)))
    light = PointLight(position=(0.0, 3.0, 0.0), intensity=6.0)
    # low camera: view rays to the floor center pass UNDER the caster
    # (caster sits at y in [0.9, 1.1]), so the center pixel shows the
    # floor's shadowed shading, not the glass surface
    cam = Camera(eye=(0.0, 0.55, 2.2), lookat=(0.0, 0.0, 0.0),
                 up=(0.0, 1.0, 0.0), fov_y=50.0, aspect_ratio=1.0)

    def render(extra, shadow_att=0.4):
        caster = [] if extra is None else [box_mesh(
            [-0.6, 0.9, -0.6], [0.6, 1.1, 0.6],
            Material(material_type=extra, ior=1.1, transmittance=0.9,
                     shadow_attenuation=shadow_att))]
        scene = build_scene([floor] + caster)
        step = make_direct_render_fn(scene, cfg, point_lights=[light],
                                     ambient=(0.0, 0.0, 0.0))
        film, _ = step(cam.params(), film_create(cfg.height, cfg.width))
        return np.asarray(film.accum)

    open_img = render(None)
    opaque_img = render(MaterialType.DIFFUSE)
    glass_img = render(MaterialType.FRESNEL_TRANSMISSIVE)
    # the floor center sits in the caster's shadow footprint
    c = slice(10, 14)
    lit = open_img[c, c].mean()
    dark = opaque_img[c, c].mean()
    glassy = glass_img[c, c].mean()
    assert dark < 0.15 * lit            # opaque caster: hard shadow
    assert 1.2 * dark < glassy < 0.95 * lit  # glass: partial shadow
    # normal-incidence factor: two shells of 1 - fresnel_schlick(1, 5,
    # 1-sa, 1) = sa each => per-pixel shadowed visibility ~= sa^2, so the
    # window mean obeys (glassy - dark) / (lit - dark) = sa^2 regardless
    # of the fraction of fully-lit pixels in the window
    assert abs((glassy - dark) / (lit - dark) - 0.4 ** 2) < 0.06
    # a higher shadow_attenuation lets MORE light through
    lighter = render(MaterialType.FRESNEL_TRANSMISSIVE, shadow_att=0.8)
    assert lighter[c, c].mean() > glassy
