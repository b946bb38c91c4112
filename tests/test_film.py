"""Film accumulation + tonemap/quantization parity (raygen.cu:75-86,
cuda/helpers.h:35-66, display.cpp ACES)."""
import numpy as np
import jax.numpy as jnp

from rendertoy3c_tpu.film import (
    Film, film_create, film_accumulate, film_reset,
    aces_tonemap, to_srgb, quantize_u8, make_color,
)


def test_accumulate_lerp():
    film = film_create(2, 2)
    f1 = jnp.full((2, 2, 3), 1.0)
    f2 = jnp.full((2, 2, 3), 0.0)
    film = film_accumulate(film, f1)  # n=0: accum = f1
    np.testing.assert_allclose(np.asarray(film.accum), 1.0)
    assert int(film.subframe_index) == 1
    film = film_accumulate(film, f2)  # n=1: lerp(1, 0, 1/2) = 0.5
    np.testing.assert_allclose(np.asarray(film.accum), 0.5)
    film = film_accumulate(film, f2)  # n=2: lerp(0.5, 0, 1/3) = 1/3
    np.testing.assert_allclose(np.asarray(film.accum), 1 / 3, rtol=1e-6)


def test_reset():
    film = film_create(2, 2)
    film = film_accumulate(film, jnp.ones((2, 2, 3)))
    film = film_reset(film)
    assert int(film.subframe_index) == 0
    np.testing.assert_allclose(np.asarray(film.accum), 0.0)


def test_quantize_rule():
    # min(uint(x*256), 255) — cuda/helpers.h:50-55
    xs = jnp.asarray([0.0, 0.5, 1.0, 2.0, -1.0])
    out = np.asarray(quantize_u8(xs))
    np.testing.assert_array_equal(out, [0, 128, 255, 255, 0])


def test_srgb_values():
    # below threshold: linear; above: 1.055 x^(1/2.4) - 0.055
    lo = float(to_srgb(jnp.float32(0.001)))
    assert abs(lo - 12.92 * 0.001) < 1e-7
    hi = float(to_srgb(jnp.float32(0.5)))
    assert abs(hi - (1.055 * 0.5 ** (1 / 2.4) - 0.055)) < 1e-5


def test_make_color():
    c = np.asarray(make_color(jnp.asarray([0.0, 1.0, 0.5])))
    assert c.shape == (4,) and c[3] == 255
    assert c[0] == 0 and c[1] == 255
    assert 186 <= c[2] <= 190  # srgb(0.5) ~ 0.7354 -> 188


def test_aces():
    # Narkowicz constants: fixed point checks
    x = jnp.asarray([0.0, 1.0])
    y = np.asarray(aces_tonemap(x))
    assert y[0] == 0.0
    np.testing.assert_allclose(y[1], (2.51 + 0.03) / (2.43 + 0.59 + 0.14), rtol=1e-6)
    # monotonic on [0, 10]
    xs = jnp.linspace(0.0, 10.0, 100)
    ys = np.asarray(aces_tonemap(xs))
    assert (np.diff(ys) > 0).all()


def test_stats_overlay_draws_text():
    """On-frame stats overlay (film/overlay.py, the ImGui displayStats
    analog sutil/sutil.cpp:735-773): dims a top-left box and rasterizes
    the glyphs; pixels outside the box are untouched."""
    from rendertoy3c_tpu.film.overlay import draw_stats_overlay, draw_text

    img = np.full((64, 128, 3), 200, np.uint8)
    out = draw_stats_overlay(img, ["fps: 12.5", "render: 3.1 ms"])
    assert out is img
    assert (img[40:, :, :] == 200).all()          # below the box untouched
    assert (img[:20, :90] != 200).any()           # box dimmed
    assert (img[:20, :90] == 255).any()           # glyph pixels lit
    img2 = np.zeros((16, 64, 3), np.uint8)
    draw_text(img2, 1, 1, "10.5")
    assert img2.sum() > 0


def test_trackball_move_roll():
    """WASD move + roll helpers (sutil/Trackball.cpp:139-206): translation
    moves eye AND lookat by speed along the normalized basis; roll
    re-derives up from the uvw frame."""
    from rendertoy3c_tpu.scene.camera import Camera, Trackball

    cam = Camera(eye=(0.0, 0.0, 5.0), lookat=(0.0, 0.0, 0.0),
                 up=(0.0, 1.0, 0.0), fov_y=45.0, aspect_ratio=1.0)
    tb = Trackball(cam, move_speed=2.0)
    tb.move_forward()
    np.testing.assert_allclose(cam.eye, (0, 0, 3), atol=1e-6)
    np.testing.assert_allclose(cam.lookat, (0, 0, -2), atol=1e-6)
    tb.move_right(1.0)
    # view dir -z, up +y -> right is -x (u = w x up with w toward -z)
    eye_after = np.asarray(cam.eye)
    assert abs(abs(eye_after[0]) - 1.0) < 1e-6
    np.testing.assert_allclose(
        np.asarray(cam.lookat) - np.asarray(cam.eye), (0, 0, -5), atol=1e-6)
    tb.move_up(0.5)
    assert abs(np.asarray(cam.eye)[1] - 0.5) < 1e-6
    # roll by 30 degrees: up tilts but stays unit-length and orthogonal
    # to the view direction
    tb.roll_left(30.0)
    up = np.asarray(cam.up)
    np.testing.assert_allclose(np.linalg.norm(up), 1.0, rtol=1e-5)
    d = cam.direction()
    assert abs(float(np.dot(up, d))) < 1e-5
    # roll right by the same angle restores (near) the original up
    tb.roll_right(30.0)
    np.testing.assert_allclose(np.asarray(cam.up), (0, 1, 0), atol=1e-5)
