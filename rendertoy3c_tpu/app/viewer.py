"""Interactive viewer — the TPU-native equivalent of the reference's
GLFW/OpenGL display loop (src/wavefront.cpp:288-371 main loop, sutil::initUI
+ GLDisplay blit + displayStats overlay + Trackball callbacks).

Backends:
  * GLFW/OpenGL (when a display is available): progressive render loop with
    mouse-orbit/zoom (scene/camera.py Trackball — same 0.5 deg/px + x1.1
    zoom semantics as sutil), camera motion restarting accumulation
    (wavefront.cpp:196-197), fps + per-phase ms drawn ON the frame (the
    ImGui displayStats overlay, film/overlay.py; toggle [O]; also in the
    window title), WASD/RF fly + ZC roll, ACES toggle [T], PNG snapshot
    [S], quit [Esc/Q].
  * Headless turntable (no display): orbits the camera and writes numbered
    PNG frames — keeps the viewer code path exercised in CI containers.

The render step itself is the same jit-compiled subframe function the
offline path uses; the viewer only feeds it camera parameters and blits the
tonemapped frame (reference: CUDAOutputBuffer -> GL PBO; here: device ->
host make_color bytes -> glDrawPixels).
"""
from __future__ import annotations

import time
from typing import Callable, Optional

import numpy as np

from ..film.film import Film, film_create, film_reset
from ..film.image import write_png
from ..film.tonemap import aces_tonemap, make_color
from ..integrate.config import RenderConfig
from ..scene.camera import Camera, Trackball
from ..utils.timers import PhaseTimers


def _frame_u8(film: Film, tonemap_aces: bool) -> np.ndarray:
    rgb = film.accum
    if tonemap_aces:
        rgb = aces_tonemap(rgb)
    return np.asarray(make_color(rgb, alpha=False))


class Viewer:
    """Progressive interactive viewer over a jit render step.

    step(cam_params, film) -> (film, stats) — e.g. make_render_fn(...)."""

    def __init__(self, step: Callable, camera: Camera, cfg: RenderConfig,
                 title: str = "rendertoy3c-tpu"):
        self.step = step
        self.camera = camera
        self.cfg = cfg
        self.title = title
        self.trackball = Trackball(camera)
        self.film = film_create(cfg.height, cfg.width)
        self.camera_dirty = False
        self.tonemap_aces = False
        self.timers = PhaseTimers()
        # on-frame stats overlay (toggle with O), reference's displayStats
        self.show_overlay = True

    # -- shared per-frame logic -------------------------------------------
    def update_state(self):
        """wavefront.cpp updateState: restart accumulation on camera edits."""
        if self.camera_dirty:
            self.film = film_reset(self.film)
            self.camera_dirty = False

    def render_subframe(self):
        with self.timers.phase("render"):
            self.film, stats = self.step(self.camera.params(), self.film)
            np.asarray(self.film.subframe_index)  # sync
        return stats

    def snapshot(self, path: str = "snapshot.png"):
        write_png(path, _frame_u8(self.film, self.tonemap_aces)[::-1])
        return path

    # -- GLFW/OpenGL loop -------------------------------------------------
    def run(self, max_subframes: Optional[int] = None) -> bool:
        """Interactive loop; returns False if no display backend exists."""
        try:
            import glfw
            from OpenGL import GL
        except ImportError:
            return False
        if not glfw.init():
            return False
        try:
            win = glfw.create_window(
                self.cfg.width, self.cfg.height, self.title, None, None
            )
            if not win:
                return False
            glfw.make_context_current(win)

            def on_mouse_button(window, button, action, mods):
                if button == glfw.MOUSE_BUTTON_LEFT:
                    if action == glfw.PRESS:
                        x, y = glfw.get_cursor_pos(window)
                        self.trackball.start_tracking(int(x), int(y))
                    else:
                        self.trackball.stop_tracking()

            def on_cursor(window, x, y):
                if self.trackball._tracking:
                    self.trackball.update_tracking(int(x), int(y))
                    self.camera_dirty = True

            def on_scroll(window, dx, dy):
                self.trackball.wheel_event(-int(np.sign(dy)))
                self.camera_dirty = True

            def on_key(window, key, scancode, action, mods):
                if action not in (glfw.PRESS, glfw.REPEAT):
                    return
                # WASD/RF fly + ZC roll (sutil/Trackball.cpp:139-206; the
                # reference app never binds these, the viewer does)
                fly = {
                    glfw.KEY_W: self.trackball.move_forward,
                    glfw.KEY_A: self.trackball.move_left,
                    glfw.KEY_D: self.trackball.move_right,
                    glfw.KEY_R: self.trackball.move_up,
                    glfw.KEY_F: self.trackball.move_down,
                    glfw.KEY_X: self.trackball.move_backward,
                    glfw.KEY_Z: self.trackball.roll_left,
                    glfw.KEY_C: self.trackball.roll_right,
                }
                if key in fly:
                    fly[key]()
                    self.camera_dirty = True
                    return
                if action != glfw.PRESS:
                    return
                if key in (glfw.KEY_ESCAPE, glfw.KEY_Q):
                    glfw.set_window_should_close(window, True)
                elif key == glfw.KEY_S:
                    print("saved", self.snapshot())
                elif key == glfw.KEY_T:
                    self.tonemap_aces = not self.tonemap_aces
                elif key == glfw.KEY_O:
                    self.show_overlay = not self.show_overlay

            glfw.set_mouse_button_callback(win, on_mouse_button)
            glfw.set_cursor_pos_callback(win, on_cursor)
            glfw.set_scroll_callback(win, on_scroll)
            glfw.set_key_callback(win, on_key)

            frames = 0
            t_last = time.perf_counter()
            fps_text = ""
            while not glfw.window_should_close(win):
                glfw.poll_events()
                self.update_state()
                self.render_subframe()
                with self.timers.phase("display"):
                    img = _frame_u8(self.film, self.tonemap_aces)
                    if self.show_overlay:
                        # fps + per-phase ms ON the frame, 0.5 s refresh —
                        # the ImGui displayStats overlay
                        # (sutil/sutil.cpp:735-773); rows flip for GL
                        from ..film.overlay import draw_stats_overlay

                        img = np.ascontiguousarray(img[::-1])
                        draw_stats_overlay(
                            img, [fps_text, self.timers.summary()])
                        img = img[::-1]
                    GL.glClear(GL.GL_COLOR_BUFFER_BIT)
                    GL.glDrawPixels(
                        self.cfg.width, self.cfg.height,
                        GL.GL_RGB, GL.GL_UNSIGNED_BYTE, img.tobytes(),
                    )
                    glfw.swap_buffers(win)
                frames += 1
                now = time.perf_counter()
                if now - t_last > 0.5:  # displayStats refresh cadence
                    fps_text = f"fps: {frames / (now - t_last):5.1f}"
                    glfw.set_window_title(
                        win,
                        f"{self.title} | {frames / (now - t_last):5.1f} fps | "
                        f"{self.timers.summary()}",
                    )
                    frames = 0
                    t_last = now
                if max_subframes and int(self.film.subframe_index) >= max_subframes:
                    break
            return True
        finally:
            glfw.terminate()

    # -- headless fallback -------------------------------------------------
    def run_turntable(self, n_frames: int = 8, subframes_per_frame: int = 4,
                      out_pattern: str = "frame_{:03d}.png",
                      orbit_degrees: float = 360.0):
        """Orbit the camera and write PNG frames (headless environments)."""
        paths = []
        step_deg = orbit_degrees / max(n_frames, 1)
        for i in range(n_frames):
            self.update_state()
            for _ in range(subframes_per_frame):
                self.render_subframe()
            p = out_pattern.format(i)
            write_png(p, _frame_u8(self.film, self.tonemap_aces)[::-1])
            paths.append(p)
            # orbit: 0.5 deg/px -> step via synthetic drag
            self.trackball.start_tracking(0, 0)
            self.trackball.update_tracking(int(step_deg / 0.5), 0)
            self.trackball.stop_tracking()
            self.camera_dirty = True
        return paths
