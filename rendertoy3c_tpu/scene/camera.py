"""Camera + trackball controls (sutil/Camera.{h,cpp}, sutil/Trackball.{h,cpp}).

`Camera` is the host-side eye/lookat/up/fov description; `camera.params()`
produces the flat (eye, U, V, W) basis consumed by ray generation — W is
deliberately un-normalized (its length is the focal distance), exactly as in
sutil/Camera.cpp:34-45. `Trackball` reproduces the reference's orbit
controls (sutil/Trackball.cpp:58-137): 0.5 deg/pixel latitude/longitude orbit
with +/-89 deg pitch clamp and x1.1 zoom steps.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class CameraParams(NamedTuple):
    """Flat pinhole basis used by raygen (src/shader/raygen.cu:18-21)."""

    eye: jnp.ndarray  # [3]
    u: jnp.ndarray  # [3] right, length = tan(fov/2) * aspect * focal
    v: jnp.ndarray  # [3] up, length = tan(fov/2) * focal
    w: jnp.ndarray  # [3] forward, length = focal


@dataclass
class Camera:
    eye: tuple = (1.0, 1.0, 1.0)
    lookat: tuple = (0.0, 0.0, 0.0)
    up: tuple = (0.0, 1.0, 0.0)
    fov_y: float = 35.0  # degrees (sutil default)
    aspect_ratio: float = 1.0

    def uvw_frame(self):
        """U, V, W per sutil/Camera.cpp:34-45 (numpy, host side)."""
        eye = np.asarray(self.eye, np.float32)
        lookat = np.asarray(self.lookat, np.float32)
        up = np.asarray(self.up, np.float32)
        w = lookat - eye  # do not normalize: length is focal distance
        wlen = float(np.linalg.norm(w))
        u = np.cross(w, up)
        u = u / np.linalg.norm(u)
        v = np.cross(u, w)
        v = v / np.linalg.norm(v)
        vlen = wlen * math.tan(0.5 * math.radians(self.fov_y))
        v = v * vlen
        u = u * (vlen * self.aspect_ratio)
        return u.astype(np.float32), v.astype(np.float32), w.astype(np.float32)

    def params(self) -> CameraParams:
        u, v, w = self.uvw_frame()
        return CameraParams(
            eye=jnp.asarray(self.eye, jnp.float32),
            u=jnp.asarray(u),
            v=jnp.asarray(v),
            w=jnp.asarray(w),
        )

    def direction(self) -> np.ndarray:
        d = np.asarray(self.lookat, np.float32) - np.asarray(self.eye, np.float32)
        return d / np.linalg.norm(d)


@dataclass
class Trackball:
    """Orbit/zoom/pan controls matching sutil/Trackball semantics."""

    camera: Camera
    move_speed: float = 1.0
    roll_speed: float = 0.5  # degrees per pixel
    zoom_multiplier: float = 1.1
    view_mode: str = "lookat_fixed"  # or "eye_fixed"
    _latitude: float = field(default=0.0, init=False)  # radians
    _longitude: float = field(default=0.0, init=False)
    _prev_pos: tuple = field(default=(0, 0), init=False)
    _tracking: bool = field(default=False, init=False)

    def __post_init__(self):
        self.reinitialize_orientation_from_camera()

    # -- orientation bookkeeping (Trackball.cpp:127-137) --
    def reinitialize_orientation_from_camera(self):
        eye = np.asarray(self.camera.eye, np.float64)
        lookat = np.asarray(self.camera.lookat, np.float64)
        d = eye - lookat
        r = np.linalg.norm(d)
        if r < 1e-12:
            self._latitude = self._longitude = 0.0
            return
        d = d / r
        self._latitude = math.asin(max(-1.0, min(1.0, d[1])))
        self._longitude = math.atan2(d[0], d[2])

    def start_tracking(self, x: int, y: int):
        self._prev_pos = (x, y)
        self._tracking = True

    def stop_tracking(self):
        self._tracking = False

    def update_tracking(self, x: int, y: int):
        """Mouse-drag orbit (Trackball.cpp:58-80): 0.5 deg/px, pitch clamp."""
        if not self._tracking:
            self.start_tracking(x, y)
            return
        dx = x - self._prev_pos[0]
        dy = y - self._prev_pos[1]
        self._prev_pos = (x, y)
        self._latitude = math.radians(
            max(-89.0, min(89.0, math.degrees(self._latitude) + 0.5 * dy))
        )
        self._longitude = math.radians(
            (math.degrees(self._longitude) - 0.5 * dx) % 360.0
        )
        self._update_camera()

    def _update_camera(self):
        """Spherical -> cartesian (Trackball.cpp:82-103)."""
        eye = np.asarray(self.camera.eye, np.float64)
        lookat = np.asarray(self.camera.lookat, np.float64)
        r = np.linalg.norm(eye - lookat)
        local = np.array(
            [
                math.cos(self._latitude) * math.sin(self._longitude),
                math.sin(self._latitude),
                math.cos(self._latitude) * math.cos(self._longitude),
            ]
        )
        if self.view_mode == "lookat_fixed":
            self.camera.eye = tuple((lookat + r * local).astype(np.float32))
        else:
            self.camera.lookat = tuple((eye - r * local).astype(np.float32))

    # -- WASD-style translation + roll (Trackball.cpp:139-206) --
    def _translate(self, delta: np.ndarray):
        eye = np.asarray(self.camera.eye, np.float64)
        lookat = np.asarray(self.camera.lookat, np.float64)
        self.camera.eye = tuple((eye + delta).astype(np.float32))
        self.camera.lookat = tuple((lookat + delta).astype(np.float32))
        self.reinitialize_orientation_from_camera()

    def move_forward(self, speed: float | None = None):
        """Translate eye AND lookat along view dir (Trackball.cpp:139-144)."""
        d = self.camera.direction()
        self._translate(d * (self.move_speed if speed is None else speed))

    def move_backward(self, speed: float | None = None):
        d = self.camera.direction()
        self._translate(-d * (self.move_speed if speed is None else speed))

    def move_left(self, speed: float | None = None):
        u, _v, _w = self.camera.uvw_frame()
        u = u / np.linalg.norm(u)
        self._translate(-u * (self.move_speed if speed is None else speed))

    def move_right(self, speed: float | None = None):
        u, _v, _w = self.camera.uvw_frame()
        u = u / np.linalg.norm(u)
        self._translate(u * (self.move_speed if speed is None else speed))

    def move_up(self, speed: float | None = None):
        _u, v, _w = self.camera.uvw_frame()
        v = v / np.linalg.norm(v)
        self._translate(v * (self.move_speed if speed is None else speed))

    def move_down(self, speed: float | None = None):
        _u, v, _w = self.camera.uvw_frame()
        v = v / np.linalg.norm(v)
        self._translate(-v * (self.move_speed if speed is None else speed))

    def roll_left(self, speed: float | None = None):
        self._roll(90.0 + (self.roll_speed if speed is None else speed))

    def roll_right(self, speed: float | None = None):
        self._roll(90.0 - (self.roll_speed if speed is None else speed))

    def _roll(self, angle_deg: float):
        """up' = u*cos(a) + v*sin(a) (Trackball.cpp:188-206)."""
        u, v, _w = self.camera.uvw_frame()
        u = u / np.linalg.norm(u)
        v = v / np.linalg.norm(v)
        a = math.radians(angle_deg)
        self.camera.up = tuple(
            (u * math.cos(a) + v * math.sin(a)).astype(np.float32))

    def wheel_event(self, direction: int):
        """Zoom by scaling eye->lookat distance x1.1 (Trackball.cpp:118-125)."""
        self.zoom(direction)

    def zoom(self, direction: int):
        factor = self.zoom_multiplier if direction < 0 else 1.0 / self.zoom_multiplier
        eye = np.asarray(self.camera.eye, np.float64)
        lookat = np.asarray(self.camera.lookat, np.float64)
        self.camera.eye = tuple((lookat + (eye - lookat) * factor).astype(np.float32))
