"""4x4 matrix, quaternion, and AABB utilities.

Parity with sutil's host/device math library (sutil/Matrix.h row-major
Matrix<4,4> transforms, sutil/Quaternion.h, sutil/Aabb.h). numpy for
host-side scene setup; every function also accepts jnp arrays for traced
use (the ops are plain elementwise/matmul).
"""
from __future__ import annotations

import numpy as np


# --- 4x4 transforms (row-major, points as column vectors) ------------------

def identity() -> np.ndarray:
    return np.eye(4, dtype=np.float32)


def translate(v) -> np.ndarray:
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = v
    return m


def scale(v) -> np.ndarray:
    v = np.broadcast_to(np.asarray(v, np.float32), (3,))
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[1, 1], m[2, 2] = v
    return m


def rotate(angle_rad: float, axis) -> np.ndarray:
    """Rotation about an arbitrary axis (sutil Matrix4x4::rotate)."""
    a = np.asarray(axis, np.float64)
    a = a / np.linalg.norm(a)
    c, s = np.cos(angle_rad), np.sin(angle_rad)
    x, y, z = a
    r = np.array([
        [c + x * x * (1 - c), x * y * (1 - c) - z * s, x * z * (1 - c) + y * s],
        [y * x * (1 - c) + z * s, c + y * y * (1 - c), y * z * (1 - c) - x * s],
        [z * x * (1 - c) - y * s, z * y * (1 - c) + x * s, c + z * z * (1 - c)],
    ])
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = r
    return m


def transform_point(m: np.ndarray, p):
    """Apply a 4x4 (or 3x4) to points [..., 3]."""
    p = np.asarray(p, np.float32)
    return p @ np.asarray(m, np.float32)[:3, :3].T + np.asarray(m)[:3, 3]


def transform_vector(m: np.ndarray, v):
    return np.asarray(v, np.float32) @ np.asarray(m, np.float32)[:3, :3].T


def transform_normal(m: np.ndarray, n):
    """Inverse-transpose transform for normals."""
    it = np.linalg.inv(np.asarray(m, np.float64)[:3, :3]).T
    out = np.asarray(n, np.float64) @ it.T
    return (out / np.maximum(np.linalg.norm(out, axis=-1, keepdims=True),
                             1e-20)).astype(np.float32)


def affine_3x4(m: np.ndarray) -> np.ndarray:
    """Top 3 rows of a 4x4 — the Instance transform format."""
    return np.asarray(m, np.float32)[:3, :4]


# --- quaternions (w, x, y, z) ----------------------------------------------

def quat_from_axis_angle(axis, angle_rad: float) -> np.ndarray:
    a = np.asarray(axis, np.float64)
    a = a / np.linalg.norm(a)
    h = angle_rad * 0.5
    return np.array([np.cos(h), *(np.sin(h) * a)], np.float32)


def quat_mul(q1, q2) -> np.ndarray:
    w1, x1, y1, z1 = np.asarray(q1, np.float64)
    w2, x2, y2, z2 = np.asarray(q2, np.float64)
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], np.float32)


def quat_rotate(q, v) -> np.ndarray:
    """Rotate vector(s) v by unit quaternion q."""
    return transform_point(quat_to_matrix(q), v)


def quat_to_matrix(q) -> np.ndarray:
    w, x, y, z = np.asarray(q, np.float64)
    n = w * w + x * x + y * y + z * z
    s = 0.0 if n == 0 else 2.0 / n
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = np.array([
        [1 - s * (y * y + z * z), s * (x * y - w * z), s * (x * z + w * y)],
        [s * (x * y + w * z), 1 - s * (x * x + z * z), s * (y * z - w * x)],
        [s * (x * z - w * y), s * (y * z + w * x), 1 - s * (x * x + y * y)],
    ])
    return m


# --- AABB -------------------------------------------------------------------

class Aabb:
    """Axis-aligned box (sutil/Aabb.h shape: include/extend/center/...)."""

    def __init__(self, lo=None, hi=None):
        self.lo = (np.full(3, np.inf, np.float32) if lo is None
                   else np.asarray(lo, np.float32).copy())
        self.hi = (np.full(3, -np.inf, np.float32) if hi is None
                   else np.asarray(hi, np.float32).copy())

    def include(self, other):
        if isinstance(other, Aabb):
            self.lo = np.minimum(self.lo, other.lo)
            self.hi = np.maximum(self.hi, other.hi)
        else:
            pts = np.asarray(other, np.float32).reshape(-1, 3)
            self.lo = np.minimum(self.lo, pts.min(axis=0))
            self.hi = np.maximum(self.hi, pts.max(axis=0))
        return self

    def valid(self) -> bool:
        return bool((self.lo <= self.hi).all())

    def center(self) -> np.ndarray:
        return 0.5 * (self.lo + self.hi)

    def extent(self) -> np.ndarray:
        return self.hi - self.lo

    def max_extent(self) -> float:
        return float(self.extent().max())

    def area(self) -> float:
        d = np.maximum(self.extent(), 0.0)
        return float(2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0]))

    def contains(self, p) -> bool:
        p = np.asarray(p, np.float32)
        return bool(((p >= self.lo) & (p <= self.hi)).all())

    def transform(self, m) -> "Aabb":
        """Conservative transform: include all 8 corners."""
        corners = np.array([
            [x, y, z]
            for x in (self.lo[0], self.hi[0])
            for y in (self.lo[1], self.hi[1])
            for z in (self.lo[2], self.hi[2])
        ], np.float32)
        return Aabb().include(transform_point(m, corners))


def parse_dimensions(s: str) -> tuple:
    """'<W>x<H>' -> (w, h), sutil::parseDimensions."""
    w, h = s.lower().split("x")
    return int(w), int(h)
