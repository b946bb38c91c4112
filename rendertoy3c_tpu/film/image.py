"""Image output: PNG / PPM / EXR (equivalent of sutil::saveImage,
sutil/sutil.cpp:542-709, which supports the same three formats).

PNG uses stdlib zlib (no filter) so saving works with zero extra deps; PPM is
the P6 binary format sutil reads/writes; EXR is a minimal self-contained
writer for uncompressed float32/half scanline images (tinyexr-equivalent
output readable by standard tools).
"""
from __future__ import annotations

import struct
import zlib

import numpy as np


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def write_png(path: str, rgb_u8: np.ndarray) -> None:
    """Write an 8-bit RGB/RGBA PNG. rgb_u8: [H, W, 3|4] uint8."""
    img = np.asarray(rgb_u8)
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] in (3, 4)
    h, w, c = img.shape
    color_type = 2 if c == 3 else 6
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    out = b"\x89PNG\r\n\x1a\n"
    out += _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
    out += _png_chunk(b"IDAT", zlib.compress(raw, 6))
    out += _png_chunk(b"IEND", b"")
    with open(path, "wb") as f:
        f.write(out)


def write_ppm(path: str, rgb_u8: np.ndarray) -> None:
    """Binary P6 PPM (the format sutil's PPMLoader handles)."""
    img = np.asarray(rgb_u8)
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] >= 3
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(img[..., :3].tobytes())


def read_ppm(path: str) -> np.ndarray:
    """Read a binary P6 PPM -> [H, W, 3] uint8."""
    with open(path, "rb") as f:
        data = f.read()
    # Header: magic, whitespace/comments, width, height, maxval.
    tokens = []
    i = 0
    while len(tokens) < 4:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        tokens.append(data[i:j])
        i = j
    i += 1  # single whitespace after maxval
    assert tokens[0] == b"P6", "only binary P6 supported"
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    assert maxval == 255
    return np.frombuffer(data, np.uint8, count=w * h * 3, offset=i).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# Minimal OpenEXR writer: uncompressed (compression=0) scanline float images.
# Layout per the OpenEXR 2.0 file format spec.
# ---------------------------------------------------------------------------

_EXR_MAGIC = 20000630
_PIXEL_FLOAT = 2  # FLOAT pixel type


def _exr_attr(name: bytes, type_: bytes, payload: bytes) -> bytes:
    return name + b"\x00" + type_ + b"\x00" + struct.pack("<I", len(payload)) + payload


def write_exr(path: str, rgb_f32: np.ndarray) -> None:
    """Write an uncompressed float32 RGB(A) EXR. rgb_f32: [H, W, 3|4]."""
    img = np.asarray(rgb_f32, dtype=np.float32)
    assert img.ndim == 3 and img.shape[2] in (3, 4)
    h, w, nc = img.shape
    names = [b"R", b"G", b"B"] + ([b"A"] if nc == 4 else [])
    # channel list must be sorted alphabetically: A, B, G, R
    order = sorted(range(nc), key=lambda k: names[k])

    chlist = b""
    for k in order:
        chlist += names[k] + b"\x00"
        chlist += struct.pack("<iiii", _PIXEL_FLOAT, 0, 1, 1)
    chlist += b"\x00"

    header = b""
    header += _exr_attr(b"channels", b"chlist", chlist)
    header += _exr_attr(b"compression", b"compression", b"\x00")  # NO_COMPRESSION
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header += _exr_attr(b"dataWindow", b"box2i", box)
    header += _exr_attr(b"displayWindow", b"box2i", box)
    header += _exr_attr(b"lineOrder", b"lineOrder", b"\x00")  # INCREASING_Y
    header += _exr_attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
    header += _exr_attr(b"screenWindowCenter", b"v2f", struct.pack("<ff", 0.0, 0.0))
    header += _exr_attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
    header += b"\x00"

    preamble = struct.pack("<iI", _EXR_MAGIC, 2)  # version 2, scanline
    offset_table_pos = len(preamble) + len(header)
    first_chunk = offset_table_pos + 8 * h
    chunk_size = 8 + 4 * w * nc  # y + pixelsize header? (y:int, size:int) + data

    offsets = struct.pack(
        "<" + "Q" * h, *[first_chunk + y * chunk_size for y in range(h)]
    )

    with open(path, "wb") as f:
        f.write(preamble)
        f.write(header)
        f.write(offsets)
        for y in range(h):
            f.write(struct.pack("<ii", y, 4 * w * nc))
            for k in order:
                f.write(img[y, :, k].tobytes())
