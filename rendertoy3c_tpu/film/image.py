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


# ---------------------------------------------------------------------------
# Readers (equivalent of sutil::loadImage, sutil/sutil.cpp:271-378, which
# dispatches PPM / PNG / EXR by extension).


def read_png(path: str) -> np.ndarray:
    """Read a PNG to [H, W, 4] uint8 RGBA (PIL when available, stdlib
    fallback for non-interlaced 8-bit images)."""
    try:
        from PIL import Image

        with Image.open(path) as im:
            return np.asarray(im.convert("RGBA"), np.uint8)
    except ImportError:
        pass

    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos = 8
    idat = b""
    w = h = bitdepth = color = None
    palette = None
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4: pos + 8]
        payload = data[pos + 8: pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bitdepth, color, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            assert bitdepth == 8 and interlace == 0, "unsupported PNG"
        elif tag == b"PLTE":
            palette = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = zlib.decompress(idat)
    nchan = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    stride = w * nchan
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    p = 0
    for y in range(h):
        filt = raw[p]
        row = np.frombuffer(raw, np.uint8, stride, p + 1).copy()
        p += 1 + stride
        if filt == 1:  # Sub
            for x in range(nchan, stride):
                row[x] = (row[x] + row[x - nchan]) & 0xFF
        elif filt == 2:  # Up
            row = (row + prev) & 0xFF
        elif filt == 3:  # Average
            for x in range(stride):
                left = row[x - nchan] if x >= nchan else 0
                row[x] = (row[x] + ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif filt == 4:  # Paeth
            for x in range(stride):
                a = int(row[x - nchan]) if x >= nchan else 0
                b = int(prev[x])
                c = int(prev[x - nchan]) if x >= nchan else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        out[y] = row
        prev = row
    img = out.reshape(h, w, nchan)
    if color == 3:  # palette
        img = palette[img[..., 0]]
        nchan = 3
    if nchan == 1:
        img = np.repeat(img, 3, axis=-1)
        nchan = 3
    if nchan == 2:
        img = np.concatenate(
            [np.repeat(img[..., :1], 3, axis=-1), img[..., 1:]], axis=-1
        )
        nchan = 4
    if nchan == 3:
        img = np.concatenate(
            [img, np.full((h, w, 1), 255, np.uint8)], axis=-1
        )
    return img


def read_exr(path: str) -> np.ndarray:
    """Read an uncompressed scanline float/half EXR (the write_exr format and
    equivalents) to [H, W, C] float32 in RGBA channel order."""
    with open(path, "rb") as f:
        data = f.read()
    magic, _version = struct.unpack_from("<iI", data, 0)
    assert magic == _EXR_MAGIC, "not an EXR"
    pos = 8
    channels = []  # (name, pixel_type)
    compression = 0
    dw = None
    while data[pos] != 0:
        zn = data.index(b"\x00", pos)
        name = data[pos:zn].decode()
        pos = zn + 1
        zt = data.index(b"\x00", pos)
        type_ = data[pos:zt].decode()
        pos = zt + 1
        (ln,) = struct.unpack_from("<I", data, pos)
        pos += 4
        payload = data[pos: pos + ln]
        pos += ln
        if name == "channels":
            cp = 0
            while payload[cp] != 0:
                cz = payload.index(b"\x00", cp)
                cname = payload[cp:cz].decode()
                ptype = struct.unpack_from("<i", payload, cz + 1)[0]
                channels.append((cname, ptype))
                cp = cz + 1 + 16
        elif name == "compression":
            compression = payload[0]
        elif name == "dataWindow":
            dw = struct.unpack("<iiii", payload)
    pos += 1  # header terminator
    assert compression == 0, "only uncompressed EXR supported"
    x0, y0, x1, y1 = dw
    w, h = x1 - x0 + 1, y1 - y0 + 1
    pos += 8 * h  # skip offset table (chunks are contiguous)
    nc = len(channels)
    psize = {1: 2, 2: 4}  # HALF, FLOAT
    out = {}
    for name, ptype in channels:
        out[name] = np.empty((h, w), np.float32)
    for _ in range(h):
        y, _size = struct.unpack_from("<ii", data, pos)
        pos += 8
        for name, ptype in channels:
            n = w * psize[ptype]
            buf = data[pos: pos + n]
            pos += n
            if ptype == 2:
                out[name][y - y0] = np.frombuffer(buf, np.float32)
            else:
                out[name][y - y0] = np.frombuffer(buf, np.float16).astype(
                    np.float32
                )
    order = [c for c in ("R", "G", "B", "A") if c in out]
    order += [c for c, _ in channels if c not in order]
    return np.stack([out[c] for c in order], axis=-1)


def load_image(path: str) -> np.ndarray:
    """Load PPM/PNG/EXR by extension (sutil::loadImage dispatch)."""
    p = path.lower()
    if p.endswith(".exr"):
        return read_exr(path)
    if p.endswith(".ppm"):
        return read_ppm(path)
    return read_png(path)
