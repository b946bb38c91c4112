"""Image writers (sutil::saveImage equivalents)."""
import numpy as np
import pytest

from rendertoy3c_tpu.film.image import write_png, write_ppm, read_ppm, write_exr


def test_png_roundtrip(tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    img = np.random.default_rng(0).integers(0, 256, (16, 24, 3), dtype=np.uint8)
    path = str(tmp_path / "t.png")
    write_png(path, img)
    back = np.asarray(PIL.open(path).convert("RGB"))
    np.testing.assert_array_equal(back, img)


def test_png_rgba(tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    img = np.random.default_rng(1).integers(0, 256, (8, 8, 4), dtype=np.uint8)
    path = str(tmp_path / "t4.png")
    write_png(path, img)
    back = np.asarray(PIL.open(path))
    np.testing.assert_array_equal(back, img)


def test_ppm_roundtrip(tmp_path):
    img = np.random.default_rng(2).integers(0, 256, (9, 7, 3), dtype=np.uint8)
    path = str(tmp_path / "t.ppm")
    write_ppm(path, img)
    back = read_ppm(path)
    np.testing.assert_array_equal(back, img)


def _read_exr_minimal(path):
    """Parse back our own uncompressed scanline EXR (test-only reader)."""
    import struct

    with open(path, "rb") as f:
        data = f.read()
    magic, version = struct.unpack_from("<iI", data, 0)
    assert magic == 20000630
    pos = 8
    channels = []
    dims = None
    while data[pos] != 0:
        name_end = data.index(b"\x00", pos)
        name = data[pos:name_end].decode()
        pos = name_end + 1
        type_end = data.index(b"\x00", pos)
        atype = data[pos:type_end].decode()
        pos = type_end + 1
        (size,) = struct.unpack_from("<I", data, pos)
        pos += 4
        payload = data[pos : pos + size]
        pos += size
        if name == "channels":
            cpos = 0
            while payload[cpos] != 0:
                cend = payload.index(b"\x00", cpos)
                channels.append(payload[cpos:cend].decode())
                cpos = cend + 1 + 16
        elif name == "dataWindow":
            x0, y0, x1, y1 = struct.unpack("<iiii", payload)
            dims = (y1 - y0 + 1, x1 - x0 + 1)
    pos += 1  # header terminator
    h, w = dims
    pos += 8 * h  # offset table
    img = np.zeros((h, w, len(channels)), np.float32)
    for y in range(h):
        yy, nbytes = struct.unpack_from("<ii", data, pos)
        pos += 8
        for ci in range(len(channels)):
            img[yy, :, ci] = np.frombuffer(data, np.float32, w, pos)
            pos += 4 * w
    return channels, img


def test_exr_roundtrip(tmp_path):
    img = np.random.default_rng(3).random((6, 5, 3)).astype(np.float32) * 4.0
    path = str(tmp_path / "t.exr")
    write_exr(path, img)
    channels, back = _read_exr_minimal(path)
    assert channels == ["B", "G", "R"]
    np.testing.assert_array_equal(back[..., 2], img[..., 0])  # R
    np.testing.assert_array_equal(back[..., 1], img[..., 1])  # G
    np.testing.assert_array_equal(back[..., 0], img[..., 2])  # B


def test_exr_readable_by_cv2(tmp_path):
    import os

    os.environ["OPENCV_IO_ENABLE_OPENEXR"] = "1"
    cv2 = pytest.importorskip("cv2")
    img = np.random.default_rng(4).random((4, 4, 3)).astype(np.float32)
    path = str(tmp_path / "cv.exr")
    write_exr(path, img)
    back = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if back is None:
        pytest.skip("cv2 built without OpenEXR")
    np.testing.assert_allclose(back[..., ::-1], img, rtol=1e-6)
