"""PNG writer / OBJ parser tests."""

import io
import struct
import zlib

import numpy as np

from raytracer_tpu.io import load_obj, obj_to_triangles, to_uint8, write_png


def test_to_uint8_clamps():
    img = np.array([[[-1.0, 0.5, 2.0]]], np.float32)
    out = to_uint8(img)
    assert out.tolist() == [[[0, 128, 255]]]


def test_png_roundtrip(tmp_path):
    img = (np.arange(4 * 3 * 3).reshape(4, 3, 3) * 7 % 256).astype(np.uint8)
    p = tmp_path / "t.png"
    write_png(str(p), img)
    data = p.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    # parse IHDR
    assert data[12:16] == b"IHDR"
    w, h = struct.unpack(">II", data[16:24])
    assert (w, h) == (3, 4)
    # decode IDAT and undo the per-row filter-0 framing
    i = data.index(b"IDAT")
    ln = struct.unpack(">I", data[i - 4:i])[0]
    raw = zlib.decompress(data[i + 4:i + 4 + ln])
    rows = [raw[r * (1 + 3 * 3) + 1: (r + 1) * (1 + 3 * 3)] for r in range(4)]
    rec = np.frombuffer(b"".join(rows), np.uint8).reshape(4, 3, 3)
    np.testing.assert_array_equal(rec, img)


OBJ_TEXT = """
# comment
o quad
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f 1 2 3 4
o tri
v 5 5 5
v 6 5 5
v 5 6 5
f 5/1 6/2/3 7//4
"""


def test_obj_parse(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text(OBJ_TEXT)
    meshes = load_obj(str(p))
    assert set(meshes) == {"quad", "tri"}
    assert meshes["quad"].shape == (2, 3, 3)  # fan-triangulated quad
    assert meshes["tri"].shape == (1, 3, 3)
    np.testing.assert_allclose(meshes["tri"][0][0], [5, 5, 5])
    allt = obj_to_triangles(str(p))
    assert allt.shape == (3, 3, 3)


def test_obj_negative_indices(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    tris = obj_to_triangles(str(p))
    assert tris.shape == (1, 3, 3)
    np.testing.assert_allclose(tris[0][1], [1, 0, 0])
