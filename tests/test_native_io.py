"""Native C++ I/O (OBJ parser, PNG writer) vs the Python golden paths."""

import os

import numpy as np
import pytest

from st3d.io.native import flush, get_lib, parse_obj_native, write_png
from st3d.io.obj import load_obj

REF = "/root/reference/objects"

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable (no toolchain)"
)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference assets absent")
@pytest.mark.parametrize(
    "rel", ["cow_mesh/cow.obj", "bob_mesh/bob.obj", "teapot_mesh/teapot.obj"]
)
def test_native_parser_matches_python(rel):
    path = os.path.join(REF, rel)
    nat = parse_obj_native(path)
    py = load_obj(path, load_textures=False, use_native=False)
    np.testing.assert_array_equal(nat["verts"], py.verts)
    np.testing.assert_array_equal(nat["faces"], py.faces)
    if py.verts_uvs is not None:
        np.testing.assert_allclose(nat["verts_uvs"], py.verts_uvs)
        np.testing.assert_array_equal(nat["faces_uvs"], py.faces_uvs)
    else:
        assert nat["faces_uvs"] is None


def test_native_parser_quads_and_negatives(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\nf -4 -3 -2\n"
    )
    nat = parse_obj_native(str(p))
    py = load_obj(str(p), use_native=False)
    np.testing.assert_array_equal(nat["faces"], py.faces)
    assert nat["faces"].shape == (3, 3)


def test_native_parse_missing_file_raises():
    with pytest.raises(IOError):
        parse_obj_native("/nonexistent/file.obj")


def test_png_roundtrip_sync_and_async(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    img = (rng.rand(37, 53, 3) * 255).astype(np.uint8)  # odd sizes
    sync_path = str(tmp_path / "sync.png")
    assert write_png(sync_path, img)
    np.testing.assert_array_equal(np.asarray(Image.open(sync_path)), img)

    paths = []
    for i in range(8):
        p = str(tmp_path / f"async_{i}.png")
        assert write_png(p, img, async_=True)
        paths.append(p)
    assert flush() == 0
    for p in paths:
        np.testing.assert_array_equal(np.asarray(Image.open(p)), img)


def test_save_image_async_api(tmp_path):
    from PIL import Image

    from st3d.io.image import flush_images, save_image

    t = np.random.RandomState(1).rand(3, 16, 16).astype(np.float32)
    p = str(tmp_path / "x.png")
    save_image(t, p, async_=True)
    assert flush_images() == 0
    back = np.asarray(Image.open(p)).astype(np.float32) / 255.0
    np.testing.assert_allclose(
        back, np.clip(np.transpose(t, (1, 2, 0)), 0, 1), atol=1 / 255.0 + 1e-6
    )


def test_native_parser_large_ngon(tmp_path):
    """Polygons beyond the old 16-corner buffer triangulate fully (the
    parser previously truncated them silently; advisor finding r1)."""
    import math

    n = 24
    lines = [
        f"v {math.cos(2 * math.pi * k / n):.6f} "
        f"{math.sin(2 * math.pi * k / n):.6f} 0.0"
        for k in range(n)
    ]
    lines.append("f " + " ".join(str(i + 1) for i in range(n)))
    p = tmp_path / "ngon.obj"
    p.write_text("\n".join(lines) + "\n")
    nat = parse_obj_native(str(p))
    py = load_obj(str(p), use_native=False)
    assert nat["faces"].shape == (n - 2, 3)
    np.testing.assert_array_equal(nat["faces"], py.faces)
