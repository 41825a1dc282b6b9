"""OBJ/MTL I/O tests: round-trip, quad triangulation, v//vn faces, topology.

Mirrors SURVEY.md §4 item 1: round-trip on cow.obj (2930 v / 3225 vt / 5856 f)
and quad fan-triangulation on bob.obj (5344 v / 5348 quads -> 10696 tris),
using the read-only reference assets when present.
"""

import os

import numpy as np
import pytest

from st3d.io.obj import load_obj, save_obj, load_mesh
from st3d.core.mesh import compute_topology

REF = "/root/reference/objects"


def test_parse_minimal_tri(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nvt 0 0\nvt 1 0\nvt 0 1\nf 1/1 2/2 3/3\n"
    )
    d = load_obj(str(p))
    assert d.verts.shape == (3, 3)
    assert d.faces.tolist() == [[0, 1, 2]]
    assert d.faces_uvs.tolist() == [[0, 1, 2]]
    np.testing.assert_allclose(d.verts_uvs, [[0, 0], [1, 0], [0, 1]])


def test_quad_fan_triangulation(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n"
    )
    d = load_obj(str(p))
    assert d.faces.tolist() == [[0, 1, 2], [0, 2, 3]]


def test_negative_indices(tmp_path):
    p = tmp_path / "neg.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    d = load_obj(str(p))
    assert d.faces.tolist() == [[0, 1, 2]]


def test_v_slash_slash_vn(tmp_path):
    p = tmp_path / "n.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nvn 0 0 1\nf 1//1 2//1 3//1\n"
    )
    d = load_obj(str(p))
    assert d.faces.tolist() == [[0, 1, 2]]
    assert d.verts_uvs is None and d.faces_uvs is None
    assert d.faces_normals.tolist() == [[0, 0, 0]]


def test_roundtrip_with_texture(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    uvs = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    tex = np.random.RandomState(0).rand(8, 8, 3).astype(np.float32)
    out = tmp_path / "m.obj"
    save_obj(str(out), verts, faces, uvs, faces, tex)
    d = load_obj(str(out))
    np.testing.assert_allclose(d.verts, verts, atol=1e-5)
    assert d.faces.tolist() == faces.tolist()
    np.testing.assert_allclose(d.verts_uvs, uvs, atol=1e-5)
    assert len(d.texture_images) == 1
    tex_back = next(iter(d.texture_images.values()))
    np.testing.assert_allclose(tex_back, tex, atol=1.0 / 255.0 + 1e-6)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference assets absent")
def test_cow_counts():
    d = load_obj(os.path.join(REF, "cow_mesh/cow.obj"))
    assert d.verts.shape == (2930, 3)
    assert d.verts_uvs.shape == (3225, 2)
    assert d.faces.shape == (5856, 3)
    assert d.faces_uvs.shape == (5856, 3)
    tex = next(iter(d.texture_images.values()))
    assert tex.shape == (1024, 1024, 3)
    assert d.faces.min() >= 0 and d.faces.max() < 2930
    assert d.faces_uvs.min() >= 0 and d.faces_uvs.max() < 3225


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference assets absent")
def test_bob_quads_triangulated():
    d = load_obj(os.path.join(REF, "bob_mesh/bob.obj"))
    assert d.verts.shape == (5344, 3)
    assert d.faces.shape == (5344 * 2, 3)  # quads -> 2 tris each
    tex = next(iter(d.texture_images.values()))
    assert tex.shape[2] == 3


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference assets absent")
def test_teapot_no_uvs():
    d = load_obj(os.path.join(REF, "teapot_mesh/teapot.obj"))
    assert d.verts.shape[0] == 1292
    assert d.verts_uvs is None
    with pytest.raises(ValueError):
        load_mesh(os.path.join(REF, "teapot_mesh/teapot.obj"))
    mesh = load_mesh(
        os.path.join(REF, "teapot_mesh/teapot.obj"), require_uvs=False
    )
    assert mesh.texture.shape == (2, 2, 3)


def test_topology_quad():
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    topo = compute_topology(faces, 4)
    assert np.asarray(topo.edges).shape == (5, 2)
    # Degrees: v0 and v2 touch 3 edges; v1, v3 touch 2.
    np.testing.assert_allclose(np.asarray(topo.degree), [3, 2, 3, 2])
    # One interior edge (0, 2) with opposite verts 1 and 3.
    nc = np.asarray(topo.nc_pairs)
    assert nc.shape == (1, 4)
    assert sorted(nc[0, :2].tolist()) == [0, 2]
    assert sorted(nc[0, 2:].tolist()) == [1, 3]


def test_topology_nonmanifold_all_pairs():
    # Three faces sharing edge (0, 1) -> C(3,2) = 3 pairs.
    faces = np.array([[0, 1, 2], [0, 1, 3], [1, 0, 4]])
    topo = compute_topology(faces, 5)
    nc = np.asarray(topo.nc_pairs)
    assert nc.shape[0] == 3
    opps = sorted(tuple(sorted(r)) for r in nc[:, 2:].tolist())
    assert opps == [(2, 3), (2, 4), (3, 4)]


def test_negative_indices_resolve_at_face_line(tmp_path):
    """OBJ negative indices are relative to the counts AT the face line,
    not the file's final counts (multi-object files append vertices after
    earlier objects' faces); native and Python parsers must agree."""
    p = tmp_path / "multi.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "f -3 -2 -1\n"            # -> verts 0,1,2 (counts at THIS line)
        "v 5 5 5\nv 6 5 5\nv 5 6 5\n"
        "f -3 -2 -1\n"            # -> verts 3,4,5
    )
    d = load_obj(str(p), use_native=False)
    assert d.faces.tolist() == [[0, 1, 2], [3, 4, 5]]
    from st3d.io.native import get_lib, parse_obj_native
    if get_lib() is not None:
        nat = parse_obj_native(str(p))
        np.testing.assert_array_equal(nat["faces"], d.faces)


def test_partial_corner_vt_detected(tmp_path):
    """has_vt must be set when ANY corner carries a vt (per-corner check,
    matching the native parser) — corner 0 without one used to drop the
    whole faces_uvs array."""
    p = tmp_path / "pvt.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nvt 0 0\nvt 1 0\n"
        "f 1 2/1 3/2\n"
    )
    d = load_obj(str(p), use_native=False)
    assert d.faces_uvs is not None
    assert d.faces_uvs.tolist() == [[0, 0, 1]]
