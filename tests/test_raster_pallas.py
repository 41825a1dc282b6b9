"""Pallas kernel vs the oracle rasterizers (SURVEY.md §4 item 2) — runs in
interpret mode on the CPU test backend; the same code compiles on TPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from st3d.core.cameras import FoVPerspectiveCameras
from st3d.kernels.raster_pallas import face_coeffs, rasterize_pallas
from st3d.render.rasterize import (
    rasterize_bruteforce,
    rasterize_xla,
)


def test_face_coeffs_reproduce_barycentrics():
    rng = np.random.RandomState(0)
    fv = jnp.asarray(
        rng.rand(5, 3, 3) * np.array([32.0, 32.0, 3.0]) + np.array([0, 0, 1.0]),
        jnp.float32,
    )
    coeffs = np.asarray(face_coeffs(fv))
    # At each vertex of each face, barycentrics are one-hot.
    for f in range(5):
        for k in range(3):
            px, py = float(fv[f, k, 0]), float(fv[f, k, 1])
            b = [
                coeffs[3 * i, f] * px + coeffs[3 * i + 1, f] * py
                + coeffs[3 * i + 2, f]
                for i in range(3)
            ]
            want = np.eye(3)[k]
            np.testing.assert_allclose(b, want, atol=2e-4)
            invz = coeffs[9, f] * px + coeffs[10, f] * py + coeffs[11, f]
            np.testing.assert_allclose(invz, 1.0 / float(fv[f, k, 2]),
                                       rtol=2e-4)


def test_invalid_faces_never_cover():
    fv = jnp.array(
        [
            [[0.0, 0.0, -1.0], [30.0, 0.0, 2.0], [0.0, 30.0, 2.0]],  # behind
            [[3.0, 3.0, 2.0], [9.0, 9.0, 2.0], [6.0, 6.0, 2.0]],      # degen
        ]
    )
    frags = rasterize_pallas(fv, 32)
    assert (np.asarray(frags.pix_to_face) == -1).all()


@pytest.mark.parametrize("size", [32, 64, 128])
def test_pallas_matches_oracle_sphere(sphere_mesh, size):
    from st3d.render.rasterize import face_verts_screen

    cam = FoVPerspectiveCameras.create(T=jnp.array([[0.0, 0.0, 3.0]]))
    fv = face_verts_screen(sphere_mesh.verts, sphere_mesh.faces, cam, size)[0]
    want = rasterize_bruteforce(fv, size)
    got = rasterize_pallas(fv, size, face_chunk=32)
    np.testing.assert_array_equal(
        np.asarray(got.pix_to_face), np.asarray(want.pix_to_face)
    )
    covered = np.asarray(want.pix_to_face) >= 0
    np.testing.assert_allclose(
        np.asarray(got.zbuf)[covered], np.asarray(want.zbuf)[covered],
        rtol=1e-4,
    )


def test_pallas_depth_tiebreak_matches_xla():
    # Two identical triangles stacked -> tie on z -> lower index wins.
    tri = [[2.0, 2.0, 2.0], [28.0, 4.0, 2.0], [6.0, 28.0, 2.0]]
    fv = jnp.array([tri, tri, tri])
    a = rasterize_pallas(fv, 32, face_chunk=2)  # split across chunks
    b = rasterize_xla(fv, 32)
    np.testing.assert_array_equal(np.asarray(a.pix_to_face),
                                  np.asarray(b.pix_to_face))
    covered = np.asarray(b.pix_to_face) >= 0
    assert (np.asarray(a.pix_to_face)[covered] == 0).all()


def test_pallas_under_vmap(sphere_mesh):
    from st3d.render.rasterize import face_verts_screen
    from st3d.core.cameras import build_fixed_cameras

    cams = build_fixed_cameras(3, shuffle=False)
    fv = face_verts_screen(sphere_mesh.verts, sphere_mesh.faces, cams, 32)
    got = jax.vmap(lambda v: rasterize_pallas(v, 32))(fv)
    for i in range(3):
        want = rasterize_bruteforce(fv[i], 32)
        np.testing.assert_array_equal(
            np.asarray(got.pix_to_face[i]), np.asarray(want.pix_to_face)
        )


def test_pallas_constant_operand_matches_arg(sphere_mesh):
    """Regression: XLA constant folding of the vmapped preprocessing
    produced garbage coefficients on the TPU stack when face_verts was a
    jit closure constant (silently empty coverage). An optimization
    barrier at the kernel entry forces runtime evaluation."""
    from st3d.render.rasterize import (
        RasterizationSettings, face_verts_screen, rasterize_batch,
    )
    from st3d.core.cameras import build_fixed_cameras

    cams = build_fixed_cameras(2, shuffle=False)
    fv = face_verts_screen(sphere_mesh.verts, sphere_mesh.faces, cams, 32)
    st = RasterizationSettings(image_size=32, backend="pallas")
    as_arg = jax.jit(lambda v: rasterize_batch(v, st))(fv)
    as_const = jax.jit(lambda _: rasterize_batch(fv, st))(jnp.zeros(()))
    np.testing.assert_array_equal(
        np.asarray(as_arg.pix_to_face), np.asarray(as_const.pix_to_face)
    )
    assert (np.asarray(as_arg.pix_to_face) >= 0).any()


def test_pallas2d_matches_oracle(sphere_mesh):
    """Experimental 2D-tiled (Morton-culled) kernel agrees with the oracle
    (kept as an alternative; the flat-tile kernel measured faster on v5e)."""
    from st3d.core.cameras import build_fixed_cameras
    from st3d.kernels.raster_pallas import rasterize_pallas2d_batched
    from st3d.render.rasterize import face_verts_screen

    cams = build_fixed_cameras(2, shuffle=False)
    fv = face_verts_screen(sphere_mesh.verts, sphere_mesh.faces, cams, 64)
    got = rasterize_pallas2d_batched(fv, 64, face_chunk=32)
    for i in range(2):
        want = rasterize_bruteforce(fv[i], 64)
        np.testing.assert_array_equal(
            np.asarray(got.pix_to_face[i]), np.asarray(want.pix_to_face)
        )


# ---------------------------------------------------------------------------
# Streaming variant (VMEM residency O(face_chunk); large face counts)
# ---------------------------------------------------------------------------

def _cam2():
    return FoVPerspectiveCameras.create(
        T=jnp.array([[0.0, 0.0, 2.0], [0.3, 0.0, 2.2]])
    )


@pytest.mark.parametrize("soft", [False, True])
def test_stream_matches_resident(sphere_mesh, soft):
    """The streaming kernel is bit-identical to the resident kernel (hard
    pix_to_face/zbuf and soft nearest_face), multi-view, multi-chunk."""
    from st3d.kernels.raster_pallas import rasterize_pallas_batched
    from st3d.render.rasterize import face_verts_screen

    size = 64
    fv = face_verts_screen(sphere_mesh.verts, sphere_mesh.faces, _cam2(),
                           size)
    kw = dict(face_chunk=16, soft=soft, soft_sigma_px=2.0)
    res = rasterize_pallas_batched(fv, size, stream=False, **kw)
    strm = rasterize_pallas_batched(fv, size, stream=True, **kw)
    np.testing.assert_array_equal(
        np.asarray(strm.pix_to_face), np.asarray(res.pix_to_face)
    )
    np.testing.assert_allclose(
        np.asarray(strm.zbuf), np.asarray(res.zbuf), rtol=0, atol=0
    )
    if soft:
        np.testing.assert_array_equal(
            np.asarray(strm.nearest_face), np.asarray(res.nearest_face)
        )


def test_stream_large_mesh_auto_selected():
    """An 81,920-face icosphere (7.7x the reference's largest mesh) runs
    through the STREAMING kernel and matches the XLA oracle (VERDICT r1
    item 5: face-count scaling). Round 3: BENCH_FACES measured the resident
    kernel faster at every face count that fits VMEM, so the auto budget
    now keeps 81,920 faces (6.55MB of coefficients) resident — the next
    ico level (327,680 faces = 26MB) is what auto-streams; this test pins
    the budget boundary and forces the streaming kernel explicitly to keep
    its correctness covered at this size."""
    import sys
    sys.path.insert(0, "tests")
    from conftest import make_ico_sphere
    from st3d.kernels.raster_pallas import (
        RESIDENT_COEFF_BUDGET,
        rasterize_pallas_batched,
    )
    from st3d.render.rasterize import (
        RasterizationSettings,
        face_verts_screen,
        rasterize_batch,
    )

    mesh = make_ico_sphere(level=6)
    f = mesh.faces.shape[0]
    assert f == 81920
    # Budget boundary: 81,920 faces stay resident (measured 19x faster);
    # 4x that auto-streams.
    assert f * 20 * 4 <= RESIDENT_COEFF_BUDGET
    assert 4 * f * 20 * 4 > RESIDENT_COEFF_BUDGET

    size = 64
    cam = FoVPerspectiveCameras.create(T=jnp.array([[0.0, 0.0, 2.5]]))
    fv = face_verts_screen(mesh.verts, mesh.faces, cam, size)
    got = rasterize_batch(
        fv, RasterizationSettings(image_size=size, backend="pallas")
    )
    want = rasterize_batch(
        fv, RasterizationSettings(image_size=size, backend="xla")
    )
    np.testing.assert_array_equal(
        np.asarray(got.pix_to_face), np.asarray(want.pix_to_face)
    )
    # The streaming kernel stays exact at this face count (forced).
    got_stream = rasterize_pallas_batched(fv, size, stream=True)
    np.testing.assert_array_equal(
        np.asarray(got_stream.pix_to_face), np.asarray(want.pix_to_face)
    )
    cov = np.asarray(want.pix_to_face) >= 0
    assert cov.mean() > 0.1  # the sphere actually renders
    # zbuf arithmetic differs (affine-1/z plane vs per-barycentric sum);
    # sub-pixel faces at this density amplify the f32 cancellation.
    np.testing.assert_allclose(
        np.asarray(got.zbuf)[cov], np.asarray(want.zbuf)[cov], rtol=3e-4
    )
