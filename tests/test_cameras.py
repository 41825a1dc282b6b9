"""Camera math vs hand-computed points (SURVEY.md §4 item 1)."""

import numpy as np
import jax.numpy as jnp

from st3d.core.cameras import (
    FoVPerspectiveCameras,
    build_fixed_cameras,
    build_random_cameras,
    look_at_view_transform,
    rotate_axis_angle,
    transform_points_screen,
    world_to_view,
    view_to_ndc,
)


def test_rotate_axis_angle_row_vector_ccw():
    # CCW about X viewed from +X: y-axis -> z-axis.
    R = rotate_axis_angle(90.0, "X")
    np.testing.assert_allclose(jnp.array([0.0, 1.0, 0.0]) @ R,
                               [0.0, 0.0, 1.0], atol=1e-6)
    # CCW about Y viewed from +Y: z-axis -> x-axis.
    R = rotate_axis_angle(90.0, "Y")
    np.testing.assert_allclose(jnp.array([0.0, 0.0, 1.0]) @ R,
                               [1.0, 0.0, 0.0], atol=1e-6)
    # CCW about Z viewed from +Z: x-axis -> y-axis.
    R = rotate_axis_angle(90.0, "Z")
    np.testing.assert_allclose(jnp.array([1.0, 0.0, 0.0]) @ R,
                               [0.0, 1.0, 0.0], atol=1e-6)
    # Orthonormality.
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_default_camera_projection():
    # Default camera: identity R, zero T -> view == world; fov 60.
    cam = FoVPerspectiveCameras.create(T=jnp.array([[0.0, 0.0, 3.0]]))
    pts = jnp.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0], [0.0, -1.0, 0.0]])
    ndc = view_to_ndc(cam, world_to_view(cam, pts))[0]
    s = 1.0 / np.tan(np.deg2rad(30.0))
    np.testing.assert_allclose(ndc[0], [0.0, 0.0, 3.0], atol=1e-5)
    np.testing.assert_allclose(ndc[1], [0.5 * s / 3.0, 0.0, 3.0], atol=1e-5)
    np.testing.assert_allclose(ndc[2], [0.0, -s / 3.0, 3.0], atol=1e-5)


def test_screen_mapping_orientation():
    """+X view-space appears LEFT, +Y appears UP (PyTorch3D NDC signs)."""
    cam = FoVPerspectiveCameras.create(T=jnp.array([[0.0, 0.0, 3.0]]))
    pts = jnp.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.0]])
    scr = transform_points_screen(cam, pts, (64, 64))[0]
    # Center of a 64x64 image: pixel (31.5, 31.5).
    np.testing.assert_allclose(scr[0, :2], [31.5, 31.5], atol=1e-4)
    assert scr[1, 0] < 31.5  # +x -> smaller pixel col (left)
    assert scr[1, 1] < 31.5  # +y -> smaller pixel row (up)


def test_look_at_view_transform_front():
    # dist=2, elev=0, azim=0 -> camera at (0,0,2) looking at origin down -z...
    R, T = look_at_view_transform(dist=2.0, elev=0.0, azim=0.0)
    # Origin maps to (0, 0, 2) in view space (2 units in front).
    v = jnp.zeros((1, 3)) @ R[0] + T[0]
    np.testing.assert_allclose(v, [[0.0, 0.0, 2.0]], atol=1e-6)
    # A point between camera and target is closer (smaller z_view).
    p = jnp.array([[0.0, 0.0, 1.0]]) @ R[0] + T[0]
    assert p[0, 2] < 2.0
    # Camera x-axis: for a camera at +z looking at origin, world +x maps to
    # view -x (right-handed, +X left in image means world +x is screen left).
    px = jnp.array([[1.0, 0.0, 0.0]]) @ R[0] + T[0]
    np.testing.assert_allclose(px[0, 0], -1.0, atol=1e-6)


def test_look_at_respects_at_offset():
    at = (0.0, 0.10, 0.25)
    R, T = look_at_view_transform(dist=2.10, elev=0.0, azim=0.0, at=(at,))
    v = jnp.array([at]) @ R[0] + T[0]
    np.testing.assert_allclose(v, [[0.0, 0.0, 2.10]], atol=1e-5)


def test_fixed_rig_shapes_and_determinism():
    cams = build_fixed_cameras(6, seed=3)
    assert len(cams) == 6
    assert cams.R.shape == (6, 3, 3)
    # R orthonormal.
    prod = jnp.einsum("nij,nkj->nik", cams.R, cams.R)
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), (6, 3, 3)),
                               atol=1e-5)
    np.testing.assert_allclose(cams.T, np.tile([0.0, 0.0, 3.0], (6, 1)))
    cams2 = build_fixed_cameras(6, seed=3)
    np.testing.assert_allclose(cams.R, cams2.R)


def test_random_rig_on_sphere():
    cams = build_random_cameras(32, seed=1)
    assert len(cams) == 32
    # Every camera sits at distance 2.10 from the look-at point.
    at = jnp.array([0.0, 0.10, 0.25])
    # Camera world position C satisfies X_view = (X - C) @ R -> C = -T @ R^T.
    C = -jnp.einsum("nj,nkj->nk", cams.T, cams.R)
    d = jnp.linalg.norm(C - at, axis=1)
    np.testing.assert_allclose(d, np.full(32, 2.10), atol=1e-4)


def test_camera_indexing():
    cams = build_fixed_cameras(6)
    one = cams[2]
    assert len(one) == 1
    np.testing.assert_allclose(one.R[0], cams.R[2])


def test_look_at_degenerate_up_along_z():
    """up parallel to a Z-axis view direction: the first fallback axis
    cross(Z, z_axis) is itself zero — the second fallback must still
    produce an orthonormal frame instead of zero columns."""
    from st3d.core.cameras import look_at_rotation

    R = np.asarray(look_at_rotation(
        ((0.0, 0.0, 5.0),), ((0.0, 0.0, 0.0),), ((0.0, 0.0, 1.0),)
    ))[0]
    # Orthonormal: R^T R == I (zero x/y columns would fail this hard).
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)
