"""faces_per_pixel > 1: top-K visibility + full SoftRas softmax-z
aggregation (SURVEY.md D4 soft-aggregation spec)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from st3d.core.cameras import FoVPerspectiveCameras
from st3d.render.rasterize import RasterizationSettings
from st3d.render.renderer import render_rgba
from st3d.render.topk import (
    rasterize_topk_bruteforce,
    rasterize_topk_xla,
)


def _cam(z=2.0):
    return FoVPerspectiveCameras.create(T=jnp.array([[0.0, 0.0, z]]))


def test_topk_order_and_occlusion():
    # Two stacked triangles covering the same pixels at different depths.
    near = [[2.0, 2.0, 1.5], [28.0, 2.0, 1.5], [2.0, 28.0, 1.5]]
    far = [[2.0, 2.0, 3.0], [28.0, 2.0, 3.0], [2.0, 28.0, 3.0]]
    fv = jnp.array([far, near])  # index 0 = far, 1 = near
    frags = rasterize_topk_bruteforce(fv, 32, k=3, window_px=1.0)
    ids = np.asarray(frags.pix_to_face)
    # Interior pixel: nearest first, then far, then empty.
    assert ids[8, 8, 0] == 1
    assert ids[8, 8, 1] == 0
    assert ids[8, 8, 2] == -1
    # Far-away background pixel: all empty.
    assert (ids[31, 31] == -1).all()


def test_topk_xla_matches_bruteforce(sphere_mesh):
    from st3d.render.rasterize import face_verts_screen

    fv = face_verts_screen(sphere_mesh.verts, sphere_mesh.faces, _cam(3.0), 32)[0]
    a = rasterize_topk_bruteforce(fv, 32, k=4, window_px=3.0)
    b = rasterize_topk_xla(fv, 32, 4, 3.0, face_chunk=7)
    np.testing.assert_array_equal(
        np.asarray(a.pix_to_face), np.asarray(b.pix_to_face)
    )


def test_softras_converges_to_hard(quad_mesh):
    hard = RasterizationSettings(image_size=32, backend="bruteforce")
    sr = RasterizationSettings(
        image_size=32, backend="bruteforce", soft=True, faces_per_pixel=4,
        soft_sigma_px=0.02, gamma=1e-4,
    )
    a = np.asarray(render_rgba(quad_mesh, _cam(), hard)[0])
    b = np.asarray(render_rgba(quad_mesh, _cam(), sr)[0])
    sharp = (b[..., 3] > 0.99) | (b[..., 3] < 0.01)
    np.testing.assert_allclose(
        b[sharp, :3], a[sharp, :3], atol=0.03
    )
    assert sharp.mean() > 0.95


def test_softras_blends_occluded_face():
    """With a large gamma the far face's color bleeds through — the defining
    property of softmax-z aggregation (a hard z-buffer cannot do this)."""
    from st3d.core.mesh import Mesh

    # Two big triangles: near is RED (u near 0), far is BLUE (u near 1).
    verts = jnp.array([
        [-2.0, -2.0, 0.0], [2.0, -2.0, 0.0], [-2.0, 2.0, 0.0],   # near
        [-2.0, -2.0, 1.0], [2.0, -2.0, 1.0], [-2.0, 2.0, 1.0],   # far
    ])
    faces = jnp.array([[0, 1, 2], [3, 4, 5]], jnp.int32)
    verts_uvs = jnp.array([[0.0, 0.5], [0.0, 0.5], [0.0, 0.5],
                           [1.0, 0.5], [1.0, 0.5], [1.0, 0.5]])
    tex = jnp.zeros((8, 8, 3)).at[:, :4, 0].set(1.0).at[:, 4:, 2].set(1.0)
    mesh = Mesh(verts=verts, faces=faces, verts_uvs=verts_uvs,
                faces_uvs=faces, texture=tex)
    cam = _cam(3.0)

    def red_blue(gamma):
        sr = RasterizationSettings(
            image_size=32, backend="bruteforce", soft=True,
            faces_per_pixel=2, soft_sigma_px=0.5, gamma=gamma,
        )
        rgba = np.asarray(render_rgba(mesh, cam, sr)[0])
        inside = rgba[..., 3] > 0.9
        return rgba[inside, 0].mean(), rgba[inside, 2].mean()

    r_sharp, b_sharp = red_blue(1e-4)   # winner-take-all -> pure red
    r_soft, b_soft = red_blue(0.5)      # large gamma -> blue bleeds in
    assert r_sharp > 0.95 and b_sharp < 0.05
    assert b_soft > 0.1 and r_soft < r_sharp


def test_softras_silhouette_gradients(quad_mesh):
    sr = RasterizationSettings(
        image_size=32, backend="bruteforce", soft=True, faces_per_pixel=4,
        soft_sigma_px=1.0, gamma=1e-2,
    )
    cam = _cam()

    def alpha_sum(verts):
        rgba = render_rgba(quad_mesh.replace(verts=verts), cam, sr)
        return jnp.sum(rgba[..., 3])

    g = jax.grad(alpha_sum)(quad_mesh.verts)
    assert float(jnp.abs(g).max()) > 0.01
    eps = 1e-2
    v = np.asarray(quad_mesh.verts)
    vp = v.copy(); vp[0, 0] -= eps
    vm = v.copy(); vm[0, 0] += eps
    fd = (alpha_sum(jnp.asarray(vp)) - alpha_sum(jnp.asarray(vm))) / (2 * eps)
    np.testing.assert_allclose(-float(fd), float(g[0, 0]), rtol=0.15)


def test_fpp_without_soft_renders_nearest(quad_mesh):
    """Hard faces_per_pixel>1 (PyTorch3D API surface) renders from the
    nearest slot: identical image to the plain hard path at blur=0."""
    k2 = RasterizationSettings(
        image_size=32, backend="bruteforce", faces_per_pixel=2
    )
    k1 = RasterizationSettings(image_size=32, backend="bruteforce")
    got = render_rgba(quad_mesh, _cam(), k2)
    want = render_rgba(quad_mesh, _cam(), k1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_topk_pallas_matches_bruteforce(sphere_mesh):
    from st3d.render.rasterize import face_verts_screen
    from st3d.kernels.raster_pallas import rasterize_pallas_topk

    fv = face_verts_screen(
        sphere_mesh.verts, sphere_mesh.faces, _cam(3.0), 32
    )
    want = rasterize_topk_bruteforce(fv[0], 32, k=4, window_px=3.0)
    got = rasterize_pallas_topk(fv, 32, 4, 3.0, face_chunk=16)
    np.testing.assert_array_equal(
        np.asarray(got[0]), np.asarray(want.pix_to_face)
    )


def test_softras_render_via_pallas_backend(quad_mesh):
    """The faces_per_pixel>1 renderer path through the pallas dispatch
    (interpret mode on CPU) matches the bruteforce path."""
    a = render_rgba(quad_mesh, _cam(), RasterizationSettings(
        image_size=32, backend="bruteforce", soft=True, faces_per_pixel=3))
    b = render_rgba(quad_mesh, _cam(), RasterizationSettings(
        image_size=32, backend="pallas", soft=True, faces_per_pixel=3))
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)
