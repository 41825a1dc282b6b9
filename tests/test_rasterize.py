"""Rasterizer golden tests (SURVEY.md §4 items 1-3): coverage vs a NumPy
oracle, backend equivalence, depth resolve, winding, barycentric identities,
texture sampling conventions, and gradient checks (finite differences for
d/d texture and d/d verts through the differentiable epilogue)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from st3d.core.cameras import FoVPerspectiveCameras
from st3d.render.rasterize import (
    RasterizationSettings,
    face_verts_screen,
    rasterize_bruteforce,
    rasterize_xla,
)
from st3d.render.shading import (
    recompute_barycentrics,
    interpolate_face_attributes,
    sample_texture,
    shade_textured,
)
from st3d.render.renderer import render_meshes, render_rgba


def _numpy_coverage(tri, size):
    """Independent oracle: point-in-triangle by sign-consistent cross
    products, at pixel centers (x=j, y=i)."""
    cover = np.zeros((size, size), bool)
    (x0, y0), (x1, y1), (x2, y2) = tri
    for i in range(size):
        for j in range(size):
            px, py = float(j), float(i)
            d0 = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
            d1 = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
            d2 = (x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)
            neg = (d0 < 0) or (d1 < 0) or (d2 < 0)
            pos = (d0 > 0) or (d1 > 0) or (d2 > 0)
            cover[i, j] = not (neg and pos)
    return cover


def test_single_triangle_vs_numpy_oracle():
    size = 32
    tri = [(4.0, 4.0), (27.0, 6.0), (10.0, 25.0)]
    fv = jnp.array([[[tri[0][0], tri[0][1], 2.0],
                     [tri[1][0], tri[1][1], 2.0],
                     [tri[2][0], tri[2][1], 2.0]]])
    frags = rasterize_bruteforce(fv, size)
    got = np.asarray(frags.pix_to_face) == 0
    want = _numpy_coverage(tri, size)
    # Boundary pixels may differ by >=0 vs >0 convention; interior must match.
    disagree = got != want
    assert disagree.sum() <= 4
    assert got.sum() > 100  # the triangle is actually drawn


def test_reversed_winding_still_covered():
    size = 32
    fv = jnp.array([[[4.0, 4.0, 2.0], [27.0, 6.0, 2.0], [10.0, 25.0, 2.0]]])
    fv_rev = fv[:, ::-1]
    a = rasterize_bruteforce(fv, size).pix_to_face
    b = rasterize_bruteforce(fv_rev, size).pix_to_face
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_depth_resolve_nearer_wins():
    size = 16
    big_far = [[0.0, 0.0, 5.0], [15.0, 0.0, 5.0], [0.0, 15.0, 5.0]]
    small_near = [[2.0, 2.0, 2.0], [10.0, 2.0, 2.0], [2.0, 10.0, 2.0]]
    fv = jnp.array([big_far, small_near])
    frags = rasterize_bruteforce(fv, size)
    p2f = np.asarray(frags.pix_to_face)
    assert p2f[4, 4] == 1           # inside both -> nearer (face 1)
    assert p2f[1, 12] == 0          # only inside far face
    assert p2f[15, 15] == -1        # background
    z = np.asarray(frags.zbuf)
    assert abs(z[4, 4] - 2.0) < 1e-4
    assert abs(z[1, 12] - 5.0) < 1e-4


def test_behind_camera_and_degenerate_dropped():
    size = 16
    behind = [[0.0, 0.0, -1.0], [15.0, 0.0, -1.0], [0.0, 15.0, -1.0]]
    degen = [[3.0, 3.0, 2.0], [9.0, 9.0, 2.0], [6.0, 6.0, 2.0]]
    fv = jnp.array([behind, degen])
    frags = rasterize_bruteforce(fv, size)
    assert (np.asarray(frags.pix_to_face) == -1).all()


@pytest.mark.parametrize("size", [32, 64])
def test_xla_matches_bruteforce(sphere_mesh, size):
    cam = FoVPerspectiveCameras.create(T=jnp.array([[0.0, 0.0, 3.0]]))
    fv = face_verts_screen(sphere_mesh.verts, sphere_mesh.faces, cam, size)[0]
    a = rasterize_bruteforce(fv, size)
    b = rasterize_xla(fv, size)
    np.testing.assert_array_equal(
        np.asarray(a.pix_to_face), np.asarray(b.pix_to_face)
    )
    np.testing.assert_allclose(
        np.asarray(a.zbuf), np.asarray(b.zbuf), rtol=1e-5
    )


def test_xla_odd_face_count_padding():
    # 3 faces with chunk 2 exercises the padding path.
    fv = jnp.array(
        [
            [[0.0, 0.0, 2.0], [15.0, 0.0, 2.0], [0.0, 15.0, 2.0]],
            [[2.0, 2.0, 1.0], [6.0, 2.0, 1.0], [2.0, 6.0, 1.0]],
            [[8.0, 8.0, 3.0], [14.0, 8.0, 3.0], [8.0, 14.0, 3.0]],
        ]
    )
    a = rasterize_bruteforce(fv, 16)
    b = rasterize_xla(fv, 16, row_block=8, face_chunk=2)
    np.testing.assert_array_equal(np.asarray(a.pix_to_face),
                                  np.asarray(b.pix_to_face))


def test_barycentric_identities():
    """Sum to 1 on covered pixels; perspective-correct bary reproduce zbuf."""
    fv = jnp.array([[[2.0, 2.0, 2.0], [25.0, 4.0, 4.0], [6.0, 25.0, 3.0]]])
    frags = rasterize_bruteforce(fv, 32)
    bary = recompute_barycentrics(fv, frags.pix_to_face)
    mask = np.asarray(frags.pix_to_face) >= 0
    b = np.asarray(bary)[mask]
    np.testing.assert_allclose(b.sum(axis=1), 1.0, atol=1e-5)
    assert (b >= -1e-4).all()
    # Interpolating the corner z's with perspective-correct bary == zbuf.
    z = interpolate_face_attributes(fv[..., 2:3], frags.pix_to_face, bary)
    np.testing.assert_allclose(
        np.asarray(z)[..., 0][mask], np.asarray(frags.zbuf)[mask], rtol=1e-4
    )


def test_sample_texture_corners_and_vflip():
    tex = jnp.arange(4 * 4 * 3, dtype=jnp.float32).reshape(4, 4, 3) / 48.0
    # uv (0,0) = bottom-left texel = texture[3, 0] (align_corners=True).
    out = sample_texture(tex, jnp.array([[0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(tex)[3, 0])
    out = sample_texture(tex, jnp.array([[1.0, 1.0]]))
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(tex)[0, 3])
    # Midpoint is the average of the four center texels.
    out = sample_texture(tex, jnp.array([[0.5, 0.5]]))
    want = np.asarray(tex)[1:3, 1:3].mean(axis=(0, 1))
    np.testing.assert_allclose(np.asarray(out)[0], want, atol=1e-6)
    # Border padding: out-of-range uv clamps.
    out = sample_texture(tex, jnp.array([[-0.5, 0.0]]))
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(tex)[3, 0])


def test_render_quad_texture_orientation(quad_mesh):
    """Front-facing quad: the visible colors must respect the V flip —
    world top of the quad (v=1) shows texture row 0."""
    size = 64
    cam = FoVPerspectiveCameras.create(T=jnp.array([[0.0, 0.0, 2.0]]))
    settings = RasterizationSettings(image_size=size, backend="bruteforce")
    rgba = render_rgba(quad_mesh, cam, settings)[0]
    a = np.asarray(rgba)
    mask = a[..., 3] > 0
    assert 0.05 < mask.mean() < 0.9
    # Texture green channel = yy/(h-1): increases with texture row index,
    # i.e. DEcreases with v. Image top rows show the quad's top (v=1) ->
    # green ~ 0; image bottom rows show v=0 -> green ~ 1.
    rows = np.where(mask.any(axis=1))[0]
    top_green = a[rows[0] + 1][mask[rows[0] + 1]][:, 1].mean()
    bot_green = a[rows[-1] - 1][mask[rows[-1] - 1]][:, 1].mean()
    assert top_green < 0.2 and bot_green > 0.8


def test_render_meshes_shapes_and_mask(sphere_mesh):
    cam = FoVPerspectiveCameras.create(
        R=jnp.stack([jnp.eye(3)] * 2),
        T=jnp.array([[0.0, 0.0, 3.0], [0.0, 0.0, 4.0]]),
    )
    settings = RasterizationSettings(image_size=32, backend="xla")
    imgs, masks = render_meshes(sphere_mesh, cam, settings)
    assert imgs.shape == (2, 3, 32, 32)
    assert masks.shape == (2, 1, 32, 32)
    m = np.asarray(masks)
    assert set(np.unique(m)).issubset({0.0, 1.0})
    assert m[0].sum() > m[1].sum() > 0  # nearer camera covers more pixels
    # Background is white.
    bg = np.asarray(imgs)[0, :, m[0, 0] == 0]
    np.testing.assert_allclose(bg, 1.0)


def test_texture_gradient_localized(quad_mesh):
    """d loss / d texture is a bilinear scatter: nonzero, and only where
    texels are actually sampled."""
    size = 32
    cam = FoVPerspectiveCameras.create(T=jnp.array([[0.0, 0.0, 2.0]]))
    settings = RasterizationSettings(image_size=size, backend="bruteforce")

    def loss_fn(tex):
        mesh = quad_mesh.replace(texture=tex)
        rgba = render_rgba(mesh, cam, settings)
        return jnp.sum(rgba[..., :3])

    g = jax.grad(loss_fn)(quad_mesh.texture)
    g = np.asarray(g)
    assert g.sum() > 0
    # The full atlas is mapped by the quad -> most texels get gradient.
    assert (np.abs(g).sum(axis=-1) > 0).mean() > 0.5

    # Finite-difference check on one well-covered texel.
    # Loss is LINEAR in texture values (bilinear weights are fixed), so a
    # large eps gives an exact finite difference and beats f32 noise.
    idx = np.unravel_index(np.abs(g[..., 0]).argmax(), g[..., 0].shape)
    eps = 0.25
    tex0 = np.asarray(quad_mesh.texture)
    tp = tex0.copy(); tp[idx[0], idx[1], 0] += eps
    tm = tex0.copy(); tm[idx[0], idx[1], 0] -= eps
    fd = (loss_fn(jnp.asarray(tp)) - loss_fn(jnp.asarray(tm))) / (2 * eps)
    np.testing.assert_allclose(float(fd), g[idx[0], idx[1], 0], rtol=1e-2)


def test_vertex_gradient_through_barycentrics(quad_mesh):
    """d loss / d verts (texture fixed) flows through the bary recompute;
    finite differences agree (away from coverage flips this is smooth)."""
    size = 32
    cam = FoVPerspectiveCameras.create(T=jnp.array([[0.0, 0.0, 2.0]]))
    settings = RasterizationSettings(image_size=size, backend="bruteforce")
    frozen = render_rgba(quad_mesh, cam, settings)  # fixed rasterization? no:

    def loss_fn(verts):
        mesh = quad_mesh.replace(verts=verts)
        rgba = render_rgba(mesh, cam, settings)
        # Weighted sum makes the loss sensitive to *where* texels land.
        h = w = size
        wgt = jnp.linspace(0, 1, h)[:, None, None] * jnp.ones((h, w, 3))
        return jnp.sum(rgba[..., :3] * wgt)

    g = jax.grad(loss_fn)(quad_mesh.verts)
    assert float(jnp.abs(g).sum()) > 0
    # Finite difference on z of vertex 0 (moves projection smoothly).
    eps = 1e-3
    v0 = np.asarray(quad_mesh.verts)
    vp = v0.copy(); vp[0, 2] += eps
    vm = v0.copy(); vm[0, 2] -= eps
    fd = (loss_fn(jnp.asarray(vp)) - loss_fn(jnp.asarray(vm))) / (2 * eps)
    np.testing.assert_allclose(float(fd), float(g[0, 2]), rtol=0.08, atol=1e-3)
