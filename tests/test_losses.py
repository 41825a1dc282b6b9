"""Loss formulas vs a literal NumPy oracle of the reference's math
(SURVEY.md §4 item 1), including the unnormalized Gram and the C²·H²
style-divisor quirk, plus mesh-regularizer sanity checks."""

import numpy as np
import jax.numpy as jnp
import pytest

from st3d.core.mesh import Mesh, compute_topology
from st3d.models.vgg import get_features, init_random_vgg19
from st3d.ops.losses import (
    StyleContentTargets,
    compute_first_approach_loss,
    compute_perceptual_loss,
    compute_tv_loss,
    gram_matrix,
    mesh_edge_loss,
    mesh_laplacian_smoothing,
    mesh_normal_consistency,
    mse_loss,
    rgb_range_loss,
    style_content_loss,
)


def numpy_gram(t):
    b, d, h, w = t.shape
    t = t.reshape(b, d, h * w)
    return np.einsum("bcn,bdn->bcd", t, t)


def numpy_style_content_loss(cur_feats, content_feats, style_feats, sw, cw):
    """Literal replica of style_transfer.py:65-76."""
    content_loss = np.mean((cur_feats["conv4_2"] - content_feats["conv4_2"]) ** 2)
    style_loss = 0.0
    for layer in ["conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1"]:
        g = numpy_gram(cur_feats[layer])
        gs = numpy_gram(style_feats[layer])
        layer_loss = np.mean((g - gs) ** 2)
        # THE quirk: divisor is shape[1]**2 * shape[2]**2 = C^2 * H^2.
        c, h = cur_feats[layer].shape[1], cur_feats[layer].shape[2]
        style_loss += layer_loss / (c ** 2 * h ** 2)
    return cw * content_loss + sw * style_loss


def test_gram_unnormalized():
    t = np.random.RandomState(0).rand(2, 3, 4, 5).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(gram_matrix(jnp.asarray(t))), numpy_gram(t), rtol=1e-5
    )


def test_perceptual_loss_vs_numpy_oracle():
    model = init_random_vgg19(seed=0)
    rng = np.random.RandomState(1)
    cur = rng.rand(2, 3, 32, 32).astype(np.float32)
    con = rng.rand(2, 3, 32, 32).astype(np.float32)
    sty = rng.rand(2, 3, 32, 32).astype(np.float32)

    feats = {
        name: {k: np.asarray(v) for k, v in
               get_features(jnp.asarray(arr), model).items()}
        for name, arr in [("cur", cur), ("con", con), ("sty", sty)]
    }
    want = numpy_style_content_loss(
        feats["cur"], feats["con"], feats["sty"], sw=1e6, cw=1.0
    )
    got = compute_perceptual_loss(
        jnp.asarray(cur), jnp.asarray(con), jnp.asarray(sty), model,
        style_weight=1e6, content_weight=1.0,
    )
    np.testing.assert_allclose(float(got), want, rtol=2e-4)

    # Precomputed-targets path gives the same number.
    targets = StyleContentTargets.create(
        jnp.asarray(con), jnp.asarray(sty), model
    )
    got2 = style_content_loss(
        get_features(jnp.asarray(cur), model), targets, 1e6, 1.0
    )
    np.testing.assert_allclose(float(got2), float(got), rtol=1e-6)


def test_first_approach_loss_texture_masks_and_ignores_main_weight():
    rng = np.random.RandomState(0)
    rendered = jnp.asarray(rng.rand(2, 3, 8, 8), jnp.float32)
    target = jnp.asarray(rng.rand(2, 3, 8, 8), jnp.float32)
    masks = jnp.asarray((rng.rand(2, 1, 8, 8) > 0.5), jnp.float32)
    weights = {"main_loss_weight": 3.0, "mesh_verts_weight": 1.0,
               "mesh_edge_loss_weight": 1.0,
               "mesh_laplacian_smoothing_weight": 1.0,
               "mesh_normal_consistency_weight": 1.0}
    got = compute_first_approach_loss(
        rendered, masks, target, None, None, None, weights, "texture"
    )
    want = np.mean(
        (np.asarray(rendered * masks) - np.asarray(target * masks)) ** 2
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-6)


def _flat_grid_mesh(n=3):
    """(n+1)^2 verts in a plane, consistent winding; normal consistency 0."""
    verts = []
    for i in range(n + 1):
        for j in range(n + 1):
            verts.append([i, j, 0.0])
    faces = []
    for i in range(n):
        for j in range(n):
            a = i * (n + 1) + j
            b = a + 1
            c = a + (n + 1)
            d = c + 1
            faces.append([a, b, d])
            faces.append([a, d, c])
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int32)
    topo = compute_topology(faces, len(verts))
    return Mesh(
        verts=jnp.asarray(verts), faces=jnp.asarray(faces),
        verts_uvs=jnp.zeros((1, 2)), faces_uvs=jnp.zeros_like(jnp.asarray(faces)),
        texture=jnp.zeros((2, 2, 3)), topology=topo,
    )


def test_mesh_edge_loss_unit_square():
    mesh = _flat_grid_mesh(1)  # unit square: 4 boundary edges len 1, 1 diag √2
    got = float(mesh_edge_loss(mesh))
    want = (4 * 1.0 + 1 * 2.0) / 5.0  # mean of squared lengths
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_laplacian_zero_interior_of_regular_grid():
    # For a flat plane, Laplacian displacement is in-plane but zero only for
    # symmetric neighborhoods; just check flat plane gives small loss that
    # drops to ~0 when verts are centroids of their neighbors; and that a
    # spike raises it.
    mesh = _flat_grid_mesh(3)
    base = float(mesh_laplacian_smoothing(mesh))
    spiked = np.asarray(mesh.verts).copy()
    spiked[5, 2] = 2.0  # push an interior vertex out of plane
    worse = float(mesh_laplacian_smoothing(mesh.replace(verts=jnp.asarray(spiked))))
    assert worse > base


def test_laplacian_exact_on_path_graph():
    # 3 verts in a line sharing one triangle... use a single triangle:
    # every vertex has 2 neighbors; L v_i = (v_j + v_k)/2 - v_i.
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    topo = compute_topology(faces, 3)
    mesh = Mesh(
        verts=jnp.asarray(verts), faces=jnp.asarray(faces),
        verts_uvs=jnp.zeros((1, 2)), faces_uvs=jnp.zeros((1, 3), jnp.int32),
        texture=jnp.zeros((2, 2, 3)), topology=topo,
    )
    lap = []
    for i in range(3):
        others = [j for j in range(3) if j != i]
        lap.append(np.linalg.norm(verts[others].mean(axis=0) - verts[i]))
    np.testing.assert_allclose(
        float(mesh_laplacian_smoothing(mesh)), np.mean(lap), rtol=1e-6
    )


def test_normal_consistency_flat_vs_folded():
    mesh = _flat_grid_mesh(2)
    np.testing.assert_allclose(float(mesh_normal_consistency(mesh)), 0.0,
                               atol=1e-6)
    # Fold: two triangles sharing edge (0,2) of a unit square, one folded up
    # by 90° -> 1 - cos(90°) = 1.
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 1]], np.float32
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    topo = compute_topology(faces, 4)
    folded = Mesh(
        verts=jnp.asarray(verts), faces=jnp.asarray(faces),
        verts_uvs=jnp.zeros((1, 2)), faces_uvs=jnp.zeros_like(jnp.asarray(faces)),
        texture=jnp.zeros((2, 2, 3)), topology=topo,
    )
    val = float(mesh_normal_consistency(folded))
    # The dihedral here: face normals are (0,0,1) and fold plane; angle 45°
    # off? Just assert it is clearly positive and < 2.
    assert 0.05 < val < 2.0


def test_dead_losses_surface():
    tex = jnp.asarray([[-0.5, 0.5, 1.5]])
    np.testing.assert_allclose(float(rgb_range_loss(tex)), 1.0, rtol=1e-6)
    imgs = jnp.ones((1, 3, 4, 4))
    masks = jnp.ones((1, 1, 4, 4))
    np.testing.assert_allclose(float(compute_tv_loss(imgs, masks)), 0.0)


def test_requires_topology_error():
    mesh = _flat_grid_mesh(1).replace(topology=None)
    with pytest.raises(ValueError, match="topology"):
        mesh_edge_loss(mesh)


def test_style_divisor_no_int32_overflow():
    """Regression: c**2 * h**2 overflows int32 at the reference's default
    768**2 size (conv1_1: 64**2 * 768**2 = 2.4e9). Synthetic features with
    h=768 (tiny w keeps it cheap) must not raise."""
    import jax

    from st3d.ops.losses import STYLE_LAYERS, CONTENT_LAYER, StyleContentTargets

    feats = {}
    grams = {}
    shapes = {}
    rng = np.random.RandomState(0)
    for layer in STYLE_LAYERS:
        f = jnp.asarray(rng.rand(1, 64, 768, 2), jnp.float32)
        feats[layer] = f
        grams[layer] = gram_matrix(f)
        shapes[layer] = tuple(f.shape)
    feats[CONTENT_LAYER] = jnp.asarray(rng.rand(1, 8, 4, 4), jnp.float32)
    targets = StyleContentTargets(
        content_features=feats[CONTENT_LAYER],
        style_grams=grams,
        feature_shapes=shapes,
    )
    val = jax.jit(
        lambda f: style_content_loss(f, targets, 1e6, 1.0)
    )(feats)
    assert np.isfinite(float(val))
