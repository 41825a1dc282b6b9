"""The reference's public import surface exists and works: a user of
``EmaMule/2D-to-3D-Style-Transfer`` switching to this framework finds every
symbol their code imported (SURVEY.md §2.1 component inventory)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

REF = "/root/reference/objects/cow_mesh/cow.obj"


def test_reference_utils_surface():
    import utils

    for name in [
        "apply_background", "load_as_tensor", "get_vgg", "tensor_to_image",
        "render_meshes", "save_render", "finalize_mesh", "finalize_tensor",
        "build_fixed_cameras", "build_random_cameras",
        "setup_optimizations", "build_mesh",
    ]:
        assert hasattr(utils, name), name


def test_reference_losses_surface():
    import losses

    for name in [
        "compute_perceptual_loss", "rgb_range_loss", "compute_tv_loss",
        "compute_first_approach_loss", "compute_second_approach_loss",
        "mesh_edge_loss", "mesh_laplacian_smoothing",
        "mesh_normal_consistency", "gram_matrix",
    ]:
        assert hasattr(losses, name), name


def test_reference_style_transfer_surface():
    import style_transfer

    for name in ["get_features", "gram_matrix", "style_transfer"]:
        assert hasattr(style_transfer, name), name


@pytest.mark.skipif(not os.path.isfile(REF), reason="assets absent")
def test_reference_style_workflow(tmp_path, sphere_mesh):
    """A reference-user workflow through the compat surface end-to-end."""
    import losses
    import utils

    renderer = utils.make_renderer(image_size=32, backend="xla")
    cams = utils.build_fixed_cameras(2, shuffle=False)
    imgs, masks = utils.render_meshes(renderer, sphere_mesh, cams)
    assert imgs.shape == (2, 3, 32, 32)
    out = utils.apply_background(imgs, masks, background_type="white")
    assert out.shape == imgs.shape

    mesh2 = utils.finalize_mesh(sphere_mesh)
    assert float(jnp.max(mesh2.texture)) <= 1.0

    el = float(losses.mesh_edge_loss(sphere_mesh))
    assert el > 0
    assert float(losses.rgb_range_loss(sphere_mesh)) >= 0

    params, opt, opt_state = utils.setup_optimizations(
        "texture", sphere_mesh, lr=0.01
    )
    assert "texture" in params

    utils.save_render(renderer, sphere_mesh, cams, str(tmp_path / "r"))
    assert os.path.isfile(tmp_path / "r" / "view_0.png")
    assert os.path.isfile(tmp_path / "r" / "view_1.png")
