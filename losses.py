"""Reference-compatible loss module: the full public surface of the
reference's ``losses.py`` (imported star-style by the drivers,
first_approach.py:12) plus the pytorch3d.loss functions it re-exported
(losses.py:3), all backed by st3d's pure-JAX implementations."""

from st3d.ops.losses import (  # noqa: F401
    compute_first_approach_loss,
    compute_perceptual_loss,
    compute_second_approach_loss,
    compute_tv_loss,
    gram_matrix,
    mesh_edge_loss,
    mesh_laplacian_smoothing,
    mesh_normal_consistency,
)
from st3d.ops.losses import rgb_range_loss as _rgb_range_loss


def rgb_range_loss(mesh):
    """Reference signature takes the mesh and reads its texture
    (losses.py:47-51)."""
    return _rgb_range_loss(mesh.texture)
