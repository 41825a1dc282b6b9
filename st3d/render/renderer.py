"""MeshRenderer equivalent: camera batch in, images + masks out.

Replaces the reference's renderer construction (first_approach.py:106-114)
and its sequential per-view Python loop ``render_meshes``
(utils.py:65-77) with a single jitted, ``vmap``-over-views function: the
Python loop over cameras — one GPU kernel launch per view in the reference —
becomes one batched XLA program (SURVEY.md §3.5).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from st3d.core.mesh import Mesh
from st3d.core.cameras import FoVPerspectiveCameras
from st3d.render.rasterize import (
    RasterizationSettings,
    face_verts_screen,
    rasterize_batch,
)
from st3d.render.shading import shade_textured


def render_rgba(
    mesh: Mesh,
    cameras: FoVPerspectiveCameras,
    settings: RasterizationSettings,
) -> jnp.ndarray:
    """Render every camera; returns (N, H, W, 4) RGBA (white background,
    alpha = coverage) — the same observable output as the reference's
    ``renderer(meshes_world=mesh, cameras=cam)`` per view."""
    fv = face_verts_screen(
        mesh.verts, mesh.faces, cameras, settings.image_size
    )  # (N, F, 3, 3)

    if settings.soft and settings.faces_per_pixel > 1:
        # Full SoftRas: K faces per pixel, softmax-z color aggregation.
        from st3d.render.topk import rasterize_topk, shade_softras

        def one_view_k(fv_view):
            kfrags = rasterize_topk(fv_view, settings)
            return shade_softras(
                fv_view, kfrags.pix_to_face, mesh.verts_uvs,
                mesh.faces_uvs, mesh.texture,
                sigma_px=settings.soft_sigma_px, gamma=settings.gamma,
            )

        return jax.vmap(one_view_k)(fv)

    # Visibility for the whole view batch in one (natively batched) raster
    # call; only the differentiable shading epilogue is vmapped.
    frags = rasterize_batch(fv, settings)

    if settings.soft:
        from st3d.render.soft import shade_soft

        def one_view_soft(fv_view, p2f, near):
            return shade_soft(
                fv_view, p2f, near, mesh.verts_uvs, mesh.faces_uvs,
                mesh.texture, sigma_px=settings.soft_sigma_px,
            )

        return jax.vmap(one_view_soft)(
            fv, frags.pix_to_face, frags.nearest_face
        )

    def one_view(fv_view, p2f):
        return shade_textured(
            fv_view, p2f, mesh.verts_uvs, mesh.faces_uvs, mesh.texture
        )

    return jax.vmap(one_view)(fv, frags.pix_to_face)


def render_meshes(
    mesh: Mesh,
    cameras: FoVPerspectiveCameras,
    settings: RasterizationSettings,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference-shaped output (utils.py:65-77): images (N, 3, H, W) and
    binary masks (N, 1, H, W) with mask = (alpha > 0)."""
    rgba = render_rgba(mesh, cameras, settings)
    images = jnp.transpose(rgba[..., :3], (0, 3, 1, 2))
    masks = (rgba[..., 3:4] > 0).astype(images.dtype)
    masks = jnp.transpose(masks, (0, 3, 1, 2))
    return images, masks
