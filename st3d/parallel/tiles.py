"""Image-tile sharding: one render spread across chips by pixel rows.

The scaling axis the reference lacks entirely (SURVEY.md §5 "Long-context /
sequence parallelism": the analogue of sequence length here is render
resolution). For 1024²+ renders a single view's pixel x face interaction is
split by ROWS across the device mesh: every chip holds the full (small) face
set and rasterizes + shades only its row band — pixel ownership is
exclusive, so composition is halo-free concatenation, and texture gradients
from each band are partial sums that ``shard_map``'s transpose reduces over
ICI automatically (replicated-input cotangents are psummed).

The row shift rides on the geometry: rasterizing rows [r0, r1) of the full
image equals rasterizing a (r1-r0)-row image after subtracting r0 from the
projected y coordinates (everything downstream is affine in y).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from st3d.core.mesh import Mesh as TriMesh
from st3d.render.rasterize import (
    RasterizationSettings,
    face_verts_screen,
    rasterize_batch,
)
from st3d.render.shading import shade_textured

TILE_AXIS = "tiles"


def make_tile_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (TILE_AXIS,))


def render_rgba_tiled(
    mesh: TriMesh,
    cameras,
    settings: RasterizationSettings,
    tile_mesh: Mesh,
) -> jnp.ndarray:
    """(N_cams, H, W, 4) RGBA, computed with rows sharded across devices.

    Differentiable w.r.t. mesh.texture and mesh.verts exactly like the
    single-device renderer (shard_map transpose sums the per-band partial
    gradients of the replicated inputs over ICI).
    """
    # The tiled epilogue shades hard K=1 (shade_textured on pix_to_face);
    # soft/blur/multi-K settings would silently render a DIFFERENT image
    # than the single-device renderer this path claims bit-identity with.
    if settings.soft or settings.blur_radius > 0 or \
            settings.faces_per_pixel > 1:
        raise ValueError(
            "tile-parallel rendering requires hard K=1 rasterization "
            f"(got soft={settings.soft}, blur_radius="
            f"{settings.blur_radius}, faces_per_pixel="
            f"{settings.faces_per_pixel}); render without --tile_parallel "
            "for soft or blurred rasterization"
        )
    n_dev = tile_mesh.devices.size
    h = settings.image_size
    if h % n_dev:
        raise ValueError(
            f"image_size {h} must divide across {n_dev} devices"
        )
    rows = h // n_dev

    fv = face_verts_screen(mesh.verts, mesh.faces, cameras, h)  # (N, F, 3, 3)

    def band(fv_rep, verts_uvs, faces_uvs, texture):
        r0 = jax.lax.axis_index(TILE_AXIS) * rows
        shift = jnp.array([0.0, 1.0, 0.0]) * r0
        fv_local = fv_rep - shift  # y -= r0
        frags = rasterize_batch(fv_local, settings, image_height=rows)

        def one_view(fvv, p2f):
            return shade_textured(fvv, p2f, verts_uvs, faces_uvs, texture)

        return jax.vmap(one_view)(fv_local, frags.pix_to_face)

    sharded = jax.shard_map(
        band,
        mesh=tile_mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(None, TILE_AXIS),   # rows concatenated over devices
        check_vma=False,
    )
    return sharded(fv, mesh.verts_uvs, mesh.faces_uvs, mesh.texture)


def pick_tile_count(image_size: int, n_devices: int) -> int:
    """Largest device count <= n_devices whose row bands tile image_size."""
    n = max(1, min(n_devices, image_size))
    while image_size % n:
        n -= 1
    return n


def render_meshes_tiled(
    mesh: TriMesh,
    cameras,
    settings: RasterizationSettings,
    tile_mesh: Optional[Mesh] = None,
) -> tuple:
    """``render_meshes``-shaped output ((N, 3, H, W) images, (N, 1, H, W)
    masks) computed with pixel rows sharded across devices — the
    ``--tile_parallel`` CLI path for 1024²+ renders (SURVEY.md §5's
    "sequence parallelism" axis). Bit-identical to the single-device
    renderer: row ownership is exclusive and the rasterizer is
    deterministic per pixel."""
    if tile_mesh is None:
        tile_mesh = make_tile_mesh(
            pick_tile_count(settings.image_size, len(jax.devices()))
        )
    rgba = render_rgba_tiled(mesh, cameras, settings, tile_mesh)
    images = jnp.transpose(rgba[..., :3], (0, 3, 1, 2))
    masks = (rgba[..., 3:4] > 0).astype(images.dtype)
    return images, jnp.transpose(masks, (0, 3, 1, 2))
