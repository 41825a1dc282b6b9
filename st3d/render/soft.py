"""Soft (SoftRas-style) differentiable silhouette shading.

The hard rasterization path (and the reference at its blur_radius=0 /
faces_per_pixel=1 settings, first_approach.py:107) has ZERO gradients
w.r.t. vertex positions at silhouette boundaries: moving a vertex never
changes which pixels are covered, in the limit. This module implements the
soft-coverage formulation of Liu et al., "Soft Rasterizer" (PAPERS.md,
arXiv:1904.01786), adapted to this framework's "discrete selection in the
kernel, differentiable recompute in XLA" architecture:

  * the rasterizer's soft mode reports per pixel the face with the largest
    signed boundary distance (nearest face outside coverage, the covering
    face inside) — a discrete, non-differentiable selection;
  * this module recomputes the TRUE signed pixel distance to that face from
    the differentiable projected vertices, and blends
    ``alpha = sigmoid(d / sigma_px)`` between the face's texel color and the
    background.

Gradients then flow to vertices both through barycentric/UV interpolation
(as in the hard path) and through the sigmoid coverage — pixels just
outside a silhouette pull the edge outward, pixels just inside push it in.
As ``sigma_px -> 0`` the rendered image converges to the hard path.

The signed distance uses min-over-edges of the metric edge distances:
exact in edge regions, an underestimate in corner regions outside the
triangle (standard for this family of rasterizers).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from st3d.render.shading import (
    interpolate_face_attributes,
    recompute_barycentrics,
    sample_texture,
)


def signed_distance_to_faces(
    face_verts: jnp.ndarray,      # (F, 3, 3) screen verts (differentiable)
    face_ids: jnp.ndarray,        # (H, W) int32 (>= 0)
) -> jnp.ndarray:
    """(H, W) EXACT signed pixel distance of each pixel to its assigned
    face's boundary: positive inside (min distance to the edge lines),
    negative outside (minus the min distance to the edge SEGMENTS — the
    naive line distance wildly underestimates for pixels beyond an edge's
    endpoints, which produced phantom 0.5-alpha streaks along extended edge
    lines). Differentiable w.r.t. ``face_verts``."""
    h, w = face_ids.shape
    tri = face_verts[face_ids]  # (H, W, 3, 3)
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    py, px = jnp.meshgrid(ys, xs, indexing="ij")

    x0, y0 = tri[..., 0, 0], tri[..., 0, 1]
    x1, y1 = tri[..., 1, 0], tri[..., 1, 1]
    x2, y2 = tri[..., 2, 0], tri[..., 2, 1]
    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    sgn = jnp.sign(area)

    def edge_line_dist(xa, ya, xb, yb):
        cross = (xb - xa) * (py - ya) - (yb - ya) * (px - xa)
        length = jnp.sqrt((xb - xa) ** 2 + (yb - ya) ** 2) + 1e-12
        return sgn * cross / length

    def edge_segment_dist(xa, ya, xb, yb):
        ex, ey = xb - xa, yb - ya
        qx, qy = px - xa, py - ya
        t = jnp.clip(
            (qx * ex + qy * ey) / jnp.maximum(ex * ex + ey * ey, 1e-12),
            0.0, 1.0,
        )
        dx, dy = qx - t * ex, qy - t * ey
        return jnp.sqrt(dx * dx + dy * dy + 1e-20)

    l0 = edge_line_dist(x1, y1, x2, y2)
    l1 = edge_line_dist(x2, y2, x0, y0)
    l2 = edge_line_dist(x0, y0, x1, y1)
    inside_d = jnp.minimum(jnp.minimum(l0, l1), l2)

    s0 = edge_segment_dist(x1, y1, x2, y2)
    s1 = edge_segment_dist(x2, y2, x0, y0)
    s2 = edge_segment_dist(x0, y0, x1, y1)
    outside_d = jnp.minimum(jnp.minimum(s0, s1), s2)

    inside = inside_d >= 0.0
    return jnp.where(inside, inside_d, -outside_d)


def shade_soft(
    face_verts: jnp.ndarray,      # (F, 3, 3) screen verts (differentiable)
    pix_to_face: jnp.ndarray,     # (H, W) hard winner (-1 background)
    nearest_face: jnp.ndarray,    # (H, W) soft-mode nearest face (>= 0)
    verts_uvs: jnp.ndarray,
    faces_uvs: jnp.ndarray,
    texture: jnp.ndarray,
    sigma_px: float = 1.0,
    background_color: Tuple[float, float, float] = (1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """RGBA (H, W, 4) with sigmoid soft coverage as alpha.

    Covered pixels take their hard z-winner's texel (so interiors match the
    hard path exactly up to the sigmoid, which saturates a few sigma inside);
    uncovered pixels take the nearest face's texel, faded by alpha.
    """
    covered = pix_to_face >= 0
    fid = jnp.where(covered, pix_to_face, nearest_face)
    sd = signed_distance_to_faces(face_verts, fid)
    alpha = jax.nn.sigmoid(sd / sigma_px)

    bary = recompute_barycentrics(face_verts, fid)
    # Outside pixels have negative barycentrics; clamp + renormalize so the
    # sampled texel is the face's nearest-edge color (differentiable).
    bary = jnp.maximum(bary, 0.0)
    bary = bary / jnp.maximum(jnp.sum(bary, axis=-1, keepdims=True), 1e-8)
    face_uv = verts_uvs[faces_uvs]
    uv = interpolate_face_attributes(face_uv, fid, bary)
    rgb_face = sample_texture(texture, uv)

    bg = jnp.asarray(background_color, rgb_face.dtype)
    rgb = alpha[..., None] * rgb_face + (1.0 - alpha[..., None]) * bg
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)
