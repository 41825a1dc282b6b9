"""UV generation and mesh padding utilities.

``generate_uvs`` makes UV-less meshes texture-optimizable: the reference
hard-crashes on teapot.obj (0 ``vt`` lines, no .mtl —
first_approach.py:88; SURVEY.md §5 "Failure detection"). Two modes:

  * ``"sphere"``: spherical projection from the bounding-sphere center.
    Fast, continuous except at the azimuth seam; the seam is cut by
    duplicating UV coordinates per face corner where the face wraps.
  * ``"face_atlas"``: every face gets its own isolated triangle in a
    square grid atlas — no seams, no texel sharing, works for any topology
    (at the cost of texture-space discontinuities between faces).

``pad_mesh`` pads a mesh to fixed vertex/face/texture budgets so multiple
meshes can be stacked and vmapped/pmapped with static shapes
(SURVEY.md §7 hard part 3; BASELINE config 5 batches 4 meshes x 5 styles).
Padding faces are degenerate (all corners = vertex 0 with zero-area UVs) and
are dropped by the rasterizer's validity mask.
"""

from __future__ import annotations

import math
import numpy as np
import jax.numpy as jnp

from st3d.core.mesh import Mesh


def generate_uvs(mesh: Mesh, mode: str = "sphere",
                 texture_size: int = 512) -> Mesh:
    """Return a copy of ``mesh`` with synthesized verts_uvs/faces_uvs and a
    fresh mid-gray texture (ready for optimization)."""
    verts = np.asarray(mesh.verts, np.float64)
    faces = np.asarray(mesh.faces, np.int64)

    if mode == "sphere":
        center = (verts.min(0) + verts.max(0)) / 2.0
        d = verts - center
        r = np.maximum(np.linalg.norm(d, axis=1), 1e-12)
        u = 0.5 + np.arctan2(d[:, 0], d[:, 2]) / (2 * math.pi)  # azimuth
        v = 0.5 + np.arcsin(np.clip(d[:, 1] / r, -1, 1)) / math.pi
        uvs = np.stack([u, v], axis=1)
        faces_uvs = faces.copy()
        # Cut the azimuth seam: faces spanning the u-wraparound get
        # duplicated UV verts shifted by +1 so interpolation never crosses
        # the atlas, then ALL u values are rescaled back into [0, 1]
        # (the sampler clamps to the border — clamping the duplicates at
        # u=1.0 instead would compress each seam face's wrapped span into
        # a sliver of the atlas edge and starve it of texels).
        extra_uvs = []
        fu = uvs[faces_uvs][:, :, 0]  # (F, 3)
        wrap = (fu.max(1) - fu.min(1)) > 0.5
        for fi in np.nonzero(wrap)[0]:
            for k in range(3):
                if uvs[faces_uvs[fi, k], 0] < 0.5:
                    src = uvs[faces_uvs[fi, k]]
                    extra_uvs.append([src[0] + 1.0, src[1]])
                    faces_uvs[fi, k] = len(uvs) + len(extra_uvs) - 1
        if extra_uvs:
            uvs = np.concatenate([uvs, np.asarray(extra_uvs)], axis=0)
            umax = uvs[:, 0].max()
            if umax > 1.0:  # uniform squeeze keeps texel density EVEN
                uvs[:, 0] /= umax
    elif mode == "face_atlas":
        f = len(faces)
        grid = int(math.ceil(math.sqrt(f)))
        cell = 1.0 / grid
        margin = cell * 0.05
        uvs = np.zeros((f * 3, 2))
        for i in range(f):
            gx, gy = i % grid, i // grid
            x0, y0 = gx * cell + margin, gy * cell + margin
            s = cell - 2 * margin
            uvs[3 * i + 0] = (x0, y0)
            uvs[3 * i + 1] = (x0 + s, y0)
            uvs[3 * i + 2] = (x0, y0 + s)
        faces_uvs = np.arange(f * 3, dtype=np.int64).reshape(f, 3)
    else:
        raise ValueError(f"unknown uv mode {mode!r}")

    texture = jnp.full((texture_size, texture_size, 3), 0.5, jnp.float32)
    return mesh.replace(
        verts_uvs=jnp.asarray(uvs, jnp.float32),
        faces_uvs=jnp.asarray(faces_uvs, jnp.int32),
        texture=texture,
    )


def pad_mesh(mesh: Mesh, num_verts: int, num_faces: int,
             num_uvs: int = None, texture_size: int = None) -> Mesh:
    """Pad to static budgets for multi-mesh stacking.

    Padding faces reference vertex 0 three times -> zero screen area ->
    dropped by every rasterizer backend's validity mask; padded verts sit at
    vertex 0's position so they never extend the silhouette. The texture is
    bilinearly resized when a target size is given. Topology is preserved
    (regularizers see only real geometry).
    """
    v, f = mesh.verts.shape[0], mesh.faces.shape[0]
    t = mesh.verts_uvs.shape[0]
    if num_verts < v or num_faces < f:
        raise ValueError(
            f"budgets ({num_verts} verts, {num_faces} faces) below actual "
            f"({v}, {f})"
        )
    num_uvs = num_uvs if num_uvs is not None else t
    if num_uvs < t:
        raise ValueError(f"uv budget {num_uvs} below actual {t}")

    verts = jnp.concatenate(
        [mesh.verts,
         jnp.broadcast_to(mesh.verts[:1], (num_verts - v, 3))]
    )
    faces = jnp.concatenate(
        [mesh.faces, jnp.zeros((num_faces - f, 3), jnp.int32)]
    )
    verts_uvs = jnp.concatenate(
        [mesh.verts_uvs,
         jnp.zeros((num_uvs - t, 2), jnp.float32)]
    )
    faces_uvs = jnp.concatenate(
        [mesh.faces_uvs, jnp.zeros((num_faces - f, 3), jnp.int32)]
    )
    texture = mesh.texture
    if texture_size is not None and (
        texture.shape[0] != texture_size or texture.shape[1] != texture_size
    ):  # check BOTH dims: a non-square map_Kd whose height happens to
        # match would otherwise skip the resize and break the fleet stack
        import jax.image

        texture = jax.image.resize(
            texture, (texture_size, texture_size, 3), "bilinear"
        )
    return mesh.replace(
        verts=verts, faces=faces, verts_uvs=verts_uvs, faces_uvs=faces_uvs,
        texture=texture,
    )
