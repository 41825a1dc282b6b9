"""Procedural mesh primitives.

``ico_sphere`` mirrors the capability of ``pytorch3d.utils.ico_sphere``
(the reference's dependency stack ships one; SURVEY.md D1-D2 ecosystem) —
a subdivided icosahedron with spherical UVs and a gradient texture, used
by tests and the face-count scaling bench as a parameter-free mesh source
at any face budget (level L -> 20·4^L faces).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from st3d.core.mesh import Mesh


def ico_sphere(level: int = 1, radius: float = 1.0,
               texture_size: int = 32) -> Mesh:
    """Subdivided icosahedron with spherical UVs (seams acceptable)."""
    t = (1.0 + 5 ** 0.5) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        dtype=np.float64,
    )
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        dtype=np.int64,
    )
    for _ in range(level):
        mid_cache = {}
        new_faces = []
        verts = list(map(np.asarray, verts))

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in mid_cache:
                verts.append((verts[a] + verts[b]) / 2.0)
                mid_cache[key] = len(verts) - 1
            return mid_cache[key]

        for f in faces:
            a, b, c = int(f[0]), int(f[1]), int(f[2])
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc],
                          [ab, bc, ca]]
        faces = np.array(new_faces, dtype=np.int64)
        verts = np.stack(verts)
    verts = verts / np.linalg.norm(verts, axis=1, keepdims=True) * radius

    u = 0.5 + np.arctan2(verts[:, 0], verts[:, 2]) / (2 * np.pi)
    v = 0.5 + np.arcsin(np.clip(verts[:, 1] / radius, -1, 1)) / np.pi
    uvs = np.stack([u, v], axis=1)

    h = w = texture_size
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    tex = np.stack(
        [xx / (w - 1), 1.0 - yy / (h - 1), 0.5 * np.ones((h, w))], axis=-1
    )
    return Mesh(
        verts=jnp.asarray(verts, jnp.float32),
        faces=jnp.asarray(faces, jnp.int32),
        verts_uvs=jnp.asarray(uvs, jnp.float32),
        faces_uvs=jnp.asarray(faces, jnp.int32),
        texture=jnp.asarray(tex),
    ).with_topology()
