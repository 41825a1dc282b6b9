"""Test configuration: force an 8-virtual-device CPU backend.

Multi-chip sharding is validated without TPU hardware by faking 8 host
devices (the JAX-native "fake backend"; SURVEY.md §4 item 6). Must run
before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize force-selects platforms "axon,cpu" programmatically
# (overriding the env var), so switch the config back before any backend is
# initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite re-jits the same fused graphs in
# every process; warm runs skip most of the ~23 min of XLA compiles.
from st3d.utils.compilecache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


REFERENCE_ROOT = "/root/reference"


def make_quad_mesh():
    """Two triangles forming the unit square in the z=0 plane, with a full
    [0,1]^2 UV atlas — the minimal textured mesh for golden tests."""
    import jax.numpy as jnp
    from st3d.core.mesh import Mesh

    verts = jnp.array(
        [
            [-0.5, -0.5, 0.0],
            [0.5, -0.5, 0.0],
            [0.5, 0.5, 0.0],
            [-0.5, 0.5, 0.0],
        ],
        jnp.float32,
    )
    faces = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    verts_uvs = jnp.array(
        [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]], jnp.float32
    )
    faces_uvs = faces
    # A texture with distinct quadrant colors plus a gradient for bilinear
    # sampling tests.
    h = w = 16
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    tex = np.stack([xx / (w - 1), yy / (h - 1), np.full((h, w), 0.25)], axis=-1)
    return Mesh(
        verts=verts,
        faces=faces,
        verts_uvs=verts_uvs,
        faces_uvs=faces_uvs,
        texture=jnp.asarray(tex),
    ).with_topology()


def make_ico_sphere(level: int = 1, radius: float = 1.0):
    """Procedural icosphere with spherical UVs (test fixture; avoids copying
    reference asset files)."""
    import jax.numpy as jnp
    from st3d.core.mesh import Mesh

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
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        faces = np.array(new_faces, dtype=np.int64)
        verts = np.stack(verts)
    verts = verts / np.linalg.norm(verts, axis=1, keepdims=True) * radius

    # Spherical UVs (seams are fine for testing).
    u = 0.5 + np.arctan2(verts[:, 0], verts[:, 2]) / (2 * np.pi)
    v = 0.5 + np.arcsin(np.clip(verts[:, 1] / radius, -1, 1)) / np.pi
    uvs = np.stack([u, v], axis=1)

    h = w = 32
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


@pytest.fixture
def quad_mesh():
    return make_quad_mesh()


@pytest.fixture
def sphere_mesh():
    return make_ico_sphere(level=1)
