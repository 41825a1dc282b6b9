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
    """Procedural icosphere fixture (delegates to the framework primitive,
    st3d.core.primitives.ico_sphere)."""
    from st3d.core.primitives import ico_sphere

    return ico_sphere(level=level, radius=radius)


@pytest.fixture
def quad_mesh():
    return make_quad_mesh()


@pytest.fixture
def sphere_mesh():
    return make_ico_sphere(level=1)
