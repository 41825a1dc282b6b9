"""Reference-compatible utility module: every public name from the
reference's ``utils.py`` (its whole surface is imported star-style by the
drivers: ``from utils import *``, first_approach.py:11) maps to the st3d
equivalent with the same call semantics.

Differences from the underlying st3d APIs are adapter-level only:
``render_meshes``/``save_render`` take a RasterizationSettings instead of a
stateful renderer object (pass one built by :func:`make_renderer`), and
noise backgrounds take an optional explicit RNG (JAX is functional).
"""

from st3d.core.cameras import (  # noqa: F401
    build_fixed_cameras,
    build_random_cameras,
)
from st3d.core.mesh import build_mesh, finalize_mesh  # noqa: F401
from st3d.engine.background import apply_background  # noqa: F401
from st3d.engine.optim import setup_optimizations  # noqa: F401
from st3d.io.image import load_as_tensor, tensor_to_image  # noqa: F401
from st3d.models.vgg import get_vgg  # noqa: F401
from st3d.render.rasterize import RasterizationSettings  # noqa: F401
from st3d.render.renderer import render_meshes as _render_meshes
from st3d.engine.pipelines import save_render as _save_render

import jax.numpy as jnp


def finalize_tensor(tensor):
    """Clamp to [0, 1] (reference utils.py:116-118; detach is a no-op for
    jax arrays)."""
    return jnp.clip(tensor, 0.0, 1.0)


def make_renderer(image_size: int = 512, backend: str = "auto",
                  **kw) -> RasterizationSettings:
    """The renderer 'object' of this framework is just its settings pytree
    (replaces the reference's MeshRenderer construction,
    first_approach.py:106-114)."""
    return RasterizationSettings(image_size=image_size, backend=backend, **kw)


def render_meshes(renderer, meshes, cameras):
    """(B, 3, H, W) images + (B, 1, H, W) masks (reference utils.py:65-77).

    ``renderer`` is a RasterizationSettings (see make_renderer)."""
    return _render_meshes(meshes, cameras, renderer)


def save_render(renderer, meshes, cameras, path):
    """Render every camera and save view_{i}.png (reference utils.py:81-91)."""
    _save_render(meshes, cameras, renderer, path)
