"""Auto-UV generation (teapot usability) and mesh padding (multi-mesh
static-shape batching, BASELINE config 5)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from st3d.core.uv import generate_uvs, pad_mesh
from st3d.core.cameras import FoVPerspectiveCameras
from st3d.render.rasterize import RasterizationSettings
from st3d.render.renderer import render_rgba

TEAPOT = "/root/reference/objects/teapot_mesh/teapot.obj"


@pytest.mark.parametrize("mode", ["sphere", "face_atlas"])
def test_generate_uvs_valid(sphere_mesh, mode):
    m = generate_uvs(sphere_mesh, mode=mode, texture_size=64)
    uvs = np.asarray(m.verts_uvs)
    assert uvs.min() >= 0.0 and uvs.max() <= 1.0 + 1e-6
    assert m.faces_uvs.shape == m.faces.shape
    assert m.texture.shape == (64, 64, 3)
    # Renderable and texture-optimizable.
    cam = FoVPerspectiveCameras.create(T=jnp.array([[0.0, 0.0, 3.0]]))
    settings = RasterizationSettings(image_size=32, backend="bruteforce")

    def loss(tex):
        rgba = render_rgba(m.replace(texture=tex), cam, settings)
        return jnp.sum(rgba[..., :3] ** 2)

    g = jax.grad(loss)(m.texture)
    assert float(jnp.abs(g).sum()) > 0


@pytest.mark.skipif(not os.path.isfile(TEAPOT), reason="teapot absent")
def test_teapot_becomes_optimizable():
    from st3d.io.obj import load_mesh

    mesh = load_mesh(TEAPOT, require_uvs=False)
    mesh = generate_uvs(mesh, mode="sphere", texture_size=128)
    cam = FoVPerspectiveCameras.create(T=jnp.array([[0.0, 0.0, 3.0]]))
    settings = RasterizationSettings(image_size=64, backend="xla")
    rgba = render_rgba(mesh, cam, settings)
    cov = float((rgba[..., 3] > 0).mean())
    assert cov > 0.05

    def loss(tex):
        out = render_rgba(mesh.replace(texture=tex), cam, settings)
        return jnp.sum(out[..., :3] ** 2)

    g = jax.grad(loss)(mesh.texture)
    # A healthy fraction of the atlas receives gradient.
    assert float((jnp.abs(g).sum(-1) > 0).mean()) > 0.05


def test_pad_mesh_render_identical(sphere_mesh):
    cam = FoVPerspectiveCameras.create(T=jnp.array([[0.0, 0.0, 3.0]]))
    settings = RasterizationSettings(image_size=48, backend="bruteforce")
    want = render_rgba(sphere_mesh, cam, settings)
    padded = pad_mesh(
        sphere_mesh,
        num_verts=sphere_mesh.verts.shape[0] + 37,
        num_faces=sphere_mesh.faces.shape[0] + 53,
        num_uvs=sphere_mesh.verts_uvs.shape[0] + 11,
    )
    got = render_rgba(padded, cam, settings)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pad_mesh_stack_and_vmap(sphere_mesh, quad_mesh):
    """Two different meshes padded to a common budget render under one vmap
    (static shapes — the config-5 batching mechanism)."""
    q = quad_mesh.replace(
        texture=jnp.broadcast_to(
            jnp.asarray([0.2, 0.4, 0.6]), (16, 16, 3)
        )
    )
    nv = max(sphere_mesh.verts.shape[0], q.verts.shape[0]) + 1
    nf = max(sphere_mesh.faces.shape[0], q.faces.shape[0]) + 1
    nt = max(sphere_mesh.verts_uvs.shape[0], q.verts_uvs.shape[0]) + 1
    ms = [
        pad_mesh(m.replace(topology=None), nv, nf, nt, texture_size=32)
        for m in (sphere_mesh, q)
    ]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ms)
    cam = FoVPerspectiveCameras.create(T=jnp.array([[0.0, 0.0, 3.0]]))
    settings = RasterizationSettings(image_size=32, backend="bruteforce")
    rgba = jax.vmap(lambda m: render_rgba(m, cam, settings))(stacked)
    assert rgba.shape == (2, 1, 32, 32, 4)
    cov = np.asarray(rgba[..., 3]).mean(axis=(1, 2, 3))
    assert cov[0] > 0.1 and cov[1] > 0.01
    single0 = render_rgba(ms[0], cam, settings)
    np.testing.assert_allclose(
        np.asarray(rgba[0]), np.asarray(single0), atol=1e-5
    )

def test_pad_budget_errors(sphere_mesh):
    with pytest.raises(ValueError, match="budget"):
        pad_mesh(sphere_mesh, num_verts=1, num_faces=1)


@pytest.mark.skipif(not os.path.isfile(TEAPOT), reason="teapot absent")
def test_teapot_pipeline_with_auto_uv(tmp_path):
    from st3d.engine.config import PipelineConfig
    from st3d.engine.pipelines import run_second_approach

    cfg = PipelineConfig(
        obj_path=TEAPOT,
        style_path="/root/reference/imgs/Style_1.jpg",
        n_views=2, batch_size=2, size=64, epochs=2,
        output_path=str(tmp_path / "tp"),
        raster_backend="xla", randomize_views=False,
        save_intermediate=False, auto_uv="sphere",
    )
    final = run_second_approach(cfg)
    assert os.path.isfile(tmp_path / "tp" / "final.obj")
    # The optimized teapot texture moved away from flat gray.
    assert float(jnp.abs(final.texture - 0.5).max()) > 1e-3
