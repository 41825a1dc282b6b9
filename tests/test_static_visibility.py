"""Static-visibility fast path: hoisting the (discrete) rasterization out
of texture-only hot loops must be EXACT — same images, same texture
gradients — for all three shading modes."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from st3d.core.cameras import build_fixed_cameras
from st3d.render.rasterize import RasterizationSettings
from st3d.render.renderer import (
    precompute_visibility,
    render_rgba,
    render_rgba_static,
)

from conftest import make_quad_mesh

REF = "/root/reference"
HAVE = os.path.isfile(f"{REF}/objects/cow_mesh/cow.obj")


def _settings(mode):
    if mode == "hard":
        return RasterizationSettings(image_size=64, backend="xla")
    if mode == "soft":
        return RasterizationSettings(
            image_size=64, backend="xla", soft=True, soft_sigma_px=1.5
        )
    if mode == "softras_k":
        return RasterizationSettings(
            image_size=64, backend="xla", soft=True, soft_sigma_px=1.5,
            faces_per_pixel=4,
        )
    raise ValueError(mode)


def _tilted_quad():
    """Quad rotated off the pixel grid: the axis-aligned quad has exact
    depth/coverage ties at pixel centers, where the (benign) fp difference
    between two separately-compiled projection programs flips boundary
    pixels — a property of the degenerate geometry, not of the fast path."""
    mesh = make_quad_mesh()
    # Bend: the flat quad's two triangles are coplanar, so their depths tie
    # EXACTLY wherever both are top-K candidates and the order is fp noise.
    verts = mesh.verts + jnp.array(
        [[0, 0, 0], [0, 0, 0.11], [0, 0, 0], [0, 0, -0.17]], jnp.float32
    )
    a, b = 0.37, 0.21
    rz = jnp.array([[jnp.cos(a), -jnp.sin(a), 0],
                    [jnp.sin(a), jnp.cos(a), 0], [0, 0, 1]], jnp.float32)
    ry = jnp.array([[jnp.cos(b), 0, jnp.sin(b)], [0, 1, 0],
                    [-jnp.sin(b), 0, jnp.cos(b)]], jnp.float32)
    return mesh.replace(verts=verts @ (rz @ ry).T)


@pytest.mark.parametrize("mode", ["hard", "soft", "softras_k"])
def test_static_matches_dynamic_images_and_grads(mode):
    mesh = _tilted_quad()
    cams = build_fixed_cameras(2, shuffle=False)
    settings = _settings(mode)

    vis = jax.jit(lambda m: precompute_visibility(m, cams, settings))(mesh)

    dyn = jax.jit(lambda m: render_rgba(m, cams, settings))(mesh)
    sta = jax.jit(lambda m: render_rgba_static(m, vis, settings))(mesh)
    np.testing.assert_allclose(
        np.asarray(sta), np.asarray(dyn), atol=1e-6
    )

    # Texture gradients through both paths agree (the only trainable leaf
    # on this path).
    def loss_dyn(tex):
        return jnp.sum(
            render_rgba(mesh.replace(texture=tex), cams, settings) ** 2
        )

    def loss_sta(tex):
        return jnp.sum(
            render_rgba_static(mesh.replace(texture=tex), vis, settings) ** 2
        )

    g_dyn = jax.jit(jax.grad(loss_dyn))(mesh.texture)
    g_sta = jax.jit(jax.grad(loss_sta))(mesh.texture)
    # Tolerance: the two paths are separately-compiled XLA programs, so the
    # projected coords differ by fma-fusion noise (~4e-6 px), which the soft
    # modes' exponential weights amplify into ~1e-4-relative grad jitter.
    np.testing.assert_allclose(
        np.asarray(g_sta), np.asarray(g_dyn), atol=1e-5, rtol=1e-3
    )
    assert float(jnp.abs(g_sta).max()) > 0  # gradients actually flow


def test_compact_matches_full_static():
    """Covered-pixel compaction is bit-exact vs the full-frame static path
    (same gathers/lerps on covered pixels; background from the same
    constant)."""
    from st3d.render.renderer import compact_visibility

    mesh = _tilted_quad()
    cams = build_fixed_cameras(2, shuffle=False)
    settings = _settings("hard")
    vis = jax.jit(lambda m: precompute_visibility(m, cams, settings))(mesh)
    cvis = compact_visibility(vis)
    assert set(cvis) == {"chunk_idx", "uv_cov", "cov8", "mask"}

    full = jax.jit(lambda m: render_rgba_static(m, vis, settings))(mesh)
    comp = jax.jit(lambda m: render_rgba_static(m, cvis, settings))(mesh)
    np.testing.assert_array_equal(np.asarray(comp), np.asarray(full))

    def loss(tex, v):
        return jnp.sum(
            render_rgba_static(mesh.replace(texture=tex), v, settings) ** 2
        )

    g_full = jax.jit(jax.grad(lambda t: loss(t, vis)))(mesh.texture)
    g_comp = jax.jit(jax.grad(lambda t: loss(t, cvis)))(mesh.texture)
    np.testing.assert_array_equal(np.asarray(g_comp), np.asarray(g_full))


def test_planned_sampling_matches_autodiff():
    """The custom-VJP sampling plan (sorted segment-sum texture gradient)
    must reproduce the autodiff scatter gradient and the plan-less forward
    values exactly."""
    from st3d.render.renderer import compact_visibility

    mesh = _tilted_quad()
    cams = build_fixed_cameras(2, shuffle=False)
    settings = _settings("hard")
    vis = jax.jit(lambda m: precompute_visibility(m, cams, settings))(mesh)
    cvis_ad = compact_visibility(vis)                 # autodiff scatter
    cvis_pl = compact_visibility(vis, texture_shape=mesh.texture.shape)
    assert "plan" in cvis_pl and "plan" not in cvis_ad

    f_ad = jax.jit(lambda m: render_rgba_static(m, cvis_ad, settings))
    f_pl = jax.jit(lambda m: render_rgba_static(m, cvis_pl, settings))
    np.testing.assert_array_equal(
        np.asarray(f_pl(mesh)), np.asarray(f_ad(mesh))
    )

    def loss(tex, v):
        return jnp.sum(
            render_rgba_static(mesh.replace(texture=tex), v, settings) ** 2
        )

    g_ad = jax.jit(jax.grad(lambda t: loss(t, cvis_ad)))(mesh.texture)
    g_pl = jax.jit(jax.grad(lambda t: loss(t, cvis_pl)))(mesh.texture)
    # Same linear-map transpose, different summation order (texel-sorted
    # segment-sum vs scatter order) -> fp-addition jitter only.
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_ad), atol=1e-5, rtol=1e-5
    )
    assert float(jnp.abs(g_pl).max()) > 0

    # vmap over textures (the multistyle pattern) batches the custom VJP.
    texs = jnp.stack([mesh.texture, mesh.texture * 0.5])
    gv = jax.jit(jax.vmap(jax.grad(lambda t: loss(t, cvis_pl))))(texs)
    gv_ad = jax.jit(jax.vmap(jax.grad(lambda t: loss(t, cvis_ad))))(texs)
    np.testing.assert_allclose(
        np.asarray(gv), np.asarray(gv_ad), atol=1e-5, rtol=1e-5
    )


def test_compact_soft_passthrough():
    """Soft-mode vis has no uv plane; compaction must be a no-op."""
    from st3d.render.renderer import compact_visibility

    mesh = _tilted_quad()
    cams = build_fixed_cameras(1, shuffle=False)
    settings = _settings("soft")
    vis = jax.jit(lambda m: precompute_visibility(m, cams, settings))(mesh)
    assert compact_visibility(vis) is vis


@pytest.mark.skipif(not HAVE, reason="reference assets absent")
def test_static_matches_dynamic_cow():
    from st3d.engine.config import PipelineConfig
    from st3d.engine.pipelines import load_scene

    mesh = load_scene(PipelineConfig(
        obj_path=f"{REF}/objects/cow_mesh/cow.obj", size=64,
    ))
    cams = build_fixed_cameras(2, shuffle=False)
    settings = RasterizationSettings(image_size=64, backend="xla")
    vis = jax.jit(lambda m: precompute_visibility(m, cams, settings))(mesh)
    dyn = jax.jit(lambda m: render_rgba(m, cams, settings))(mesh)
    sta = jax.jit(lambda m: render_rgba_static(m, vis, settings))(mesh)
    np.testing.assert_allclose(np.asarray(sta), np.asarray(dyn), atol=1e-6)


@pytest.mark.parametrize("bg_mode", ["white", "noise", "style"])
def test_composited_static_matches_blend(bg_mode):
    """The fused background composite (windows scattered ONTO the
    background frame, no alpha channel — shade_compact_rgb) is bit-exact
    vs apply_background over the rgba static render, values AND texture
    gradients, for all three reference background modes."""
    from st3d.engine.background import apply_background
    from st3d.render.renderer import (
        compact_visibility,
        render_composited_static,
    )
    from st3d.render.shading import flatten_background

    mesh = _tilted_quad()
    cams = build_fixed_cameras(2, shuffle=False)
    settings = _settings("hard")
    vis = jax.jit(lambda m: precompute_visibility(m, cams, settings))(mesh)
    cvis = compact_visibility(vis, texture_shape=mesh.texture.shape)
    k = cvis["uv_cov"].shape[-2]
    rng = jax.random.PRNGKey(11)
    style = jax.random.uniform(
        jax.random.fold_in(rng, 1),
        cvis["mask"].shape + (3,), mesh.texture.dtype)

    def reference(tex):
        rgba = render_rgba_static(
            mesh.replace(texture=tex), cvis, settings)
        rgb = rgba[..., :3]
        m = (rgba[..., 3:4] > 0).astype(rgb.dtype)
        # apply_background is NCHW; the static hot path blends in NHWC
        # with the same arithmetic — reproduce it directly.
        if bg_mode == "white":
            return rgb
        if bg_mode == "noise":
            bg = jax.random.uniform(rng, rgb.shape, rgb.dtype)
        else:
            bg = style
        return rgb * m + bg * (1.0 - m)

    def fused(tex):
        if bg_mode == "white":
            return render_composited_static(
                mesh.replace(texture=tex), cvis, settings)
        if bg_mode == "noise":
            bg = jax.random.uniform(
                rng, cvis["mask"].shape + (3,), mesh.texture.dtype)
        else:
            bg = style
        return render_composited_static(
            mesh.replace(texture=tex), cvis, settings,
            background_flat=flatten_background(bg, k))

    ref = jax.jit(reference)(mesh.texture)
    fus = jax.jit(fused)(mesh.texture)
    np.testing.assert_array_equal(np.asarray(fus), np.asarray(ref))
    assert fus.shape == cvis["mask"].shape + (3,)

    tgt = jax.random.uniform(jax.random.fold_in(rng, 2), ref.shape)
    g_ref = jax.jit(jax.grad(
        lambda t: jnp.sum((reference(t) - tgt) ** 2)))(mesh.texture)
    g_fus = jax.jit(jax.grad(
        lambda t: jnp.sum((fused(t) - tgt) ** 2)))(mesh.texture)
    np.testing.assert_array_equal(np.asarray(g_fus), np.asarray(g_ref))
    assert float(jnp.abs(g_fus).max()) > 0
