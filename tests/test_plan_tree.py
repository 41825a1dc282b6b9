"""The scatter-free texture-gradient reduction tree (renderer._build_plan_
tree + shading._planned_bwd): exactness vs a dense oracle on synthetic
plans, the structural edge cases that gate it off, and the fold_gram48
tracer-leak regression."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from st3d.render.renderer import _build_plan_tree


def _ref_sums(tix, cov, ctq, n_texels):
    """Oracle: per-texel f64 sums of the 12-wide weighted quad rows."""
    out = np.zeros((n_texels, 12), np.float64)
    for i in range(len(tix)):
        if cov[i]:
            out[tix[i]] += ctq[i]
    return out


def _run_tree(tree, ctq, n_texels):
    """Evaluate the tree exactly as shading._planned_bwd does."""
    outs = []
    src = jnp.asarray(ctq, jnp.float32)
    for g_idx in tree["levels"]:
        src = jnp.concatenate([src, jnp.zeros((1, 12), src.dtype)], axis=0)
        lvl = src[g_idx].reshape(-1, 4, 12).sum(axis=1)
        outs.append(lvl)
        src = lvl
    cat = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    rows = cat[tree["out_idx"]]
    sums = jnp.zeros((n_texels, 12), rows.dtype).at[tree["texels"]].set(
        rows, unique_indices=True, indices_are_sorted=True)
    return np.asarray(sums)


@pytest.mark.parametrize("seed,n_rows,n_texels", [
    (0, 400, 64), (1, 4000, 256), (2, 1000, 1024)])
def test_tree_matches_dense_oracle(seed, n_rows, n_texels):
    """Random plans (skewed texel distribution, random coverage holes):
    the tree reproduces the dense per-texel sums."""
    rng = np.random.RandomState(seed)
    # Skew: squared uniform concentrates rows on low texel ids (the same
    # clustering real UV islands produce; exercises multi-level segments).
    tix = (rng.rand(n_rows) ** 2 * n_texels).astype(np.int32)
    cov = rng.rand(n_rows) < 0.8
    tree = _build_plan_tree(tix, cov, n_rows)
    assert tree is not None
    ctq = rng.randn(n_rows, 12).astype(np.float32)
    got = _run_tree(tree, ctq, n_texels)
    want = _ref_sums(tix, cov, ctq, n_texels)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def test_tree_gates_and_degenerate():
    """Empty coverage returns None (the segment-sum fallback handles it);
    a degenerate all-one-texel plan still builds and sums exactly."""
    tix = np.zeros(16, np.int32)
    assert _build_plan_tree(tix, np.zeros(16, bool), 16) is None
    # All rows on one texel: 16 rows -> 4 L1 nodes -> 1 L2 node.
    tree = _build_plan_tree(tix, np.ones(16, bool), 16)
    assert tree is not None and len(tree["levels"]) == 2
    ctq = np.arange(192, dtype=np.float32).reshape(16, 12)
    got = _run_tree(tree, ctq, 64)
    np.testing.assert_allclose(got[0], ctq.sum(axis=0), rtol=1e-6)
    np.testing.assert_allclose(got[1:], 0.0)


def test_fold_gram48_two_traces_no_leak():
    """Regression: fold_gram48 once cached jnp.asarray(selection
    matrices) in a module global; created inside a trace that constant
    is a tracer and the SECOND trace in the process dies with
    UnexpectedTracerError. Two different jits must both trace clean."""
    from st3d.kernels.stage1_pallas import fold_gram48

    w = jnp.zeros((3, 3, 3, 64))
    b = jnp.zeros((64,))
    g48 = jnp.ones((2, 48, 48))
    s48 = jnp.ones((2, 48))
    r1 = jax.jit(lambda g, s: fold_gram48(g, s, w, b, 64))(g48, s48)
    r2 = jax.jit(lambda g, s: fold_gram48(g * 2, s, w, b, 64))(g48, s48)
    assert r1.shape == r2.shape == (2, 64, 64)
    assert bool(jnp.all(jnp.isfinite(r1))) and bool(jnp.all(jnp.isfinite(r2)))


@pytest.mark.parametrize("land", ["barrier", "flat"])
def test_landing_variants_bit_equal(monkeypatch, land):
    """ST3D_TREE_LAND={barrier,flat} change only the landing scatter's
    layout/form — the full _planned_bwd texture gradient is bit-identical
    to the default landing (same adds, same order)."""
    from st3d.render import shading
    from st3d.render.renderer import compact_visibility, precompute_visibility
    from st3d.core.cameras import build_fixed_cameras
    from st3d.io.obj import load_mesh
    from st3d.render.rasterize import RasterizationSettings
    from st3d.utils.assets import resolve_asset

    mesh = load_mesh(resolve_asset("./objects/cow_mesh/cow.obj"))
    cams = build_fixed_cameras(2, shuffle=False)
    settings = RasterizationSettings(image_size=64, backend="auto")
    vis = precompute_visibility(mesh, cams, settings)
    vis = compact_visibility(vis, texture_shape=mesh.texture.shape)
    plan = vis["plan"]
    assert "tree" in plan
    ht, wt = mesh.texture.shape[0], mesh.texture.shape[1]
    ct = jax.random.normal(jax.random.PRNGKey(5),
                           plan["fx"].shape + (3,), jnp.float32)
    res = (ht, wt, plan["fx"], plan["fy"], plan["perm"], plan["segids"],
           plan["tree"])

    monkeypatch.delenv("ST3D_TREE_LAND", raising=False)
    g0 = shading._planned_bwd(res, ct)[0]
    monkeypatch.setenv("ST3D_TREE_LAND", land)
    g1 = shading._planned_bwd(res, ct)[0]
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))


def test_sample_barrier_bit_equal(monkeypatch):
    """ST3D_SAMPLE_BARRIER pins a layout only — forward values are
    bit-identical."""
    from st3d.render import shading
    from st3d.render.renderer import compact_visibility, precompute_visibility
    from st3d.core.cameras import build_fixed_cameras
    from st3d.io.obj import load_mesh
    from st3d.render.rasterize import RasterizationSettings
    from st3d.utils.assets import resolve_asset

    mesh = load_mesh(resolve_asset("./objects/cow_mesh/cow.obj"))
    cams = build_fixed_cameras(2, shuffle=False)
    settings = RasterizationSettings(image_size=64, backend="auto")
    vis = precompute_visibility(mesh, cams, settings)
    vis = compact_visibility(vis, texture_shape=mesh.texture.shape)
    plan = vis["plan"]

    def fwd():
        return shading.sample_covered_planned(
            mesh.texture, plan["idx"], plan["fx"], plan["fy"],
            plan["perm"], plan["segids"], plan.get("tree"))

    monkeypatch.delenv("ST3D_SAMPLE_BARRIER", raising=False)
    o0 = fwd()
    monkeypatch.setenv("ST3D_SAMPLE_BARRIER", "1")
    o1 = fwd()
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))
