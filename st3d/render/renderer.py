"""MeshRenderer equivalent: camera batch in, images + masks out.

Replaces the reference's renderer construction (first_approach.py:106-114)
and its sequential per-view Python loop ``render_meshes``
(utils.py:65-77) with a single jitted, ``vmap``-over-views function: the
Python loop over cameras — one GPU kernel launch per view in the reference —
becomes one batched XLA program (SURVEY.md §3.5).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from st3d.core.mesh import Mesh
from st3d.core.cameras import FoVPerspectiveCameras
from st3d.render.rasterize import (
    RasterizationSettings,
    face_verts_screen,
    rasterize_batch,
)
from st3d.render.shading import shade_textured

# Frame-assembly granularity of the compacted static-visibility path: the
# scatter writes CHUNK-pixel windows of the flat pixel index (TPU scatters
# are row-rate-limited, so wider rows are ~free; covered pixels are span-
# shaped so the over-coverage of aligned windows is small).
CHUNK = 8


def render_rgba(
    mesh: Mesh,
    cameras: FoVPerspectiveCameras,
    settings: RasterizationSettings,
) -> jnp.ndarray:
    """Render every camera; returns (N, H, W, 4) RGBA (white background,
    alpha = coverage) — the same observable output as the reference's
    ``renderer(meshes_world=mesh, cameras=cam)`` per view."""
    fv = face_verts_screen(
        mesh.verts, mesh.faces, cameras, settings.image_size
    )  # (N, F, 3, 3)

    if settings.soft and settings.faces_per_pixel > 1:
        # Full SoftRas: K faces per pixel, softmax-z color aggregation.
        from st3d.render.topk import rasterize_topk, shade_softras

        def one_view_k(fv_view):
            kfrags = rasterize_topk(fv_view, settings)
            return shade_softras(
                fv_view, kfrags.pix_to_face, mesh.verts_uvs,
                mesh.faces_uvs, mesh.texture,
                sigma_px=settings.soft_sigma_px, gamma=settings.gamma,
            )

        return jax.vmap(one_view_k)(fv)

    # Visibility for the whole view batch in one (natively batched) raster
    # call; only the differentiable shading epilogue is vmapped.
    frags = rasterize_batch(fv, settings)

    if settings.soft:
        from st3d.render.soft import shade_soft

        def one_view_soft(fv_view, p2f, near):
            return shade_soft(
                fv_view, p2f, near, mesh.verts_uvs, mesh.faces_uvs,
                mesh.texture, sigma_px=settings.soft_sigma_px,
            )

        return jax.vmap(one_view_soft)(
            fv, frags.pix_to_face, frags.nearest_face
        )

    def one_view(fv_view, p2f):
        return shade_textured(
            fv_view, p2f, mesh.verts_uvs, mesh.faces_uvs, mesh.texture
        )

    return jax.vmap(one_view)(fv, frags.pix_to_face)


def warn_if_hard_k_saturated(
    mesh: Mesh,
    cameras: FoVPerspectiveCameras,
    settings: RasterizationSettings,
    context: str = "render",
) -> int:
    """Pipeline-level hard-K saturation check (VERDICT r3 item 6): when the
    config uses blur_radius > 0 or faces_per_pixel > 1 in hard mode,
    rasterize once and warn (with the raise-``hard_k_slack`` remedy) if the
    selection was saturated anywhere. Returns the at-risk pixel count;
    instant 0 for configs that cannot saturate (the default K=1/blur=0)."""
    if settings.soft or (
        float(settings.blur_radius) == 0.0 and settings.faces_per_pixel == 1
    ):
        return 0
    from st3d.render.topk import check_hard_k_saturation

    fv = face_verts_screen(
        mesh.verts, mesh.faces, cameras, settings.image_size
    )
    return check_hard_k_saturation(fv, settings, context=context)


def render_meshes(
    mesh: Mesh,
    cameras: FoVPerspectiveCameras,
    settings: RasterizationSettings,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference-shaped output (utils.py:65-77): images (N, 3, H, W) and
    binary masks (N, 1, H, W) with mask = (alpha > 0)."""
    rgba = render_rgba(mesh, cameras, settings)
    images = jnp.transpose(rgba[..., :3], (0, 3, 1, 2))
    masks = (rgba[..., 3:4] > 0).astype(images.dtype)
    masks = jnp.transpose(masks, (0, 3, 1, 2))
    return images, masks


# ---------------------------------------------------------------------------
# Static-visibility fast path (texture-only optimization)
# ---------------------------------------------------------------------------
#
# Every rasterizer output is discrete and depends only on geometry + cameras
# (the contract in st3d/render/rasterize.py: kernels emit pix_to_face /
# nearest_face / zbuf under stop_gradient; all differentiable math lives in
# the shading epilogue). So when the vertex positions are NOT trainable —
# the reference's default optimization_target='texture' in both approaches —
# the whole visibility pass is a per-camera-batch CONSTANT and belongs
# outside the hot loop: the per-step work reduces to texture sampling + VGG.
# The reference re-rasterizes every step (renderer call inside the loss,
# second_approach.py:156); hoisting is exact, not an approximation.

def precompute_visibility(
    mesh: Mesh,
    cameras: FoVPerspectiveCameras,
    settings: RasterizationSettings,
):
    """Visibility constants for ``render_rgba_static``: a pytree of discrete
    fragment tensors with a leading view axis (shardable along it)."""
    fv = jax.lax.stop_gradient(face_verts_screen(
        mesh.verts, mesh.faces, cameras, settings.image_size
    ))
    if settings.soft and settings.faces_per_pixel > 1:
        from st3d.render.topk import rasterize_topk

        kfrags = jax.vmap(lambda fvv: rasterize_topk(fvv, settings))(fv)
        return {"fv": fv, "p2f_k": kfrags.pix_to_face}
    frags = rasterize_batch(fv, settings)
    vis = {"fv": fv, "p2f": frags.pix_to_face}
    if settings.soft:
        vis["near"] = frags.nearest_face
    else:
        # Hard mode: the barycentric/UV interpolation is geometry-only, so
        # the per-pixel texture coordinates and coverage are ALSO constants
        # — the per-step epilogue collapses to one texel gather + lerp per
        # pixel (shading.shade_from_uvs).
        from st3d.render.shading import pixel_uvs

        uv, mask = jax.vmap(
            lambda fvv, p2f: pixel_uvs(
                fvv, p2f, mesh.verts_uvs, mesh.faces_uvs
            )
        )(fv, frags.pix_to_face)
        vis["uv"] = jax.lax.stop_gradient(uv)
        vis["mask"] = mask
    return vis


def compact_visibility(vis, texture_shape=None, pad_multiple: int = 512):
    """Host-side compaction of hard-mode visibility constants.

    Replaces the full-frame ``uv`` plane with a per-view sorted list of
    covered CHUNK-pixel windows (``chunk_idx`` aligned window ids +
    ``uv_cov`` (..., C, CHUNK, 2) + ``cov8`` per-pixel coverage), padded to
    a common budget (pad windows point at the per-view H*W/CHUNK trash
    slot). ``shade_compact`` then touches only covered windows per step.
    No-op for soft modes (no ``uv`` key).

    With ``texture_shape`` (Ht, Wt[, ...]) a static SAMPLING PLAN is also
    built: per-pixel bilinear coordinates (computed on-device with the same
    ``sample_coords`` the live path uses, so values agree bit-for-bit) plus
    a permutation sorting all bilinear contributions of a camera batch by
    target texel. ``shading.sample_covered_planned`` consumes it to turn the
    texture-gradient scatter into a sorted segment-sum. The plan jointly
    flattens the LAST lead axis (views — which share one texture); outer
    lead axes (e.g. the fleet's mesh axis) each get their own permutation.
    NOTE: the plan must not be re-sharded along the view axis (its
    permutation spans all views); drop it before view-sharding vis.

    Runs OUTSIDE jit (numpy): visibility is precomputed once per camera
    batch, so the host round trip is setup cost, not step cost.
    """
    if "uv" not in vis:
        return vis
    import numpy as np

    uv = np.asarray(vis["uv"])
    mask = np.asarray(vis["mask"])
    lead = mask.shape[:-2]
    h, w = mask.shape[-2], mask.shape[-1]
    assert (h * w) % CHUNK == 0
    n = int(np.prod(lead)) if lead else 1
    uvf = uv.reshape(n, h * w, 2)
    mf = mask.reshape(n, h * w)
    # Covered pixels grouped into CHUNK-aligned windows of the flat pixel
    # index: the frame scatter then writes CHUNK*3-float rows instead of
    # 3-float rows (TPU scatters are row-rate-limited — measured ~2.4x
    # cheaper at 512**2 than the per-pixel formulation). Uncovered pixels
    # inside a covered chunk carry uv=0 / cov8=False and are overwritten
    # with the background by the same jnp.where every frame pixel gets.
    mc = mf.reshape(n, h * w // CHUNK, CHUNK).any(axis=-1)
    counts = mc.sum(axis=-1)
    c_pad = max(pad_multiple // CHUNK,
                int(-(-int(counts.max()) // 64)) * 64)
    chunk_idx = np.full((n, c_pad), h * w // CHUNK, np.int32)
    uv_cov = np.zeros((n, c_pad, CHUNK, 2), np.float32)
    cov8 = np.zeros((n, c_pad, CHUNK), bool)
    uvc = uvf.reshape(n, h * w // CHUNK, CHUNK, 2)
    mfc = mf.reshape(n, h * w // CHUNK, CHUNK)
    for v in range(n):
        nz = np.nonzero(mc[v])[0]
        chunk_idx[v, : len(nz)] = nz
        uv_cov[v, : len(nz)] = np.where(
            mfc[v, nz][..., None], uvc[v, nz], 0.0
        )
        cov8[v, : len(nz)] = mfc[v, nz]
    # Only the compacted planes + mask are consumed per step; dropping the
    # full-frame planes keeps them out of the (possibly sharded) step args.
    out = {
        "mask": vis["mask"],
        "chunk_idx": jnp.asarray(chunk_idx.reshape(lead + (c_pad,))),
        "uv_cov": jnp.asarray(uv_cov.reshape(lead + (c_pad, CHUNK, 2))),
        "cov8": jnp.asarray(cov8.reshape(lead + (c_pad, CHUNK))),
    }
    if texture_shape is not None:
        from st3d.render.shading import sample_coords

        ht, wt = int(texture_shape[0]), int(texture_shape[1])
        x0, y0, fx, fy = jax.jit(
            lambda u: sample_coords((ht, wt), u)
        )(out["uv_cov"])
        x0h, y0h = np.asarray(x0), np.asarray(y0)
        tix = (y0h.astype(np.int64) * wt + x0h).astype(np.int32)
        b_ax = lead[-1] if lead else 1
        outer = lead[:-1]
        n_out = int(np.prod(outer)) if outer else 1
        n4 = b_ax * c_pad * CHUNK
        tflat = tix.reshape(n_out, n4)
        # 4 contributions per pixel target texels (i00, i00+1, i00+wt,
        # i00+wt+1); sorting i00 sorts all four columns simultaneously.
        perm = np.argsort(tflat, axis=-1, kind="stable").astype(np.int32)
        segids = np.take_along_axis(tflat, perm, axis=-1)
        out["plan"] = {
            "idx": jnp.asarray(tix.reshape(lead + (c_pad, CHUNK))),
            "fx": fx,
            "fy": fy,
            "perm": jnp.asarray(perm.reshape(outer + (n4,))),
            "segids": jnp.asarray(segids.reshape(outer + (n4,))),
        }
        if not outer:
            tree = _build_plan_tree(tflat[0], np.asarray(cov8).reshape(-1),
                                    n4)
            if tree is not None:
                out["plan"]["tree"] = tree
    return out


def _build_plan_tree(tix_flat, cov_flat, n_rows):
    """Host-side scatter-free reduction tree for the sampling plan's
    texture gradient (consumed by shading._planned_bwd; see its docstring
    for the why — XLA's segment-sum scatter degrades superlinearly with
    size, 12.9ms/step at 768² vs 1.48ms at 512²).

    Only rows with structurally NONZERO cotangents participate (cov8 —
    uncovered pixels inside covered windows and pad windows contribute
    exact zeros; dropping them also removes the one giant uv=(0,0) trash
    segment, measured 52K rows at 768² where the real max degree is ~40).
    Rows are sorted by target texel; each texel's run is padded so it
    splits into whole degree-4 groups; each level gathers groups from the
    previous level (pad slot = the appended zero row) and a texel finishes
    at the level where one group holds its whole run (p50 degree 2 →
    3 levels cover the measured max). Returns None for empty coverage or
    when the tree exceeds the level cap (degenerate UV mappings — the
    segment-sum fallback handles those).
    """
    import numpy as np

    keep = np.nonzero(cov_flat)[0]
    if len(keep) == 0:
        return None
    seg_k = tix_flat[keep]
    order = np.argsort(seg_k, kind="stable")
    src = keep[order].astype(np.int64)        # rows into the ctq source
    uniq, counts = np.unique(seg_k[order], return_counts=True)

    levels = []
    out_level = np.zeros(len(uniq), np.int64)
    out_node = np.zeros(len(uniq), np.int64)
    seg_rank = np.arange(len(uniq))           # current segment -> uniq rank
    cur_counts = counts
    src_len = n_rows                          # pad slot (appended zero row)
    level_sizes = []
    for level in range(10):
        cur_starts = np.concatenate([[0], np.cumsum(cur_counts)])
        g_counts = -(-cur_counts // 4)
        g_starts = np.concatenate([[0], np.cumsum(g_counts)])
        g_total = int(g_counts.sum())
        gidx = np.full(g_total * 4, src_len, np.int64)
        seg_rep = np.repeat(np.arange(len(cur_counts)), cur_counts)
        off = np.arange(len(src)) - cur_starts[:-1][seg_rep]
        gidx[4 * g_starts[:-1][seg_rep] + off] = src
        levels.append(gidx.astype(np.int32))
        level_sizes.append(g_total)
        done = g_counts == 1
        out_level[seg_rank[done]] = level
        out_node[seg_rank[done]] = g_starts[:-1][done]
        if bool(done.all()):
            break
        group_seg = np.repeat(np.arange(len(cur_counts)), g_counts)
        src = np.nonzero(~done[group_seg])[0].astype(np.int64)
        cur_counts = g_counts[~done]
        seg_rank = seg_rank[~done]
        src_len = g_total
    else:
        return None                           # level cap hit: fall back
    level_off = np.concatenate([[0], np.cumsum(level_sizes)])
    return {
        "levels": tuple(jnp.asarray(g) for g in levels),
        "out_idx": jnp.asarray(
            (level_off[out_level] + out_node).astype(np.int32)),
        "texels": jnp.asarray(uniq.astype(np.int32)),
    }


def drop_plan(vis):
    """Strip the sampling plan from compact visibility before VIEW-sharding
    it: the plan's permutation spans ALL views of a camera batch jointly
    and MUST NOT be re-sharded along the view axis (a sharded permutation
    would corrupt texture gradients). Every data-parallel consumer of
    compact visibility goes through this helper; the DP step then falls
    back to autodiff's atlas scatter. None passes through."""
    if vis is None:
        return None
    return {k: v for k, v in vis.items() if k != "plan"}


def render_rgba_static(
    mesh: Mesh,
    vis,
    settings: RasterizationSettings,
) -> jnp.ndarray:
    """``render_rgba`` with the visibility pass replaced by the precomputed
    constants — identical output when the geometry matches the one passed to
    ``precompute_visibility``. Differentiable w.r.t. ``mesh.texture`` only
    (vertex gradients are deliberately absent: callers gate this path on
    optimization_target == 'texture')."""
    if "chunk_idx" in vis:
        from st3d.render.shading import shade_compact

        return shade_compact(
            mesh.texture, vis["chunk_idx"], vis["uv_cov"], vis["cov8"],
            vis["mask"], plan=vis.get("plan"),
        )
    fv = vis["fv"]
    if settings.soft and settings.faces_per_pixel > 1:
        from st3d.render.topk import shade_softras

        return jax.vmap(
            lambda fvv, p2f_k: shade_softras(
                fvv, p2f_k, mesh.verts_uvs, mesh.faces_uvs, mesh.texture,
                sigma_px=settings.soft_sigma_px, gamma=settings.gamma,
            )
        )(fv, vis["p2f_k"])
    if settings.soft:
        from st3d.render.soft import shade_soft

        return jax.vmap(
            lambda fvv, p2f, near: shade_soft(
                fvv, p2f, near, mesh.verts_uvs, mesh.faces_uvs,
                mesh.texture, sigma_px=settings.soft_sigma_px,
            )
        )(fv, vis["p2f"], vis["near"])
    if "uv" in vis:
        from st3d.render.shading import shade_from_uvs

        return shade_from_uvs(mesh.texture, vis["uv"], vis["mask"])
    return jax.vmap(
        lambda fvv, p2f: shade_textured(
            fvv, p2f, mesh.verts_uvs, mesh.faces_uvs, mesh.texture
        )
    )(fv, vis["p2f"])


def render_composited_static(
    mesh: Mesh,
    vis,
    settings: RasterizationSettings,
    background_flat: jnp.ndarray = None,
    background_color: Tuple[float, float, float] = (1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Background-composited RGB (N, H, W, 3) straight from the compact
    static-visibility scatter — no alpha channel, no full-frame blend
    (``shading.shade_compact_rgb``). Bit-equal to
    ``apply_background(render_rgba_static(...)[..., :3], mask, ...)``;
    requires compact visibility (``compact_visibility`` output)."""
    if "chunk_idx" not in vis:
        raise ValueError(
            "render_composited_static requires compact visibility "
            "(a vis dict from compact_visibility); got the raw "
            "precompute_visibility pytree"
        )
    from st3d.render.shading import shade_compact_rgb

    h, w = vis["mask"].shape[-2], vis["mask"].shape[-1]
    return shade_compact_rgb(
        mesh.texture, vis["chunk_idx"], vis["uv_cov"], vis["cov8"],
        (h, w), background_flat=background_flat,
        background_color=background_color, plan=vis.get("plan"),
    )


def render_meshes_static(
    mesh: Mesh,
    vis,
    settings: RasterizationSettings,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static-visibility ``render_meshes``: images (N, 3, H, W), masks
    (N, 1, H, W)."""
    rgba = render_rgba_static(mesh, vis, settings)
    images = jnp.transpose(rgba[..., :3], (0, 3, 1, 2))
    masks = (rgba[..., 3:4] > 0).astype(images.dtype)
    masks = jnp.transpose(masks, (0, 3, 1, 2))
    return images, masks
