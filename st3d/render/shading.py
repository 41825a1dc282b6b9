"""Differentiable shading epilogue: barycentric recompute, UV interpolation,
texture sampling, ambient shading and background compositing.

Replaces the capability of PyTorch3D's ``SoftPhongShader`` + ``AmbientLights``
+ ``TexturesUV`` sampling as configured by the reference
(first_approach.py:108-113; SURVEY.md D5/D6): with ambient-only lights the
Phong model collapses to "pixel = sampled texel", softmax-blended onto a
white background with alpha = coverage.

Everything here is plain XLA and differentiable: given the non-differentiable
``pix_to_face`` from the rasterizer, barycentrics are recomputed from the
(differentiable) projected vertices, so ``jax.grad`` delivers exact gradients
w.r.t. both the texture atlas (a bilinear scatter-add, the gradient that
drives texture optimization) and the vertex positions (through barycentric /
projection derivatives) — the same gradient surface PyTorch3D's hard
rasterizer exposes.

Texture convention (PyTorch3D TexturesUV defaults, SURVEY.md D6): uv (0,0) is
the BOTTOM-left of the texture image (V axis flipped relative to image rows),
bilinear sampling with align_corners=True and border padding.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp

from st3d.render.rasterize import AREA_EPS


def barycentrics_of_triangles(tri: jnp.ndarray) -> jnp.ndarray:
    """Perspective-correct barycentrics at pixel centers for pre-gathered
    per-pixel triangles ``tri`` of shape (H, W, 3, 3). Differentiable."""
    h, w = tri.shape[0], tri.shape[1]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    py, px = jnp.meshgrid(ys, xs, indexing="ij")

    x0, y0, z0 = tri[..., 0, 0], tri[..., 0, 1], tri[..., 0, 2]
    x1, y1, z1 = tri[..., 1, 0], tri[..., 1, 1], tri[..., 1, 2]
    x2, y2, z2 = tri[..., 2, 0], tri[..., 2, 1], tri[..., 2, 2]

    w0 = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
    w1 = (x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)
    w2 = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    denom_a = jnp.where(jnp.abs(area) > AREA_EPS, area, AREA_EPS)
    b = jnp.stack([w0, w1, w2], axis=-1) / denom_a[..., None]

    # Perspective correction: weight by 1/z and renormalize.
    z = jnp.stack([z0, z1, z2], axis=-1)
    bw = b / jnp.maximum(z, 1e-8)
    denom = jnp.sum(bw, axis=-1, keepdims=True)
    return bw / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)


def recompute_barycentrics(
    face_verts: jnp.ndarray,      # (F, 3, 3) screen verts, differentiable
    pix_to_face: jnp.ndarray,     # (H, W) int32, -1 = background
) -> jnp.ndarray:
    """Perspective-correct barycentrics of each pixel in its winning face.

    Returns (H, W, 3); arbitrary values where pix_to_face < 0 (mask later).
    Differentiable w.r.t. ``face_verts``; the integer ids act as constants,
    which is exactly the hard-rasterization gradient semantics.
    """
    safe = jnp.maximum(pix_to_face, 0)
    return barycentrics_of_triangles(face_verts[safe])


def interpolate_face_attributes(
    attrs: jnp.ndarray,           # (F, 3, D) per-face-vertex attributes
    pix_to_face: jnp.ndarray,     # (H, W)
    barycentrics: jnp.ndarray,    # (H, W, 3)
) -> jnp.ndarray:
    """(H, W, D) barycentric interpolation of per-corner attributes."""
    safe = jnp.maximum(pix_to_face, 0)
    a = attrs[safe]  # (H, W, 3, D)
    return jnp.sum(a * barycentrics[..., None], axis=-2)


def sample_coords(texture_hw, uv: jnp.ndarray, align_corners: bool = True):
    """Bilinear sample coordinates: (x0, y0) int32 top-left texel + (fx, fy)
    fractional offsets, with border clamping and the TexturesUV V-flip.

    Shared by ``sample_texture`` (in-graph) and the static sampling plan
    (``renderer.compact_visibility`` precomputes these once per camera batch
    on-device so plan and live path agree bit-for-bit)."""
    ht, wt = texture_hw
    u = uv[..., 0]
    v = uv[..., 1]
    if align_corners:
        x = u * (wt - 1)
        y = (1.0 - v) * (ht - 1)
    else:
        x = u * wt - 0.5
        y = (1.0 - v) * ht - 0.5

    # Border padding == clamping the sample point into the texel grid.
    x = jnp.clip(x, 0.0, wt - 1)
    y = jnp.clip(y, 0.0, ht - 1)
    x0 = jnp.clip(jnp.floor(x), 0, wt - 2)
    y0 = jnp.clip(jnp.floor(y), 0, ht - 2)
    fx = x - x0
    fy = y - y0
    return x0.astype(jnp.int32), y0.astype(jnp.int32), fx, fy


def _quad_pack(texture: jnp.ndarray) -> jnp.ndarray:
    """(Ht, Wt, 3) atlas -> (Ht*Wt, 12) rows holding each texel's 2x2
    neighborhood, so a whole bilinear tap is ONE row gather (TPU gathers
    cost ~per row, not per byte; measured 3.6x over four separate taps at
    512**2 in the full fwd+bwd)."""
    ht, wt = texture.shape[0], texture.shape[1]
    t_r = jnp.concatenate([texture[:, 1:], texture[:, -1:]], axis=1)
    t_d = jnp.concatenate([texture[1:], texture[-1:]], axis=0)
    t_rd = jnp.concatenate([t_d[:, 1:], t_d[:, -1:]], axis=1)
    quad = jnp.concatenate([texture, t_r, t_d, t_rd], axis=-1)
    return quad.reshape(ht * wt, 12)


def _bilerp_rows(g: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray):
    """Lerp quad rows (..., 12) -> (..., 3) (exact association kept stable:
    top/bottom then vertical — any change breaks bit-parity tests)."""
    top = g[..., 0:3] * (1 - fx)[..., None] + g[..., 3:6] * fx[..., None]
    bot = g[..., 6:9] * (1 - fx)[..., None] + g[..., 9:12] * fx[..., None]
    return top * (1 - fy)[..., None] + bot * fy[..., None]


def sample_texture(
    texture: jnp.ndarray,         # (Ht, Wt, 3), row 0 = top
    uv: jnp.ndarray,              # (..., 2) with v=0 at the bottom
    align_corners: bool = True,
) -> jnp.ndarray:
    """Differentiable bilinear texture sampling with border padding and the
    TexturesUV V-flip. Gradient w.r.t. ``texture`` is a bilinear scatter-add
    into the atlas (via XLA autodiff of the gathers)."""
    ht, wt = texture.shape[0], texture.shape[1]
    x0, y0, fx, fy = sample_coords((ht, wt), uv, align_corners)
    quad = _quad_pack(texture)
    idx = y0 * wt + x0
    return _bilerp_rows(quad[idx], fx, fy)


@jax.custom_vjp
def sample_covered_planned(texture, idx, fx, fy, perm, segids, tree=None):
    """``sample_texture`` on a STATIC sampling plan (texture-only hot loops).

    idx/fx/fy are the per-covered-pixel coordinates from ``sample_coords``
    (constants — see renderer.compact_visibility); perm is a static
    permutation sorting the flattened bilinear contributions by TARGET TEXEL
    and segids the sorted texel ids. Forward is identical math to
    ``sample_texture``. ``ST3D_SAMPLE_BARRIER=1`` pins the quad-row
    gather's output layout (768²: XLA flips it column-major to suit a
    consumer, making the gather VMEM-write-bound — trace fusion.224). The custom backward replaces XLA's random-order
    atlas scatter-add (the single most expensive op of the step at 512**2 —
    ~5ms, profiler-measured) with the exact transpose of the same linear
    map, evaluated in texel order. This is the one custom VJP in the tree;
    it is equality-tested against the autodiff gradient
    (tests/test_static_visibility.py).

    Two backward evaluation plans (both host-built, same additions):

    - ``tree`` (default when present): a SCATTER-FREE multi-level padded
      reduction. XLA's segment-sum lowers to a scatter-add whose layout /
      strategy degrades superlinearly with size (profiler: 1.48ms at 512²
      but 12.9ms at 768² for 2.2x the rows — the round-4 MFU cliff at the
      reference's default size). The tree instead gathers the covered
      contributions sorted by texel and padded so every texel's run is a
      whole number of degree-4 groups, then reshape+sums groups level by
      level (p50 degree = 2, so ~3 levels cover the measured max ~40);
      the per-texel results land with ONE sorted-unique scatter-set of
      ~n_covered_texels rows (the cheap scatter kind — same class as the
      frame scatter). Rows whose cotangent is structurally zero (cov8
      false / pad windows) are dropped at plan-build time.
    - ``perm``/``segids`` (fallback + ``ST3D_NO_PLAN_TREE=1``): gather by
      perm + sorted segment-sum.
    """
    ht, wt = texture.shape[0], texture.shape[1]
    g = _quad_pack(texture)[idx]
    if os.environ.get("ST3D_SAMPLE_BARRIER"):
        g = jax.lax.optimization_barrier(g)
    return _bilerp_rows(g, fx, fy)


def _planned_fwd(texture, idx, fx, fy, perm, segids, tree=None):
    out = sample_covered_planned(texture, idx, fx, fy, perm, segids, tree)
    return out, (texture.shape[0], texture.shape[1], fx, fy, perm, segids,
                 tree)


def _planned_bwd(res, ct):
    ht, wt, fx, fy, perm, segids, tree = res
    # Column k of the reduced (Ht*Wt, 12) result holds the contributions
    # whose target texel is the k-th corner of the quad anchored at the
    # row's texel — fold them with dense shifted adds (the transpose of
    # _quad_pack's shifted concats).
    w00 = (1 - fx) * (1 - fy)
    w01 = fx * (1 - fy)
    w10 = (1 - fx) * fy
    w11 = fx * fy
    ctq = jnp.concatenate(
        [ct * w00[..., None], ct * w01[..., None],
         ct * w10[..., None], ct * w11[..., None]], axis=-1)
    flat = ctq.reshape((-1, 12))
    if os.environ.get("ST3D_TREE_BARRIER"):
        # Layout-assignment experiment: at 768² XLA flips the ctq build's
        # output layout to column-major ({0,1}) to suit the level-1 gather,
        # making the elementwise build write strided — 4.2ms vs the 0.47ms
        # row-major build at 512² (round-5 trace, fusion.243). The barrier
        # decouples producer and gather layouts. MEASURED NEUTRAL in the
        # isolated tree micro (tree 9.174ms vs barrier 9.173ms @768²,
        # scripts/tree_micro.py) — the strided write cost moves, it does
        # not disappear. Kept off-by-default as a layout A/B hook.
        flat = jax.lax.optimization_barrier(flat)
    if tree is not None and not os.environ.get("ST3D_NO_PLAN_TREE"):
        # Scatter-free padded tree reduction (see the docstring). Each
        # level gathers from the previous level's output (+ appended zero
        # row at index len(prev) — the pad slot the host indices point at)
        # and sums degree-4 groups; texels finish at the level where one
        # group holds their whole run, landing via ONE sorted-unique
        # 12-float-row scatter-set. Two rejected refinements, micro-
        # benchmarked on-device (/tmp-reproducible, PERF_NOTES round 4):
        # an 8-texel 96-float windowed landing (the frame scatter's
        # flat-row trick) measured 3.2x SLOWER than these 12-float rows
        # (7.3 vs 2.06ms at 512² — the (Ht*Wt/8, 96) <-> (Ht, Wt, 12)
        # relayouts swamp the row-rate saving), and gathering raw 3-wide
        # ct rows + expanding with a static corner-weight table lost ~35%
        # vs building the full-N ctq above (2.77 vs 2.06ms).
        outs = []
        src = flat
        for g_idx in tree["levels"]:
            src = jnp.concatenate(
                [src, jnp.zeros((1, 12), src.dtype)], axis=0)
            lvl = src[g_idx].reshape(-1, 4, 12).sum(axis=1)
            outs.append(lvl)
            src = lvl
        cat = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        rows = cat[tree["out_idx"]]
        land = os.environ.get("ST3D_TREE_LAND", "")
        if land == "flat":
            # 768² layout fix candidate: XLA assigns the 2-D landing a
            # column-major layout to suit the plane-sliced epilogue, so
            # each 12-float row-set writes 12 separate tiles (round-5
            # trace fusion.243: 4.2ms at 2.6GiB/s, VMEM-write-bound,
            # vs 0.47ms row-major at 512²). A 1-D operand has exactly
            # one layout — scatter 12-element windows at texel*12 and
            # let the consumer reshape (bit-identical values).
            dnums = jax.lax.ScatterDimensionNumbers(
                update_window_dims=(1,), inserted_window_dims=(),
                scatter_dims_to_operand_dims=(0,))
            flat1 = jax.lax.scatter(
                jnp.zeros((ht * wt * 12,), rows.dtype),
                (tree["texels"][:, None] * 12).astype(jnp.int32), rows,
                dnums, indices_are_sorted=True, unique_indices=True,
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
            sums = flat1.reshape(ht * wt, 12)
        else:
            sums = jnp.zeros((ht * wt, 12), rows.dtype).at[
                tree["texels"]].set(
                rows, unique_indices=True, indices_are_sorted=True)
            if land == "barrier":
                # Same fix via layout decoupling: the barrier pins the
                # scatter's own (row-major) layout and pays one explicit
                # relayout into the epilogue's preferred planes.
                sums = jax.lax.optimization_barrier(sums)
    else:
        sums = jax.ops.segment_sum(
            flat[perm], segids, num_segments=ht * wt,
            indices_are_sorted=True,
        )
    s = sums.reshape(ht, wt, 12)
    g = s[..., 0:3]
    g = g.at[:, 1:].add(s[:, :-1, 3:6])
    g = g.at[1:, :].add(s[:-1, :, 6:9])
    g = g.at[1:, 1:].add(s[:-1, :-1, 9:12])
    return (g, None, None, None, None, None, None)


sample_covered_planned.defvjp(_planned_fwd, _planned_bwd)


def pixel_uvs(
    face_verts: jnp.ndarray,      # (F, 3, 3) screen verts (differentiable)
    pix_to_face: jnp.ndarray,     # (H, W)
    verts_uvs: jnp.ndarray,       # (Vt, 2)
    faces_uvs: jnp.ndarray,       # (F, 3)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel texture coordinates (H, W, 2) + coverage mask (H, W).

    Differentiable w.r.t. ``face_verts``; geometry-only — in a texture-only
    optimization this whole function is a per-camera-batch CONSTANT that
    the static-visibility path precomputes once (see
    renderer.precompute_visibility).
    """
    # One row gather per pixel: pack the 9 screen-vert floats and 6 UV
    # floats of every face into a 15-float row first (TPU gathers cost
    # ~per row — see sample_texture).
    f = face_verts.shape[0]
    face_uv = verts_uvs[faces_uvs]  # (F, 3, 2)
    pack = jnp.concatenate(
        [face_verts.reshape(f, 9), face_uv.reshape(f, 6)], axis=-1
    )
    safe = jnp.maximum(pix_to_face, 0)
    g = pack[safe]                                     # (H, W, 15)
    tri = g[..., 0:9].reshape(g.shape[:-1] + (3, 3))
    uvf = g[..., 9:15].reshape(g.shape[:-1] + (3, 2))
    bary = barycentrics_of_triangles(tri)
    uv = jnp.sum(uvf * bary[..., None], axis=-2)       # (H, W, 2)
    return uv, pix_to_face >= 0


def shade_from_uvs(
    texture: jnp.ndarray,         # (Ht, Wt, 3)
    uv: jnp.ndarray,              # (..., H, W, 2)
    mask: jnp.ndarray,            # (..., H, W) bool
    background_color: Tuple[float, float, float] = (1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """RGBA (..., H, W, 4) from per-pixel UVs: the texture-dependent tail of
    ``shade_textured``. Accepts any leading batch axes (the quad-packing in
    ``sample_texture`` then runs ONCE for the whole view batch instead of
    per-vmapped view)."""
    rgb = sample_texture(texture, uv)
    m = mask[..., None]
    bg = jnp.asarray(background_color, rgb.dtype)
    rgb = jnp.where(m, rgb, bg)
    alpha = m.astype(rgb.dtype)
    return jnp.concatenate([rgb, alpha], axis=-1)


def shade_compact(
    texture: jnp.ndarray,         # (Ht, Wt, 3)
    chunk_idx: jnp.ndarray,       # (..., C) int32 aligned window ids
    uv_cov: jnp.ndarray,          # (..., C, K, 2) UVs of the window pixels
    cov8: jnp.ndarray,            # (..., C, K) bool per-pixel coverage
    mask: jnp.ndarray,            # (..., H, W) bool coverage
    background_color: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    plan=None,                    # static sampling plan (see below)
) -> jnp.ndarray:
    """RGBA (..., H, W, 4) shading only the COVERED pixel windows.

    The static-visibility fast path on top of ``shade_from_uvs``: with a
    typical object filling ~1/3 of the frame, gathering/lerping texels for
    background pixels — and scatter-adding their (zero) cotangents back into
    the atlas — is the majority of the epilogue's row traffic.
    ``renderer.compact_visibility`` builds the sorted, padded window list
    host-side; the forward is C*K gathers + ONE sorted-unique scatter-set of
    K-pixel rows (TPU scatters are row-rate-limited: K-pixel windows are
    ~2.4x cheaper than per-pixel rows at 512**2) whose backward is a gather
    — no full-frame scatter anywhere.

    ``plan`` (when compact_visibility was given the texture shape) switches
    the sampling to ``sample_covered_planned``: same forward values, but the
    atlas-gradient scatter is replaced by a sorted segment-sum over the
    plan's static texel ordering. Uncovered pixels inside covered windows
    reach the sampler with uv=0, and the jnp.where below zeroes their
    cotangents before they reach it.
    """
    if plan is not None:
        rgb_cov = sample_covered_planned(
            texture, plan["idx"], plan["fx"], plan["fy"],
            plan["perm"], plan["segids"], plan.get("tree"),
        )
    else:
        rgb_cov = sample_texture(texture, uv_cov)      # (..., C, K, 3)
    h, w = mask.shape[-2], mask.shape[-1]
    k = uv_cov.shape[-2]
    bg = jnp.asarray(background_color, rgb_cov.dtype)
    vals = jnp.where(cov8[..., None], rgb_cov, bg)

    # compact_visibility pads idx with REPEATED copies of the trash row
    # h*w//k, so `unique_indices=True` is formally a lie whenever a view
    # has 2+ pad slots (every duplicate writes the IDENTICAL bg payload
    # to the one trash row that flat[:-1] slices off, so it was benign
    # under any plausible lowering). The r4f interleaved A/B measured the
    # formally-correct scatter FREE (median 44.87 vs 44.64 it/s @512²
    # bf16, >= default in 4/5 windows), so correct is now the default;
    # ST3D_SCATTER_UNIQUE=1 restores the old promise for A/B.
    unique = bool(os.environ.get("ST3D_SCATTER_UNIQUE"))

    def one_view(idx_v, vals_v):
        # Rows are FLAT (k*3,) vectors: a (rows, k, 3) scatter operand gets
        # laid out [rows, 3, 8] with the 8 tiled into 128 lanes — a 16x
        # padded-traffic blowup on the bg broadcast + scatter + downstream
        # convert (profiler: ~2.2ms/step at 512²). Flat k*3 rows pad
        # 24 -> 128 instead (5.3x) and reshape back for free.
        flat = jnp.broadcast_to(jnp.tile(bg, k), (h * w // k + 1, k * 3))
        flat = flat.at[idx_v].set(
            vals_v.reshape(vals_v.shape[0], k * 3),
            unique_indices=unique, indices_are_sorted=True,
        )
        return flat[:-1].reshape(h, w, 3)

    lead = chunk_idx.shape[:-1]
    rgb = jax.vmap(one_view)(
        chunk_idx.reshape((-1,) + chunk_idx.shape[-1:]),
        vals.reshape((-1,) + vals.shape[-3:]),
    ).reshape(lead + (h, w, 3))
    alpha = mask.astype(rgb.dtype)[..., None]
    return jnp.concatenate([rgb, alpha], axis=-1)


def shade_compact_rgb(
    texture: jnp.ndarray,         # (Ht, Wt, 3)
    chunk_idx: jnp.ndarray,       # (..., C) int32 aligned window ids
    uv_cov: jnp.ndarray,          # (..., C, K, 2) UVs of the window pixels
    cov8: jnp.ndarray,            # (..., C, K) bool per-pixel coverage
    hw: Tuple[int, int],
    background_flat: jnp.ndarray = None,  # (..., H*W/K + 1, K*3)
    background_color: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    plan=None,
) -> jnp.ndarray:
    """Composited RGB (..., H, W, 3): ``shade_compact``'s covered windows
    scattered ONTO the background, with no alpha channel.

    The window list IS the coverage mask, so
    ``apply_background(shade_compact(...)[..., :3], mask, ...)`` computes
    the same frame while materializing (and relaying out) the full frame
    several extra times per step: the rgba concat, the ``[..., :3]`` /
    alpha slices, the ``alpha > 0`` compare, and the full-frame blend.
    This entry point replaces all of them with the one scatter the
    compact path already does (VERDICT r4 item 1b: frame-assembly
    formatting). Values are bit-equal: for a binary mask the reference
    blend ``rgb*mask + bg*(1-mask)`` (engine/background.py) selects
    exactly, and uncovered pixels inside covered windows take the
    background row gathered at the window's own index.

    ``background_flat`` is the background frame in the scatter's own flat
    window layout — ``frame.reshape(..., H*W//K, K*3)`` plus ONE trailing
    trash row for the pad slots (see ``flatten_background``). Per-step
    noise backgrounds should be GENERATED in this shape (no reshape ever
    exists). When it is None, ``background_color`` fills the frame (the
    white-background / bench path — no gather needed).
    """
    if plan is not None:
        rgb_cov = sample_covered_planned(
            texture, plan["idx"], plan["fx"], plan["fy"],
            plan["perm"], plan["segids"], plan.get("tree"),
        )
    else:
        rgb_cov = sample_texture(texture, uv_cov)      # (..., C, K, 3)
    h, w = hw
    k = uv_cov.shape[-2]
    unique = bool(os.environ.get("ST3D_SCATTER_UNIQUE"))

    def one_view(idx_v, rgb_v, cov_v, bg_v):
        if bg_v is None:
            bgc = jnp.asarray(background_color, rgb_v.dtype)
            flat = jnp.broadcast_to(jnp.tile(bgc, k),
                                    (h * w // k + 1, k * 3))
            rows = jnp.where(cov_v[..., None], rgb_v, bgc)
        else:
            flat = bg_v
            rows = jnp.where(
                cov_v[..., None], rgb_v,
                flat[idx_v].reshape(idx_v.shape[0], k, 3))
        flat = flat.at[idx_v].set(
            rows.reshape(rows.shape[0], k * 3),
            unique_indices=unique, indices_are_sorted=True,
        )
        return flat[:-1].reshape(h, w, 3)

    lead = chunk_idx.shape[:-1]
    idx_f = chunk_idx.reshape((-1,) + chunk_idx.shape[-1:])
    rgb_f = rgb_cov.reshape((-1,) + rgb_cov.shape[-3:])
    cov_f = cov8.reshape((-1,) + cov8.shape[-2:])
    if background_flat is None:
        rgb = jax.vmap(lambda i, r, c: one_view(i, r, c, None))(
            idx_f, rgb_f, cov_f)
    else:
        rgb = jax.vmap(one_view)(
            idx_f, rgb_f, cov_f,
            background_flat.reshape((-1,) + background_flat.shape[-2:]))
    return rgb.reshape(lead + (h, w, 3))


def flatten_background(frame: jnp.ndarray, k: int) -> jnp.ndarray:
    """(..., H, W, 3) -> (..., H*W/K + 1, K*3): a background frame in
    ``shade_compact_rgb``'s flat window layout (pure row-major reshape)
    plus the trailing trash row the pad slots land in. Meant for HOISTED
    constants (style/content backgrounds) — per-step noise should be
    generated directly in the flat shape instead."""
    h, w = frame.shape[-3], frame.shape[-2]
    flat = frame.reshape(frame.shape[:-3] + (h * w // k, k * 3))
    pad = jnp.zeros(flat.shape[:-2] + (1, k * 3), flat.dtype)
    return jnp.concatenate([flat, pad], axis=-2)


def shade_textured(
    face_verts: jnp.ndarray,      # (F, 3, 3) screen verts (differentiable)
    pix_to_face: jnp.ndarray,     # (H, W)
    verts_uvs: jnp.ndarray,       # (Vt, 2)
    faces_uvs: jnp.ndarray,       # (F, 3)
    texture: jnp.ndarray,         # (Ht, Wt, 3)
    background_color: Tuple[float, float, float] = (1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Ambient-shaded RGBA image (H, W, 4): texel color where covered,
    ``background_color`` elsewhere, alpha = hard coverage.

    Matches the reference's effective shader: ambient-only lights make Phong
    == texel lookup; BlendParams' default background is white so
    ``apply_background('white')`` is a no-op (reference utils.py:29-30), and
    the mask is alpha > 0 (utils.py:72).
    """
    uv, mask = pixel_uvs(face_verts, pix_to_face, verts_uvs, faces_uvs)
    return shade_from_uvs(texture, uv, mask, background_color)
