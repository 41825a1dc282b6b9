"""K-face rasterization + full SoftRas softmax-z aggregation
(``faces_per_pixel > 1``; SURVEY.md D4's "soft aggregation ... softmax-z",
Liu et al. arXiv:1904.01786 per PAPERS.md).

Per pixel the rasterizer keeps the K nearest-by-depth faces whose signed
boundary distance exceeds ``-window_px`` (covering faces and near-misses in
the blur region). Shading computes per-face soft coverage
``D_k = sigmoid(d_k / sigma)`` and blends colors with depth-softmax weights

    w_k ∝ D_k * exp(znorm_k / gamma),   w_bg ∝ exp(eps / gamma),

where znorm is the [0, 1]-normalized closeness; silhouette alpha is
``1 - prod_k (1 - D_k)``. As sigma, gamma -> 0 this converges to the hard
renderer. Selection (the top-K ids) is discrete; all blend math is
recomputed differentiably in XLA from the projected vertices — the same
architecture as the K=1 paths (rasterize.py docstring).

Backends: bruteforce (oracle), a chunked-XLA scan, and a Pallas TPU
kernel (st3d.kernels.raster_pallas.rasterize_pallas_topk) — all agree
bit-for-bit (ranking by raw affine inverse depth).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from st3d.render.rasterize import _pixel_depth_and_cover
from st3d.render.shading import (
    barycentrics_of_triangles,
    sample_texture,
)
from st3d.render.soft import signed_distance_to_faces


@struct.dataclass
class KFragments:
    """Top-K visibility: pix_to_face (H, W, K) int32 sorted near-to-far
    (-1 = no eligible face in that slot)."""

    pix_to_face: jnp.ndarray


def rasterize_topk_bruteforce(
    face_verts: jnp.ndarray, image_size: int, k: int,
    window_px: float, image_height: int = None,
) -> KFragments:
    w = image_size
    h = image_height if image_height is not None else image_size
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    py, px = jnp.meshgrid(ys, xs, indexing="ij")
    covered, z, sdist, inv_z = _pixel_depth_and_cover(
        face_verts, px.reshape(-1), py.reshape(-1)
    )  # (P, F)
    eligible = sdist > -window_px
    # Rank by the RAW affine inv_z (near-tangent faces can extrapolate
    # inv_z <= 0 and rank last) — identical ordering to the Pallas kernel.
    invz = jnp.where(eligible, inv_z, -jnp.inf)
    kk = min(k, invz.shape[1])
    scores, idx = jax.lax.top_k(invz, kk)  # (P, kk)
    ids = jnp.where(scores > -jnp.inf, idx, -1).astype(jnp.int32)
    if kk < k:
        ids = jnp.concatenate(
            [ids, jnp.full((ids.shape[0], k - kk), -1, jnp.int32)], axis=1
        )
    return KFragments(pix_to_face=ids.reshape(h, w, k))


@functools.partial(
    jax.jit,
    static_argnums=(1, 2, 3),
    static_argnames=("row_block", "face_chunk", "image_height"),
)
def rasterize_topk_xla(
    face_verts: jnp.ndarray,
    image_size: int,
    k: int,
    window_px: float,
    *, row_block: int = 16, face_chunk: int = 512,
    image_height: int = None,
) -> KFragments:
    """Chunked scan carrying a per-pixel top-K (merge via top_k on the
    concatenation of the carry and the chunk's top-K)."""
    w = image_size
    h = image_height if image_height is not None else image_size
    f = face_verts.shape[0]
    fc = min(face_chunk, max(f, 1))
    n_chunks = -(-f // fc)
    pad = n_chunks * fc - f
    fv = jnp.pad(face_verts, ((0, pad), (0, 0), (0, 0)))
    fv_chunks = fv.reshape(n_chunks, fc, 3, 3)

    rb = min(row_block, h)
    while h % rb:
        rb -= 1
    n_blocks = h // rb
    xs = jnp.arange(w, dtype=jnp.float32)

    def do_block(block_idx):
        ysb = block_idx * rb + jnp.arange(rb, dtype=jnp.float32)
        pyb, pxb = jnp.meshgrid(ysb, xs, indexing="ij")
        pxf = pxb.reshape(-1)
        pyf = pyb.reshape(-1)
        p = rb * w

        def scan_chunk(carry, inp):
            best_scores, best_ids = carry          # (P, K) each
            chunk_idx, chunk = inp
            covered, z, sd, inv_z = _pixel_depth_and_cover(chunk, pxf, pyf)
            eligible = sd > -window_px
            invz = jnp.where(eligible, inv_z, -jnp.inf)
            kk = min(k, invz.shape[1])
            cs, ci = jax.lax.top_k(invz, kk)       # chunk top-k
            ci = ci + chunk_idx * fc
            if kk < k:
                fill = k - kk
                cs = jnp.concatenate(
                    [cs, jnp.full((p, fill), -jnp.inf)], axis=1
                )
                ci = jnp.concatenate(
                    [ci, jnp.zeros((p, fill), ci.dtype)], axis=1
                )
            merged_s = jnp.concatenate([best_scores, cs], axis=1)
            merged_i = jnp.concatenate([best_ids, ci], axis=1)
            ms, sel = jax.lax.top_k(merged_s, k)
            mi = jnp.take_along_axis(merged_i, sel, axis=1)
            return (ms, mi), None

        init = (
            jnp.full((p, k), -jnp.inf, jnp.float32),
            jnp.zeros((p, k), jnp.int32),
        )
        (scores, ids), _ = jax.lax.scan(
            scan_chunk, init, (jnp.arange(n_chunks), fv_chunks)
        )
        ids = jnp.where(scores > -jnp.inf, ids, -1)
        return ids.reshape(rb, w, k).astype(jnp.int32)

    ids = jax.lax.map(do_block, jnp.arange(n_blocks))
    return KFragments(pix_to_face=ids.reshape(h, w, k))


def rasterize_topk(face_verts, settings, window_px: float = None
                   ) -> KFragments:
    """Single-view top-K dispatch (all three backends agree bit-for-bit;
    scores are the raw affine inverse depths). ``window_px`` overrides the
    soft-mode default eligibility window (used by the hard blur path)."""
    window = (3.0 * settings.soft_sigma_px if window_px is None
              else window_px)
    k = settings.faces_per_pixel
    face_verts = jax.lax.stop_gradient(face_verts)
    backend = settings.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "bruteforce":
        return rasterize_topk_bruteforce(
            face_verts, settings.image_size, k, window
        )
    if backend == "pallas":
        from st3d.kernels.raster_pallas import rasterize_pallas_topk

        ids = rasterize_pallas_topk(
            face_verts[None], settings.image_size, k, window
        )[0]
        return KFragments(pix_to_face=ids)
    return rasterize_topk_xla(
        face_verts, settings.image_size, k, window
    )


def shade_softras(
    face_verts: jnp.ndarray,      # (F, 3, 3) differentiable screen verts
    pix_to_face_k: jnp.ndarray,   # (H, W, K) near-to-far, -1 empty
    verts_uvs: jnp.ndarray,
    faces_uvs: jnp.ndarray,
    texture: jnp.ndarray,
    sigma_px: float = 1.0,
    gamma: float = 1e-2,
    znear: float = 0.1,
    zfar: float = 100.0,
    background_color: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    bg_eps: float = 0.0,
) -> jnp.ndarray:
    """Full SoftRas color aggregation over the K faces; RGBA (H, W, 4)."""
    h, w, k = pix_to_face_k.shape
    valid = pix_to_face_k >= 0
    safe = jnp.maximum(pix_to_face_k, 0)

    f = face_verts.shape[0]
    face_uv = verts_uvs[faces_uvs]
    pack = jnp.concatenate(
        [face_verts.reshape(f, 9), face_uv.reshape(f, 6)], axis=-1
    )
    g = pack[safe]                                        # (H, W, K, 15)
    tri = g[..., 0:9].reshape(h, w, k, 3, 3)
    uvf = g[..., 9:15].reshape(h, w, k, 3, 2)

    def per_slot(tri_k, uvf_k, ids_k):
        bary = barycentrics_of_triangles(tri_k)
        bary = jnp.maximum(bary, 0.0)
        bary = bary / jnp.maximum(
            jnp.sum(bary, axis=-1, keepdims=True), 1e-8
        )
        uv = jnp.sum(uvf_k * bary[..., None], axis=-2)
        rgb = sample_texture(texture, uv)                 # (H, W, 3)
        sd = signed_distance_to_faces(face_verts, jnp.maximum(ids_k, 0))
        z = jnp.sum(tri_k[..., 2] * bary, axis=-1)        # approx view z
        return rgb, sd, z

    rgb_k, sd_k, z_k = jax.vmap(
        per_slot, in_axes=(2, 2, 2), out_axes=(2, 2, 2)
    )(tri, uvf, pix_to_face_k)                            # (H, W, K, 3) ...

    d_cov = jax.nn.sigmoid(sd_k / sigma_px)
    d_cov = jnp.where(valid, d_cov, 0.0)

    # Silhouette: union of per-face soft coverages.
    alpha = 1.0 - jnp.prod(1.0 - d_cov, axis=-1)

    # Depth softmax: znorm in [0, 1], 1 = at znear.
    znorm = jnp.clip((zfar - z_k) / (zfar - znear), 0.0, 1.0)
    znorm = jnp.where(valid, znorm, -jnp.inf)
    m = jnp.maximum(jnp.max(znorm, axis=-1, keepdims=True), bg_eps)
    w_face = d_cov * jnp.exp((znorm - m) / gamma)
    w_bg = jnp.exp((bg_eps - m[..., 0]) / gamma)
    denom = jnp.sum(w_face, axis=-1) + w_bg
    bg = jnp.asarray(background_color, rgb_k.dtype)
    rgb = (
        jnp.sum(w_face[..., None] * rgb_k, axis=-2)
        + w_bg[..., None] * bg
    ) / denom[..., None]
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# Hard K-face fragments with blur_radius (PyTorch3D rasterizer API parity)
# ---------------------------------------------------------------------------

@struct.dataclass
class HardKFragments:
    """PyTorch3D-shaped rasterizer output (SURVEY.md D4:
    ``RasterizationSettings(image_size, blur_radius, faces_per_pixel)``,
    reference config first_approach.py:107): per pixel the K nearest-by-depth
    candidate faces, where a candidate either covers the pixel or lies within
    the blur window (squared NDC distance < blur_radius).

    pix_to_face: (N, H, W, K) int32, near-to-far, -1 = empty slot.
    zbuf:        (N, H, W, K) perspective-correct view z (-1 empty).
    bary:        (N, H, W, K, 3) perspective-correct barycentrics, clipped
                 to >= 0 outside the face like PyTorch3D's blur candidates
                 are NOT — raw (possibly negative) values kept (-1 empty).
    dists:       (N, H, W, K) signed SQUARED NDC distance of the pixel to
                 the face boundary, PyTorch3D sign convention (negative
                 inside, positive outside; -1 empty).
    saturated:   (N,) int32 count of AT-RISK pixels: every selection slot
                 (K + slack) was filled AND at least one was rejected by the
                 exact filter — a true candidate MAY have been evicted
                 there. 0 => the output is provably exact. Re-rasterize with
                 a larger ``settings.hard_k_slack`` when nonzero.
    """

    pix_to_face: jnp.ndarray
    zbuf: jnp.ndarray
    bary: jnp.ndarray
    dists: jnp.ndarray
    saturated: jnp.ndarray = None


def blur_window_px(blur_radius: float, image_size: int) -> float:
    """PyTorch3D's blur_radius is a squared NDC distance; candidates satisfy
    dist_ndc**2 < blur_radius, i.e. |dist_px| < sqrt(blur) * size / 2 (NDC
    spans 2 units over the image)."""
    import math

    return math.sqrt(max(float(blur_radius), 0.0)) * image_size / 2.0


def rasterize_hard_k(face_verts: jnp.ndarray, settings) -> HardKFragments:
    """Hard-mode rasterization with faces_per_pixel >= 1 and blur_radius >= 0
    for a view batch ``face_verts`` (N, F, 3, 3).

    Selection runs on the discrete top-K machinery (proxy signed distance,
    a provable lower bound of the exact distance, so the candidate set is a
    superset) with ``slack`` extra slots; the differentiable epilogue
    recomputes EXACT segment-clamped distances, filters to PyTorch3D's
    admission rule, and compacts the surviving slots near-to-far. Exact
    unless more than ``slack`` proxy-only candidates precede a true
    candidate in depth order (impossible at the reference's K=1/blur=0).
    """
    k = settings.faces_per_pixel
    size = settings.image_size
    blur = float(settings.blur_radius)
    window = blur_window_px(blur, size)
    face_verts = jax.lax.stop_gradient(face_verts)

    backend = settings.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    # Proxy eligibility needs a slightly positive window so boundary pixels
    # (exact sd == 0) are admitted at blur == 0; exact filter below. Slack
    # slots absorb proxy-only candidates that the exact filter removes.
    win_eff = max(window, 1e-3)
    slack = settings.hard_k_slack if (blur > 0.0 or k > 1) else 0
    kk = k + slack
    if backend == "pallas":
        from st3d.kernels.raster_pallas import rasterize_pallas_topk

        ids = rasterize_pallas_topk(face_verts, size, kk, win_eff)
    elif backend == "bruteforce":
        ids = jax.vmap(
            lambda fv: rasterize_topk_bruteforce(
                fv, size, kk, win_eff
            ).pix_to_face
        )(face_verts)
    else:
        ids = jax.vmap(
            lambda fv: rasterize_topk_xla(
                fv, size, kk, win_eff
            ).pix_to_face
        )(face_verts)

    def epilogue(fv, ids_k):               # (F, 3, 3), (H, W, K)
        valid = ids_k >= 0
        safe = jnp.maximum(ids_k, 0)

        def per_slot(ids_s):
            tri = fv[ids_s]                 # (H, W, 3, 3)
            bary = barycentrics_of_triangles(tri)
            # bary are already perspective-correct -> interpolate z directly.
            z = jnp.sum(bary * tri[..., 2], axis=-1)
            sd_px = signed_distance_to_faces(fv, ids_s)  # + inside
            return bary, z, sd_px

        bary, z, sd_px = jax.vmap(
            per_slot, in_axes=2, out_axes=(2, 2, 2)
        )(safe)                             # (H, W, K, 3), (H, W, K) x2

        # PyTorch3D sign convention + NDC squared units.
        sd_ndc = sd_px * (2.0 / size)
        dists = -jnp.sign(sd_px) * sd_ndc * sd_ndc

        # Exact admission: covers the pixel, or within the blur window.
        keep = valid & ((sd_px >= 0.0) | (dists < blur))
        # A pixel is AT RISK of a missed candidate iff the selection was
        # saturated (every K+slack slot valid) and the exact filter removed
        # at least one slot — an evicted (slack+1)-th proxy-only candidate
        # could have hidden a true one behind it.
        risky = jnp.all(valid, axis=-1) & jnp.any(valid & ~keep, axis=-1)
        n_risky = jnp.sum(risky.astype(jnp.int32))
        # Compact surviving slots near-to-far, drop the slack tail.
        order = jnp.argsort(~keep, axis=-1, stable=True)
        take = lambda a: jnp.take_along_axis(a, order, axis=-1)[..., :k]
        keep_c = take(keep)
        ids_out = jnp.where(keep_c, take(ids_k), -1)
        zbuf = jnp.where(keep_c, take(z), -1.0)
        dists_c = jnp.where(keep_c, take(dists), -1.0)
        bary = jnp.take_along_axis(
            bary, order[..., None], axis=-2
        )[..., :k, :]
        bary = jnp.where(keep_c[..., None], bary, -1.0)
        return ids_out, zbuf, bary, dists_c, n_risky

    ids_o, zbuf, bary, dists, n_risky = jax.vmap(epilogue)(face_verts, ids)
    return HardKFragments(
        pix_to_face=ids_o, zbuf=zbuf, bary=bary, dists=dists,
        saturated=n_risky,
    )


@functools.partial(jax.jit, static_argnums=(1,))
def _saturation_probe(fv, settings):
    """Module-level jit (settings is a static frozen dataclass): a fresh
    ``jax.jit(lambda ...)`` per call would miss jit's function-identity
    cache and recompile the full rasterizer on every saturation check."""
    return rasterize_hard_k(fv, settings).saturated


def check_hard_k_saturation(face_verts: jnp.ndarray, settings,
                            context: str = "render") -> int:
    """Host-side production check of the ``HardKFragments.saturated``
    diagnostic (VERDICT r3 item 6: it was computed and tested but nothing
    on a production path ever read it, so a saturating blur/fpp>1 run
    silently proceeded on inexact selection).

    Rasterizes ``face_verts`` (N, F, 3, 3) once with the configured
    settings, pulls the per-view at-risk pixel counts to the host, and
    emits a ``warnings.warn`` with the remedy when any are nonzero.
    Returns the total count (0 = provably exact). No-op (returns 0
    without rasterizing) when the config cannot saturate: soft mode, or
    hard mode with blur_radius == 0 and faces_per_pixel == 1.
    """
    if settings.soft or (
        float(settings.blur_radius) == 0.0 and settings.faces_per_pixel == 1
    ):
        return 0
    import warnings

    sat = _saturation_probe(jax.lax.stop_gradient(face_verts), settings)
    total = int(jnp.sum(sat))
    if total:
        warnings.warn(
            f"hard-K rasterization saturated at {total} pixel(s) during "
            f"{context}: every selection slot (K={settings.faces_per_pixel}"
            f" + slack={settings.hard_k_slack}) filled and the exact "
            "filter rejected at least one — a true candidate may have "
            "been evicted, so face selection at those pixels is not "
            "provably exact. Remedy: raise settings.hard_k_slack "
            f"(--hard_k_slack; try {2 * settings.hard_k_slack}) and "
            "re-run.",
            stacklevel=2,
        )
    return total
