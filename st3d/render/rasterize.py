"""Rasterization: per-pixel visibility (winning face id + depth).

TPU-native replacement for PyTorch3D's ``MeshRasterizer`` +
``RasterizationSettings`` C++/CUDA kernel (reference config:
first_approach.py:107 ``RasterizationSettings(image_size=size,
blur_radius=0.0, faces_per_pixel=1)``; SURVEY.md D4).

Architecture ("discrete visibility in the kernel, differentiable math in
XLA"): rasterization here returns only the **non-differentiable** quantities —
``pix_to_face`` (int32 winning face per pixel, -1 = background) and ``zbuf``.
Barycentrics are *recomputed differentiably* from the projected vertices in
:mod:`st3d.render.shading`, so gradients w.r.t. vertices flow through
ordinary XLA autodiff and no custom VJP is needed on the hot path. This
matches the gradient semantics of PyTorch3D's hard rasterizer (pix_to_face is
non-differentiable there too; barycentrics carry the vertex gradients).

Three interchangeable backends behind :func:`rasterize`:
  * ``"bruteforce"`` — (P, F) broadcast; oracle for tests, tiny sizes only.
  * ``"xla"``        — memory-bounded nested scan (row blocks x face chunks);
                       runs on any backend, used on CPU and under the
                       multi-chip dry-run.
  * ``"pallas"``     — tiled TPU kernel (st3d.kernels.raster_pallas), the
                       production path on TPU.

Conventions: face vertices arrive as screen-space ``(x_pix, y_pix, z_view)``
(see st3d.core.cameras.transform_points_screen); pixel (i, j) center is at
(x=j, y=i); depth is perspective-correct interpolated view z; winding is not
culled (faces visible from both sides, PyTorch3D default
cull_backfaces=False); ties in depth go to the lower face index.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

Z_EPS = 1e-5          # faces with any vertex at view-z below this are dropped
AREA_EPS = 1e-10      # degenerate-triangle rejection threshold
BIG_Z = 1e10


@struct.dataclass
class RasterizationSettings:
    """Mirror of PyTorch3D's RasterizationSettings for the options the
    reference exercises, plus soft-rasterization knobs.

    blur_radius / faces_per_pixel are accepted for API parity; the hard path
    (blur=0, fpp=1 — the reference's setting) is what the fast kernels
    implement. ``sigma``/``gamma`` drive the optional soft silhouette mode in
    st3d.render.soft.
    """

    image_size: int = struct.field(pytree_node=False, default=256)
    blur_radius: float = struct.field(pytree_node=False, default=0.0)
    faces_per_pixel: int = struct.field(pytree_node=False, default=1)
    backend: str = struct.field(pytree_node=False, default="auto")
    sigma: float = struct.field(pytree_node=False, default=1e-4)
    gamma: float = struct.field(pytree_node=False, default=1e-4)
    # Soft (SoftRas-style) mode: rasterizers additionally report the nearest
    # face per pixel (by signed boundary distance) and shading blends a
    # sigmoid(dist / soft_sigma_px) coverage — giving nonzero SILHOUETTE
    # gradients w.r.t. vertices, which the hard path (and the reference at
    # blur_radius=0) structurally lacks. soft_sigma_px is in pixel units.
    soft: bool = struct.field(pytree_node=False, default=False)
    soft_sigma_px: float = struct.field(pytree_node=False, default=1.0)
    # Extra top-K selection slots absorbing proxy-admitted candidates that
    # the exact distance filter later rejects (hard blur/K>1 path only; see
    # topk.rasterize_hard_k). Selection is exact unless more than this many
    # proxy-only candidates precede a true candidate in depth order — the
    # HardKFragments.saturated diagnostic counts at-risk pixels; raise the
    # slack if it reports nonzero.
    hard_k_slack: int = struct.field(pytree_node=False, default=4)


@struct.dataclass
class Fragments:
    """Per-pixel rasterization output for one view (K = faces_per_pixel = 1).

    pix_to_face:  (H, W) int32, -1 where no face covers the pixel.
    zbuf:         (H, W) float32 perspective-correct view-space depth
                  (BIG_Z where uncovered).
    nearest_face: optional (H, W) int32 — the face with the largest signed
                  boundary distance at this pixel (== the covering face when
                  covered, the closest face when not). Populated only in
                  soft mode; drives silhouette gradients in
                  st3d.render.soft.
    """

    pix_to_face: jnp.ndarray
    zbuf: jnp.ndarray
    nearest_face: Optional[jnp.ndarray] = None


def _face_valid(face_verts: jnp.ndarray) -> jnp.ndarray:
    """(F,) mask: in front of camera and non-degenerate in screen space."""
    z_ok = jnp.all(face_verts[:, :, 2] > Z_EPS, axis=1)
    x0, y0 = face_verts[:, 0, 0], face_verts[:, 0, 1]
    x1, y1 = face_verts[:, 1, 0], face_verts[:, 1, 1]
    x2, y2 = face_verts[:, 2, 0], face_verts[:, 2, 1]
    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    return z_ok & (jnp.abs(area) > AREA_EPS)


def _pixel_depth_and_cover(face_verts, px, py):
    """Coverage and perspective-correct depth of faces at pixel points.

    face_verts: (F, 3, 3); px, py: (...,) pixel coordinates broadcastable
    against a trailing face axis added here. Returns (covered, z) each of
    shape broadcast(px.shape, F).
    """
    x0 = face_verts[:, 0, 0]
    y0 = face_verts[:, 0, 1]
    x1 = face_verts[:, 1, 0]
    y1 = face_verts[:, 1, 1]
    x2 = face_verts[:, 2, 0]
    y2 = face_verts[:, 2, 1]
    z0 = face_verts[:, 0, 2]
    z1 = face_verts[:, 1, 2]
    z2 = face_verts[:, 2, 2]

    px = px[..., None]
    py = py[..., None]

    # Edge functions -> unnormalized barycentrics (w0 opposite v0, etc.).
    w0 = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
    w1 = (x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)
    w2 = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)

    # Normalize by signed area: handles both windings (no backface culling).
    inv_area = jnp.where(jnp.abs(area) > AREA_EPS, 1.0 / area, 0.0)
    b0 = w0 * inv_area
    b1 = w1 * inv_area
    b2 = w2 * inv_area
    covered = (b0 >= 0.0) & (b1 >= 0.0) & (b2 >= 0.0)

    # Perspective-correct depth: 1/z is affine in screen space.
    inv_z = b0 / z0 + b1 / z1 + b2 / z2
    z = 1.0 / jnp.maximum(inv_z, 1e-12)

    valid = _face_valid(face_verts)
    covered = covered & valid

    # Signed boundary distance in pixel units: b_k * |area| / |edge_k| is
    # the metric distance to edge k (positive inside). min over edges is
    # exact in edge regions and a lower bound near corners — the proxy used
    # for nearest-face selection in soft mode.
    def edge_len(xa, ya, xb, yb):
        return jnp.sqrt((xb - xa) ** 2 + (yb - ya) ** 2) + 1e-12

    abs_area = jnp.abs(area)
    d0 = b0 * abs_area / edge_len(x1, y1, x2, y2)
    d1 = b1 * abs_area / edge_len(x2, y2, x0, y0)
    d2 = b2 * abs_area / edge_len(x0, y0, x1, y1)
    sdist = jnp.minimum(jnp.minimum(d0, d1), d2)
    # Gate by bbox proximity: the edge-LINE distance wildly overestimates
    # closeness for pixels beyond an edge's endpoints (a face 200px away
    # whose edge line passes through the pixel gets sd ~ 0). min with the
    # signed bbox distance keeps selection proximity-sane; same rule in the
    # Pallas kernels (bit-identical selection across backends).
    xmin = jnp.minimum(jnp.minimum(x0, x1), x2)
    xmax = jnp.maximum(jnp.maximum(x0, x1), x2)
    ymin = jnp.minimum(jnp.minimum(y0, y1), y2)
    ymax = jnp.maximum(jnp.maximum(y0, y1), y2)
    bbox_sd = jnp.minimum(
        jnp.minimum(px - xmin, xmax - px),
        jnp.minimum(py - ymin, ymax - py),
    )
    sdist = jnp.minimum(sdist, bbox_sd)
    sdist = jnp.where(valid, sdist, -jnp.inf)
    return covered, z, sdist, inv_z


def rasterize_bruteforce(
    face_verts: jnp.ndarray, image_size: int, soft: bool = False,
    image_height: int = None,
) -> Fragments:
    """Golden-oracle rasterizer: full (H*W, F) broadcast. Use at <=128**2."""
    w = image_size
    h = image_height if image_height is not None else image_size
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    py, px = jnp.meshgrid(ys, xs, indexing="ij")
    covered, z, sdist, _ = _pixel_depth_and_cover(
        face_verts, px.reshape(-1), py.reshape(-1)
    )  # (P, F)
    zm = jnp.where(covered, z, BIG_Z)
    best = jnp.argmin(zm, axis=1)  # lowest index wins ties (argmin semantics)
    best_z = jnp.take_along_axis(zm, best[:, None], axis=1)[:, 0]
    hit = best_z < BIG_Z
    pix_to_face = jnp.where(hit, best, -1).astype(jnp.int32)
    nearest = None
    if soft:
        nearest = jnp.argmax(sdist, axis=1).astype(jnp.int32).reshape(h, w)
    return Fragments(
        pix_to_face=pix_to_face.reshape(h, w),
        zbuf=best_z.reshape(h, w),
        nearest_face=nearest,
    )


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def rasterize_xla(
    face_verts: jnp.ndarray,
    image_size: int,
    row_block: int = 16,
    face_chunk: int = 512,
    soft: bool = False,
    image_height: int = None,
) -> Fragments:
    """Memory-bounded rasterizer in pure XLA: lax.map over row blocks,
    lax.scan over face chunks with a running (z, face-id) minimum.

    Works on every backend; the CPU production path and the oracle for the
    Pallas kernel at realistic sizes.
    """
    w = image_size
    h = image_height if image_height is not None else image_size
    f = face_verts.shape[0]
    fc = min(face_chunk, max(f, 1))
    n_chunks = -(-f // fc)
    pad = n_chunks * fc - f
    fv = jnp.pad(face_verts, ((0, pad), (0, 0), (0, 0)))
    # Padded faces have all-zero verts -> invalid (area 0, z 0) -> ignored.
    fv_chunks = fv.reshape(n_chunks, fc, 3, 3)

    rb = min(row_block, h)
    while h % rb:
        rb -= 1
    n_blocks = h // rb
    xs = jnp.arange(w, dtype=jnp.float32)

    def do_block(block_idx):
        ys = block_idx * rb + jnp.arange(rb, dtype=jnp.float32)
        py, px = jnp.meshgrid(ys, xs, indexing="ij")
        px = px.reshape(-1)
        py = py.reshape(-1)

        def scan_chunk(carry, inp):
            best_z, best_f, best_sd, best_sf = carry
            chunk_idx, chunk = inp
            covered, z, sd, _ = _pixel_depth_and_cover(chunk, px, py)  # (P, fc)
            zm = jnp.where(covered, z, BIG_Z)
            arg = jnp.argmin(zm, axis=1)
            zc = jnp.take_along_axis(zm, arg[:, None], axis=1)[:, 0]
            fidc = chunk_idx * fc + arg
            better = zc < best_z  # strict: earlier (lower) face wins ties
            if soft:  # static: the nearest-face carry exists only in soft mode
                sarg = jnp.argmax(sd, axis=1)
                sdc = jnp.take_along_axis(sd, sarg[:, None], axis=1)[:, 0]
                sbetter = sdc > best_sd
                best_sd = jnp.where(sbetter, sdc, best_sd)
                best_sf = jnp.where(sbetter, chunk_idx * fc + sarg, best_sf)
            return (
                jnp.where(better, zc, best_z),
                jnp.where(better, fidc, best_f),
                best_sd,
                best_sf,
            ), None

        init = (
            jnp.full((rb * w,), BIG_Z, jnp.float32),
            jnp.full((rb * w,), -1, jnp.int32),
            jnp.full((rb * w,), -jnp.inf, jnp.float32),
            jnp.full((rb * w,), 0, jnp.int32),
        )
        (best_z, best_f, _, best_sf), _ = jax.lax.scan(
            scan_chunk, init, (jnp.arange(n_chunks), fv_chunks)
        )
        best_f = jnp.where(best_z < BIG_Z, best_f, -1)
        return (
            best_f.reshape(rb, w).astype(jnp.int32),
            best_z.reshape(rb, w),
            best_sf.reshape(rb, w).astype(jnp.int32),
        )

    pix_to_face, zbuf, nearest = jax.lax.map(do_block, jnp.arange(n_blocks))
    return Fragments(
        pix_to_face=pix_to_face.reshape(h, w),
        zbuf=zbuf.reshape(h, w),
        nearest_face=nearest.reshape(h, w) if soft else None,
    )


def resolve_backend(settings: RasterizationSettings) -> str:
    backend = settings.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend not in ("bruteforce", "xla", "pallas"):
        raise ValueError(f"unknown rasterizer backend {backend!r}")
    return backend


def rasterize(
    face_verts: jnp.ndarray,
    settings: RasterizationSettings,
) -> Fragments:
    """Rasterize one view (F, 3, 3) with the configured backend."""
    frags = rasterize_batch(face_verts[None], settings)
    return Fragments(
        pix_to_face=frags.pix_to_face[0],
        zbuf=frags.zbuf[0],
        # Soft mode's extra plane must survive the unbatching — dropping
        # it would crash (or silently de-gradient) shade_soft callers.
        nearest_face=(frags.nearest_face[0]
                      if frags.nearest_face is not None else None),
    )


def rasterize_batch(
    face_verts: jnp.ndarray,      # (N, F, 3, 3)
    settings: RasterizationSettings,
    image_height: int = None,
) -> Fragments:
    """Rasterize a batch of views; Fragments fields get a leading N axis.

    The Pallas backend batches natively (views ride the kernel grid). The
    XLA backends batch through vmap. IMPORTANT: never wrap the Pallas path
    in jax.vmap yourself — pallas_call's batching rule combined with
    autodiff silently returned empty coverage on TPU; this entry point is
    the supported batched API.
    """
    # Visibility is discrete: face ids carry no gradient (hard-raster
    # semantics; vertex gradients flow through the differentiable bary
    # recompute in shading.py instead). stop_gradient also keeps autodiff
    # from trying to differentiate the Pallas kernel (no VJP defined) and
    # prunes dead backward compute from the XLA backends.
    face_verts = jax.lax.stop_gradient(face_verts)
    backend = resolve_backend(settings)
    if not settings.soft and (
        settings.blur_radius != 0.0 or settings.faces_per_pixel != 1
    ):
        # PyTorch3D hard semantics with a blur window and/or K slots
        # (RasterizationSettings at reference first_approach.py:107): the
        # winner may be a non-covering face within sqrt(blur_radius) NDC of
        # the pixel. Full K-deep output (zbuf/bary/dists) via
        # st3d.render.topk.rasterize_hard_k; this entry keeps the
        # Fragments contract by taking the nearest slot.
        if image_height is not None and image_height != settings.image_size:
            # The hard-K machinery rasterizes full frames only; silently
            # ignoring the band height would hand a tiled caller (N, H, W)
            # frames where it expects (N, rows, W) — shard_map would then
            # CONCATENATE the full frames into corrupt output with no
            # error anywhere downstream.
            raise NotImplementedError(
                "banded rasterization (image_height="
                f"{image_height}) is not supported with blur_radius > 0 "
                "or faces_per_pixel > 1"
            )
        from st3d.render.topk import rasterize_hard_k

        hk = rasterize_hard_k(face_verts, settings)
        p2f = hk.pix_to_face[..., 0]
        zbuf = jnp.where(p2f >= 0, hk.zbuf[..., 0], BIG_Z)
        return Fragments(pix_to_face=p2f, zbuf=zbuf)
    if backend == "bruteforce":
        return jax.vmap(
            lambda fv: rasterize_bruteforce(
                fv, settings.image_size, soft=settings.soft,
                image_height=image_height,
            )
        )(face_verts)
    if backend == "xla":
        return jax.vmap(
            lambda fv: rasterize_xla(
                fv, settings.image_size, soft=settings.soft,
                image_height=image_height,
            )
        )(face_verts)
    from st3d.kernels.raster_pallas import rasterize_pallas_batched

    return rasterize_pallas_batched(
        face_verts, settings.image_size, soft=settings.soft,
        image_height=image_height, soft_sigma_px=settings.soft_sigma_px,
    )


def face_verts_screen(
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    cameras,
    image_size: int,
) -> jnp.ndarray:
    """Project mesh vertices and gather per-face screen verts.

    Returns (N_cams, F, 3, 3) of (x_pix, y_pix, z_view). Differentiable
    w.r.t. ``verts``; shared by every rasterizer backend and by the
    differentiable epilogue (bary recompute).
    """
    from st3d.core.cameras import transform_points_screen

    scr = transform_points_screen(cameras, verts, (image_size, image_size))
    return scr[:, faces]  # (N, F, 3, 3)
