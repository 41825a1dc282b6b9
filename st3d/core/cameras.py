"""Cameras: FoV perspective projection, look-at, axis-angle rotations, rigs.

TPU-native replacement for the PyTorch3D camera machinery the reference uses:
``FoVPerspectiveCameras`` (first_approach.py:16,106; utils.py:7,149,168),
``look_at_view_transform`` (utils.py:9,161) and ``RotateAxisAngle``
(utils.py:6,142), plus the two camera rigs ``build_fixed_cameras`` /
``build_random_cameras`` (utils.py:121-170).

Conventions (PyTorch3D-compatible, so camera configs carry over):
  * Row vectors: ``X_view = X_world @ R + T``.
  * View space: camera looks down **+Z**; points in front have z_view > 0.
  * NDC: **+X left, +Y up** in the image. Pixel (row i, col j) center maps to
    ``ndc = (1 - 2*(j+0.5)/W, 1 - 2*(i+0.5)/H)``.
  * FoV projection: ``x_ndc = x_view / (tan(fov/2)*aspect) / z_view``,
    ``y_ndc = y_view / tan(fov/2) / z_view``. Defaults fov=60deg, znear=1.0,
    zfar=100.0, aspect=1.0 (PyTorch3D defaults).

Everything is a pytree / pure function, so projection participates in jit,
vmap-over-views and autodiff (vertex gradients flow through the projection).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple, Union

import numpy as np
import jax.numpy as jnp
from flax import struct

Array = jnp.ndarray


@struct.dataclass
class FoVPerspectiveCameras:
    """A batch of N perspective cameras (N may be 1).

    Attributes:
      R: (N, 3, 3) world->view rotation, applied to row vectors (X @ R).
      T: (N, 3) world->view translation.
      fov: (N,) field of view in degrees.
      znear / zfar: (N,) clip planes.
      aspect_ratio: (N,) width/height aspect of the frustum.
    """

    R: Array
    T: Array
    fov: Array
    znear: Array
    zfar: Array
    aspect_ratio: Array

    @classmethod
    def create(
        cls,
        R=None,
        T=None,
        fov: float = 60.0,
        znear: float = 1.0,
        zfar: float = 100.0,
        aspect_ratio: float = 1.0,
    ) -> "FoVPerspectiveCameras":
        if R is None:
            R = jnp.eye(3)[None]
        R = jnp.asarray(R, jnp.float32)
        if R.ndim == 2:
            R = R[None]
        n = R.shape[0]
        if T is None:
            T = jnp.zeros((n, 3))
        T = jnp.asarray(T, jnp.float32)
        if T.ndim == 1:
            T = T[None]

        def _bc(x):
            x = jnp.asarray(x, jnp.float32)
            return jnp.broadcast_to(jnp.atleast_1d(x), (n,))

        return cls(
            R=R,
            T=T,
            fov=_bc(fov),
            znear=_bc(znear),
            zfar=_bc(zfar),
            aspect_ratio=_bc(aspect_ratio),
        )

    def __len__(self) -> int:
        return self.R.shape[0]

    def __getitem__(self, idx) -> "FoVPerspectiveCameras":
        if isinstance(idx, int):
            idx = slice(idx, idx + 1)
        return FoVPerspectiveCameras(
            R=self.R[idx],
            T=self.T[idx],
            fov=self.fov[idx],
            znear=self.znear[idx],
            zfar=self.zfar[idx],
            aspect_ratio=self.aspect_ratio[idx],
        )


def world_to_view(cameras: FoVPerspectiveCameras, points: Array) -> Array:
    """(N, V, 3) view-space points from (V, 3) or (N, V, 3) world points."""
    pts = jnp.asarray(points, jnp.float32)
    if pts.ndim == 2:
        pts = pts[None]
    # Row-vector convention: X_view = X_world @ R + T.
    return jnp.einsum("nvj,njk->nvk", pts, cameras.R) + cameras.T[:, None, :]


def view_to_ndc(cameras: FoVPerspectiveCameras, pts_view: Array) -> Array:
    """Perspective projection; returns (N, V, 3) of (x_ndc, y_ndc, z_view).

    z_view (not NDC z) is kept as the depth coordinate: it is monotonic in
    NDC z inside the frustum and better conditioned for perspective-correct
    barycentrics.
    """
    tan_half = jnp.tan(jnp.deg2rad(cameras.fov) * 0.5)  # (N,)
    sx = 1.0 / (tan_half * cameras.aspect_ratio)
    sy = 1.0 / tan_half
    z = pts_view[..., 2]
    # Guard against division by ~0 for points near the camera plane.
    z_safe = jnp.where(jnp.abs(z) < 1e-8, jnp.where(z < 0, -1e-8, 1e-8), z)
    x_ndc = pts_view[..., 0] * sx[:, None] / z_safe
    y_ndc = pts_view[..., 1] * sy[:, None] / z_safe
    return jnp.stack([x_ndc, y_ndc, z], axis=-1)


def ndc_to_screen(ndc: Array, image_size: Tuple[int, int]) -> Array:
    """Map NDC (+X left, +Y up) to pixel coordinates.

    Pixel (i, j) CENTER is at screen (x=j, y=i): ``x = (1-x_ndc)*W/2 - 0.5``.
    Depth (last channel) passes through.
    """
    h, w = image_size
    x = (1.0 - ndc[..., 0]) * (w * 0.5) - 0.5
    y = (1.0 - ndc[..., 1]) * (h * 0.5) - 0.5
    return jnp.stack([x, y, ndc[..., 2]], axis=-1)


def transform_points_screen(
    cameras: FoVPerspectiveCameras, points: Array, image_size: Tuple[int, int]
) -> Array:
    """World -> screen-pixel coordinates (x_pix, y_pix, z_view); (N, V, 3)."""
    return ndc_to_screen(view_to_ndc(cameras, world_to_view(cameras, points)),
                         image_size)


# ---------------------------------------------------------------------------
# Rotations and look-at
# ---------------------------------------------------------------------------

def rotate_axis_angle(angle: Union[float, Array], axis: str = "X",
                      degrees: bool = True) -> Array:
    """Rotation matrix for ROW vectors: ``p_rot = p @ R``.

    Counter-clockwise for positive angles when looking from the positive end
    of the axis (PyTorch3D ``RotateAxisAngle`` semantics, utils.py:142 uses
    ``.get_matrix()[..., :3, :3]`` of it). For row vectors this is the
    transpose of the standard column-vector rotation matrix.
    """
    a = jnp.asarray(angle, jnp.float32)
    if degrees:
        a = jnp.deg2rad(a)
    c, s = jnp.cos(a), jnp.sin(a)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    if axis.upper() == "X":
        rows = [[one, zero, zero], [zero, c, s], [zero, -s, c]]
    elif axis.upper() == "Y":
        rows = [[c, zero, -s], [zero, one, zero], [s, zero, c]]
    elif axis.upper() == "Z":
        rows = [[c, s, zero], [-s, c, zero], [zero, zero, one]]
    else:
        raise ValueError(f"axis must be X/Y/Z, got {axis!r}")
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def camera_position_from_spherical_angles(
    dist, elev, azim, degrees: bool = True, at=((0.0, 0.0, 0.0),)
) -> Array:
    """(N, 3) camera positions (PyTorch3D spherical convention)."""
    dist = jnp.atleast_1d(jnp.asarray(dist, jnp.float32))
    elev = jnp.atleast_1d(jnp.asarray(elev, jnp.float32))
    azim = jnp.atleast_1d(jnp.asarray(azim, jnp.float32))
    n = max(dist.shape[0], elev.shape[0], azim.shape[0])
    dist = jnp.broadcast_to(dist, (n,))
    elev = jnp.broadcast_to(elev, (n,))
    azim = jnp.broadcast_to(azim, (n,))
    if degrees:
        elev = jnp.deg2rad(elev)
        azim = jnp.deg2rad(azim)
    x = dist * jnp.cos(elev) * jnp.sin(azim)
    y = dist * jnp.sin(elev)
    z = dist * jnp.cos(elev) * jnp.cos(azim)
    at = jnp.broadcast_to(jnp.asarray(at, jnp.float32).reshape(-1, 3), (n, 3))
    return jnp.stack([x, y, z], axis=-1) + at


def look_at_rotation(camera_position: Array, at, up=((0.0, 1.0, 0.0),)) -> Array:
    """(N, 3, 3) rotation whose COLUMNS are the camera x/y/z axes."""
    pos = jnp.asarray(camera_position, jnp.float32).reshape(-1, 3)
    n = pos.shape[0]
    at = jnp.broadcast_to(jnp.asarray(at, jnp.float32).reshape(-1, 3), (n, 3))
    up = jnp.broadcast_to(jnp.asarray(up, jnp.float32).reshape(-1, 3), (n, 3))

    def _norm(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)

    z_axis = _norm(at - pos)
    x_axis = jnp.cross(up, z_axis)
    # Degenerate when up ~ parallel to the view direction: fall back to a
    # horizontal x-axis (PyTorch3D warns and substitutes similarly). The
    # first fallback axis is itself degenerate when the VIEW runs along
    # world Z (cross(Z, ±Z) = 0 — e.g. up=(0,0,1), camera on the Z axis),
    # so a second, orthogonal fallback axis covers that case; the two
    # cannot both be parallel to z_axis.
    bad = jnp.linalg.norm(x_axis, axis=-1, keepdims=True) < 1e-6
    fallback = jnp.cross(jnp.array([0.0, 0.0, 1.0]), z_axis)
    bad2 = jnp.linalg.norm(fallback, axis=-1, keepdims=True) < 1e-6
    fallback = jnp.where(
        bad2, jnp.cross(jnp.array([0.0, 1.0, 0.0]), z_axis), fallback
    )
    x_axis = _norm(jnp.where(bad, fallback, x_axis))
    y_axis = _norm(jnp.cross(z_axis, x_axis))
    return jnp.stack([x_axis, y_axis, z_axis], axis=-1)  # columns = axes


def look_at_view_transform(
    dist=1.0, elev=0.0, azim=0.0, degrees: bool = True,
    at=((0.0, 0.0, 0.0),), up=((0.0, 1.0, 0.0),),
) -> Tuple[Array, Array]:
    """R, T such that ``X_view = X_world @ R + T`` (PyTorch3D semantics;
    reference uses it at utils.py:161-166)."""
    pos = camera_position_from_spherical_angles(dist, elev, azim, degrees, at)
    n = pos.shape[0]
    at_b = jnp.broadcast_to(jnp.asarray(at, jnp.float32).reshape(-1, 3), (n, 3))
    R = look_at_rotation(pos, at_b, up)
    T = -jnp.einsum("nj,njk->nk", pos, R)
    return R, T


# ---------------------------------------------------------------------------
# Camera rigs (reference: utils.py:121-170)
# ---------------------------------------------------------------------------

def build_fixed_cameras(
    n_views: int, dist: float = 3.0, shuffle: bool = True, seed: int = 0
) -> FoVPerspectiveCameras:
    """Fixed rig: floor(n/2) rotations about X over linspace(0, 315) and the
    rest about Y over linspace(45, 315), angle list shuffled
    (reference: utils.py:121-151). Deterministic given ``seed``.
    """
    x_views = n_views // 2
    y_views = n_views - x_views
    angles = [(a, "X") for a in np.linspace(0.0, 315.0, max(x_views, 1))[:x_views]]
    angles += [(a, "Y") for a in np.linspace(45.0, 315.0, max(y_views, 1))[:y_views]]
    if shuffle:
        np.random.RandomState(seed).shuffle(angles)
    Rs = [rotate_axis_angle(a, axis) for a, axis in angles]
    R = jnp.stack(Rs, axis=0)
    T = jnp.broadcast_to(jnp.array([0.0, 0.0, dist], jnp.float32), (n_views, 3))
    return FoVPerspectiveCameras.create(R=R, T=T)


def build_random_cameras(
    n_views: int, dist: float = 2.10, seed: int = 0
) -> FoVPerspectiveCameras:
    """Random rig: elevation uniform on the sphere via cos(elev) ~ U(-1, 1),
    azimuth ~ U(-180, 180), look-at (0, 0.10, 0.25)
    (reference: utils.py:154-170). Deterministic given ``seed``.
    """
    rng = np.random.RandomState(seed)
    cos_elevs = rng.rand(n_views) * 2.0 - 1.0
    elevs = np.arccos(cos_elevs) * 180.0 / math.pi - 90.0
    azims = rng.rand(n_views) * 360.0 - 180.0
    R, T = look_at_view_transform(
        dist=dist, elev=elevs, azim=azims, at=((0.0, 0.10, 0.25),)
    )
    return FoVPerspectiveCameras.create(R=R, T=T)


def concatenate_cameras(
    cams: Sequence[FoVPerspectiveCameras],
) -> FoVPerspectiveCameras:
    return FoVPerspectiveCameras(
        R=jnp.concatenate([c.R for c in cams]),
        T=jnp.concatenate([c.T for c in cams]),
        fov=jnp.concatenate([c.fov for c in cams]),
        znear=jnp.concatenate([c.znear for c in cams]),
        zfar=jnp.concatenate([c.zfar for c in cams]),
        aspect_ratio=jnp.concatenate([c.aspect_ratio for c in cams]),
    )
