"""Host-side image I/O and conversions (PIL), device-side resize (XLA).

Replaces the reference's torchvision/PIL glue: ``load_as_tensor``
(utils.py:34-44 — PIL -> RGB -> resize(size,size) -> [0,1] float, **no
ImageNet normalization**), ``tensor_to_image`` (utils.py:56-61) and the
bilinear texture resize (first_approach.py:90-100, F.interpolate
align_corners=False — ``jax.image.resize`` uses the same half-pixel
convention).
"""

from __future__ import annotations

import os
import numpy as np
import jax.numpy as jnp
from PIL import Image


def load_as_tensor(image_path: str, size: int = 512) -> jnp.ndarray:
    """(3, size, size) float32 in [0, 1] (reference utils.py:34-44)."""
    img = Image.open(image_path).convert("RGB")
    img = img.resize((size, size), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return jnp.asarray(np.transpose(arr, (2, 0, 1)))


def tensor_to_image(tensor) -> Image.Image:
    """(3, H, W) or (1, 3, H, W) [0,1]-clamped tensor -> PIL image
    (reference utils.py:56-61)."""
    arr = np.asarray(tensor)
    if arr.ndim == 4:
        arr = arr[0]
    arr = np.clip(arr, 0.0, 1.0)
    arr = (np.transpose(arr, (1, 2, 0)) * 255.0 + 0.5).astype(np.uint8)
    return Image.fromarray(arr)


def save_image(tensor, path: str, async_: bool = False) -> None:
    """Save a (3, H, W) [0,1] tensor as PNG/JPEG.

    ``async_=True`` queues the write on the native C++ writer pool
    (native/st3d_native.cpp) so the training loop never blocks on image IO
    — the reference writes PNGs synchronously inside its hot loop
    (second_approach.py:183-185). Call :func:`flush_images` before relying
    on the files. Non-PNG extensions and missing native lib fall back to
    PIL synchronously.
    """
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if path.lower().endswith(".png"):
        # Single conversion path: async (native) and sync (PIL) writes of
        # the same tensor must produce identical bytes.
        rgb8 = np.asarray(tensor_to_image(tensor))
        try:
            from st3d.io.native import write_png

            if write_png(path, rgb8, async_=async_):
                return
        except Exception:
            pass
    tensor_to_image(tensor).save(path)


def flush_images() -> int:
    """Wait for queued async image writes; returns failed-write count."""
    try:
        from st3d.io.native import flush

        return flush()
    except Exception:
        return 0


def resize_bilinear_chw(image: jnp.ndarray, size: int) -> jnp.ndarray:
    """Device-side bilinear resize of (..., H, W) preserving leading dims;
    half-pixel centers (== F.interpolate align_corners=False,
    first_approach.py:93-98)."""
    import jax.image

    shape = image.shape[:-2] + (size, size)
    return jax.image.resize(image, shape, method="bilinear")
