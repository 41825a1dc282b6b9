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
from typing import Optional

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


def save_image(tensor, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tensor_to_image(tensor).save(path)


def resize_bilinear_chw(image: jnp.ndarray, size: int) -> jnp.ndarray:
    """Device-side bilinear resize of (..., H, W) preserving leading dims;
    half-pixel centers (== F.interpolate align_corners=False,
    first_approach.py:93-98)."""
    import jax.image

    shape = image.shape[:-2] + (size, size)
    return jax.image.resize(image, shape, method="bilinear")
