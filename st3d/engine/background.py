"""Background compositing for rendered views (reference utils.py:19-30).

``noise``: blend with U(0,1) noise outside the mask; ``style``: blend with
the style image; ``white``: identity (the renderer's blend background is
already white — reference utils.py:29-30). Noise needs explicit RNG (JAX is
functional; the reference used global torch.rand state).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_background(
    tensors: jnp.ndarray,          # (B, 3, H, W)
    masks: jnp.ndarray,            # (B, 1, H, W)
    background_type: str = "noise",
    background: jnp.ndarray = None,
    rng: jax.Array = None,
) -> jnp.ndarray:
    if background_type == "noise":
        if rng is None:
            rng = jax.random.PRNGKey(0)
        noise = jax.random.uniform(rng, tensors.shape, tensors.dtype)
        return tensors * masks + noise * (1.0 - masks)
    if background_type == "style":
        return tensors * masks + background * (1.0 - masks)
    if background_type == "white":
        return tensors
    raise ValueError(f"unknown background_type {background_type!r}")
