"""Optimization setup: which mesh leaves train, and the Adam optimizer.

Functional equivalent of the reference's ``setup_optimizations``
(utils.py:173-204): ``optimization_target`` in {'texture', 'mesh', 'both'}
selects trainable leaves — the texture atlas and/or the vertex positions;
verts_uvs are never optimized ("doesn't get good results", utils.py:189).

torch.optim.Adam(lr) with defaults (betas (0.9, 0.999), eps 1e-8) maps to
``optax.adam(lr)`` (same update rule, SURVEY.md D11). Where the reference
mutates ``requires_grad`` flags on shared tensors and rebuilds the Meshes
object every step, here the trainable leaves live in a ``params`` dict and
``apply_params`` rebuilds the (immutable) Mesh inside the jitted step — the
functional version of build_mesh-per-step (first_approach.py:194-195).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import optax

from st3d.core.mesh import Mesh

VALID_TARGETS = ("texture", "mesh", "both")


def trainable_params(optimization_target: str, mesh: Mesh) -> Dict[str, jnp.ndarray]:
    # Copies, not views: the jitted steps donate the param buffers, and the
    # original mesh (the frozen "content" reference) must stay alive — the
    # functional analogue of the reference's mesh.clone() (utils.py:175).
    def _c(x):
        return jnp.array(x, copy=True)

    if optimization_target == "texture":
        return {"texture": _c(mesh.texture)}
    if optimization_target == "mesh":
        return {"verts": _c(mesh.verts)}
    if optimization_target == "both":
        return {"texture": _c(mesh.texture), "verts": _c(mesh.verts)}
    raise ValueError(
        f"optimization_target must be one of {VALID_TARGETS}, "
        f"got {optimization_target!r}"
    )


def apply_params(mesh: Mesh, params: Dict[str, jnp.ndarray]) -> Mesh:
    """Mesh with the trainable leaves swapped in (jit-traceable)."""
    updates = {}
    if "texture" in params:
        updates["texture"] = params["texture"]
    if "verts" in params:
        updates["verts"] = params["verts"]
    return mesh.replace(**updates)


def setup_optimizations(
    optimization_target: str, mesh: Mesh, lr: float
) -> Tuple[Dict[str, jnp.ndarray], optax.GradientTransformation, optax.OptState]:
    """(params, optimizer, opt_state) — the functional analogue of the
    reference's dict of handles (utils.py:197-204)."""
    params = trainable_params(optimization_target, mesh)
    optimizer = optax.adam(learning_rate=lr)
    return params, optimizer, optimizer.init(params)
