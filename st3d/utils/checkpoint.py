"""Checkpoint / resume — capability the reference lacks entirely
(SURVEY.md §5: a crash loses all progress; only final outputs are saved).

Checkpoints hold {trainable params, optimizer state, progress counters, RNG
key} as a flat .npz (dependency-free, works for the small states here — the
texture atlas dominates at a few MB). Structure is restored by flattening a
template pytree with the same treedef (e.g. a freshly-initialized optimizer
state), so no pickling of jax internals is needed.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import numpy as np
import jax


def _flatten(tree) -> Tuple[list, Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_checkpoint(path: str, step: int, params, opt_state, rng,
                    extras: Dict[str, Any] = None) -> None:
    """``extras`` are named arrays restored verbatim (e.g. mid-batch progress
    counters and the 2D-stylized targets of the in-flight batch)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays: Dict[str, np.ndarray] = {"__step__": np.asarray(step)}
    for prefix, tree in (("p", params), ("o", opt_state), ("r", rng)):
        leaves, _ = _flatten(tree)
        for i, leaf in enumerate(leaves):
            arrays[f"{prefix}{i}"] = np.asarray(leaf)
    for k, v in (extras or {}).items():
        arrays[f"x_{k}"] = np.asarray(v)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)  # atomic: a crash mid-write never corrupts


def load_checkpoint(path: str, params_template, opt_state_template,
                    rng_template, with_extras: bool = False):
    """Restore (step, params, opt_state, rng[, extras]) with the templates'
    treedefs.

    Raises with a clear message on leaf-count/shape mismatch (e.g. resuming
    with a different optimization_target or texture size).
    """
    data = np.load(path)
    step = int(data["__step__"])

    def rebuild(prefix, template):
        leaves, treedef = _flatten(template)
        out = []
        for i, leaf in enumerate(leaves):
            key = f"{prefix}{i}"
            if key not in data:
                raise ValueError(
                    f"checkpoint {path} is missing {key}; was it written "
                    "with a different configuration?"
                )
            arr = data[key]
            if tuple(arr.shape) != tuple(np.shape(leaf)):
                raise ValueError(
                    f"checkpoint leaf {key} has shape {arr.shape}, expected "
                    f"{np.shape(leaf)} (different optimization_target, "
                    "size, or mesh?)"
                )
            want_dtype = np.asarray(leaf).dtype
            if arr.dtype != want_dtype:
                raise ValueError(
                    f"checkpoint leaf {key} has dtype {arr.dtype}, expected "
                    f"{want_dtype} (different compute_dtype?) — a silent "
                    "cast would resume with different numerics"
                )
            out.append(arr)
        return jax.tree_util.tree_unflatten(treedef, out)

    out = (
        step,
        rebuild("p", params_template),
        rebuild("o", opt_state_template),
        rebuild("r", rng_template),
    )
    if with_extras:
        extras = {k[2:]: data[k] for k in data.files if k.startswith("x_")}
        return out + (extras,)
    return out
