"""Numerical-safety utilities (SURVEY.md §5 "Race detection / sanitizers":
the functional-purity analogue for this framework is NaN/Inf guarding plus
Pallas interpret mode, which tests already exercise).

``guard_finite`` wraps a jitted step with ``jax.experimental.checkify`` so a
NaN/Inf produced anywhere inside surfaces as a Python error naming the
failing check instead of silently corrupting the optimization. Enabled by
the pipelines' ``--debug_nan`` flag; zero overhead when off (the unwrapped
step is used).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def check_tree_finite(tree, label: str) -> None:
    """Inside-jit check that every array leaf is finite (checkify)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            name = label + jax.tree_util.keystr(path)
            checkify.check(
                jnp.all(jnp.isfinite(leaf)), f"non-finite values in {name}"
            )


def guard_finite(fn: Callable) -> Callable:
    """Wrap ``fn`` so user checks (and automatic float checks) raise on the
    host after each call. Usage::

        step = guard_finite(step)   # instead of step
        out = step(...)             # raises ValueError on NaN/Inf
    """
    checked = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def jit_with_finite_guard(fn: Callable, **jit_kwargs) -> Callable:
    """checkify-wrapped jit: same signature as ``jax.jit(fn, **jit_kwargs)``
    but raising on any NaN/Inf produced inside."""
    checked = checkify.checkify(fn, errors=checkify.float_checks)
    jitted = jax.jit(checked, **jit_kwargs)

    def wrapper(*args, **kwargs):
        err, out = jitted(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper
