"""Persistent XLA compilation cache.

The bench workload's fused step graph takes minutes to compile on TPU
(BENCH_r02: 446s of pure compile per bench run) and the Mosaic kernels
compile remotely. Nothing in the workload changes between invocations, so
a persistent on-disk cache turns every repeat run's compile into a
cache-dir read. Call ``enable_compilation_cache()`` once, before the first
``jit`` executes (safe to call multiple times; safe on CPU too, where it
also speeds up the 8-virtual-device test suite's recompiles across
processes).

Reference basis: none — the reference is eager PyTorch and has no compile
step; this is TPU-framework infrastructure (VERDICT r2 item 4).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Resolution: explicit arg > ``$ST3D_COMPILE_CACHE`` > ``<repo>/.jax_cache``.
    Setting ``$ST3D_COMPILE_CACHE`` to the empty string disables caching.
    Returns the directory used ('' when disabled).
    """
    import jax

    env = os.environ.get("ST3D_COMPILE_CACHE")
    if cache_dir is None:
        if env is not None:
            if not env:
                return ""
            cache_dir = env
        else:
            cache_dir = _DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything that took real compile time (default threshold is 1s;
    # keep tiny throwaway jits out of the dir but catch every hot graph).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # Cache entries are keyed on everything that affects codegen; allow hits
    # across processes regardless of when they were written.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
