#!/usr/bin/env python
"""Diagnose why the persistent compilation cache misses on the axon TPU
path (entries are written but fresh processes recompile ~446s graphs).

Compiles a mid-size marker graph with DEBUG logging from the compilation
cache module; run twice (two processes) and compare the logged keys:

    python scripts/cache_probe.py && python scripts/cache_probe.py
"""

import logging
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

logging.basicConfig(level=logging.DEBUG)
for name in ("jax._src.compilation_cache", "jax._src.cache_key",
             "jax._src.compiler"):
    logging.getLogger(name).setLevel(logging.DEBUG)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from st3d.utils.compilecache import enable_compilation_cache

    d = enable_compilation_cache()
    print(f"cache dir: {d}", file=sys.stderr)

    @jax.jit
    def marker(x):
        for _ in range(8):
            x = jnp.tanh(x @ x) + 0.5
        return x.sum()

    x = jnp.ones((1024, 1024), jnp.bfloat16)
    t0 = time.time()
    marker(x).block_until_ready()
    print(f"backend={jax.default_backend()} compile+run: "
          f"{time.time()-t0:.2f}s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
