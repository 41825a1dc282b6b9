#!/usr/bin/env python
"""Isolate WHERE bench_st2d's slow first timed window goes (VERDICT r4
weakness 5: rate_windows [5.8, 62.5, 67.7] — a 10x-slow window 1 despite
warmup compiling the same chunk length).

Phases timed separately, 4 repetitions, everything block_until_ready'd:
  create   StyleContentTargets.create (2 VGG fwd at the target shapes)
  chunk    one _scan_steps(n=100) call
Prints a JSON line per repetition so the slow component is unambiguous.

MEASUREMENT CAVEAT (round 5): repeated chunk calls report ~0.0s — the
tunnel dedupes/pipelines dispatches whose results are never consumed
across repetitions (same artifact stage1_isolate.py hit; its fix is
chaining each iteration through a scan carry). Only the FIRST
occurrence of each phase (its compile+run) is trustworthy here; steady
rates must come from scripts/bench_st2d.py, whose windows consume their
outputs.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import optax

    from st3d.engine.style_transfer2d import _scan_steps
    from st3d.io.image import load_as_tensor
    from st3d.models.vgg import get_vgg
    from st3d.ops.losses import StyleContentTargets
    from st3d.utils.assets import resolve_asset
    from st3d.utils.compilecache import enable_compilation_cache

    enable_compilation_cache()
    size, views, chunk = 512, 4, 100
    dtype = jnp.bfloat16

    vgg = get_vgg()
    style = load_as_tensor(resolve_asset("./imgs/Style_1.jpg"), size)
    style_b = jnp.broadcast_to(style[None], (views,) + style.shape)
    content_b = style_b

    for rep in range(4):
        t0 = time.time()
        targets = jax.block_until_ready(StyleContentTargets.create(
            content_b, style_b, vgg, dtype=dtype, layout="NHWC"))
        t_create = time.time() - t0

        t0 = time.time()
        imgs = jax.block_until_ready(
            jnp.transpose(jnp.asarray(content_b, jnp.float32), (0, 2, 3, 1)))
        opt_state = jax.block_until_ready(optax.adam(0.003).init(imgs))
        t_init = time.time() - t0

        times = []
        for _ in range(3):
            t0 = time.time()
            imgs, opt_state, losses = _scan_steps(
                imgs, opt_state, targets, vgg,
                jnp.float32(1e6), jnp.float32(1.0), chunk, 0.003, dtype)
            jax.block_until_ready(losses)
            times.append(time.time() - t0)
        print(json.dumps({
            "rep": rep, "create_s": round(t_create, 3),
            "init_s": round(t_init, 3),
            "chunk_s": [round(t, 3) for t in times],
            "it_s": [round(chunk / t, 1) for t in times],
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
