#!/usr/bin/env python
"""Fail-fast on-device compile+grad check for the packed stage 1 at the
ladder shapes (512/768/1024, bf16 + the f32 512 CLI-default shape).

The round-4 VMEM lesson (CLAUDE.md): a band size that fits one shape WILL
OOM at another — Mosaic's scoped-VMEM stack is sized per (wp, bh, dtype).
This script compiles conv1_1_packed -> conv1_2_packed_pool forward AND the
full-chain input gradient at every rung and asserts finiteness, so a
banding regression surfaces here (seconds of compile) instead of inside a
multi-stage bench batch. Run on TPU after touching stage1_pallas banding.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp


def main() -> int:
    if "--v3" in sys.argv:                   # opt-in kernels (ST3D_STAGE1=v3)
        from st3d.kernels.stage1v3_pallas import (
            conv1_1_packed_v3 as conv1_1_packed,
            conv1_2_packed_pool_v3 as conv1_2_packed_pool,
            stage1_v3_supported as stage1_supported,
        )

        def loss_of(xx, w1, b1, w2, b2):
            z5, g64 = conv1_1_packed(xx, w1, b1)
            p, _ = conv1_2_packed_pool(z5, w2, b2)
            return (jnp.sum(p.astype(jnp.float32) ** 2)
                    + 1e-6 * jnp.sum(g64))
    else:                                    # v2 (the default kernels)
        from st3d.kernels.stage1_pallas import (
            conv1_1_packed,
            conv1_2_packed_pool,
            stage1_supported,
        )

        def loss_of(xx, w1, b1, w2, b2):
            z5, g48, s48 = conv1_1_packed(xx, w1, b1)
            p, _ = conv1_2_packed_pool(z5, w2, b2)
            return (jnp.sum(p.astype(jnp.float32) ** 2)
                    + 1e-6 * jnp.sum(g48) + 1e-6 * jnp.sum(s48))

    key = jax.random.PRNGKey(3)
    ok = True
    for size, dtype in ((512, jnp.bfloat16), (768, jnp.bfloat16),
                        (1024, jnp.bfloat16), (512, jnp.float32)):
        x = jax.random.uniform(key, (2, size, size, 3), dtype)
        w1 = (jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 3, 64),
                                jnp.float32) * 0.2).astype(dtype)
        b1 = jnp.zeros((64,), dtype)
        w2 = (jax.random.normal(jax.random.fold_in(key, 2), (3, 3, 64, 64),
                                jnp.float32) * 0.05).astype(dtype)
        b2 = jnp.zeros((64,), dtype)
        if not stage1_supported(x, dtype):
            # Not a failure: vgg.get_features routes unsupported shapes to
            # the other stage-1 variant (v3 gate miss -> v2, and vice
            # versa); this line documents which rungs ride the fallback.
            print(f"[{size}^2 {jnp.dtype(dtype).name}] UNSUPPORTED "
                  "(banding gate) -> falls back to the other variant",
                  flush=True)
            continue

        def loss(xx):
            return loss_of(xx, w1, b1, w2, b2)

        t0 = time.time()
        try:
            val, g = jax.jit(jax.value_and_grad(loss))(x)
            finite = bool(jnp.isfinite(val)) and bool(
                jnp.all(jnp.isfinite(g.astype(jnp.float32))))
            nz = float(jnp.max(jnp.abs(g.astype(jnp.float32))))
            status = "ok" if (finite and nz > 0) else "BAD-VALUES"
            ok = ok and finite and nz > 0
            print(f"[{size}^2 {jnp.dtype(dtype).name}] {status} "
                  f"loss={float(val):.4g} max|g|={nz:.3g} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        except Exception as e:  # VMEM OOM / lowering failure
            ok = False
            msg = str(e)
            # surface the Mosaic OOM detail (buried mid-message under the
            # axon remote-compile wrapper)
            for kw in ("Ran out of memory", "Scoped allocation"):
                p = msg.find(kw)
                if p >= 0:
                    msg = msg[p:]
                    break
            print(f"[{size}^2 {jnp.dtype(dtype).name}] FAILED: "
                  f"{msg[:600]}", flush=True)
    print("stage1_ladder_check:", "OK" if ok else "FAILED", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
