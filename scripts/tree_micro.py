#!/usr/bin/env python
"""Micro-benchmark of the planned texture-sampling fwd + gradient bwd on
the REAL sampling plan (cow, bench camera rig), with layout variants.

Round-5 768² trace: the landing scatter (fusion.243) costs 4.2ms because
XLA assigns it a column-major layout to suit the plane-sliced epilogue —
9x the row-major 512² cost for 2.25x the rows; the fwd quad-row gather
(fusion.224) gets the same treatment (1.3ms, VMEM-write-bound). Variants:

  bwd: tree          current default
       tree_barrier  ST3D_TREE_BARRIER=1 (barrier between the ctq build
                     and the level gathers)
       land_barrier  ST3D_TREE_LAND=barrier (barrier AFTER the landing
                     scatter — scatter keeps row-major, epilogue pays one
                     relayout)
       land_flat     ST3D_TREE_LAND=flat (1-D window-12 scatter: a 1-D
                     operand has exactly one layout)
       segsum        ST3D_NO_PLAN_TREE=1 (sorted segment-sum fallback)
  fwd: fwd           current default
       fwd_barrier   ST3D_SAMPLE_BARRIER=1 (pin the gather's layout)

Timing discipline (CLAUDE.md): every iteration chains through the
previous output (identical-arg re-dispatch gets deduped by the tunnel),
and each window ends on a host value fetch.

Usage: python scripts/tree_micro.py [--size 768] [--iters 50]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ENV_KEYS = ("ST3D_TREE_BARRIER", "ST3D_NO_PLAN_TREE", "ST3D_TREE_LAND",
            "ST3D_SAMPLE_BARRIER")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default=768, type=int)
    ap.add_argument("--views", default=4, type=int)
    ap.add_argument("--iters", default=50, type=int)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from st3d.utils.compilecache import enable_compilation_cache

    enable_compilation_cache()

    from st3d.core.cameras import build_fixed_cameras
    from st3d.io.obj import load_mesh
    from st3d.render import shading
    from st3d.render.rasterize import RasterizationSettings
    from st3d.render.renderer import compact_visibility, precompute_visibility
    from st3d.utils.assets import resolve_asset

    mesh = load_mesh(resolve_asset("./objects/cow_mesh/cow.obj"))
    tex = jax.image.resize(mesh.texture, (args.size, args.size, 3),
                           "bilinear")
    mesh = mesh.replace(texture=tex)
    cams = build_fixed_cameras(args.views, shuffle=False)
    settings = RasterizationSettings(image_size=args.size, backend="auto")
    vis = precompute_visibility(mesh, cams, settings)
    vis = compact_visibility(vis, texture_shape=tex.shape)
    plan = vis["plan"]
    ht, wt = tex.shape[0], tex.shape[1]

    ct0 = jax.random.normal(jax.random.PRNGKey(0),
                            plan["fx"].shape + (3,), jnp.float32)

    def time_fn(build):
        """build() -> jitted f(x) -> (out, x_next); returns (ms, out)."""
        f = build()
        out, x = f(ct0)
        jax.block_until_ready((out, x))
        # settle: two untimed chained windows
        for _ in range(2):
            out, x = f(x)
        float(out.reshape(-1)[0])
        t0 = time.time()
        for _ in range(args.iters):
            out, x = f(x)
        float(out.reshape(-1)[0])                 # host value fetch
        ms = (time.time() - t0) / args.iters * 1e3
        return ms, out

    def with_env(env, fn):
        old = {k: os.environ.pop(k, None) for k in ENV_KEYS}
        os.environ.update(env)
        try:
            return fn()
        finally:
            for k in ENV_KEYS:
                os.environ.pop(k, None)
            for k, v in old.items():
                if v is not None:
                    os.environ[k] = v

    def bwd_builder():
        def bwd(ctv):
            res = (ht, wt, plan["fx"], plan["fy"], plan["perm"],
                   plan["segids"], plan.get("tree"))
            g = shading._planned_bwd(res, ctv)[0]
            # chain: next input depends on this output (defeats dedupe)
            ct2 = ctv * (1.0 + 0.0 * g[0, 0, 0])
            return g, ct2
        return jax.jit(bwd)

    def fwd_builder():
        def fwd(ctv):
            out = shading.sample_covered_planned(
                mesh.texture, plan["idx"], plan["fx"], plan["fy"],
                plan["perm"], plan["segids"], plan.get("tree"))
            # chain via a texture-shaped perturbation driven by ctv
            out = out * (1.0 + 0.0 * ctv[0, 0, 0])
            return out, ctv * (1.0 + 0.0 * out.reshape(-1)[0])
        return jax.jit(fwd)

    results, outs = {}, {}
    for name, env in (
        ("tree", {}),
        ("tree_barrier", {"ST3D_TREE_BARRIER": "1"}),
        ("land_barrier", {"ST3D_TREE_LAND": "barrier"}),
        ("land_flat", {"ST3D_TREE_LAND": "flat"}),
        ("segsum", {"ST3D_NO_PLAN_TREE": "1"}),
    ):
        ms, out = with_env(env, lambda: time_fn(bwd_builder))
        results[name] = round(ms, 3)
        outs[name] = out
        print(json.dumps({"size": args.size, "variant": name,
                          "ms": results[name]}), flush=True)

    for name, env in (
        ("fwd", {}),
        ("fwd_barrier", {"ST3D_SAMPLE_BARRIER": "1"}),
    ):
        ms, out = with_env(env, lambda: time_fn(fwd_builder))
        results[name] = round(ms, 3)
        outs[name] = out
        print(json.dumps({"size": args.size, "variant": name,
                          "ms": results[name]}), flush=True)

    base = outs["tree"]
    for name in ("tree_barrier", "land_barrier", "land_flat", "segsum"):
        d = float(jnp.max(jnp.abs(base - outs[name])))
        print(json.dumps({"max_abs_vs_tree": {name: d}}), flush=True)
    d = float(jnp.max(jnp.abs(outs["fwd"] - outs["fwd_barrier"])))
    print(json.dumps({"max_abs_fwd_vs_barrier": d}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
