#!/usr/bin/env python
"""Micro-benchmark of the planned texture-gradient backward alone, on the
REAL sampling plan (cow, bench camera rig), with layout variants.

Round-5 768² trace: the ctq build (fusion.243) costs 4.2ms because XLA
assigns it a column-major layout to suit the level-1 gather — 9x the
row-major 512² cost for 2.25x the rows. Variants:

  tree          current default
  tree_barrier  ST3D_TREE_BARRIER=1 (optimization_barrier between the ctq
                build and the level gathers — decouples the layouts)
  segsum        ST3D_NO_PLAN_TREE=1 (sorted segment-sum fallback)

Usage: python scripts/tree_micro.py [--size 768] [--iters 50]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


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

    ct = jax.random.normal(jax.random.PRNGKey(0),
                           plan["fx"].shape + (3,), jnp.float32)

    def run_variant(name, env):
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            def bwd(ctv):
                res = (ht, wt, plan["fx"], plan["fy"], plan["perm"],
                       plan["segids"], plan.get("tree"))
                return shading._planned_bwd(res, ctv)[0]

            f = jax.jit(bwd)
            out = jax.block_until_ready(f(ct))
            t0 = time.time()
            for _ in range(args.iters):
                out = f(ct)
            jax.block_until_ready(out)
            ms = (time.time() - t0) / args.iters * 1e3
            return ms, out
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    results = {}
    outs = {}
    for name, env in (
        ("tree", {"ST3D_TREE_BARRIER": "", "ST3D_NO_PLAN_TREE": ""}),
        ("tree_barrier", {"ST3D_TREE_BARRIER": "1",
                          "ST3D_NO_PLAN_TREE": ""}),
        ("segsum", {"ST3D_TREE_BARRIER": "", "ST3D_NO_PLAN_TREE": "1"}),
    ):
        env = {k: v for k, v in env.items() if v} or \
            {k: "" for k in env}  # ensure empties unset
        clean = {}
        for k in ("ST3D_TREE_BARRIER", "ST3D_NO_PLAN_TREE"):
            os.environ.pop(k, None)
        clean.update({k: v for k, v in env.items() if v})
        ms, out = run_variant(name, clean)
        results[name] = round(ms, 3)
        outs[name] = out
        print(json.dumps({"size": args.size, "variant": name,
                          "ms": results[name]}), flush=True)

    import numpy as np

    d = float(jnp.max(jnp.abs(outs["tree"] - outs["tree_barrier"])))
    ds = float(jnp.max(jnp.abs(outs["tree"] - outs["segsum"])))
    print(json.dumps({"max_abs_tree_vs_barrier": d,
                      "max_abs_tree_vs_segsum": ds}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
