#!/usr/bin/env python
"""Fleet driver: every mesh x every style (BASELINE.md config 5 — "all 4
meshes x 5 styles").

Default mode ``batched`` runs the whole grid as ONE SPMD program: meshes
padded to common static budgets and stacked, mesh axis folded into the
rasterizer's view axis, all M x S x B renders through VGG as one batch
(st3d/engine/fleetbatch.py). With --data_parallel the (mesh, style) grid
shards over a 2D device mesh — zero per-step collectives.

``--fleet_mode sequential`` keeps the per-mesh loop (multistyle engine per
mesh) for memory-constrained runs.

    python fleet.py \
        --obj_paths ./objects/cow_mesh/cow.obj,./objects/bob_mesh/bob.obj \
        --style_paths ./imgs/Style_1.jpg,./imgs/Style_3.png \
        --size 512 --epochs 300 --output_path ./output_fleet

UV-less meshes (teapot) automatically get spherical auto-UVs unless
--auto_uv overrides.
"""

import argparse
import dataclasses
import os

from st3d.engine.config import parse_second_approach
from st3d.engine.multistyle import run_multistyle
from st3d.io.obj import load_obj
from st3d.utils.assets import resolve_asset


def main(argv=None):
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument(
        "--obj_paths", default="./objects/cow_mesh/cow.obj", type=str,
        help="comma-separated OBJ paths",
    )
    pre.add_argument(
        "--style_paths", default="./imgs/Style_1.jpg", type=str,
        help="comma-separated style image paths",
    )
    pre.add_argument(
        "--fleet_mode", default="batched",
        choices=("batched", "sequential"),
        help="batched: one SPMD program over the mesh x style grid; "
             "sequential: per-mesh multistyle loop",
    )
    ns, rest = pre.parse_known_args(argv)
    cfg = parse_second_approach(rest)
    obj_paths = [p for p in ns.obj_paths.split(",") if p]
    style_paths = [p for p in ns.style_paths.split(",") if p]

    if ns.fleet_mode == "batched":
        from st3d.engine.fleetbatch import run_fleet_batched

        run_fleet_batched(cfg, obj_paths, style_paths)
        return

    for obj in obj_paths:
        stem = os.path.splitext(os.path.basename(obj))[0]
        sub = dataclasses.replace(
            cfg,
            obj_path=obj,
            output_path=os.path.join(cfg.output_path, stem),
        )
        # UV-less meshes get spherical auto-UVs so the fleet never crashes
        # where the reference does (first_approach.py:88 on teapot).
        if sub.auto_uv == "none":
            data = load_obj(resolve_asset(obj), load_textures=True)
            if data.verts_uvs is None or not data.texture_images:
                sub = dataclasses.replace(sub, auto_uv="sphere")
        print(f"=== {stem}: {len(style_paths)} styles ===")
        run_multistyle(sub, style_paths)


if __name__ == "__main__":
    main()
