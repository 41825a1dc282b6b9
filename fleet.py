#!/usr/bin/env python
"""Fleet driver: every mesh x every style (BASELINE.md config 5 — "all 4
meshes x 5 styles"). Styles batch jointly per mesh (one visibility pass, one
VGG batch — st3d/engine/multistyle.py); meshes run sequentially (their
texture atlases are independent problems). Combine with --data_parallel to
shard views across chips and --size 1024 for large renders.

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
    ns, rest = pre.parse_known_args(argv)
    cfg = parse_second_approach(rest)
    obj_paths = [p for p in ns.obj_paths.split(",") if p]
    style_paths = [p for p in ns.style_paths.split(",") if p]

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
