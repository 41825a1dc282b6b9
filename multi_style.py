#!/usr/bin/env python
"""Multi-style batched CLI: optimize one mesh against several styles
simultaneously — visibility rasterized once per step, all styles' renders
through VGG as one batch (BASELINE.md config 4; capability the reference
can only approximate with sequential runs).

    python multi_style.py --obj_path ./objects/bob_mesh/bob.obj \
        --style_paths ./imgs/Style_1.jpg,./imgs/Style_3.png --epochs 500

Shares the second-approach flags (perceptual loss, texture target).
"""

import argparse

from st3d.engine.config import PipelineConfig, parse_second_approach
from st3d.engine.multistyle import run_multistyle


def main(argv=None):
    # Reuse the second-approach parser; pull out our extra flag first.
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument(
        "--style_paths",
        default="./imgs/Style_1.jpg",
        type=str,
        help="comma-separated style image paths",
    )
    ns, rest = pre.parse_known_args(argv)
    cfg = parse_second_approach(rest)
    style_paths = [p for p in ns.style_paths.split(",") if p]
    run_multistyle(cfg, style_paths)


if __name__ == "__main__":
    main()
