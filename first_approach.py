#!/usr/bin/env python
"""First approach CLI: render views -> 2D style transfer per view -> optimize
the UV texture (and optionally vertices) by masked MSE through the
differentiable renderer.

Drop-in for the reference's ``python first_approach.py --flags``
(first_approach.py:22-47): same flag names and defaults (boolean flags parse
correctly here), same output layout (log.txt, 2d_style_transfer/,
final_render/, final.obj). See st3d/engine/pipelines.py.
"""

from st3d.engine.config import parse_first_approach
from st3d.engine.pipelines import run_first_approach


def main(argv=None):
    cfg = parse_first_approach(argv)
    run_first_approach(cfg)


if __name__ == "__main__":
    main()
