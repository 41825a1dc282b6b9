#!/usr/bin/env python
"""Second approach CLI: optimize texture/vertices directly against the VGG
perceptual (style Gram + content) loss computed on differentiable renders.

Drop-in for the reference's ``python second_approach.py --flags``
(second_approach.py:22-44): same flag names/defaults, same output layout
(log.txt, current_images/, final_render/, final.obj). See
st3d/engine/pipelines.py.
"""

from st3d.engine.config import parse_second_approach
from st3d.engine.pipelines import run_second_approach


def main(argv=None):
    cfg = parse_second_approach(argv)
    run_second_approach(cfg)


if __name__ == "__main__":
    main()
