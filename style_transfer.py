#!/usr/bin/env python
"""2D style-transfer module — import surface matching the reference's
``style_transfer.py`` (``from style_transfer import *`` pulls in
``get_features``, ``gram_matrix``, ``style_transfer``), plus a small CLI for
running standalone 2D style transfer on image files (new capability; the
reference's 2D engine had no CLI).
"""

from st3d.models.vgg import get_features  # noqa: F401
from st3d.ops.losses import gram_matrix  # noqa: F401
from st3d.engine.style_transfer2d import style_transfer  # noqa: F401


def main(argv=None):
    import argparse

    import jax.numpy as jnp
    import numpy as np

    from st3d.io.image import load_as_tensor, save_image
    from st3d.models.vgg import get_vgg
    from st3d.utils.assets import resolve_asset

    p = argparse.ArgumentParser(description="standalone 2D style transfer")
    p.add_argument("--content_path", required=True, type=str)
    p.add_argument("--style_path", required=True, type=str)
    p.add_argument("--out_path", default="stylized.png", type=str)
    p.add_argument("--steps", default=2000, type=int)
    p.add_argument("--size", default=512, type=int)
    p.add_argument("--style_weight", default=1e6, type=float)
    p.add_argument("--content_weight", default=1.0, type=float)
    p.add_argument("--lr", default=0.003, type=float)
    p.add_argument("--vgg_weights", default=None, type=str)
    args = p.parse_args(argv)

    content = load_as_tensor(resolve_asset(args.content_path), args.size)[None]
    style = load_as_tensor(resolve_asset(args.style_path), args.size)[None]
    vgg = get_vgg(args.vgg_weights)
    out = style_transfer(
        content, content, style, vgg, steps=args.steps,
        style_weight=args.style_weight, content_weight=args.content_weight,
        lr=args.lr,
    )
    save_image(np.asarray(jnp.clip(out, 0, 1))[0], args.out_path)
    print(f"wrote {args.out_path}")


if __name__ == "__main__":
    main()
