#!/usr/bin/env python
"""Decompose the benchmark step's time on the real chip.

Times, separately compiled, each on the bench workload (cow, 4 views @512²,
bf16 VGG):
  * full optimization step (static visibility — what bench.py measures)
  * VGG forward only (fixed images)
  * VGG forward+backward (fixed images; grads w.r.t. images)
  * shading epilogue forward (texture -> 4 rendered views)
  * shading forward+backward (grads w.r.t. texture — isolates the
    bilinear-gather backward scatter into the atlas)
  * Gram/style+content loss forward+backward on fixed features
  * Adam update on the texture

Prints a JSON dict of milliseconds per call. Run on TPU (no args); pass
--cpu to sanity-check the harness on the CPU backend.
"""

import argparse
import json
import sys
import time

REPEATS = 20


def timed(fn, *args):
    out = fn(*args)
    jax_block(out)
    t0 = time.time()
    for _ in range(REPEATS):
        out = fn(*args)
    jax_block(out)
    return (time.time() - t0) / REPEATS * 1e3


def jax_block(x):
    import jax

    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
        else a, x
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--views", type=int, default=4)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax

    sys.path.insert(0, "/root/repo")
    from st3d.core.cameras import build_fixed_cameras
    from st3d.engine.config import PipelineConfig
    from st3d.engine.optim import apply_params, setup_optimizations
    from st3d.engine.pipelines import load_scene
    from st3d.io.image import load_as_tensor
    from st3d.models.vgg import get_features, get_vgg
    from st3d.ops.losses import StyleContentTargets, style_content_loss
    from st3d.render.rasterize import RasterizationSettings
    from st3d.render.renderer import (
        compact_visibility,
        precompute_visibility,
        render_meshes,
        render_meshes_static,
    )
    from st3d.utils.assets import resolve_asset

    size, views = args.size, args.views
    dtype = jnp.bfloat16
    cfg = PipelineConfig(size=size, n_views=views)
    mesh = load_scene(cfg)
    cams = build_fixed_cameras(views, shuffle=False)
    settings = RasterizationSettings(image_size=size, backend="auto")
    vgg = get_vgg()
    style = load_as_tensor(resolve_asset(cfg.style_path), size)
    style_b = jnp.broadcast_to(style[None], (views,) + style.shape)

    content_imgs, _ = jax.jit(
        lambda m, c: render_meshes(m, c, settings)
    )(mesh, cams)
    targets = StyleContentTargets.create(content_imgs, style_b, vgg,
                                         dtype=dtype, layout="NHWC")
    vis = compact_visibility(jax.jit(
        lambda m, c: precompute_visibility(m, c, settings)
    )(mesh, cams), texture_shape=mesh.texture.shape)
    params, optimizer, opt_state = setup_optimizations("texture", mesh, 0.01)

    results = {}

    # --- full step ---------------------------------------------------------
    def loss_fn(p):
        imgs, _ = render_meshes_static(apply_params(mesh, p), vis, settings)
        feats = get_features(imgs, vgg, dtype=dtype, layout="NHWC")
        return style_content_loss(feats, targets, 1e6, 1.0, layout="NHWC")

    @jax.jit
    def full_step(p, st):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, st = optimizer.update(grads, st, p)
        return optax.apply_updates(p, updates), st, loss

    results["full_step_ms"] = timed(full_step, params, opt_state)

    # --- raster (what static-vis removed) ----------------------------------
    results["raster_ms"] = timed(
        jax.jit(lambda m: precompute_visibility(m, cams, settings)), mesh
    )

    # --- VGG fwd / fwd+bwd --------------------------------------------------
    imgs0, _ = jax.jit(
        lambda p: render_meshes_static(apply_params(mesh, p), vis, settings)
    )(params)

    @jax.jit
    def vgg_fwd(x):
        return get_features(x, vgg, dtype=dtype, layout="NHWC")["conv4_2"]

    results["vgg_fwd_ms"] = timed(vgg_fwd, imgs0)

    @jax.jit
    def vgg_fwd_bwd(x):
        def f(xx):
            feats = get_features(xx, vgg, dtype=dtype, layout="NHWC")
            return style_content_loss(
                feats, targets, 1e6, 1.0, layout="NHWC"
            )

        return jax.value_and_grad(f)(x)

    results["vgg_loss_fwd_bwd_ms"] = timed(vgg_fwd_bwd, imgs0)

    # --- finer VGG decomposition --------------------------------------------
    @jax.jit
    def vgg_bwd_sumtaps(x):
        def f(xx):
            feats = get_features(xx, vgg, dtype=dtype, layout="NHWC")
            return sum(jnp.sum(v.astype(jnp.float32)) for v in feats.values())

        return jax.grad(f)(x)

    results["vgg_sumtaps_fwd_bwd_ms"] = timed(vgg_bwd_sumtaps, imgs0)

    feats0 = jax.jit(
        lambda x: get_features(x, vgg, dtype=dtype, layout="NHWC")
    )(imgs0)

    @jax.jit
    def gram_loss_fwd_bwd(feats):
        def f(ff):
            return style_content_loss(ff, targets, 1e6, 1.0, layout="NHWC")

        return jax.value_and_grad(f)(feats)

    results["gram_loss_fwd_bwd_ms"] = timed(gram_loss_fwd_bwd, feats0)

    # --- shading epilogue fwd / fwd+bwd -------------------------------------
    @jax.jit
    def shade_fwd(p):
        imgs, _ = render_meshes_static(apply_params(mesh, p), vis, settings)
        return imgs

    results["shade_fwd_ms"] = timed(shade_fwd, params)

    @jax.jit
    def shade_fwd_bwd(p):
        def f(pp):
            imgs, _ = render_meshes_static(
                apply_params(mesh, pp), vis, settings
            )
            return jnp.sum(imgs * imgs)

        return jax.value_and_grad(f)(p)

    results["shade_fwd_bwd_ms"] = timed(shade_fwd_bwd, params)

    # --- Adam ---------------------------------------------------------------
    @jax.jit
    def adam_only(p, st):
        updates, st = optimizer.update(p, st, p)  # grads := params (dummy)
        return optax.apply_updates(p, updates), st

    results["adam_ms"] = timed(adam_only, params, opt_state)

    results["backend"] = jax.default_backend()
    results["size"] = size
    results["views"] = views
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
