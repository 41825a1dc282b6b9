"""Multi-style batched optimization: one mesh, S styles, jointly.

BASELINE.md acceptance config 4 ("bob_mesh batched over Style_1-5, 8 vmapped
views per step, shared VGG features"). The reference can only run styles
sequentially as separate processes; this engine exploits the structure
TPU-style:

  * geometry is shared, so per step the (expensive) visibility pass runs
    ONCE for the view batch and every style's texture is sampled against the
    same fragments (vmap over the style axis of the texel epilogue);
  * all S x B rendered views go through VGG as ONE batch (MXU-friendly);
  * the per-style losses use disjoint texture parameters, so one Adam update
    over the stacked (S, H, W, 3) atlas optimizes all styles independently
    but simultaneously.

With ``cfg.data_parallel`` the style axis shards across the device mesh
(each chip owns its styles' texture atlases, renders and Gram targets — an
embarrassingly parallel layout with ZERO per-step collectives; geometry and
content features are replicated). Style count must divide the device count.

Outputs: ``output_path/<style_stem>/final.obj`` (+ renders) per style, a
shared ``log.txt`` with per-step summed loss, and metrics.jsonl carrying the
per-style loss vector.
"""

from __future__ import annotations

import functools

import os
from typing import Dict, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import optax

from st3d.core.mesh import Mesh, finalize_mesh
from st3d.engine.config import PipelineConfig
from st3d.engine.pipelines import (
    build_cameras,
    load_scene,
    save_render,
    _batches,
)
from st3d.io.image import load_as_tensor
from st3d.io.obj import save_mesh
from st3d.models.vgg import get_features, get_vgg
from st3d.ops.losses import (
    CONTENT_LAYER,
    STYLE_LAYERS,
    gram_matrix_nhwc,
    mse_loss,
)
from st3d.render.rasterize import RasterizationSettings
from st3d.render.renderer import (
    compact_visibility,
    precompute_visibility,
    render_meshes,
)
from st3d.render.shading import shade_compact
from st3d.utils.assets import resolve_asset
from st3d.utils.checkpoint import load_checkpoint, save_checkpoint
from st3d.utils.logging import RunLogger


def _multi_style_content_loss(feats, content_features, style_grams,
                              style_weight, content_weight, image_h):
    """Per-style reference loss on features carrying a leading style axis.

    feats: {layer: (S, B, H, W, C)} NHWC taps in the compute dtype (the TPU
    hot-loop layout — Grams run on the MXU's bf16 path with f32
    accumulation); content_features (B, H, W, C) shared; style_grams
    {layer: (S, B, C, C)}. Returns (S,) per-style losses.

    A ``"<layer>:gram"`` key (get_features ``gram1=True``) carries the Gram
    directly; its divisor height derives from ``image_h``, the ACTUAL input
    image height (passed explicitly — reconstructing it as conv4_2 height
    * 8 mis-scales the C²·H² divisor when the size is not a multiple of 8,
    since the maxpools floor; advisor r3).
    """
    cf32 = content_features.astype(jnp.float32)

    def one_style(feats_s, grams_s):
        content_loss = mse_loss(
            feats_s[CONTENT_LAYER].astype(jnp.float32), cf32
        )
        style_loss = 0.0
        for layer in STYLE_LAYERS:
            if layer + ":gram" in feats_s:
                g = feats_s[layer + ":gram"]
                scale = {"conv1_1": 1, "conv2_1": 2, "conv3_1": 4,
                         "conv4_1": 8, "conv5_1": 16}[layer]
                # floor-div matches the maxpools' floor semantics exactly
                # at every depth: (h//2)//2 == h//4 (nested floor-div).
                c, h = g.shape[-1], image_h // scale
            else:
                f = feats_s[layer]
                c, h = f.shape[3], f.shape[1]
                g = gram_matrix_nhwc(f)
            style_loss = style_loss + jnp.mean(
                (g - grams_s[layer]) ** 2
            ) / (float(c) ** 2 * float(h) ** 2)  # float: int32 overflow at 768**2
        return content_weight * content_loss + style_weight * style_loss

    return jax.vmap(one_style)(
        feats, {l: style_grams[l] for l in STYLE_LAYERS}
    )


def run_multistyle(cfg: PipelineConfig, style_paths: Sequence[str],
                   epochs: int = None) -> Dict[str, Mesh]:
    """Second-approach optimization of one texture PER STYLE, jointly."""
    epochs = epochs if epochs is not None else cfg.epochs
    os.makedirs(cfg.output_path, exist_ok=True)
    style_names = [
        os.path.splitext(os.path.basename(p))[0] for p in style_paths
    ]
    n_styles = len(style_paths)

    mesh = load_scene(cfg)
    settings = RasterizationSettings(
        image_size=cfg.size, backend=cfg.raster_backend
    )
    vgg = get_vgg(cfg.vgg_weights)
    cameras = build_cameras(cfg)
    logger = RunLogger(cfg.output_path)
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    render_jit = jax.jit(lambda m, c: render_meshes(m, c, settings))
    # Geometry is never optimized here, so the visibility pass is a
    # per-batch constant (see renderer.precompute_visibility): the per-step
    # work is texture sampling + VGG only.
    vis_jit = jax.jit(lambda m, c: precompute_visibility(m, c, settings))

    # Per-batch constants: content renders + features (shared), per-style
    # Gram targets, precomputed visibility.
    batch_const = []
    for i, b0, b1 in _batches(cfg.n_views, cfg.batch_size):
        bsz = b1 - b0
        batch_cams = cameras[b0:b1]
        content_imgs, _ = render_jit(mesh, batch_cams)
        content_features = get_features(
            content_imgs, vgg, dtype=dtype, layout="NHWC"
        )[CONTENT_LAYER]
        styles = jnp.stack([
            jnp.broadcast_to(
                load_as_tensor(resolve_asset(p), cfg.size)[None],
                (bsz, 3, cfg.size, cfg.size),
            )
            for p in style_paths
        ])  # (S, B, 3, H, W)
        style_feats = get_features(
            styles.reshape(n_styles * bsz, 3, cfg.size, cfg.size),
            vgg, dtype=dtype, layout="NHWC",
        )
        style_grams = {}
        for l in STYLE_LAYERS:
            g = gram_matrix_nhwc(style_feats[l])
            style_grams[l] = g.reshape(
                n_styles, bsz, g.shape[-1], g.shape[-1]
            )
        batch_const.append(
            (compact_visibility(vis_jit(mesh, batch_cams),
                                texture_shape=mesh.texture.shape),
             content_features, style_grams)
        )

    textures = jnp.broadcast_to(
        mesh.texture[None], (n_styles,) + mesh.texture.shape
    ).copy()
    params = {"textures": textures}
    optimizer = optax.adam(cfg.lr)
    opt_state = optimizer.init(params)

    # Style-axis sharding: textures/grams/losses split over chips; no
    # collectives (per-style losses touch disjoint parameters).
    use_dp = cfg.data_parallel and len(jax.devices()) > 1
    if use_dp:
        from jax.sharding import Mesh as DevMesh, NamedSharding, PartitionSpec as P

        n_dev = len(jax.devices())
        if n_styles % n_dev:
            raise ValueError(
                f"data_parallel multistyle needs the style count "
                f"({n_styles}) to divide the {n_dev} devices"
            )
        dev_mesh = DevMesh(np.array(jax.devices()), ("styles",))
        style_sh = NamedSharding(dev_mesh, P("styles"))
        repl = NamedSharding(dev_mesh, P())

        params = jax.device_put(params, style_sh)
        opt_state = jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, style_sh if x.ndim >= 1 and x.shape[0] == n_styles
                else repl
            ) if hasattr(x, "ndim") else x,
            opt_state,
        )
        batch_const = [
            (
                jax.device_put(vis, repl),
                jax.device_put(cfeat, repl),
                jax.device_put(grams, style_sh),
            )
            for (vis, cfeat, grams) in batch_const
        ]

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(p, st, vis, content_features, style_grams):
        def loss_fn(p):
            # Visibility AND per-pixel UVs precomputed (hard mode): every
            # style's shading is one texel gather + lerp per pixel.
            rgba = jax.vmap(
                lambda tex: shade_compact(
                    tex, vis["chunk_idx"], vis["uv_cov"], vis["cov8"],
                    vis["mask"], plan=vis.get("plan"),
                )
            )(p["textures"])  # (S, B, H, W, 4)
            imgs = rgba[..., :3]  # NHWC end-to-end (no NCHW round trip)
            s, b = imgs.shape[0], imgs.shape[1]
            feats = get_features(
                imgs.reshape(s * b, cfg.size, cfg.size, 3), vgg,
                dtype=dtype, layout="NHWC", input_layout="NHWC",
                gram1=True,
            )
            feats = {
                k: v.reshape((s, b) + v.shape[1:]) for k, v in feats.items()
            }
            per_style = _multi_style_content_loss(
                feats, content_features, style_grams,
                cfg.style_weight, cfg.content_weight, cfg.size,
            )
            return jnp.sum(per_style), per_style

        (loss, per_style), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(p)
        updates, st = optimizer.update(grads, st, p)
        p = optax.apply_updates(p, updates)
        return p, st, loss, per_style

    start_epoch = 0
    ckpt_path = os.path.join(cfg.output_path, "checkpoint.npz")
    rng = jax.random.PRNGKey(cfg.seed)
    if cfg.resume and os.path.isfile(ckpt_path):
        start_epoch, params, opt_state, rng = load_checkpoint(
            ckpt_path, params, opt_state, rng
        )

    for epoch in range(start_epoch, epochs):
        total = 0.0
        per_style_sum = np.zeros(len(style_names))
        for vis, cfeat, grams in batch_const:
            params, opt_state, loss, per_style = step(
                params, opt_state, vis, cfeat, grams
            )
            total += float(loss)
            per_style_sum += np.asarray(per_style)
        logger.log_epoch(
            epoch, total,
            per_style={n: float(v)
                       for n, v in zip(style_names, per_style_sum)},
        )
        if cfg.checkpoint_every and (epoch + 1) % cfg.checkpoint_every == 0:
            save_checkpoint(ckpt_path, epoch + 1, params, opt_state, rng)

    results: Dict[str, Mesh] = {}
    fixed12 = build_cameras(
        PipelineConfig(n_views=12, randomize_views=False, seed=cfg.seed)
    )
    for s, name in enumerate(style_names):
        final = finalize_mesh(mesh.replace(texture=params["textures"][s]))
        out_dir = os.path.join(cfg.output_path, name)
        save_render(final, fixed12, settings,
                    os.path.join(out_dir, "final_render"),
                    tile_parallel=cfg.tile_parallel)
        save_mesh(final, os.path.join(out_dir, "final.obj"))
        results[name] = final
    logger.close()
    return results
