"""The two optimization pipelines, reimplementing the reference drivers
end-to-end (first_approach.py / second_approach.py) with a TPU-shaped stack:
one jitted step function per phase (render -> shade -> VGG -> loss -> Adam,
differentiated end-to-end), views batched through ``vmap`` inside the
renderer, per-phase ``lax.scan`` chunking instead of Python step loops, and
style/content targets hoisted out of the hot loop (SURVEY.md §3.5).

Observable outputs match the reference layout exactly:
  output_path/log.txt                      ('Logger:' header + per-step lines)
  output_path/2d_style_transfer/view_i.png (first approach)
  output_path/current_images/view_i.png    (second approach)
  output_path/final_render/view_i.png      (12 fixed views)
  output_path/final.obj (+ .mtl + texture png)

Additions over the reference: checkpoint/resume (the reference loses all
progress on a crash), structured metrics.jsonl, optional jax.profiler trace,
bfloat16 VGG compute, and a data_parallel flag that shards the view batch
across TPU chips (st3d.parallel).
"""

from __future__ import annotations

import functools
import math
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from st3d.core.mesh import Mesh, finalize_mesh
from st3d.core.cameras import (
    FoVPerspectiveCameras,
    build_fixed_cameras,
    build_random_cameras,
)
from st3d.engine.background import apply_background
from st3d.engine.config import PipelineConfig
from st3d.engine.optim import apply_params, setup_optimizations
from st3d.engine.style_transfer2d import _specs, _use_aot, style_transfer
from st3d.io.image import (
    flush_images,
    load_as_tensor,
    resize_bilinear_chw,
    save_image,
)
from st3d.io.obj import load_mesh, save_mesh
from st3d.models.vgg import get_features, get_vgg
from st3d.ops.losses import (
    CONTENT_LAYER,
    StyleContentTargets,
    compute_first_approach_loss,
    style_content_loss,
)
from st3d.render.rasterize import RasterizationSettings
from st3d.render.renderer import (
    compact_visibility,
    drop_plan,
    precompute_visibility,
    render_meshes,
    render_meshes_static,
    render_rgba_static,
    warn_if_hard_k_saturated,
)
from st3d.utils.assets import resolve_asset
from st3d.utils.checkpoint import load_checkpoint, save_checkpoint
from st3d.utils.compilecache import enable_compilation_cache
from st3d.utils.logging import RunLogger


def load_scene(cfg: PipelineConfig) -> Mesh:
    """Load the mesh + texture, resize the texture to the render size when
    requested (reference first_approach.py:90-100). With ``--auto_uv`` a
    UV-less mesh (teapot) gets synthesized UVs + a blank texture instead of
    the reference's hard crash (first_approach.py:88)."""
    auto = getattr(cfg, "auto_uv", "none")
    mesh = load_mesh(
        resolve_asset(cfg.obj_path), with_topology=True,
        require_uvs=(auto == "none"),
    )
    if auto != "none" and mesh.texture.shape[0] <= 2:
        from st3d.core.uv import generate_uvs

        mesh = generate_uvs(mesh, mode=auto, texture_size=cfg.size)
    if cfg.resize_texture and mesh.texture.shape[0] != cfg.size:
        tex = jnp.transpose(mesh.texture, (2, 0, 1))
        tex = resize_bilinear_chw(tex, cfg.size)
        mesh = mesh.replace(texture=jnp.transpose(tex, (1, 2, 0)))
    return mesh


def build_cameras(cfg: PipelineConfig) -> FoVPerspectiveCameras:
    if cfg.randomize_views:
        return build_random_cameras(cfg.n_views, seed=cfg.seed)
    return build_fixed_cameras(cfg.n_views, seed=cfg.seed)


def _batches(n_views: int, batch_size: int):
    for i in range(math.ceil(n_views / batch_size)):
        yield i, i * batch_size, min((i + 1) * batch_size, n_views)


def _load_style(cfg: PipelineConfig, batch: int) -> jnp.ndarray:
    style = load_as_tensor(resolve_asset(cfg.style_path), size=cfg.size)
    return jnp.broadcast_to(style[None], (batch,) + style.shape)


def _render_for_save_impl(mesh, cameras, settings):
    return render_meshes(mesh, cameras, settings)


def _render_for_save_tiled_impl(mesh, cameras, settings):
    from st3d.parallel.tiles import render_meshes_tiled

    return render_meshes_tiled(mesh, cameras, settings)


_render_for_save = jax.jit(_render_for_save_impl, static_argnums=(2,))
_render_for_save_tiled = jax.jit(_render_for_save_tiled_impl,
                                 static_argnums=(2,))

# Per-(settings, tiled) AOT routes for the save renders: on TPU the final
# 12-view render is a fresh multi-minute axon compile every process
# (same prep-class tax as the content render). Settings are hashable
# (static_argnums above already requires it).
_SAVE_RENDER_EXEC = {}


def _save_render_call(mesh, cameras, settings, tiled):
    key = (settings, bool(tiled))
    fn = _SAVE_RENDER_EXEC.get(key)
    if fn is None:
        from st3d.utils.aot import aot_jit

        impl = (_render_for_save_tiled_impl if tiled
                else _render_for_save_impl)
        fn = _SAVE_RENDER_EXEC[key] = aot_jit(
            jax.jit(functools.partial(impl, settings=settings)),
            f"save_render{'_tiled' if tiled else ''}_{settings.image_size}",
            gate=_use_aot)
    return fn(mesh, cameras)


def save_render(mesh: Mesh, cameras, settings, path: str,
                tile_parallel: bool = False) -> None:
    """Render every camera and save view_{i}.png (reference utils.py:81-91).

    ``tile_parallel=True`` (CLI ``--tile_parallel``) shards pixel ROWS of
    each render across the device mesh (st3d.parallel.tiles) — the
    high-resolution path where a 1024²+ frame is bigger than a view batch.
    Output is bit-identical to the single-device render."""
    os.makedirs(path, exist_ok=True)
    warn_if_hard_k_saturated(mesh, cameras, settings,
                             context=f"save_render({path})")
    # Module-level jits (settings static): fleet grids call save_render
    # once per (mesh, style) cell with identical shapes — a fresh
    # jit(lambda) per call would re-trace the full render program each
    # time instead of hitting the in-process cache.
    tiled = tile_parallel and len(jax.devices()) > 1
    imgs, _ = _save_render_call(mesh, cameras, settings, tiled)
    arr = np.asarray(imgs)
    for i in range(arr.shape[0]):
        save_image(arr[i], os.path.join(path, f"view_{i}.png"), async_=True)
    flush_images()


def _maybe_profile(cfg: PipelineConfig):
    if cfg.profile:
        trace_dir = os.path.join(cfg.output_path, "profile")
        jax.profiler.start_trace(trace_dir)
        return lambda: jax.profiler.stop_trace()
    return lambda: None


# ---------------------------------------------------------------------------
# First approach (reference first_approach.py)
# ---------------------------------------------------------------------------

def run_first_approach(cfg: PipelineConfig) -> Mesh:
    enable_compilation_cache()
    os.makedirs(cfg.output_path, exist_ok=True)
    os.makedirs(os.path.join(cfg.output_path, "2d_style_transfer"),
                exist_ok=True)

    content_mesh = load_scene(cfg)
    settings = RasterizationSettings(
        image_size=cfg.size, backend=cfg.raster_backend,
        soft=cfg.soft_raster, soft_sigma_px=cfg.soft_sigma_px,
        faces_per_pixel=cfg.faces_per_pixel,
        blur_radius=cfg.blur_radius, hard_k_slack=cfg.hard_k_slack,
    )
    vgg = get_vgg(cfg.vgg_weights)
    cameras = build_cameras(cfg)
    # Hard-K configs: surface the saturation diagnostic before optimizing
    # (no-op for the default K=1/blur=0; warns with the remedy otherwise).
    warn_if_hard_k_saturated(content_mesh, cameras[:cfg.batch_size],
                             settings, context="first render")
    params, optimizer, opt_state = setup_optimizations(
        cfg.optimization_target, content_mesh, cfg.mse_lr
    )
    weights = cfg.loss_weights()
    logger = RunLogger(cfg.output_path)
    rng = jax.random.PRNGKey(cfg.seed)
    stop_profile = _maybe_profile(cfg)
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    from st3d.utils.aot import aot_jit

    # Prep-class graphs (content render, visibility precompute) re-tax
    # every process with minutes of axon compile; on TPU they ride the
    # AOT executable cache too (per-shape executables, same machinery as
    # bench.py's _prep).
    render_jit = aot_jit(
        jax.jit(lambda m, c: render_meshes(m, c, settings)),
        f"render_{cfg.size}", gate=_use_aot)

    # Texture-only MSE phase: visibility is a per-batch constant (see the
    # second approach's static_vis note).
    static_vis = cfg.optimization_target == "texture"
    vis_jit = aot_jit(
        jax.jit(lambda m, c: precompute_visibility(m, c, settings)),
        f"vis_{cfg.size}", gate=_use_aot)

    fused_bg = bool(os.environ.get("ST3D_FUSED_BG"))

    def mse_loss_fn(p, cams_b, target_imgs, vis):
        mesh = apply_params(content_mesh, p)
        if vis is not None and fused_bg and "chunk_idx" in vis:
            # A/B candidate (VERDICT r4 item 1b): the frame comes straight
            # from the compact scatter (white bg), and the mask is the
            # static visibility constant itself — the rgba concat, slices,
            # and alpha compare never exist. Bit-equal: alpha IS
            # vis["mask"] cast, by construction (shade_compact).
            from st3d.render.renderer import render_composited_static

            imgs = render_composited_static(mesh, vis, settings)
            masks = vis["mask"][..., None].astype(imgs.dtype)
        elif vis is not None:
            # NHWC end-to-end (targets arrive pre-transposed); the loss is
            # elementwise+mean, so the layout only has to be consistent.
            rgba = render_rgba_static(mesh, vis, settings)
            imgs = rgba[..., :3]
            masks = (rgba[..., 3:4] > 0).astype(imgs.dtype)
        else:
            imgs, masks = render_meshes(mesh, cams_b, settings)
        verts = p.get("verts", content_mesh.verts)
        return compute_first_approach_loss(
            imgs, masks, target_imgs, verts, content_mesh.verts, mesh,
            weights, cfg.optimization_target,
        )

    @functools.partial(jax.jit, static_argnames=("n_steps",),
                       donate_argnums=(0, 1))
    def mse_steps(p, st, cams_b, target_imgs, vis, n_steps: int):
        def one(carry, _):
            p, st = carry
            loss, grads = jax.value_and_grad(mse_loss_fn)(
                p, cams_b, target_imgs, vis
            )
            updates, st = optimizer.update(grads, st, p)
            p = optax.apply_updates(p, updates)
            return (p, st), loss

        (p, st), losses = jax.lax.scan(one, (p, st), None, length=n_steps)
        return p, st, losses

    # On TPU the MSE scan's multi-minute axon compile rides the AOT
    # executable cache (the persistent compilation cache does not help
    # that path at all — see style_transfer2d._use_aot, same machinery).
    mse_exec = {}

    def mse_steps_call(p, st, cams_b, target_imgs, vis, n_steps: int):
        if not _use_aot():
            return mse_steps(p, st, cams_b, target_imgs, vis, n_steps)
        fn = mse_exec.get(n_steps)
        if fn is None:
            from st3d.utils.aot import load_or_compile_guarded

            fn = mse_exec[n_steps] = load_or_compile_guarded(
                mse_steps,
                (_specs(p), _specs(st), _specs(cams_b),
                 _specs(target_imgs), _specs(vis)),
                tag=(f"fa_mse_{cfg.size}_{cfg.compute_dtype}_"
                     f"{'static' if vis is not None else 'dyn'}_{n_steps}"),
                static_tail=(n_steps,))
        return fn(p, st, cams_b, target_imgs, vis)

    # --- data-parallel MSE phase (reference hot loop B,
    # first_approach.py:191-212): views shard across all local devices,
    # texture/vert grads pmean over ICI. Exact: the masked MSE is a mean
    # over the batch axis, and the mesh regularizers are view-independent
    # (identical on every shard).
    use_dp = cfg.data_parallel and len(jax.devices()) > 1
    if use_dp:
        from st3d.parallel.sharding import (
            make_device_mesh,
            make_view_parallel_step,
            replicate,
            shard_views,
        )

        dev_mesh = make_device_mesh()
        n_dev = len(dev_mesh.devices)
        for _, b0, b1 in _batches(cfg.n_views, cfg.batch_size):
            if (b1 - b0) % n_dev != 0:
                raise ValueError(
                    f"data_parallel requires every view batch to divide the "
                    f"{n_dev} devices; got batch of {b1 - b0} views "
                    "(adjust --n_views/--batch_size)"
                )

        def dp_mse_loss(p, cam_R, cam_T, target_imgs, vis):
            local_cams = FoVPerspectiveCameras.create(R=cam_R, T=cam_T)
            mesh = apply_params(content_mesh, p)
            if vis is not None:
                imgs, masks = render_meshes_static(mesh, vis, settings)
            else:
                imgs, masks = render_meshes(mesh, local_cams, settings)
            verts = p.get("verts", content_mesh.verts)
            return compute_first_approach_loss(
                imgs, masks, target_imgs, verts, content_mesh.verts, mesh,
                weights, cfg.optimization_target,
            )

        dp_mse_step = make_view_parallel_step(dp_mse_loss, optimizer, dev_mesh)

    start_batch = 0
    resume_done = 0          # within-batch MSE steps already applied
    resume_applied = None    # that batch's 2D-stylized targets
    ckpt_path = os.path.join(cfg.output_path, "checkpoint.npz")
    if cfg.resume and os.path.isfile(ckpt_path):
        start_batch, params, opt_state, rng, extras = load_checkpoint(
            ckpt_path, params, opt_state, rng, with_extras=True
        )
        if "mse_done" in extras:
            # Mid-batch checkpoint: the 2D-ST targets are stored so resume
            # continues the MSE phase from `mse_done` instead of re-running
            # style transfer and over-optimizing the batch.
            resume_done = int(extras["mse_done"])
            resume_applied = jnp.asarray(extras["applied"])
        print(f"Resumed from batch {start_batch}, MSE step {resume_done}")

    if use_dp:
        params = replicate(params, dev_mesh)
        opt_state = replicate(opt_state, dev_mesh)

    for i, b0, b1 in _batches(cfg.n_views, cfg.batch_size):
        if i < start_batch:
            continue
        bsz = b1 - b0
        print(f"\nBatch {i}")
        batch_cams = cameras[b0:b1]
        style_b = _load_style(cfg, bsz)
        vis = (compact_visibility(vis_jit(content_mesh, batch_cams),
                                  texture_shape=content_mesh.texture.shape)
               if static_vis else None)

        if i == start_batch and resume_applied is not None:
            applied, done = resume_applied, resume_done
        else:
            content_imgs, content_masks = render_jit(content_mesh, batch_cams)
            rng, r1 = jax.random.split(rng)
            content_b = apply_background(
                content_imgs, content_masks, cfg.content_background,
                style_b, r1
            )

            if cfg.style_transfer_init == "noise":
                rng, r2 = jax.random.split(rng)
                init = jax.random.uniform(
                    r2, content_b.shape, content_b.dtype
                )
            elif cfg.style_transfer_init == "content":
                init = content_b
            elif cfg.style_transfer_init == "current":
                cur_mesh = apply_params(content_mesh, params)
                cur_imgs, cur_masks = render_jit(cur_mesh, batch_cams)
                rng, r3 = jax.random.split(rng)
                init = apply_background(
                    cur_imgs, cur_masks, cfg.current_background, style_b, r3
                )
            else:
                raise ValueError(cfg.style_transfer_init)

            applied = style_transfer(
                init, content_b, style_b, vgg,
                steps=cfg.n_style_transfer_steps,
                style_weight=cfg.style_weight,
                content_weight=cfg.content_weight,
                lr=cfg.style_transfer_lr,
                dtype=dtype,
            )
            applied = jnp.clip(applied, 0.0, 1.0)  # finalize_tensor

            arr = np.asarray(applied)
            for j in range(bsz):
                save_image(
                    arr[j],
                    os.path.join(cfg.output_path, "2d_style_transfer",
                                 f"view_{i * cfg.batch_size + j}.png"),
                    async_=True,
                )
            done = 0

        # MSE optimization toward the 2D-stylized targets, through the
        # renderer (hot loop B) — chunked scan, losses logged per step.
        # Chunks never cross a checkpoint_every boundary, so mid-batch
        # checkpoints fire for ANY checkpoint_every value.
        # Per-step progress bar with loss postfix mirrors the reference
        # (first_approach.py:191: tqdm(..., desc="Optimizing", postfix=loss)).
        mse_bar = None
        try:
            from tqdm import tqdm as _tqdm

            mse_bar = _tqdm(total=cfg.n_mse_steps, initial=done,
                            desc="Optimizing")
        except ImportError:
            pass
        if use_dp:
            # The sampling plan cannot be view-sharded (renderer.drop_plan);
            # the DP path keeps autodiff's scatter.
            vis_nd = drop_plan(vis)
            camR_s, camT_s, applied_s, vis_s = shard_views(
                (batch_cams.R, batch_cams.T, applied, vis_nd), dev_mesh
            )
        pend_done, pend_losses = None, None

        def _flush_mse_log(d0, ls):
            ls = np.asarray(ls)
            for k, lv in enumerate(ls):
                logger.log_step(i, d0 + k, float(lv))
            if mse_bar is not None:
                mse_bar.set_postfix(loss=float(ls[-1]))
                mse_bar.update(len(ls))

        while done < cfg.n_mse_steps:
            n = min(25, cfg.n_mse_steps - done)
            if cfg.checkpoint_every:
                n = min(n, cfg.checkpoint_every
                        - (done % cfg.checkpoint_every))
            if use_dp:
                for k in range(n):
                    params, opt_state, loss = dp_mse_step(
                        params, opt_state, camR_s, camT_s, applied_s, vis_s
                    )
                    logger.log_step(i, done + k, float(loss))
                    if mse_bar is not None:
                        mse_bar.set_postfix(loss=float(loss))
                        mse_bar.update(1)
            else:
                params, opt_state, losses = mse_steps_call(
                    params, opt_state, batch_cams,
                    jnp.transpose(applied, (0, 2, 3, 1))
                    if vis is not None else applied,
                    vis, n
                )
                # Flush the PREVIOUS chunk's losses now that this chunk is
                # dispatched: np.asarray blocks until that chunk's device
                # work completes, and blocking on the current chunk before
                # dispatching the next serializes every dispatch against
                # the tunnel round-trip (same lag-by-one as the 2D-ST
                # progress bar — st3d/engine/style_transfer2d.py).
                if pend_losses is not None:
                    _flush_mse_log(pend_done, pend_losses)
                pend_done, pend_losses = done, losses
            done += n
            if (cfg.checkpoint_every and done < cfg.n_mse_steps
                    and done % cfg.checkpoint_every == 0):
                # log.txt must cover every step up to the checkpoint a
                # resume would continue from.
                if pend_losses is not None:
                    _flush_mse_log(pend_done, pend_losses)
                    pend_losses = None
                save_checkpoint(
                    ckpt_path, i, params, opt_state, rng,
                    extras={"mse_done": done, "applied": applied},
                )
        if pend_losses is not None:
            _flush_mse_log(pend_done, pend_losses)
        if mse_bar is not None:
            mse_bar.close()

        save_checkpoint(ckpt_path, i + 1, params, opt_state, rng)

    stop_profile()
    final = finalize_mesh(apply_params(content_mesh, params))
    save_render(final, build_fixed_cameras(12, seed=cfg.seed), settings,
                os.path.join(cfg.output_path, "final_render"),
                tile_parallel=cfg.tile_parallel)
    save_mesh(final, os.path.join(cfg.output_path, "final.obj"))
    flush_images()
    logger.close()
    return final


# ---------------------------------------------------------------------------
# Second approach (reference second_approach.py)
# ---------------------------------------------------------------------------

def run_second_approach(cfg: PipelineConfig) -> Mesh:
    enable_compilation_cache()
    os.makedirs(cfg.output_path, exist_ok=True)
    os.makedirs(os.path.join(cfg.output_path, "current_images"), exist_ok=True)

    content_mesh = load_scene(cfg)
    settings = RasterizationSettings(
        image_size=cfg.size, backend=cfg.raster_backend,
        soft=cfg.soft_raster, soft_sigma_px=cfg.soft_sigma_px,
        faces_per_pixel=cfg.faces_per_pixel,
        blur_radius=cfg.blur_radius, hard_k_slack=cfg.hard_k_slack,
    )
    vgg = get_vgg(cfg.vgg_weights)
    cameras = build_cameras(cfg)
    warn_if_hard_k_saturated(content_mesh, cameras[:cfg.batch_size],
                             settings, context="first render")
    params, optimizer, opt_state = setup_optimizations(
        cfg.optimization_target, content_mesh, cfg.lr
    )
    weights = cfg.loss_weights()
    logger = RunLogger(cfg.output_path)
    rng = jax.random.PRNGKey(cfg.seed)
    stop_profile = _maybe_profile(cfg)
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    from st3d.utils.aot import aot_jit

    render_jit = aot_jit(
        jax.jit(lambda m, c: render_meshes(m, c, settings)),
        f"render_{cfg.size}", gate=_use_aot)

    # Texture-only optimization never moves the geometry, so the discrete
    # visibility pass is a per-batch CONSTANT — hoist it with the targets
    # and run only the shading epilogue + VGG per step (the reference
    # re-rasterizes every step, second_approach.py:156).
    static_vis = cfg.optimization_target == "texture"
    vis_jit = aot_jit(
        jax.jit(lambda m, c: precompute_visibility(m, c, settings)),
        f"vis_{cfg.size}", gate=_use_aot)

    # Per-batch constants, hoisted out of the epoch loop (the reference
    # re-renders content and re-extracts style/content features every step;
    # SURVEY.md §3.2 redundancies). With a 'noise' content background the
    # content features must be re-extracted per step (fresh noise) — style
    # Grams are still reused.
    batch_const = []
    for i, b0, b1 in _batches(cfg.n_views, cfg.batch_size):
        bsz = b1 - b0
        batch_cams = cameras[b0:b1]
        style_b = _load_style(cfg, bsz)
        content_imgs, content_masks = render_jit(content_mesh, batch_cams)
        if cfg.content_background != "noise":
            content_b = apply_background(
                content_imgs, content_masks, cfg.content_background, style_b
            )
            targets = StyleContentTargets.create(
                content_b, style_b, vgg, dtype=dtype, layout="NHWC"
            )
        else:
            # Content features recomputed in-step; precompute style Grams.
            targets = StyleContentTargets.create(
                content_imgs, style_b, vgg, dtype=dtype, layout="NHWC"
            )
        vis = (compact_visibility(vis_jit(content_mesh, batch_cams),
                                  texture_shape=content_mesh.texture.shape)
               if static_vis else None)
        batch_const.append(
            (batch_cams, style_b, content_imgs, content_masks, targets, vis)
        )

    content_noise = cfg.content_background == "noise"

    # --- data-parallel path: shard the view batch across all local devices
    # (shard_map over a 'views' mesh axis; grads pmean over ICI). Loss
    # semantics are identical: every term is a mean over the batch axis.
    use_dp = cfg.data_parallel and len(jax.devices()) > 1
    if use_dp:
        from st3d.parallel.sharding import (
            make_device_mesh,
            make_view_parallel_step,
            replicate,
            shard_views,
        )

        dev_mesh = make_device_mesh()
        n_dev = len(dev_mesh.devices)
        for _, b0, b1 in _batches(cfg.n_views, cfg.batch_size):
            if (b1 - b0) % n_dev != 0:
                raise ValueError(
                    f"data_parallel requires every view batch to divide the "
                    f"{n_dev} devices; got batch of {b1 - b0} views "
                    "(adjust --n_views/--batch_size)"
                )

        def dp_loss_fn(p, cam_R, cam_T, style_b, cimgs, cmasks, tgt, vis,
                       seeds):
            # One shard of views per device; rig cameras use default
            # intrinsics so R/T fully determine them.
            local_cams = FoVPerspectiveCameras.create(R=cam_R, T=cam_T)
            r1 = jax.random.PRNGKey(seeds[0])
            r2 = jax.random.fold_in(r1, 1)
            mesh2 = apply_params(content_mesh, p)
            if vis is not None:
                cur_imgs, cur_masks = render_meshes_static(
                    mesh2, vis, settings
                )
            else:
                cur_imgs, cur_masks = render_meshes(
                    mesh2, local_cams, settings
                )
            cur = apply_background(
                cur_imgs, cur_masks, cfg.current_background, style_b, r1
            )
            if content_noise:
                content_b = apply_background(
                    cimgs, cmasks, "noise", style_b, r2
                )
                cf = get_features(
                    content_b, vgg, dtype=dtype, layout="NHWC"
                )[CONTENT_LAYER]
                tgt = tgt.replace(content_features=cf)
            cur_feats = get_features(cur, vgg, dtype=dtype,
                                     layout="NHWC", gram1=True)
            main = style_content_loss(
                cur_feats, tgt, cfg.style_weight, cfg.content_weight,
                layout="NHWC",
            )
            if cfg.optimization_target == "texture":
                loss = main
            else:
                from st3d.ops.losses import mesh_regularizer_loss

                loss = weights["main_loss_weight"] * main
                loss += mesh_regularizer_loss(
                    mesh2, p.get("verts", content_mesh.verts),
                    content_mesh.verts, weights,
                )
            # Aux frame only when current_images/ saves consume it (the
            # non-DP step has the same gate).
            return loss, (cur if cfg.save_intermediate else None)

        dp_step = make_view_parallel_step(
            dp_loss_fn, optimizer, dev_mesh, has_aux=True
        )

    fused_bg = bool(os.environ.get("ST3D_FUSED_BG"))

    def _epoch_step_impl(p, st, rng, cams_b, style_b, content_imgs,
                         content_masks, targets, vis):
        rng, r1, r2 = jax.random.split(rng, 3)

        def loss_fn(p):
            mesh = apply_params(content_mesh, p)
            if vis is not None and fused_bg and "chunk_idx" in vis:
                # A/B candidate (VERDICT r4 item 1b): composite the
                # background INSIDE the compact scatter — the rgba frame,
                # its alpha compare, and the full-frame blend never exist.
                # Bit-equal to the branch below: the window list is the
                # mask, and the noise keeps apply_background's exact RNG
                # stream (generated at (B,H,W,3), then flattened).
                from st3d.render.renderer import render_composited_static
                from st3d.render.shading import flatten_background

                k = vis["uv_cov"].shape[-2]
                if cfg.current_background == "white":
                    cur = render_composited_static(mesh, vis, settings)
                else:
                    if cfg.current_background == "noise":
                        bgf = jax.random.uniform(
                            r1, vis["mask"].shape + (3,),
                            mesh.texture.dtype)
                    else:                                   # style
                        bgf = jnp.transpose(style_b, (0, 2, 3, 1))
                    cur = render_composited_static(
                        mesh, vis, settings,
                        background_flat=flatten_background(bgf, k))
                cur_feats = get_features(cur, vgg, dtype=dtype,
                                         layout="NHWC",
                                         input_layout="NHWC", gram1=True)
                if cfg.save_intermediate:
                    cur = jnp.transpose(cur, (0, 3, 1, 2))  # aux is NCHW
            elif vis is not None:
                # NHWC end-to-end on the static path: rgba straight into
                # VGG (the NCHW round trip forced a channel-major layout
                # onto the frame-assembly scatter — profiler-measured as
                # the most expensive op of the step).
                rgba = render_rgba_static(mesh, vis, settings)
                cur_i = rgba[..., :3]
                cur_m = (rgba[..., 3:4] > 0).astype(cur_i.dtype)
                cur = apply_background(
                    cur_i, cur_m, cfg.current_background,
                    jnp.transpose(style_b, (0, 2, 3, 1)), r1
                )
                cur_feats = get_features(cur, vgg, dtype=dtype,
                                         layout="NHWC",
                                         input_layout="NHWC", gram1=True)
                if cfg.save_intermediate:
                    cur = jnp.transpose(cur, (0, 3, 1, 2))  # aux is NCHW
            else:
                cur_imgs, cur_masks = render_meshes(mesh, cams_b, settings)
                cur = apply_background(
                    cur_imgs, cur_masks, cfg.current_background, style_b, r1
                )
                cur_feats = get_features(cur, vgg, dtype=dtype,
                                         layout="NHWC", gram1=True)
            tg = targets
            if content_noise:
                content_b = apply_background(
                    content_imgs, content_masks, "noise", style_b, r2
                )
                cf = get_features(
                    content_b, vgg, dtype=dtype, layout="NHWC"
                )[CONTENT_LAYER]
                tg = targets.replace(content_features=cf)
            main = style_content_loss(
                cur_feats, tg, cfg.style_weight, cfg.content_weight,
                layout="NHWC",
            )
            if cfg.optimization_target == "texture":
                loss = main
            else:
                from st3d.ops.losses import mesh_regularizer_loss

                loss = weights["main_loss_weight"] * main
                loss += mesh_regularizer_loss(
                    mesh, p.get("verts", content_mesh.verts),
                    content_mesh.verts, weights,
                )
            # The frame aux exists only to feed current_images/ saves;
            # without them it would be a wasted jit output plus (on the
            # static NHWC path) the NCHW layout fork the step was
            # profiled to avoid.
            return loss, (cur if cfg.save_intermediate else None)

        (loss, cur), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, st = optimizer.update(grads, st, p)
        p = optax.apply_updates(p, updates)
        return p, st, rng, loss, cur

    if cfg.debug_nan:
        from st3d.utils.debug import jit_with_finite_guard

        epoch_step = jit_with_finite_guard(_epoch_step_impl)
    else:
        epoch_step = jax.jit(_epoch_step_impl, donate_argnums=(0, 1))

    # Single-batch runs without per-step image saving avoid the per-epoch
    # host round trip entirely: epochs run as lax.scan chunks (the same
    # trick as the 2D engine and the first approach's MSE phase) — worth
    # ~25% sustained throughput at 512**2 (8.0 -> ~10 iters/sec measured).
    use_chunked = (
        not use_dp
        and not cfg.save_intermediate
        and math.ceil(cfg.n_views / cfg.batch_size) == 1
        and not cfg.debug_nan
    )
    if use_chunked:
        @functools.partial(jax.jit, static_argnames=("n",),
                           donate_argnums=(0, 1))
        def epoch_chunk(p, st, rng, cams_b, style_b, cimg, cmask, targets,
                        vis, n: int):
            def one(carry, _):
                p, st, rng = carry
                p, st, rng, loss, _cur = _epoch_step_impl(
                    p, st, rng, cams_b, style_b, cimg, cmask, targets, vis
                )
                return (p, st, rng), loss

            (p, st, rng), losses = jax.lax.scan(
                one, (p, st, rng), None, length=n
            )
            return p, st, rng, losses

        # TPU warm starts: the epoch scan is the multi-minute axon
        # compile; route it through the AOT executable cache (same
        # machinery and rationale as the first approach's MSE scan).
        chunk_exec = {}

        def epoch_chunk_call(p, st, rng, cams_b, style_b, cimg, cmask,
                             targets, vis, n):
            if not _use_aot():
                return epoch_chunk(p, st, rng, cams_b, style_b, cimg,
                                   cmask, targets, vis, n)
            fn = chunk_exec.get(n)
            if fn is None:
                from st3d.utils.aot import load_or_compile_guarded

                fn = chunk_exec[n] = load_or_compile_guarded(
                    epoch_chunk,
                    tuple(_specs(a) for a in (
                        p, st, rng, cams_b, style_b, cimg, cmask,
                        targets, vis)),
                    tag=f"sa_epoch_{cfg.size}_{cfg.compute_dtype}_{n}",
                    static_tail=(n,))
            return fn(p, st, rng, cams_b, style_b, cimg, cmask, targets,
                      vis)

    start_epoch = 0
    ckpt_path = os.path.join(cfg.output_path, "checkpoint.npz")
    if cfg.resume and os.path.isfile(ckpt_path):
        start_epoch, params, opt_state, rng = load_checkpoint(
            ckpt_path, params, opt_state, rng
        )
        print(f"Resumed from epoch {start_epoch}")

    if use_dp:
        params = replicate(params, dev_mesh)
        opt_state = replicate(opt_state, dev_mesh)
        # The sampling plan cannot be view-sharded (renderer.drop_plan);
        # the DP path keeps autodiff's atlas scatter.
        batch_const = [
            tuple(shard_views(x, dev_mesh) for x in (
                cams_b.R, cams_b.T, style_b, cimg, cmask, targets,
                drop_plan(vis)))
            for (cams_b, style_b, cimg, cmask, targets, vis) in batch_const
        ]
        # On resume, continue the per-step noise-RNG seed sequence where the
        # crashed run left off (the non-dp path checkpoints its rng key; the
        # dp path derives seeds from the global step index instead).
        step_counter = start_epoch * len(batch_const)

    if use_chunked:
        (cams_b, style_b, cimg, cmask, targets, vis) = batch_const[0]
        epoch = start_epoch
        while epoch < cfg.epochs:
            n = min(50, cfg.epochs - epoch)
            if cfg.checkpoint_every:
                n = min(n, cfg.checkpoint_every
                        - (epoch % cfg.checkpoint_every))
            params, opt_state, rng, losses = epoch_chunk_call(
                params, opt_state, rng, cams_b, style_b, cimg, cmask,
                targets, vis, n,
            )
            for j, lv in enumerate(np.asarray(losses)):
                logger.log_epoch(epoch + j, float(lv))
            epoch += n
            if cfg.checkpoint_every and epoch % cfg.checkpoint_every == 0:
                save_checkpoint(ckpt_path, epoch, params, opt_state, rng)
        remaining_epochs = range(0)  # everything done in chunks
    else:
        remaining_epochs = range(start_epoch, cfg.epochs)

    for epoch in remaining_epochs:
        total_loss = 0.0
        for bi, const in enumerate(batch_const):
            if use_dp:
                (cam_R, cam_T, style_b, cimg, cmask, targets, vis) = const
                seeds = jnp.asarray(
                    cfg.seed + step_counter * 131071
                    + jnp.arange(cam_R.shape[0]), jnp.uint32
                )
                params, opt_state, loss, cur = dp_step(
                    params, opt_state, cam_R, cam_T, style_b, cimg, cmask,
                    targets, vis, shard_views(seeds, dev_mesh),
                )
                step_counter += 1
            else:
                (cams_b, style_b, cimg, cmask, targets, vis) = const
                params, opt_state, rng, loss, cur = epoch_step(
                    params, opt_state, rng, cams_b, style_b, cimg, cmask,
                    targets, vis,
                )
            total_loss += float(loss)
            if cfg.save_intermediate:
                arr = np.asarray(jnp.clip(cur, 0.0, 1.0))
                for j in range(arr.shape[0]):
                    save_image(
                        arr[j],
                        os.path.join(
                            cfg.output_path, "current_images",
                            f"view_{bi * cfg.batch_size + j}.png",
                        ),
                        async_=True,
                    )
        logger.log_epoch(epoch, total_loss)
        if cfg.checkpoint_every and (epoch + 1) % cfg.checkpoint_every == 0:
            save_checkpoint(ckpt_path, epoch + 1, params, opt_state, rng)

    stop_profile()
    final = finalize_mesh(apply_params(content_mesh, params))
    save_render(final, build_fixed_cameras(12, seed=cfg.seed), settings,
                os.path.join(cfg.output_path, "final_render"),
                tile_parallel=cfg.tile_parallel)
    save_mesh(final, os.path.join(cfg.output_path, "final.obj"))
    flush_images()
    logger.close()
    return final
