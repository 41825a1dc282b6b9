"""Batched multi-mesh x multi-style optimization (BASELINE.md config 5:
"all 4 meshes x 5 styles" in ONE run).

The sequential fleet driver loops meshes; this engine runs the whole
(mesh, style) grid as one SPMD program, TPU-first:

  * meshes are padded to common static budgets (``pad_mesh``) and stacked on
    a leading mesh axis — padding faces are degenerate and dropped by every
    rasterizer backend's validity mask, so visibility is bit-identical to
    the unpadded meshes;
  * per step the mesh axis FOLDS INTO the rasterizer's view axis: one
    kernel launch rasterizes all M x B views (the Pallas kernel is natively
    view-batched; wrapping it in vmap is forbidden — see
    rasterize_batch's contract);
  * shading vmaps over mesh x style against the shared fragments, and all
    M x S x B renders go through VGG as ONE batch (MXU-friendly);
  * every (mesh, style) cell owns a disjoint texture atlas, so one Adam
    update over the stacked (M, S, H, W, 3) parameter advances the whole
    grid simultaneously — identical trajectories to M x S sequential runs.

With ``cfg.data_parallel`` the grid shards over a 2D device mesh
("mesh" x "style" axes, auto-factored to tile the device count): geometry
and content features ride the mesh axis, Gram targets the style axis,
textures both. Disjoint parameters -> ZERO per-step collectives; XLA only
all-gathers the small fragment tensors where the style axis consumes them.

Reference basis: the reference (first/second_approach.py) runs one
mesh x style per process invocation; config 5's grid is 20 processes there.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict, List, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import optax

from st3d.core.mesh import Mesh, finalize_mesh
from st3d.core.uv import pad_mesh
from st3d.engine.config import PipelineConfig
from st3d.engine.multistyle import _multi_style_content_loss
from st3d.engine.pipelines import (
    _batches,
    build_cameras,
    load_scene,
    save_render,
)
from st3d.io.image import load_as_tensor
from st3d.io.obj import save_mesh
from st3d.models.vgg import get_features, get_vgg
from st3d.ops.losses import CONTENT_LAYER, STYLE_LAYERS, gram_matrix_nhwc
from st3d.render.rasterize import (
    RasterizationSettings,
    face_verts_screen,
    rasterize_batch,
)
from st3d.render.renderer import compact_visibility, render_meshes
from st3d.render.shading import pixel_uvs, shade_compact
from st3d.utils.assets import resolve_asset
from st3d.utils.checkpoint import load_checkpoint, save_checkpoint
from st3d.utils.compilecache import enable_compilation_cache
from st3d.utils.logging import RunLogger


def _pick_grid(n_dev: int, n_meshes: int, n_styles: int):
    """Factor ``n_dev`` into (mesh_devices, style_devices) and pick padded
    grid sizes: returns ``(dm, ds, m_pad, s_pad)`` with ``m_pad`` / ``s_pad``
    the smallest multiples of ``dm`` / ``ds`` covering the real grid.

    Any grid shards over any device count: non-tiling shapes (the flagship
    4 meshes x 5 styles on 8 devices -> (4, 2, 4, 6)) pad an axis with
    masked zero-loss cells. The factorization minimizing padded cells wins;
    ties shard the style axis harder (texture params and Gram targets are
    the big per-style state).
    """
    best = None
    for ds in range(n_dev, 0, -1):
        if n_dev % ds:
            continue
        dm = n_dev // ds
        m_pad = -(-n_meshes // dm) * dm
        s_pad = -(-n_styles // ds) * ds
        key = (m_pad * s_pad, -ds)
        if best is None or key < best[0]:
            best = (key, (dm, ds, m_pad, s_pad))
    return best[1]


def _pad_axis(a: jnp.ndarray, axis: int, size: int) -> jnp.ndarray:
    """Grow ``axis`` to ``size`` by repeating the first slice (padding cells
    must rasterize/shade to FINITE values — they are loss-masked, not
    computed-around, so garbage like zero-area faces would still NaN)."""
    n = a.shape[axis]
    if n == size:
        return a
    idx = (slice(None),) * axis + (slice(0, 1),)
    rep = jnp.broadcast_to(
        a[idx], a.shape[:axis] + (size - n,) + a.shape[axis + 1:]
    )
    return jnp.concatenate([a, rep], axis=axis)


def _load_fleet_meshes(cfg: PipelineConfig,
                       obj_paths: Sequence[str]) -> List[Mesh]:
    """Load every mesh with the same auto-UV recovery the sequential fleet
    applies (UV-less meshes like teapot get spherical UVs instead of the
    reference's crash at first_approach.py:88)."""
    meshes = []
    for obj in obj_paths:
        sub = dataclasses.replace(cfg, obj_path=obj)
        try:
            meshes.append(load_scene(sub))
        except ValueError:
            if sub.auto_uv != "none":
                raise
            # load_mesh(require_uvs=True)'s no-UVs/texture error: retry
            # with spherical UV recovery (one extra load for the rare
            # UV-less mesh beats double-parsing EVERY fleet OBJ to probe).
            meshes.append(
                load_scene(dataclasses.replace(sub, auto_uv="sphere"))
            )
    return meshes


def run_fleet_batched(cfg: PipelineConfig, obj_paths: Sequence[str],
                      style_paths: Sequence[str],
                      epochs: int = None) -> Dict[str, Dict[str, Mesh]]:
    """Optimize one texture per (mesh, style) cell, jointly.

    Returns ``{mesh_stem: {style_stem: finalized Mesh}}`` and writes
    ``output_path/<mesh>/<style>/final.obj`` (+ renders) per cell, matching
    the sequential fleet's layout.
    """
    epochs = epochs if epochs is not None else cfg.epochs
    enable_compilation_cache()
    os.makedirs(cfg.output_path, exist_ok=True)
    mesh_names = [os.path.splitext(os.path.basename(p))[0] for p in obj_paths]
    style_names = [os.path.splitext(os.path.basename(p))[0]
                   for p in style_paths]
    n_meshes, n_styles = len(obj_paths), len(style_paths)
    if len(set(mesh_names)) != n_meshes:
        raise ValueError(f"duplicate mesh stems in {mesh_names}")
    if len(set(style_names)) != n_styles:
        raise ValueError(f"duplicate style stems in {style_names}")

    meshes = _load_fleet_meshes(cfg, obj_paths)
    v_pad = max(m.verts.shape[0] for m in meshes)
    f_pad = max(m.faces.shape[0] for m in meshes)
    t_pad = max(m.verts_uvs.shape[0] for m in meshes)
    tex_size = max(m.texture.shape[0] for m in meshes)
    padded = [
        pad_mesh(m, v_pad, f_pad, num_uvs=t_pad, texture_size=tex_size)
        for m in meshes
    ]
    verts = jnp.stack([m.verts for m in padded])          # (M, V, 3)
    faces = jnp.stack([m.faces for m in padded])          # (M, F, 3)
    verts_uvs = jnp.stack([m.verts_uvs for m in padded])  # (M, T, 2)
    faces_uvs = jnp.stack([m.faces_uvs for m in padded])  # (M, F, 3)

    # The batched fleet step shades via the compact visibility path
    # (pixel_uvs/shade_compact), which requires hard K=1 rasterization;
    # soft/blur/multi-K settings cannot be honored here — refuse LOUDLY
    # instead of silently optimizing a different objective than
    # run_second_approach would for the same cfg.
    if cfg.soft_raster or cfg.blur_radius > 0 or cfg.faces_per_pixel > 1:
        raise ValueError(
            "fleet_mode=batched requires hard K=1 rasterization "
            f"(got soft_raster={cfg.soft_raster}, "
            f"blur_radius={cfg.blur_radius}, "
            f"faces_per_pixel={cfg.faces_per_pixel}); use the per-style "
            "multistyle/second-approach drivers for soft or blurred "
            "rasterization."
        )
    settings = RasterizationSettings(
        image_size=cfg.size, backend=cfg.raster_backend
    )
    vgg = get_vgg(cfg.vgg_weights)
    cameras = build_cameras(cfg)
    logger = RunLogger(cfg.output_path)
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    size = cfg.size

    render_jit = jax.jit(lambda m, c: render_meshes(m, c, settings))

    # Textures are the only trainable leaves, so visibility is a per-batch
    # constant (renderer.precompute_visibility rationale): project + fold
    # meshes into the view axis, ONE rasterizer launch per camera batch,
    # done once at setup.
    @jax.jit
    def fleet_visibility(batch_cams):
        fv = jax.vmap(
            lambda v, f: face_verts_screen(v, f, batch_cams, size)
        )(verts, faces)  # (M, B, F, 3, 3)
        m, b = fv.shape[0], fv.shape[1]
        frags = rasterize_batch(fv.reshape((m * b,) + fv.shape[2:]), settings)
        p2f = frags.pix_to_face.reshape(
            (m, b) + frags.pix_to_face.shape[1:]
        )
        # Hard mode + textures-only: per-pixel UVs and coverage are ALSO
        # constants — the step shades via shading.shade_from_uvs only.
        uv, mask = jax.vmap(
            lambda fv_m, p2f_m, uvs_m, fuvs_m: jax.vmap(
                lambda fvv, pp: pixel_uvs(fvv, pp, uvs_m, fuvs_m)
            )(fv_m, p2f_m)
        )(fv, p2f, verts_uvs, faces_uvs)
        return {"uv": jax.lax.stop_gradient(uv), "mask": mask}

    # Per-batch constants: per-mesh content features, per-style Gram targets
    # (shared across meshes — the style image does not depend on geometry).
    batch_const = []
    for i, b0, b1 in _batches(cfg.n_views, cfg.batch_size):
        bsz = b1 - b0
        batch_cams = cameras[b0:b1]
        cfeat = jnp.stack([
            get_features(render_jit(m, batch_cams)[0], vgg,
                         dtype=dtype, layout="NHWC")[CONTENT_LAYER]
            for m in padded
        ])  # (M, B, H, W, C) — layout="NHWC" taps
        styles = jnp.stack([
            jnp.broadcast_to(
                load_as_tensor(resolve_asset(p), size)[None],
                (bsz, 3, size, size),
            )
            for p in style_paths
        ])
        style_feats = get_features(
            styles.reshape(n_styles * bsz, 3, size, size), vgg,
            dtype=dtype, layout="NHWC",
        )
        style_grams = {}
        for l in STYLE_LAYERS:
            g = gram_matrix_nhwc(style_feats[l])
            style_grams[l] = g.reshape(n_styles, bsz, g.shape[-1], g.shape[-1])
        batch_const.append(
            (compact_visibility(fleet_visibility(batch_cams),
                                texture_shape=padded[0].texture.shape),
             cfeat, style_grams)
        )

    textures = jnp.stack([
        jnp.broadcast_to(m.texture[None], (n_styles,) + m.texture.shape)
        for m in padded
    ])  # (M, S, H, W, 3)

    # Padded grid dims (== real dims unless DP needs an axis grown to tile
    # the device count; padded cells replicate row/col 0 and are loss-masked
    # to exact zero, so they never influence real cells' trajectories).
    grid_m, grid_s = n_meshes, n_styles
    cell_mask = None
    use_dp = cfg.data_parallel and len(jax.devices()) > 1
    if use_dp:
        n_dev = len(jax.devices())
        dm, ds, grid_m, grid_s = _pick_grid(n_dev, n_meshes, n_styles)
        if (grid_m, grid_s) != (n_meshes, n_styles):
            textures = _pad_axis(_pad_axis(textures, 0, grid_m), 1, grid_s)
            batch_const = [
                (
                    # every vis leaf (incl. the nested sampling plan) is
                    # mesh-major
                    jax.tree_util.tree_map(
                        lambda x: _pad_axis(x, 0, grid_m), vis
                    ),
                    _pad_axis(cfeat, 0, grid_m),
                    {l: _pad_axis(g, 0, grid_s) for l, g in grams.items()},
                )
                for (vis, cfeat, grams) in batch_const
            ]
            # NOTE: the stacked geometry (verts/faces/uvs) is NOT padded or
            # sharded — it is consumed only by fleet_visibility, which
            # already ran while building batch_const above; the step itself
            # reads only textures + the precomputed visibility.
            cell_mask = jnp.zeros((grid_m, grid_s), jnp.float32)
            cell_mask = cell_mask.at[:n_meshes, :n_styles].set(1.0)

    params = {"textures": textures}
    optimizer = optax.adam(cfg.lr)
    opt_state = optimizer.init(params)

    # Checkpoints stay canonical (real grid shape) regardless of how many
    # devices the writing run padded for: slice on save, re-pad on load.
    def _slice_grid(tree):
        return jax.tree_util.tree_map(
            lambda x: x[:n_meshes, :n_styles]
            if hasattr(x, "ndim") and x.ndim >= 2
            and x.shape[:2] == (grid_m, grid_s) else x,
            tree,
        )

    def _pad_grid(tree):
        return jax.tree_util.tree_map(
            lambda x: _pad_axis(_pad_axis(x, 0, grid_m), 1, grid_s)
            if hasattr(x, "ndim") and x.ndim >= 2
            and x.shape[:2] == (n_meshes, n_styles) else x,
            tree,
        )

    if use_dp:
        from jax.sharding import Mesh as DevMesh, NamedSharding
        from jax.sharding import PartitionSpec as P

        dev_mesh = DevMesh(
            np.asarray(jax.devices()).reshape(dm, ds), ("mesh", "style")
        )
        mesh_sh = NamedSharding(dev_mesh, P("mesh"))
        grid_sh = NamedSharding(dev_mesh, P("mesh", "style"))
        repl = NamedSharding(dev_mesh, P())

        def _shard_opt(params, opt_state):
            params = jax.device_put(params, grid_sh)
            opt_state = jax.tree_util.tree_map(
                lambda x: jax.device_put(
                    x, grid_sh if hasattr(x, "ndim") and x.ndim >= 2
                    and x.shape[:2] == (grid_m, grid_s) else repl
                ) if hasattr(x, "ndim") else x,
                opt_state,
            )
            return params, opt_state

        params, opt_state = _shard_opt(params, opt_state)
        if cell_mask is not None:
            cell_mask = jax.device_put(cell_mask, grid_sh)
        batch_const = [
            (
                jax.device_put(vis, mesh_sh),
                jax.device_put(cfeat, mesh_sh),
                jax.tree_util.tree_map(
                    lambda g: jax.device_put(
                        g, NamedSharding(dev_mesh, P("style"))
                    ),
                    grams,
                ),
            )
            for (vis, cfeat, grams) in batch_const
        ]

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(p, st, vis, cfeat, style_grams):
        def loss_fn(p):
            m, b = vis["mask"].shape[0], vis["mask"].shape[1]

            def shade_mesh(idx_m, uvc_m, cov8_m, mask_m, tex_s, plan_m):
                return jax.vmap(
                    lambda tex: shade_compact(
                        tex, idx_m, uvc_m, cov8_m, mask_m, plan=plan_m
                    )
                )(tex_s)  # (S, B, H, W, 4)

            rgba = jax.vmap(shade_mesh)(
                vis["chunk_idx"], vis["uv_cov"], vis["cov8"],
                vis["mask"], p["textures"], vis.get("plan"),
            )  # (M, S, B, H, W, 4)
            imgs = rgba[..., :3]  # NHWC end-to-end (no NCHW round trip)
            s = imgs.shape[1]
            feats = get_features(
                imgs.reshape(m * s * b, size, size, 3), vgg, dtype=dtype,
                layout="NHWC", input_layout="NHWC", gram1=True,
            )
            feats = {
                k: v.reshape((m, s, b) + v.shape[1:])
                for k, v in feats.items()
            }
            per_grid = jax.vmap(
                _multi_style_content_loss,
                in_axes=(0, 0, None, None, None, None),
            )(feats, cfeat, style_grams, cfg.style_weight,
              cfg.content_weight, size)  # (M, S)
            if cell_mask is not None:
                # Padded cells: zero loss => zero grads => Adam leaves their
                # (duplicate) textures untouched; real cells are unaffected.
                per_grid = per_grid * cell_mask
            return jnp.sum(per_grid), per_grid

        (loss, per_grid), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(p)
        updates, st = optimizer.update(grads, st, p)
        p = optax.apply_updates(p, updates)
        return p, st, loss, per_grid

    from st3d.engine.style_transfer2d import _specs, _use_aot

    aot_step = _use_aot() and not use_dp
    if aot_step or os.environ.get("ST3D_FLEET_MEMLOWER"):
        # Memory evidence for the config-5 grid (VERDICT r4 item 5): the
        # axon tunnel does not expose device.memory_stats(), but the
        # compiler's own memory analysis of the step executable is exact
        # and host-independent. AOT-compile the step explicitly (the
        # compiled object replaces the jit wrapper, so the step compiles
        # ONCE either way) and write the analysis next to metrics.jsonl.
        # On TPU the executable also rides the AOT cache (the grid step
        # was ~590s of the fleet runner's 603s wall) — single-device
        # only: ShapeDtypeStruct specs carry no shardings, so the DP grid
        # keeps the jit wrapper.
        vis0, cfeat0, grams0 = batch_const[0]
        if aot_step:
            from st3d.utils.aot import load_or_compile_guarded

            compiled = load_or_compile_guarded(
                step, (_specs(params), _specs(opt_state), _specs(vis0),
                       _specs(cfeat0), _specs(grams0)),
                tag=f"fleet_step_{cfg.size}_{grid_m}x{grid_s}")
        else:
            compiled = step.lower(params, opt_state, vis0, cfeat0,
                                  grams0).compile()

        def _avals(t):
            return jax.tree_util.tree_map(
                lambda a: (jnp.shape(a), jnp.result_type(a)), t)

        # A Compiled object only accepts entry-0's exact avals; a ragged
        # last view-batch must keep the jit wrapper (and pay one more
        # compile) rather than crash mid-epoch.
        uniform = all(
            _avals(bc) == _avals(batch_const[0]) for bc in batch_const
        )
        try:
            ma = compiled.memory_analysis()
            mem = {
                k: int(getattr(ma, k))
                for k in (
                    "argument_size_in_bytes",
                    "output_size_in_bytes",
                    "temp_size_in_bytes",
                    "alias_size_in_bytes",
                    "generated_code_size_in_bytes",
                )
                if getattr(ma, k, None) is not None
            }
            # Donated params/opt_state alias outputs, so live HBM at step
            # peak = non-aliased args + outputs + temps.
            mem["step_peak_hbm_bytes"] = (
                mem.get("argument_size_in_bytes", 0)
                - mem.get("alias_size_in_bytes", 0)
                + mem.get("output_size_in_bytes", 0)
                + mem.get("temp_size_in_bytes", 0)
            )
        except Exception as e:  # analysis missing on some PJRT backends,
            # and unavailable on a DESERIALIZED (AOT-cache-hit) executable
            mem = {"error": str(e)}
        mem_path = os.path.join(cfg.output_path, "xla_mem.json")
        # A warm AOT hit cannot produce the analysis — keep an existing
        # good file rather than clobbering it with the error record.
        if "error" not in mem or not os.path.isfile(mem_path):
            with open(mem_path, "w") as f:
                import json as _json

                _json.dump(mem, f, indent=1)
        if uniform:
            step = compiled

    start_epoch = 0
    ckpt_path = os.path.join(cfg.output_path, "checkpoint.npz")
    rng = jax.random.PRNGKey(cfg.seed)
    if cfg.resume and os.path.isfile(ckpt_path):
        start_epoch, cp_params, cp_opt, rng = load_checkpoint(
            ckpt_path, _slice_grid(params), _slice_grid(opt_state), rng
        )
        params, opt_state = _pad_grid(cp_params), _pad_grid(cp_opt)
        if use_dp:
            # load_checkpoint returns unsharded host arrays; a resumed DP
            # run must re-apply the grid sharding or the whole texture grid
            # materializes replicated/on one device (advisor r2).
            params, opt_state = _shard_opt(params, opt_state)

    for epoch in range(start_epoch, epochs):
        total = 0.0
        grid_sum = np.zeros((grid_m, grid_s))
        for vis, cfeat, grams in batch_const:
            params, opt_state, loss, per_grid = step(
                params, opt_state, vis, cfeat, grams
            )
            total += float(loss)
            grid_sum += np.asarray(per_grid)
        logger.log_epoch(
            epoch, total,
            per_cell={
                f"{mn}/{sn}": float(grid_sum[mi, si])
                for mi, mn in enumerate(mesh_names)
                for si, sn in enumerate(style_names)
            },
        )
        if cfg.checkpoint_every and (epoch + 1) % cfg.checkpoint_every == 0:
            save_checkpoint(ckpt_path, epoch + 1, _slice_grid(params),
                            _slice_grid(opt_state), rng)

    results: Dict[str, Dict[str, Mesh]] = {}
    fixed12 = build_cameras(
        PipelineConfig(n_views=12, randomize_views=False, seed=cfg.seed)
    )
    textures_out = np.asarray(params["textures"])
    for mi, mesh_name in enumerate(mesh_names):
        results[mesh_name] = {}
        for si, style_name in enumerate(style_names):
            # Final meshes carry the ORIGINAL (unpadded) geometry with the
            # optimized texture; padding only ever existed inside the step.
            final = finalize_mesh(
                meshes[mi].replace(texture=jnp.asarray(textures_out[mi, si]))
            )
            out_dir = os.path.join(cfg.output_path, mesh_name, style_name)
            save_render(final, fixed12, settings,
                        os.path.join(out_dir, "final_render"),
                        tile_parallel=cfg.tile_parallel)
            save_mesh(final, os.path.join(out_dir, "final.obj"))
            results[mesh_name][style_name] = final
    logger.close()
    return results
