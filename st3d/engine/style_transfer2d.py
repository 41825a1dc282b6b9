"""The 2D neural style-transfer engine (Gatys-style, VGG Gram losses).

Replaces the reference's ``style_transfer`` (style_transfer.py:38-85): Adam
directly on the pixel tensor against content loss (conv4_2 MSE) + the
quirk-exact style Gram losses. Differences that change performance but not
results (SURVEY.md §3.4/§3.5):

  * Content features and style Grams are computed once and reused (the
    reference also hoists these — parity).
  * The whole optimization runs as a jitted ``lax.scan`` over step chunks
    with donated buffers — no per-step host round trip, no Python loop over
    3000 steps, and (unlike the reference's ``get_features``) the VGG stops
    at conv5_1 instead of running all 37 modules.
  * Output is NOT clamped (parity: the caller clamps via finalize_tensor,
    first_approach.py:182).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import optax

from st3d.models.vgg import VGG19, get_features
from st3d.ops.losses import StyleContentTargets, style_content_loss


def _use_aot() -> bool:
    """The persistent compilation cache does not accelerate the axon
    remote-compile path at all (measured round 3), so every fresh process
    pays the full multi-minute compile of the scan chunk and the targets
    graph — the warm bf16 first-approach e2e measured 660s with ~560s of
    it recompilation (round 5). On TPU, route the big executables through
    the AOT executable cache instead (same machinery as bench.py;
    ST3D_NO_AOT opts out)."""
    return (not os.environ.get("ST3D_NO_AOT")
            and jax.default_backend() == "tpu")


def _specs(t):
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)), t)


# Process-global executable memo: repeated style_transfer calls (one per
# first-approach batch; one per bench window) must not re-lower and
# re-hash their executables every call (~seconds each — it depressed
# bench_st2d's windows by 2x). Safe because every graph-determining input
# is in the memo key: shapes/dtype/steps/lr in the tag and the ST3D_* A/B
# env via the aot key itself (a changed env changes what load_or_compile
# returns, so include it here too).
_EXEC_MEMO = {}


def _memo_exec(tag, build):
    key = (tag, os.environ.get("ST3D_NO_AOT", ""),
           tuple(sorted((k, v) for k, v in os.environ.items()
                        if k.startswith("ST3D_"))))
    fn = _EXEC_MEMO.get(key)
    if fn is None:
        fn = _EXEC_MEMO[key] = build()
    return fn


@functools.partial(jax.jit, static_argnames=("steps", "lr", "dtype"),
                   donate_argnums=(0, 1))
def _scan_steps(imgs, opt_state, targets, model, style_weight,
                content_weight, steps: int, lr: float, dtype=jnp.float32):
    """imgs are NHWC f32: the pixel buffer and the Adam state live in the
    VGG's native layout for the whole scan, so no transpose pair runs per
    step (hot loop A profiled 30% slower than the strictly-larger 3D step
    with the NCHW buffer — the per-step transposes forced a channel-major
    layout fork; VERDICT r3 item 3). Adam is elementwise, so the NHWC
    trajectory is the NCHW trajectory transposed — torch parity holds
    (tests/test_torch_parity.py)."""
    opt = optax.adam(lr)

    def loss_fn(x):
        # gram1: the conv1_1 Gram comes algebraically from the im2col
        # patches (same matrix up to float reassociation; trajectory parity
        # vs the torch replica holds — tests/test_torch_parity.py).
        feats = get_features(x, model, dtype=dtype, layout="NHWC",
                             input_layout="NHWC", gram1=True)
        return style_content_loss(
            feats, targets, style_weight, content_weight, layout="NHWC"
        )

    def step(carry, _):
        x, st = carry
        loss, grads = jax.value_and_grad(loss_fn)(x)
        updates, st = opt.update(grads, st, x)
        x = optax.apply_updates(x, updates)
        return (x, st), loss

    (imgs, opt_state), losses = jax.lax.scan(
        step, (imgs, opt_state), None, length=steps
    )
    return imgs, opt_state, losses


def style_transfer(
    initial_optimized_imgs: jnp.ndarray,
    content_imgs: jnp.ndarray,
    style_imgs: jnp.ndarray,
    model: VGG19,
    steps: int = 2000,
    style_weight: float = 1e6,
    content_weight: float = 1.0,
    lr: float = 0.003,
    chunk: int = 100,
    progress: bool = True,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Optimize ``initial_optimized_imgs`` (B, 3, H, W) toward the style of
    ``style_imgs`` and the content of ``content_imgs``. Reference signature
    and defaults (style_transfer.py:38)."""
    assert (
        initial_optimized_imgs.shape[0]
        == content_imgs.shape[0]
        == style_imgs.shape[0]
    )
    use_aot = _use_aot()
    shp = "x".join(map(str, initial_optimized_imgs.shape))
    dt_name = jnp.dtype(dtype).name
    if use_aot:
        from st3d.utils.aot import load_or_compile_guarded

        def _build_create():
            create_jit = jax.jit(functools.partial(
                StyleContentTargets.create, dtype=dtype, layout="NHWC"))
            return load_or_compile_guarded(
                create_jit, (_specs(content_imgs), _specs(style_imgs),
                             _specs(model)),
                tag=f"st2d_create_{shp}_{dt_name}")

        create_exec = _memo_exec(f"st2d_create_{shp}_{dt_name}",
                                 _build_create)
        targets = create_exec(content_imgs, style_imgs, model)
    else:
        targets = StyleContentTargets.create(
            content_imgs, style_imgs, model, dtype=dtype, layout="NHWC"
        )

    # Copy (reference clone().detach(), style_transfer.py:54): the scan
    # donates its input buffers, and the caller's array must stay valid.
    # NHWC from here to the end of the optimization (see _scan_steps).
    imgs = jnp.transpose(
        jnp.asarray(initial_optimized_imgs, jnp.float32), (0, 2, 3, 1)
    )
    opt_state = optax.adam(lr).init(imgs)

    chunks = []
    remaining = steps
    while remaining > 0:
        chunks.append(min(chunk, remaining))
        remaining -= chunks[-1]

    iterator = chunks
    if progress:
        try:
            from tqdm import tqdm

            iterator = tqdm(chunks, desc="2D Style Transfer")
        except ImportError:
            pass

    # The postfix lags ONE chunk: float(loss) blocks until that chunk's
    # device work completes, and blocking on the CURRENT chunk before
    # dispatching the next serializes every dispatch against the tunnel
    # round-trip (measured: the first approach's ST phase sustained
    # 2.73s/100-step chunk with the synchronous postfix vs bench_st2d's
    # 1.6s for the identical scan — a ~1.1s/chunk dispatch stall, round
    # 5). Fetching chunk i-1's loss while chunk i runs keeps the bar live
    # at full pipeline depth.
    scan_exec = {}

    def _run_chunk(imgs, opt_state, n):
        if use_aot:
            fn = scan_exec.get(n)
            if fn is None:
                from st3d.utils.aot import load_or_compile_guarded

                def _build_scan(imgs=imgs, opt_state=opt_state, n=n):
                    return load_or_compile_guarded(
                        _scan_steps,
                        (_specs(imgs), _specs(opt_state), _specs(targets),
                         _specs(model),
                         jax.ShapeDtypeStruct((), jnp.float32),
                         jax.ShapeDtypeStruct((), jnp.float32)),
                        tag=f"st2d_scan_{shp}_{n}_{dt_name}",
                        static_tail=(n, lr, dtype))

                fn = scan_exec[n] = _memo_exec(
                    f"st2d_scan_{shp}_{n}_{dt_name}_lr{lr}", _build_scan)
            return fn(imgs, opt_state, targets, model,
                      jnp.float32(style_weight),
                      jnp.float32(content_weight))
        return _scan_steps(
            imgs, opt_state, targets, model,
            jnp.float32(style_weight), jnp.float32(content_weight),
            n, lr, dtype,
        )

    pending = None
    for n in iterator:
        imgs, opt_state, losses = _run_chunk(imgs, opt_state, n)
        if progress and pending is not None \
                and hasattr(iterator, "set_postfix"):
            iterator.set_postfix(loss=float(pending))
        pending = losses[-1]
    if progress and pending is not None and hasattr(iterator, "set_postfix"):
        iterator.set_postfix(loss=float(pending))
    return jnp.transpose(imgs, (0, 3, 1, 2))  # back to the NCHW API layout
