"""Pallas TPU 3x3 SAME convolution for the VGG stage-1/2 layers.

Why: XLA's conv strategy for the early VGG layers (64-128 channels at
512**2/256**2) spends more time on layout copies around each conv than on
the matmuls themselves — profiler-measured ~10ms/step of "data formatting"
at the 512**2 bench workload, against a ~2ms compute roofline for those
layers. This kernel keeps a row band of the image resident in VMEM, runs
the nine taps as MXU matmuls into an f32 accumulator, and writes the
(bias-added) output once — no intermediate layouts for XLA to bounce
between. ReLU intentionally stays OUTSIDE (pre-ReLU taps are the style
surface, and XLA fuses the max for free).

The backward is the same kernel: for a stride-1 SAME conv the input
gradient is a 3x3 SAME conv of the cotangent with the spatially-flipped,
IO-transposed kernel. VGG weights are frozen in this framework (SURVEY.md
L6 — only textures/verts train), so no weight gradient is needed and the
custom VJP returns None for the weight/bias cotangents.

Replaces the capability of torchvision's VGG conv layers on the hot path
(reference style_transfer.py:10-27 feature extraction); `get_features`
gates it to the TPU backend and falls back to `lax.conv_general_dilated`
elsewhere (tests pin pallas==XLA equality in interpret mode).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# VMEM budget is rows x width x channels (f32 accumulator dominates), so
# the row band must shrink with BOTH width and channel count: a fixed
# 16-row band fits 512-wide/64ch but OOMs the 16MB scoped limit at 768-wide
# (width) and at 64-wide/512ch with a pixel-only rule (channels).
BLOCK_PIXELS_64CH = 8192


def _tap_group(cin: int) -> int:
    """Taps contracted per matmul (env ST3D_CONV_KGROUP={1,3,9}; 9 = one
    K=9*cin im2col matmul staged through VMEM scratch, 3 = per-dy K=3*cin).

    Profiler (round 3): conv1_2 (cin=cout=64) runs its MXU passes
    quarter-full — 1620us vs the ~400us roofline of every other stage —
    so grouping taps into one K=9*cin matmul targets exactly that layer.
    The first grouped experiment applied the env to EVERY conv (staging
    9*512-channel scratch for stage 4 — a measurement artifact that made
    grouping look like a loss); grouping is only ever sensible below the
    128-lane contraction, so it applies to cin < 128 only. Measured
    (ab_bench interleaved medians): +0.7% as the default. Env
    ST3D_CONV_KGROUP={1,3,9} overrides."""
    env = os.environ.get("ST3D_CONV_KGROUP")
    g = int(env) if env else 9
    return g if cin < 128 else 1


def _band_rows(h: int, wi: int, cin: int, cout: int, itemsize: int,
               group: int = 1) -> int:
    if group > 1:
        # Grouped taps add a (bh*wi, group*cin) patch scratch; with lane
        # padding the scratch dominates at ~1.3KB/px (cin=64, bf16), so
        # cap the band at ~2048 px (bh=4 at 512-wide: scratch+acc+blocks
        # ≈ 6MB, inside the 16MB scoped VMEM with double buffering).
        budget = max(256, (BLOCK_PIXELS_64CH // 4) * 64
                     // max(cin, cout, 64))
    else:
        budget = max(256, BLOCK_PIXELS_64CH * 64 // max(cin, cout, 64))
    budget = budget * 2 // max(2, itemsize)   # sized for bf16; halve for f32
    bh = max(1, min(h, 16, budget // max(1, wi)))
    while h % bh:
        bh -= 1
    return bh


def _conv_kernel(x_ref, w_ref, b_ref, o_ref, patch_ref=None, *, bh, wi,
                 cin, cout, group, relu=False):
    # x_ref: (1, bh+2, wi+2, cin) halo'd input rows; w_ref: (9*cin, cout)
    # tap-major packed weights; b_ref: (1, cout); o_ref: (1, bh, wi, cout).
    # patch_ref (group > 1): (bh*wi, group*cin) VMEM scratch — the shifted
    # windows have mismatched sublane/lane offsets, so they are STORED into
    # the scratch (memory ops relayout) instead of vector-concatenated
    # (Mosaic rejects tpu.concatenate of offset-mismatched vectors).
    acc = jnp.zeros((bh * wi, cout), jnp.float32)
    if group == 9:
        for dy in range(3):
            for dx in range(3):
                k = dy * 3 + dx
                patch_ref[:, k * cin:(k + 1) * cin] = x_ref[
                    0, dy:dy + bh, dx:dx + wi, :
                ].reshape(bh * wi, cin)
        acc = acc + jnp.dot(
            patch_ref[...], w_ref[...], preferred_element_type=jnp.float32
        )
    elif group == 3:
        for dy in range(3):
            for dx in range(3):
                patch_ref[:, dx * cin:(dx + 1) * cin] = x_ref[
                    0, dy:dy + bh, dx:dx + wi, :
                ].reshape(bh * wi, cin)
            wk = w_ref[dy * 3 * cin:(dy + 1) * 3 * cin, :]
            acc = acc + jnp.dot(
                patch_ref[...], wk, preferred_element_type=jnp.float32
            )
    else:
        for dy in range(3):
            for dx in range(3):
                tap = x_ref[0, dy:dy + bh, dx:dx + wi, :].reshape(
                    bh * wi, cin
                )
                wk = w_ref[(dy * 3 + dx) * cin:(dy * 3 + dx + 1) * cin, :]
                acc = acc + jnp.dot(
                    tap, wk, preferred_element_type=jnp.float32
                )
    acc = acc + b_ref[0].astype(jnp.float32)
    if relu:
        # Fused ReLU (non-tap layers): XLA cannot fuse elementwise ops
        # into a custom call, so the separate max op costs a full
        # activation read+write per layer (profiler: ~0.8ms/step at 512²).
        acc = jnp.maximum(acc, 0.0)
    o_ref[0] = acc.astype(o_ref.dtype).reshape(bh, wi, cout)


def _conv3x3_same_impl(x, w, b, interpret, relu=False):
    bsz, h, wi, cin = x.shape
    cout = w.shape[3]
    group = _tap_group(cin)
    bh = _band_rows(h, wi, cin, cout, x.dtype.itemsize, group)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wf = w.reshape(9 * cin, cout)
    scratch = []
    if group > 1:
        from jax.experimental.pallas import tpu as pltpu

        scratch = [pltpu.VMEM((bh * wi, group * cin), x.dtype)]
    return pl.pallas_call(
        functools.partial(_conv_kernel, bh=bh, wi=wi, cin=cin, cout=cout,
                          group=group, relu=relu),
        grid=(bsz, h // bh),
        scratch_shapes=scratch,
        in_specs=[
            # Overlapping row windows (the +-1 halo) need element-offset
            # indexing; Mosaic requires every dim of the spec to use it.
            pl.BlockSpec(
                (pl.Element(1), pl.Element(bh + 2), pl.Element(wi + 2),
                 pl.Element(cin)),
                lambda bi, hi: (bi, hi * bh, 0, 0),
            ),
            pl.BlockSpec((9 * cin, cout), lambda bi, hi: (0, 0)),
            pl.BlockSpec((1, cout), lambda bi, hi: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, bh, wi, cout), lambda bi, hi: (bi, hi, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wi, cout), x.dtype),
        interpret=interpret,
    )(xp, wf, b.reshape(1, cout))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_bias(x, w, b, interpret=False):
    """3x3 SAME stride-1 conv + bias, NHWC/HWIO, f32 accumulation.

    Differentiable w.r.t. ``x`` only (VGG weights are frozen).
    """
    return _conv3x3_same_impl(x, w, b, interpret)


def _fwd(x, w, b, interpret):
    return conv3x3_bias(x, w, b, interpret), (w,)


def _bwd(interpret, res, ct):
    (w,) = res
    wt = jnp.flip(jnp.flip(w, axis=0), axis=1).transpose(0, 1, 3, 2)
    zb = jnp.zeros((w.shape[2],), ct.dtype)
    return _conv3x3_same_impl(ct, wt, zb, interpret), None, None


conv3x3_bias.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_bias_relu(x, w, b, interpret=False):
    """relu(conv3x3(x) + b) in one kernel pass (non-tap VGG layers).

    Backward: the ReLU mask comes from the saved OUTPUT (z > 0 ⟺ pre-ReLU
    y > 0), then the usual flipped-weights transpose conv.
    """
    return _conv3x3_same_impl(x, w, b, interpret, relu=True)


def _fr(x, w, b, interpret):
    z = conv3x3_bias_relu(x, w, b, interpret)
    return z, (w, z)


def _br(interpret, res, ct):
    w, z = res
    ct = ct * (z > 0).astype(ct.dtype)
    wt = jnp.flip(jnp.flip(w, axis=0), axis=1).transpose(0, 1, 3, 2)
    zb = jnp.zeros((w.shape[2],), ct.dtype)
    return _conv3x3_same_impl(ct, wt, zb, interpret), None, None


conv3x3_bias_relu.defvjp(_fr, _br)


# ---------------------------------------------------------------------------
# Fused conv + Gram (conv2_1): emit the pre-ReLU tap's Gram from VMEM
# ---------------------------------------------------------------------------

def _conv_gram_kernel(x_ref, w_ref, b_ref, o_ref, g_ref, *, bh, wi, cin,
                      cout, group):
    """_conv_kernel plus a per-view Gram accumulator: g[b] += y_bandᵀ·y_band
    across the row-band grid steps (the g block revisits (bi, 0, 0) every
    hi, so accumulation is sequential). The Gram is computed from the
    OUTPUT-dtype band (bf16 in production) with f32 accumulation — the same
    numbers gram_matrix_nhwc produces from the exported tap, without ever
    exporting it (the tap's second consumer forked its layout and re-entered
    the conv chain with a full-size cotangent; PERF_NOTES §2)."""
    acc = jnp.zeros((bh * wi, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = x_ref[0, dy:dy + bh, dx:dx + wi, :].reshape(bh * wi, cin)
            wk = w_ref[(dy * 3 + dx) * cin:(dy * 3 + dx + 1) * cin, :]
            acc = acc + jnp.dot(tap, wk, preferred_element_type=jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)
    y = acc.astype(o_ref.dtype)
    o_ref[0] = y.reshape(bh, wi, cout)
    partial = jnp.dot(y.T, y, preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        g_ref[0] = partial

    @pl.when(pl.program_id(1) != 0)
    def _acc():
        g_ref[0] += partial


def _conv_gram_impl(x, w, b, interpret):
    bsz, h, wi, cin = x.shape
    cout = w.shape[3]
    bh = _band_rows(h, wi, cin, cout, x.dtype.itemsize)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wf = w.reshape(9 * cin, cout)
    return pl.pallas_call(
        functools.partial(_conv_gram_kernel, bh=bh, wi=wi, cin=cin,
                          cout=cout, group=1),
        grid=(bsz, h // bh),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(bh + 2), pl.Element(wi + 2),
                 pl.Element(cin)),
                lambda bi, hi: (bi, hi * bh, 0, 0),
            ),
            pl.BlockSpec((9 * cin, cout), lambda bi, hi: (0, 0)),
            pl.BlockSpec((1, cout), lambda bi, hi: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bh, wi, cout), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, cout, cout), lambda bi, hi: (bi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h, wi, cout), x.dtype),
            jax.ShapeDtypeStruct((bsz, cout, cout), jnp.float32),
        ],
        interpret=interpret,
    )(xp, wf, b.reshape(1, cout))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_bias_gram(x, w, b, interpret=False):
    """3x3 SAME conv + bias AND the unnormalized Gram of its (pre-ReLU)
    output, in one kernel pass: returns ``(y, gram)`` with
    ``gram[v] = y_vᵀ·y_v`` over pixels ((B, C, C) float32).

    Differentiable w.r.t. ``x`` only (VGG weights frozen). The Gram
    cotangent folds into the output cotangent analytically:
    d(yᵀy)/dy → dy += y·(ctG + ctGᵀ).
    """
    return _conv_gram_impl(x, w, b, interpret)


def _cg_fwd(x, w, b, interpret):
    y, g = conv3x3_bias_gram(x, w, b, interpret)
    return (y, g), (w, y)


def _cg_bwd(interpret, res, cts):
    ct_y, ct_g = cts
    w, y = res
    sym = ct_g + jnp.swapaxes(ct_g, -1, -2)           # (B, C, C) f32
    bsz, h, wi, cout = y.shape
    dy = ct_y + jnp.einsum(
        "bhwc,bcd->bhwd", y, sym.astype(y.dtype),
        preferred_element_type=y.dtype,
    )
    wt = jnp.flip(jnp.flip(w, axis=0), axis=1).transpose(0, 1, 3, 2)
    zb = jnp.zeros((w.shape[2],), dy.dtype)
    return _conv3x3_same_impl(dy, wt, zb, interpret), None, None


conv3x3_bias_gram.defvjp(_cg_fwd, _cg_bwd)
