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
# Env ST3D_CONV_BLOCK_PIXELS overrides for ladder-tuning A/Bs (values too
# large OOM Mosaic's 16MB scoped VMEM — see CLAUDE.md).
BLOCK_PIXELS_64CH = 8192


def _block_pixels() -> int:
    env = os.environ.get("ST3D_CONV_BLOCK_PIXELS")
    return int(env) if env else BLOCK_PIXELS_64CH


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
    if env:
        if env not in ("1", "3", "9"):  # advisor r3: fail loud, not silent
            raise ValueError(
                f"ST3D_CONV_KGROUP={env!r}: must be one of 1, 3, 9 "
                "(taps contracted per matmul)"
            )
        g = int(env)
    else:
        g = 9
    return g if cin < 128 else 1


def _band_rows(h: int, wi: int, cin: int, cout: int, itemsize: int,
               group: int = 1) -> int:
    if group > 1:
        # Grouped taps add a (bh*wi, group*cin) patch scratch; with lane
        # padding the scratch dominates at ~1.3KB/px (cin=64, bf16), so
        # cap the band at ~2048 px (bh=4 at 512-wide: scratch+acc+blocks
        # ≈ 6MB, inside the 16MB scoped VMEM with double buffering).
        budget = max(256, (_block_pixels() // 4) * 64
                     // max(cin, cout, 64))
    else:
        budget = max(256, _block_pixels() * 64 // max(cin, cout, 64))
    budget = budget * 2 // max(2, itemsize)   # sized for bf16; halve for f32
    bh = max(1, min(h, 16, budget // max(1, wi)))
    while h % bh:
        bh -= 1
    return bh


def _finish(acc, b_ref, o_ref, bh, wi, cout, relu, i_ref=None):
    acc = acc + b_ref[0].astype(jnp.float32)
    if relu:
        # Fused ReLU (non-tap layers): XLA cannot fuse elementwise ops
        # into a custom call, so the separate max op costs a full
        # activation read+write per layer (profiler: ~0.8ms/step at 512²).
        acc = jnp.maximum(acc, 0.0)
    if i_ref is None:
        o_ref[0] = acc.astype(o_ref.dtype).reshape(bh, wi, cout)
        return
    # Fused 2x2/stride-2 max-pool (pre-pool layers, relu implied): the
    # full-size activation never leaves VMEM — only the pooled output and
    # a quadrant-index map (for the exact backward routing) hit HBM,
    # absorbing the reduce_window fwd and the SelectAndScatter bwd.
    # Quadrant index = 2*dy + dx. Reduction order is COLUMNS then ROWS
    # with strict > so ties pick the first max in row-major window scan
    # order — exactly XLA's SelectAndScatter(GE) routing (probed
    # on-device). Pooling happens on the OUTPUT-dtype values, not the
    # f32 accumulator: bf16 rounding creates ties the f32 compare would
    # break differently, routing the backward to a different pixel than
    # the unfused graph (~|dp|-sized max-norm diffs on-device).
    acc = acc.astype(o_ref.dtype).astype(jnp.float32)
    y4 = acc.reshape(bh, wi // 2, 2, cout)
    c0, c1 = y4[:, :, 0], y4[:, :, 1]
    cm = jnp.maximum(c0, c1)                      # (bh, wi/2, cout)
    cw = (c1 > c0).astype(jnp.float32)            # winning column per row
    cm2 = cm.reshape(bh // 2, 2, wi // 2, cout)
    cw2 = cw.reshape(bh // 2, 2, wi // 2, cout)
    r0, r1 = cm2[:, 0], cm2[:, 1]
    rw = (r1 > r0).astype(jnp.float32)            # winning row pair
    p = jnp.maximum(r0, r1)
    dxq = jnp.where(rw > 0, cw2[:, 1], cw2[:, 0])
    o_ref[0] = p.astype(o_ref.dtype)
    i_ref[0] = (rw * 2 + dxq).astype(i_ref.dtype)


def _conv_kernel(x_ref, w_ref, b_ref, o_ref, *rest, bh, wi,
                 cin, cout, group, relu=False, pool=False):
    i_ref = rest[0] if pool else None
    patch_ref = rest[-1] if group > 1 else None
    # x_ref: (1, bh+2, wi+2, cin) halo'd input rows; w_ref: (9*cin, cout)
    # tap-major packed weights; b_ref: (1, cout); o_ref: (1, bh, wi, cout).
    # patch_ref (group > 1): (bh, wi, group*cin) VMEM scratch — the shifted
    # windows have mismatched sublane/lane offsets, so they are STORED into
    # the scratch (memory ops relayout) instead of vector-concatenated
    # (Mosaic rejects tpu.concatenate of offset-mismatched vectors).
    acc = jnp.zeros((bh * wi, cout), jnp.float32)
    if group == 9:
        for dy in range(3):
            for dx in range(3):
                k = (dy * 3 + dx) * cin
                patch_ref[:, :, k:k + cin] = x_ref[
                    0, dy:dy + bh, dx:dx + wi, :
                ]
        acc = acc + jnp.dot(
            patch_ref[...].reshape(bh * wi, 9 * cin), w_ref[...],
            preferred_element_type=jnp.float32,
        )
    elif group == 3:
        for dy in range(3):
            for dx in range(3):
                patch_ref[:, :, dx * cin:(dx + 1) * cin] = x_ref[
                    0, dy:dy + bh, dx:dx + wi, :
                ]
            wk = w_ref[dy * 3 * cin:(dy + 1) * 3 * cin, :]
            acc = acc + jnp.dot(
                patch_ref[...].reshape(bh * wi, 3 * cin), wk,
                preferred_element_type=jnp.float32,
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
    _finish(acc, b_ref, o_ref, bh, wi, cout, relu, i_ref)


def _conv_kernel_nopad(x_ref, w_ref, b_ref, o_ref, *rest, bh, wi,
                       cin, cout, nbands, relu=False, pool=False):
    """group=9 kernel reading the UNPADDED input: the ±1 SAME halo is
    realized by staging ZEROS into the patch scratch at the image borders
    instead of materializing a padded activation copy in HBM (profiler:
    the per-conv pads cost ~1.7ms/step at 512², the single largest
    non-compute line after the epilogue).

    The input block is (1, bh+2, wi, cin) at row offset
    clip(hi*bh-1, 0, h-bh-2); ``base = hi*bh-1 - offset`` is -1 on the
    first band and +1 on the last, shifting tap dy's local rows to
    out_row + dy + base. dy=0 on the first band and dy=2 on the last fall
    one row outside the image: their stores shift by a row and zero the
    border row of that tap's patch slot.
    """
    i_ref = rest[0] if pool else None
    patch_ref = rest[-1]
    hi = pl.program_id(1)
    base = jnp.where(hi == 0, -1, 0) + jnp.where(hi == nbands - 1, 1, 0)
    zrow = jnp.zeros((1, wi, cin), x_ref.dtype)

    def store_cols(rows_val, dy, dx, row_lo, row_hi):
        # Place tap rows with the dx column shift; the out-of-image column
        # of the edge taps is zeroed.
        k = (dy * 3 + dx) * cin
        n = row_hi - row_lo
        if dx == 0:
            patch_ref[row_lo:row_hi, 1:wi, k:k + cin] = rows_val[:, 0:wi - 1, :]
            patch_ref[row_lo:row_hi, 0:1, k:k + cin] = jnp.zeros(
                (n, 1, cin), rows_val.dtype
            )
        elif dx == 2:
            patch_ref[row_lo:row_hi, 0:wi - 1, k:k + cin] = rows_val[:, 1:wi, :]
            patch_ref[row_lo:row_hi, wi - 1:wi, k:k + cin] = jnp.zeros(
                (n, 1, cin), rows_val.dtype
            )
        else:
            patch_ref[row_lo:row_hi, :, k:k + cin] = rows_val

    for dy in range(3):
        if dy == 1:
            # local rows 1+base .. bh+base: in-block on every band.
            rows = x_ref[0, pl.ds(1 + base, bh), :, :]
            for dx in range(3):
                store_cols(rows, 1, dx, 0, bh)
        elif dy == 0:
            @pl.when(hi != 0)
            def _interior0():
                rows = x_ref[0, pl.ds(base, bh), :, :]
                for dx in range(3):
                    store_cols(rows, 0, dx, 0, bh)

            @pl.when(hi == 0)
            def _first0():
                # out row 0's dy=0 tap reads image row -1 => zeros; rows
                # 1..bh-1 read image rows 0..bh-2.
                rows = x_ref[0, 0:bh - 1, :, :]
                for dx in range(3):
                    store_cols(rows, 0, dx, 1, bh)
                    k = dx * cin
                    patch_ref[0:1, :, k:k + cin] = zrow.astype(x_ref.dtype)
        else:  # dy == 2
            @pl.when(hi != nbands - 1)
            def _interior2():
                rows = x_ref[0, pl.ds(2 + base, bh), :, :]
                for dx in range(3):
                    store_cols(rows, 2, dx, 0, bh)

            @pl.when(hi == nbands - 1)
            def _last2():
                # out row bh-1's dy=2 tap reads image row h => zeros; rows
                # 0..bh-2 read local rows 3..bh+1.
                rows = x_ref[0, 3:bh + 2, :, :]
                for dx in range(3):
                    store_cols(rows, 2, dx, 0, bh - 1)
                    k = (6 + dx) * cin
                    patch_ref[bh - 1:bh, :, k:k + cin] = zrow.astype(
                        x_ref.dtype
                    )

    acc = jnp.dot(
        patch_ref[...].reshape(bh * wi, 9 * cin), w_ref[...],
        preferred_element_type=jnp.float32,
    )
    _finish(acc, b_ref, o_ref, bh, wi, cout, relu, i_ref)


def _stage_halo_block(x_ref, s_ref, *, bh, wi, cin, nbands):
    """Copy the row-halo'd UNPADDED input block (1, bh+2, wi, cin) into a
    zero-bordered (bh+2, wi+2, cin) VMEM scratch, so after staging
    ``s_ref[r, c, :] == SAME-padded-image[hi*bh - 1 + r, c - 1, :]`` —
    exactly the window layout the padded-operand kernels' direct tap
    reads expect. Row algebra mirrors ``_conv_kernel_nopad``: the block
    sits at image row ``clip(hi*bh - 1, 0, h - bh - 2)``, i.e. shifted
    +1 (first band) / -1 (last band) from the padded window; the
    out-of-image row of the boundary bands is zeroed. Callers guard
    nbands >= 2 and bh >= 2."""
    hi = pl.program_id(1)
    zcol = jnp.zeros((bh + 2, 1, cin), x_ref.dtype)
    zrow = jnp.zeros((1, wi + 2, cin), x_ref.dtype)
    s_ref[:, 0:1, :] = zcol
    s_ref[:, wi + 1:wi + 2, :] = zcol

    @pl.when((hi != 0) & (hi != nbands - 1))
    def _interior():
        s_ref[:, 1:wi + 1, :] = x_ref[0]

    @pl.when(hi == 0)
    def _first():
        s_ref[1:bh + 2, 1:wi + 1, :] = x_ref[0, 0:bh + 1]
        s_ref[0:1, :, :] = zrow

    @pl.when(hi == nbands - 1)
    def _last():
        s_ref[0:bh + 1, 1:wi + 1, :] = x_ref[0, 1:bh + 2]
        s_ref[bh + 1:bh + 2, :, :] = zrow


def _conv_kernel_halo1(x_ref, w_ref, b_ref, o_ref, *rest, bh, wi, cin,
                       cout, nbands, relu=False, pool=False):
    """group=1 kernel on an UNPADDED input: stage the zero-bordered halo
    window into VMEM scratch (``_stage_halo_block``), then run the same
    9 direct-tap dots as ``_conv_kernel``. Kills the HBM pad op the
    padded-operand path pays per call — the profiler's remaining ~0.9
    ms/step of pads at 512² after the group=9 layers went halo (fwd pads
    of the 128+-channel convs + the pads of every transposed-conv
    cotangent in the backward). The staging copy is VMEM-local VPU work
    ~N/(9*cout) of the band's MXU cycles (≈11% at cout=128, less above).
    """
    i_ref = rest[0] if pool else None
    s_ref = rest[-1]
    _stage_halo_block(x_ref, s_ref, bh=bh, wi=wi, cin=cin, nbands=nbands)
    acc = jnp.zeros((bh * wi, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = s_ref[dy:dy + bh, dx:dx + wi, :].reshape(bh * wi, cin)
            wk = w_ref[(dy * 3 + dx) * cin:(dy * 3 + dx + 1) * cin, :]
            acc = acc + jnp.dot(tap, wk, preferred_element_type=jnp.float32)
    _finish(acc, b_ref, o_ref, bh, wi, cout, relu, i_ref)


def _halo1_band(h: int, wi: int, cin: int, cout: int, itemsize: int,
                bh: int, pool: bool) -> int:
    """Band rows for the halo-scratch path: start from ``_band_rows``'s
    choice and shrink until the double-buffered in/out blocks + weights
    + the (bh+2, wi+2, cin) scratch fit a conservative 13.5MB of the
    16MB scoped VMEM (the padded path's budget never modeled the
    scratch; at 1024² f32 cin=cout=512 the unshrunk total is 16.3MB).
    Returns 0 when no bh >= 2 fits (caller falls back to the padded
    path)."""
    step = 2 if pool else 1

    def vmem(b):
        return ((2 * ((b + 2) * wi * cin + b * wi * cout)
                 + 9 * cin * cout + (b + 2) * (wi + 2) * cin) * itemsize)

    while bh >= 2:
        if vmem(bh) <= 13_500_000 and h % bh == 0:
            return bh
        bh -= step
    return 0


def _halo1_ok(h: int, wi: int, bh: int, nb: int) -> bool:
    """Shape guards for the halo-scratch path (same algebra as nopad:
    the Element row offset clip(hi*bh-1, 0, h-bh-2) needs h-bh-2 >= 0
    and >= 2 bands so first/last boundary staging never overlaps);
    ``ST3D_NO_HALO1=1`` reverts to HBM-padded operands (A/B). Measured
    round 5: halo1 default ON is worth +4.7% on the full step (49.34 vs
    47.15 it/s @512² bf16, 5 agreeing windows per variant)."""
    return (nb >= 2 and bh >= 2 and h - bh - 2 >= 0 and wi >= 2
            and not os.environ.get("ST3D_NO_KERNEL_HALO")
            and not os.environ.get("ST3D_NO_HALO1"))


def _halo1_xspec(bh, wi, cin, h):
    return pl.BlockSpec(
        (pl.Element(1), pl.Element(bh + 2), pl.Element(wi),
         pl.Element(cin)),
        lambda bi, hi: (bi, jnp.clip(hi * bh - 1, 0, h - bh - 2), 0, 0),
    )


def _conv3x3_same_impl(x, w, b, interpret, relu=False, pool=False):
    bsz, h, wi, cin = x.shape
    cout = w.shape[3]
    group = _tap_group(cin)
    bh = _band_rows(h, wi, cin, cout, x.dtype.itemsize, group)
    if pool:
        # Pooled bands: bh must be even (2x2 windows never straddle a
        # band boundary; h, wi even is checked by the caller). h even
        # guarantees bh=2 as the floor, so the VMEM budget can only be
        # undershot, never violated.
        bh = bh - (bh % 2)
        while bh > 2 and h % bh:
            bh -= 2
        bh = max(bh, 2)
    nb = h // bh
    wf = w.reshape(9 * cin, cout)
    scratch = []
    if group > 1:
        from jax.experimental.pallas import tpu as pltpu

        scratch = [pltpu.VMEM((bh, wi, group * cin), x.dtype)]
    # In-kernel halo (group=9 shapes with >=2 bands): skip the HBM pad.
    # bh >= 2 is load-bearing: single-row bands make _first0's row-1 store
    # and _last2's 3:bh+2 read start out of bounds (JAX validates slice
    # starts even for empty slices) — seen on-device at 1024-wide f32.
    nopad = (group == 9 and nb >= 2 and bh >= 2 and h - bh - 2 >= 0
             and wi >= 2 and not os.environ.get("ST3D_NO_KERNEL_HALO"))
    if nopad:
        kernel = functools.partial(
            _conv_kernel_nopad, bh=bh, wi=wi, cin=cin, cout=cout,
            nbands=nb, relu=relu, pool=pool,
        )
        x_spec = pl.BlockSpec(
            (pl.Element(1), pl.Element(bh + 2), pl.Element(wi),
             pl.Element(cin)),
            lambda bi, hi: (bi, jnp.clip(hi * bh - 1, 0, h - bh - 2), 0, 0),
        )
        operand = x
    elif (group == 1
          and (bh1 := _halo1_band(h, wi, cin, cout, x.dtype.itemsize,
                                  bh, pool))
          and _halo1_ok(h, wi, bh1, h // bh1)):
        from jax.experimental.pallas import tpu as pltpu

        bh, nb = bh1, h // bh1
        kernel = functools.partial(
            _conv_kernel_halo1, bh=bh, wi=wi, cin=cin, cout=cout,
            nbands=nb, relu=relu, pool=pool,
        )
        x_spec = _halo1_xspec(bh, wi, cin, h)
        scratch = [pltpu.VMEM((bh + 2, wi + 2, cin), x.dtype)]
        operand = x
    else:
        kernel = functools.partial(
            _conv_kernel, bh=bh, wi=wi, cin=cin, cout=cout, group=group,
            relu=relu, pool=pool,
        )
        x_spec = pl.BlockSpec(
            # Overlapping row windows (the +-1 halo) need element-offset
            # indexing; Mosaic requires every dim of the spec to use it.
            (pl.Element(1), pl.Element(bh + 2), pl.Element(wi + 2),
             pl.Element(cin)),
            lambda bi, hi: (bi, hi * bh, 0, 0),
        )
        operand = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    if pool:
        out_specs = [
            pl.BlockSpec((1, bh // 2, wi // 2, cout),
                         lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, bh // 2, wi // 2, cout),
                         lambda bi, hi: (bi, hi, 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((bsz, h // 2, wi // 2, cout), x.dtype),
            # Quadrant index 0..3 stored in the activation dtype (exact
            # as bf16; int8 outputs are shakier in Mosaic).
            jax.ShapeDtypeStruct((bsz, h // 2, wi // 2, cout), x.dtype),
        ]
    else:
        out_specs = pl.BlockSpec(
            (1, bh, wi, cout), lambda bi, hi: (bi, hi, 0, 0)
        )
        out_shape = jax.ShapeDtypeStruct((bsz, h, wi, cout), x.dtype)
    return pl.pallas_call(
        kernel,
        grid=(bsz, nb),
        scratch_shapes=scratch,
        in_specs=[
            x_spec,
            pl.BlockSpec((9 * cin, cout), lambda bi, hi: (0, 0)),
            pl.BlockSpec((1, cout), lambda bi, hi: (0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(operand, wf, b.reshape(1, cout))


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_bias_relu_pool(x, w, b, interpret=False):
    """maxpool2x2(relu(conv3x3(x) + b)) in one kernel pass (the four VGG
    pre-pool layers). Returns ``(pooled, idx)`` where ``idx`` in {0..3}
    (= 2*dy + dx window scan order, activation dtype) records the argmax
    quadrant for the exact backward routing. The full-size activation
    never leaves VMEM — forward saves its HBM round trip plus the
    reduce_window, backward replaces SelectAndScatter with an
    index-routed expansion.

    Requires even H and W. Backward: dp routes to the argmax quadrant,
    masked by ``pooled > 0`` (the relu mask at the argmax — non-argmax
    positions get no pool gradient regardless), then the usual
    flipped-weights transpose conv.
    """
    return _conv3x3_same_impl(x, w, b, interpret, relu=True, pool=True)


def _frp(x, w, b, interpret):
    p, idx = conv3x3_bias_relu_pool(x, w, b, interpret)
    return (p, idx), (w, p, idx)


def _brp(interpret, res, cts):
    ct_p, _ = cts                       # idx is non-differentiable
    w, p, idx = res
    dp = ct_p * (p > 0).astype(ct_p.dtype)
    quads = [dp * (idx == q).astype(dp.dtype) for q in range(4)]
    bsz, h2, w2, c = dp.shape
    row0 = jnp.stack([quads[0], quads[1]], axis=3).reshape(bsz, h2, w2 * 2, c)
    row1 = jnp.stack([quads[2], quads[3]], axis=3).reshape(bsz, h2, w2 * 2, c)
    dy = jnp.stack([row0, row1], axis=2).reshape(bsz, h2 * 2, w2 * 2, c)
    wt = jnp.flip(jnp.flip(w, axis=0), axis=1).transpose(0, 1, 3, 2)
    zb = jnp.zeros((w.shape[2],), dy.dtype)
    return _conv3x3_same_impl(dy, wt, zb, interpret), None, None


conv3x3_bias_relu_pool.defvjp(_frp, _brp)


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


def _conv_gram_kernel_halo(x_ref, w_ref, b_ref, o_ref, g_ref, s_ref, *,
                           bh, wi, cin, cout, nbands):
    """_conv_gram_kernel on an UNPADDED input block: same staging as
    ``_conv_kernel_halo1``, then the identical tap dots + output-dtype
    Gram accumulation (bit-identical outputs to the padded variant)."""
    _stage_halo_block(x_ref, s_ref, bh=bh, wi=wi, cin=cin, nbands=nbands)
    acc = jnp.zeros((bh * wi, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = s_ref[dy:dy + bh, dx:dx + wi, :].reshape(bh * wi, cin)
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
    wf = w.reshape(9 * cin, cout)
    bh1 = _halo1_band(h, wi, cin, cout, x.dtype.itemsize, bh, False)
    if bh1 and _halo1_ok(h, wi, bh1, h // bh1):
        from jax.experimental.pallas import tpu as pltpu

        bh = bh1
        kernel = functools.partial(_conv_gram_kernel_halo, bh=bh, wi=wi,
                                   cin=cin, cout=cout, nbands=h // bh)
        x_spec = _halo1_xspec(bh, wi, cin, h)
        scratch = [pltpu.VMEM((bh + 2, wi + 2, cin), x.dtype)]
        operand = x
    else:
        kernel = functools.partial(_conv_gram_kernel, bh=bh, wi=wi,
                                   cin=cin, cout=cout, group=1)
        x_spec = pl.BlockSpec(
            (pl.Element(1), pl.Element(bh + 2), pl.Element(wi + 2),
             pl.Element(cin)),
            lambda bi, hi: (bi, hi * bh, 0, 0),
        )
        scratch = []
        operand = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return pl.pallas_call(
        kernel,
        grid=(bsz, h // bh),
        scratch_shapes=scratch,
        in_specs=[
            x_spec,
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
    )(operand, wf, b.reshape(1, cout))


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


# ---------------------------------------------------------------------------
# Space-to-depth packed conv (conv1_2): full-MXU matmuls at cin=64
# ---------------------------------------------------------------------------
#
# conv1_2 (cin=cout=64 at 512²) is the one layer whose matmuls cannot fill
# the 128x128 MXU in the natural layout: K=64/N=64 quarter-fills it, and the
# profiler shows it at ~2.3ms fwd against a ~0.4ms roofline while every
# 128+-channel stage runs near peak. The fix is the classic space-to-depth
# transform: pack 2x2 pixel quads into channels ((B,H,W,C) padded by 1 →
# (B,H/2+1,W/2+1,4C)), under which the 3x3 SAME conv becomes a 2x2 VALID
# conv with K=4·cin=256, N=4·cout=256 — full MXU fill for 16/9× the FLOPs,
# a net ~2.25× on the MXU passes. Because the following 2x2/stride-2
# maxpool's windows are exactly the four output phases packed into one
# pixel's channels, the pool collapses to a LANE-SLICED channel-group max
# inside the kernel (the spatially-fused pool variant above lost to sublane
# relayouts; channel groups have none), so pool1's reduce_window fwd and
# SelectAndScatter bwd disappear with it.
#
# Derivation of the tap/phase mapping (offsets chosen so the packed window
# is 2x2, not 3x3): with P(Y,X,(py,px,c)) = Ipad(2Y+py, 2X+px, c) over the
# 1-padded image, O(2Y+qy, 2X+qx, o) = Σ_{dy,dx,c} P(Y+ty, X+tx, (py,px,c))
# · W3[dy,dx,c,o] where (ty,py) = divmod(qy+dy, 2), (tx,px) = divmod(qx+dx,
# 2) — ty,tx ∈ {0,1}. Zeros fill the (ty,py,qy,dy) combinations with no
# solution; W2 is 56% dense, which is where the 16/9 comes from.


def _pack_weights_2x2(w, b):
    """(3,3,cin,cout) HWIO → ((2,2,4cin,4cout) flat (16cin,4cout) tap-major,
    (4cout,)) for the packed 2x2 VALID conv. Packed channel order is
    (py,px,c) in / (qy,qx,o) out, matching the space-to-depth reshape."""
    cin, cout = w.shape[2], w.shape[3]
    w2 = jnp.zeros((2, 2, 2, 2, cin, 2, 2, cout), w.dtype)
    for qy in range(2):
        for qx in range(2):
            for dy in range(3):
                for dx in range(3):
                    ty, py = divmod(qy + dy, 2)
                    tx, px = divmod(qx + dx, 2)
                    w2 = w2.at[ty, tx, py, px, :, qy, qx, :].set(w[dy, dx])
    return w2.reshape(4 * 4 * cin, 4 * cout), jnp.tile(b, 4)


def _space_to_depth5(x):
    """(B,H,W,C) → (B, H/2+1, 2, W/2+1, 2C): pad 1 on every side, then a
    pure RESHAPE — row 2Y+py lands at [Y, py] and the (px,c) pair is
    already minor-contiguous, so XLA emits a bitcast, not a transpose.
    (The first packed layout interleaved (py,px,c) into one channel axis;
    the profiler showed ~2.7ms/step of pad+transpose+reshape copies for
    it at 512². Keeping py as its own axis removes every copy but the
    pad.)"""
    bsz, h, wi, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return xp.reshape(bsz, (h + 2) // 2, 2, (wi + 2) // 2, 2 * c)


def _pool4_first_max(acc, pool_c, out_dtype):
    """Reduce the four phase channel-groups of ``acc`` ((M, 4*pool_c) f32)
    with strict > — first max in window scan order wins, matching
    SelectAndScatter's probed routing. Ties compare OUTPUT-dtype values
    (see _finish: f32 compares break bf16 ties differently). Returns
    (pooled, idx) as (M, pool_c) f32."""
    acc = acc.astype(out_dtype).astype(jnp.float32)
    c0 = acc[:, 0 * pool_c:1 * pool_c]
    c1 = acc[:, 1 * pool_c:2 * pool_c]
    c2 = acc[:, 2 * pool_c:3 * pool_c]
    c3 = acc[:, 3 * pool_c:4 * pool_c]
    w01 = (c1 > c0).astype(jnp.float32)
    w23 = (c3 > c2).astype(jnp.float32)
    m01 = jnp.maximum(c0, c1)
    m23 = jnp.maximum(c2, c3)
    wm = (m23 > m01).astype(jnp.float32)
    p = jnp.maximum(m01, m23)
    idx = jnp.where(wm > 0, 2.0 + w23, w01)
    return p, idx


def _conv2x2_fwd_kernel(x_ref, w_ref, b_ref, o_ref, i_ref, *, bh, wi,
                        cin2, pool_c):
    """Packed fwd: x_ref is the 5D (1, bh+1, 2, wi+1, 2cin) block — eight
    K=2cin, N=4cout matmuls over taps (ty, tx, py). ReLU + the 2x2 pool
    (= a channel-group max over the four output phases) happen in VMEM;
    only (pooled, idx) reach HBM."""
    kout = o_ref.shape[3] * 4
    acc = jnp.zeros((bh * wi, kout), jnp.float32)
    for t in range(4):
        ty, tx = divmod(t, 2)
        for py in range(2):
            tap = x_ref[0, ty:ty + bh, py, tx:tx + wi, :].reshape(
                bh * wi, cin2
            )
            k0 = t * 2 * cin2 + py * cin2
            acc = acc + jnp.dot(
                tap, w_ref[k0:k0 + cin2, :],
                preferred_element_type=jnp.float32,
            )
    acc = jnp.maximum(acc + b_ref[0].astype(jnp.float32), 0.0)
    p, idx = _pool4_first_max(acc, pool_c, o_ref.dtype)
    o_ref[0] = p.astype(o_ref.dtype).reshape(bh, wi, pool_c)
    i_ref[0] = idx.astype(i_ref.dtype).reshape(bh, wi, pool_c)


def _conv2x2_bwd_kernel(dp_ref, i_ref, p_ref, w_ref, o_ref, dz_ref, *,
                        bh, wo, hz, wz, cout, cin, nbands):
    """Packed bwd, one pass: route the pool cotangent to its argmax phase
    (relu-masked) into a zero-padded VMEM scratch, then the four K=4cout
    transpose-conv matmuls. dp/i/p blocks are (1, bh+1, wz, cout) rows of
    the POOLED grid at clip(hi*bh-1, ...); the out block is the 5D
    (1, bh, 2, wo, 2cin) slab of the dxp grid (wo = wz + 2), so the
    unpack back to NHWC is a bitcast + one slice. Border rows/cols of the
    scratch hold zeros (dz is zero outside the pooled grid)."""
    hi = pl.program_id(1)

    # Zero ONLY the scratch borders (a full-scratch memset per band costs
    # ~0.9MB of VMEM writes × nbands × views): cols 0, wz+1, wz+2 always;
    # boundary rows on the first/last bands below.
    zc = jnp.zeros((bh + 1, 1, dz_ref.shape[2]), dz_ref.dtype)
    dz_ref[:, 0:1, :] = zc
    dz_ref[:, wz + 1:wz + 2, :] = zc
    dz_ref[:, wz + 2:wz + 3, :] = zc
    # Mosaic has no bf16 vector compare on this target — route in f32.
    # The relu-masked product is hoisted out of the per-band branches (it
    # only depends on the block, not the routing offsets).
    d_all = (dp_ref[0].astype(jnp.float32)
             * (p_ref[0].astype(jnp.float32) > 0).astype(jnp.float32))
    idx = i_ref[0].astype(jnp.float32)
    v2 = os.environ.get("ST3D_PACKED_BWD") == "v2"

    def route(rows):
        # rows: slice of the block's row axis; returns routed dz rows.
        d = d_all[rows]
        ix = idx[rows]
        return jnp.concatenate(
            [(d * (ix == float(q)).astype(jnp.float32)).astype(
                dz_ref.dtype) for q in range(4)], axis=-1
        )

    def route_store(src, dst_lo, n):
        # v2 routing (env ST3D_PACKED_BWD=v2): four direct channel-range
        # stores instead of a 4x64-lane concatenate — the concat is a lane
        # relayout Mosaic builds out of masks/selects; separate stores let
        # the memory unit do the placement (A/B candidate for the bwd's
        # 2x gap to its packed roofline, PERF_NOTES 116-118).
        d = d_all[src]
        ix = idx[src]
        for q in range(4):
            dz_ref[dst_lo:dst_lo + n, 1:wz + 1,
                   q * cout:(q + 1) * cout] = (
                d * (ix == float(q)).astype(jnp.float32)
            ).astype(dz_ref.dtype)

    # Scratch row j holds dz[hi*bh - 1 + j] (zero outside [0, hz)); the
    # dp/i/p block sits at row clip(hi*bh - 1, 0, hz - bh - 1), so the
    # block→scratch shift is 1 on the first band (dz[-1] row stays zero)
    # and 2 on the last (the final two scratch rows are dz[hz], dz[hz+1]
    # — both zero). Middle bands copy 1:1. Requires nbands >= 2, bh >= 2,
    # hz >= bh + 1 (the caller falls back to XLA otherwise).
    zr = jnp.zeros((1, wz, dz_ref.shape[2]), dz_ref.dtype)

    @pl.when(hi == 0)
    def _first():
        dz_ref[0:1, 1:wz + 1, :] = zr
        if v2:
            route_store(slice(0, bh), 1, bh)
        else:
            dz_ref[1:bh + 1, 1:wz + 1, :] = route(slice(0, bh))

    @pl.when((hi != 0) & (hi != nbands - 1))
    def _mid():
        if v2:
            route_store(slice(0, bh + 1), 0, bh + 1)
        else:
            dz_ref[0:bh + 1, 1:wz + 1, :] = route(slice(0, bh + 1))

    @pl.when(hi == nbands - 1)
    def _last():
        if v2:
            route_store(slice(2, bh + 1), 0, bh - 1)
        else:
            dz_ref[0:bh - 1, 1:wz + 1, :] = route(slice(2, bh + 1))
        dz_ref[bh - 1:bh, 1:wz + 1, :] = zr
        dz_ref[bh:bh + 1, 1:wz + 1, :] = zr

    acc = jnp.zeros((bh * wo, 4 * cin), jnp.float32)
    for t in range(4):
        sy, sx = divmod(t, 2)
        # dxp[Y, X] += dz[Y - sy, X - sx] @ (W2[sy, sx])ᵀ; scratch holds
        # dz shifted by +1 in each axis (row j = dz[Y0 - 1 + j]), so the
        # tap slice starts at (1 - sy, 1 - sx). w_ref is the FLIPPED
        # transpose weights (wtf[a, b] = W2[1-a, 1-b]ᵀ), so (W2[sy, sx])ᵀ
        # lives at tap index 3 - t.
        tap = dz_ref[1 - sy:1 - sy + bh, 1 - sx:1 - sx + wo, :].reshape(
            bh * wo, 4 * cout
        )
        acc = acc + jnp.dot(
            tap, w_ref[(3 - t) * 4 * cout:(4 - t) * 4 * cout, :],
            preferred_element_type=jnp.float32,
        )
    out = acc.reshape(bh, wo, 4 * cin).astype(o_ref.dtype)
    for py in range(2):
        o_ref[0, :, py, :, :] = out[:, :, py * 2 * cin:(py + 1) * 2 * cin]


def _bwd_weights_2x2(w):
    """Spatially-flipped, IO-transposed packed weights for the transpose
    conv: (16*cout, 4*cin) tap-major, K channels in dz's (q, o) order."""
    cin, cout = w.shape[2], w.shape[3]
    w2, _ = _pack_weights_2x2(w, jnp.zeros((cout,), w.dtype))
    w2 = w2.reshape(2, 2, 4 * cin, 4 * cout)
    wt = jnp.flip(jnp.flip(w2, axis=0), axis=1).transpose(0, 1, 3, 2)
    return wt.reshape(4 * 4 * cout, 4 * cin)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_bias_relu_pool_packed(x, w, b, interpret=False):
    """maxpool2x2(relu(conv3x3_same(x) + b)) via the space-to-depth packed
    2x2 conv — same contract as ``conv3x3_bias_relu_pool`` (returns
    ``(pooled, idx)``, idx in {0..3} window scan order, activation dtype),
    built for conv1_2 where cin=64 quarter-fills the MXU in natural layout.
    Requires even H and W. Differentiable w.r.t. ``x`` only."""
    bsz, h, wi, cin = x.shape
    hp, wp = h // 2, wi // 2
    cout = w.shape[3]
    wflat, b4 = _pack_weights_2x2(w, b)
    xp = _space_to_depth5(x)
    bh = _band_rows(hp, wp, 4 * cin, 4 * cout, x.dtype.itemsize)
    kernel = functools.partial(
        _conv2x2_fwd_kernel, bh=bh, wi=wp, cin2=2 * cin, pool_c=cout,
    )
    out_sd = jax.ShapeDtypeStruct((bsz, hp, wp, cout), x.dtype)
    return pl.pallas_call(
        kernel,
        grid=(bsz, hp // bh),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(bh + 1), pl.Element(2),
                 pl.Element(wp + 1), pl.Element(2 * cin)),
                lambda bi, hi: (bi, hi * bh, 0, 0, 0),
            ),
            pl.BlockSpec(wflat.shape, lambda bi, hi: (0, 0)),
            pl.BlockSpec((1, 4 * cout), lambda bi, hi: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bh, wp, cout), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, bh, wp, cout), lambda bi, hi: (bi, hi, 0, 0)),
        ],
        out_shape=[out_sd, out_sd],
        interpret=interpret,
    )(xp, wflat, b4.reshape(1, 4 * cout))


def _prp_fwd(x, w, b, interpret):
    p, idx = conv3x3_bias_relu_pool_packed(x, w, b, interpret)
    return (p, idx), (w, p, idx)


def _prp_bwd(interpret, res, cts):
    ct_p, _ = cts
    w, p, idx = res
    cin, cout = w.shape[2], w.shape[3]
    bsz, hz, wz = p.shape[0], p.shape[1], p.shape[2]
    h, wi = 2 * hz, 2 * wz
    wtf = _bwd_weights_2x2(w)
    # dxp grid = the packed-padded input support, (hz+1)×(wz+1), emitted
    # on an even-banded (hz+2)×(wz+2) grid (hz+1 can be prime). The
    # routing + transpose conv run in ONE kernel pass when the banding
    # permits; tiny shapes fall back to the XLA chain.
    ho, wo = hz + 2, wz + 2
    from jax.experimental.pallas import tpu as pltpu

    bh = _band_rows(ho, wo, 4 * cout, 4 * cin, ct_p.dtype.itemsize)
    nb = ho // bh
    if nb >= 2 and bh >= 2 and hz >= bh + 1:
        kernel = functools.partial(
            _conv2x2_bwd_kernel, bh=bh, wo=wo, hz=hz, wz=wz, cout=cout,
            cin=cin, nbands=nb,
        )
        pspec = pl.BlockSpec(
            (pl.Element(1), pl.Element(bh + 1), pl.Element(wz),
             pl.Element(cout)),
            lambda bi, hi: (bi, jnp.clip(hi * bh - 1, 0, hz - bh - 1),
                            0, 0),
        )
        dxp = pl.pallas_call(
            kernel,
            grid=(bsz, nb),
            in_specs=[pspec, pspec, pspec,
                      pl.BlockSpec(wtf.shape, lambda bi, hi: (0, 0))],
            out_specs=pl.BlockSpec(
                (1, bh, 2, wo, 2 * cin), lambda bi, hi: (bi, hi, 0, 0, 0)
            ),
            out_shape=jax.ShapeDtypeStruct((bsz, ho, 2, wo, 2 * cin),
                                           ct_p.dtype),
            scratch_shapes=[
                pltpu.VMEM((bh + 1, wz + 3, 4 * cout), ct_p.dtype)
            ],
            interpret=interpret,
        )(ct_p, idx, p, wtf)
    else:
        dp = ct_p * (p > 0).astype(ct_p.dtype)
        dz = jnp.concatenate(
            [dp * (idx == q).astype(dp.dtype) for q in range(4)], axis=-1
        )
        ctp = jnp.pad(dz, ((0, 0), (1, 2), (1, 2), (0, 0)))
        dxp = jax.lax.conv_general_dilated(
            ctp, wtf.reshape(2, 2, 4 * cout, 4 * cin), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=ctp.dtype,
        )  # (B, hz+2, wz+2, 4cin): the (ho, wo) dxp grid
        dxp = dxp.reshape(bsz, ho, wo, 2, 2 * cin).transpose(0, 1, 3, 2, 4)
    # Bitcast unpack: (B, ho, 2, wo, 2cin) → slice the true (hz+1, wz+1)
    # support → (B, h+2, w+2, cin) → drop the SAME-padding ring.
    dxp = dxp[:, :hz + 1, :, :wz + 1, :]
    dx = dxp.reshape(bsz, h + 2, wi + 2, cin)
    return dx[:, 1:h + 1, 1:wi + 1, :], None, None


conv3x3_bias_relu_pool_packed.defvjp(_prp_fwd, _prp_bwd)
