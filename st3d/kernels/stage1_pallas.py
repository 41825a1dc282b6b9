"""Phase-aligned packed VGG stage 1: conv1_1 -> relu -> conv1_2 -> relu ->
pool1 with ZERO XLA glue between the kernels (VERDICT r3 item 5a).

Round 3's space-to-depth packed conv1_2 (conv_pallas.py) made the
quarter-fill conv1_2 matmuls full-MXU, but its padded packing
((B,H,W,C) -> pad -> 5D reshape) is not physically free under XLA tiling:
the profiler attributes ~4.4ms/step of pad/reshape/slice glue to it at
512², plus ~1.5ms for conv1_1's XLA im2col chain (PERF_NOTES "pack/unpack
glue"). Both exist only because the packing phase was aligned to the
PADDED image. This module re-derives the packing aligned to the UNPADDED
image:

    x5[b, Y, py, X, px*C + c] = x[b, 2Y+py, 2X+px, c]

a pure row-major reshape (``pack_input5``). Under it the 3x3 SAME conv
becomes a quad conv whose taps span ROW PHASES rp = qy+dy in {0..3} and
COL PHASES cp = qx+dx in {0..3}; phase v maps to packed coordinates

    PHASES[v] = [(-1,1), (0,0), (0,1), (1,0)][v]     # (t, p)

so O[2Y+qy, 2X+qx, o] = sum_{dy,dx,c} x5[Y+ty, py, X+tx, px*C+c]
· W[dy,dx,c,o] with (ty,py) = PHASES[qy+dy], (tx,px) = PHASES[qx+dx].
Out-of-image phases contribute exact zeros (the SAME padding), staged as
zeros into the quad-patch scratch (conv_pallas' nopad trick).

The fused chain:

  conv1_1_packed:  x5 (B,hp,2,wp,6) -> z5 (B,hp,2,wp,128)
      [= packed relu(conv1_1(x)+b)] + quad-patch Gram stats G48/s48;
      the algebraic conv1_1 Gram folds out of them (``fold_gram48``) —
      same closed form as vgg.get_features' gram1, so the (B,H,W,64)
      conv1_1 activation NEVER exists in unpacked form.
  conv1_2_packed_pool: z5 -> (pooled (B,hp,wp,64), idx in {0..3}) — the
      2x2 maxpool collapses to a channel-group max over the quad exactly
      as in conv_pallas.conv3x3_bias_relu_pool_packed (first-max tie
      routing on output-dtype values).

Backwards are kernels too, and their COTANGENTS STAY PACKED: conv1_2's
bwd routes the pool cotangent by the saved idx (relu-masked), runs the
K=4cout transpose matmul and folds straight into a dz5 block
(_conv1_2_bwd_kernel); conv1_1's bwd rebuilds the quad patches, applies
all three cotangent terms (dz5, dG48, ds48 — the Gram stats' closed-form
transposes) and folds to dx (_conv1_1_bwd_kernel). Both are
equality-tested against autodiff of the pure-jnp references
(``_conv1_1_packed_ref`` / ``_conv1_2_ref``) in
tests/test_stage1_pallas.py — exact gradients of the identical math, in
line with the repo's custom-VJP invariant (CLAUDE.md); pool-tie routing
follows the saved idx, the same first-max semantics as
conv_pallas.conv3x3_bias_relu_pool_packed.

Replaces the capability of the reference's first two VGG feature layers
(style_transfer.py:10-27, torchvision modules 0-4). Gated by
st3d.models.vgg to TPU + gram1 hot loops (env ST3D_STAGE1_V2).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Packed (t, p) for conv-window phase v = q + d (q in {0,1}, d in {0,1,2},
# minus the SAME offset: image row 2Y + q + d - 1 = 2(Y+t) + p).
PHASES = ((-1, 1), (0, 0), (0, 1), (1, 0))


# ---------------------------------------------------------------------------
# Weight packing + pure-jnp references (also the phase-1 backward)
# ---------------------------------------------------------------------------

def pack_weights_phase(w, b):
    """(3,3,cin,cout) HWIO -> ((16*cin, 4*cout), (4*cout,)). K order
    (rp*4+cp)*cin + c; N order (qy*2+qx)*cout + o (pool-group order)."""
    cin, cout = w.shape[2], w.shape[3]
    wq = jnp.zeros((4, 4, cin, 2, 2, cout), w.dtype)
    for qy in range(2):
        for qx in range(2):
            for dy in range(3):
                for dx in range(3):
                    wq = wq.at[qy + dy, qx + dx, :, qy, qx, :].set(w[dy, dx])
    return wq.reshape(16 * cin, 4 * cout), jnp.tile(b, 4)


def pack_input5(x):
    """(B, H, W, C) -> (B, H/2, 2, W/2, 2C): pure row-major reshape."""
    bsz, h, w, c = x.shape
    return x.reshape(bsz, h // 2, 2, w // 2, 2 * c)


def unpack_output5(x5):
    """(B, hp, 2, wp, 2C) -> (B, H, W, C): the inverse reshape."""
    bsz, hp, _, wp, c2 = x5.shape
    return x5.reshape(bsz, hp * 2, wp * 2, c2 // 2)


def quad_patches_ref(x5):
    """(B, hp, 2, wp, 2*cin) -> (B, hp, wp, 16*cin) quad patches (zeros at
    out-of-image phases). Pure jnp; the test oracle AND the phase-1
    backward path (its VJP is the exact overlap-add fold)."""
    cin = x5.shape[-1] // 2
    hp, wp = x5.shape[1], x5.shape[3]
    cols = []
    for rp in range(4):
        ty, py = PHASES[rp]
        rows = x5[:, :, py, :, :]                      # (B, hp, wp, 2cin)
        if ty == -1:
            rows = jnp.pad(rows[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
        elif ty == 1:
            rows = jnp.pad(rows[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
        for cp in range(4):
            tx, px = PHASES[cp]
            v = rows[..., px * cin:(px + 1) * cin]
            if tx == -1:
                v = jnp.pad(v[:, :, :-1], ((0, 0), (0, 0), (1, 0), (0, 0)))
            elif tx == 1:
                v = jnp.pad(v[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
            cols.append(v)
    return jnp.concatenate(cols, axis=-1)


def _acc_to_z5(acc):
    """(B, hp, wp, 256=(qy,qx,o)) -> (B, hp, 2, wp, 128=(qx,o))."""
    bsz, hp, wp, n = acc.shape
    return jnp.moveaxis(acc.reshape(bsz, hp, wp, 2, n // 2), 3, 2)


def _conv1_1_packed_ref(x, w, b, dtype=None):
    """Reference (z5, g48, s48) — identical math to the kernel."""
    x5 = pack_input5(x)
    p48 = quad_patches_ref(x5)
    wq, bq = pack_weights_phase(w.astype(x.dtype), b.astype(x.dtype))
    acc = jnp.einsum("bhwk,kn->bhwn", p48, wq,
                     preferred_element_type=jnp.float32)
    acc = jnp.maximum(acc + bq.astype(jnp.float32), 0.0)
    z5 = _acc_to_z5(acc.astype(x.dtype))
    g48 = jnp.einsum("bhwk,bhwl->bkl", p48, p48,
                     preferred_element_type=jnp.float32)
    s48 = jnp.sum(p48.astype(jnp.float32), axis=(1, 2))
    return z5, g48, s48


def _conv1_2_ref(z5, w, b):
    """Reference (pooled, idx-free) — maxpool via group max (autodiff
    routes its gradient by argmax; see module docstring on phase-1 ties)."""
    p = quad_patches_ref(z5)
    wq, bq = pack_weights_phase(w.astype(z5.dtype), b.astype(z5.dtype))
    acc = jnp.einsum("bhwk,kn->bhwn", p, wq,
                     preferred_element_type=jnp.float32)
    acc = jnp.maximum(acc + bq.astype(jnp.float32), 0.0)
    acc = acc.astype(z5.dtype).astype(jnp.float32)     # pool on out-dtype
    cout = acc.shape[-1] // 4
    g = acc.reshape(acc.shape[:3] + (4, cout))
    return jnp.max(g, axis=3).astype(z5.dtype)


def _conv1_2_ref_with_idx(z5, w, b):
    """_conv1_2_ref plus the kernel's idx output (first-max routing —
    jnp.argmax picks the first maximum, matching the kernel's tie-break).
    The bh<2 forward fallback of conv1_2_packed_pool."""
    p = quad_patches_ref(z5)
    wq, bq = pack_weights_phase(w.astype(z5.dtype), b.astype(z5.dtype))
    acc = jnp.einsum("bhwk,kn->bhwn", p, wq,
                     preferred_element_type=jnp.float32)
    acc = jnp.maximum(acc + bq.astype(jnp.float32), 0.0)
    acc = acc.astype(z5.dtype).astype(jnp.float32)     # pool on out-dtype
    cout = acc.shape[-1] // 4
    g = acc.reshape(acc.shape[:3] + (4, cout))
    return (jnp.max(g, axis=3).astype(z5.dtype),
            jnp.argmax(g, axis=3).astype(z5.dtype))


# ---------------------------------------------------------------------------
# Selection fold: quad-patch Gram stats -> the standard 27-patch stats
# ---------------------------------------------------------------------------

def _selection_matrices(cin=3):
    s = np.zeros((4, 9 * cin, 16 * cin), np.float32)
    for qy in range(2):
        for qx in range(2):
            for dy in range(3):
                for dx in range(3):
                    for c in range(cin):
                        s[qy * 2 + qx, (dy * 3 + dx) * cin + c,
                          ((qy + dy) * 4 + (qx + dx)) * cin + c] = 1.0
    return s


_S27 = None


def fold_gram48(g48, s48, w, b, n_pixels):
    """conv1_1 Gram from quad-patch stats: PtP = sum_i S_i G48 S_i^T and
    s27 = sum_i S_i s48, then vgg's gram1 closed form (the single home
    of the parity-critical formula — vgg.gram1_closed_form).

    Only the NUMPY selection matrices are cached in the module global:
    ``jnp.asarray`` inside a traced function yields a tracer-backed
    constant, and caching THAT leaks it into later traces
    (UnexpectedTracerError in any process that traces fold_gram48 twice —
    seen in ab_bench round 4)."""
    from st3d.models.vgg import gram1_closed_form

    global _S27
    if _S27 is None:
        _S27 = _selection_matrices(3)
    s = jnp.asarray(_S27)                               # (4, 27, 48)
    ptp = jnp.einsum("ikl,blm,inm->bkn", s, g48.astype(jnp.float32), s)
    s27 = jnp.einsum("ikl,bl->bk", s, s48.astype(jnp.float32))
    return gram1_closed_form(ptp, s27, w, b, n_pixels)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _band_rows_packed(hp: int, wp: int, kin: int, itemsize: int = 2) -> int:
    """Packed band rows: the (bh, wp, kin) patch scratch + f32 acc dominate
    VMEM; cap the scratch at ~4MB (bf16, kin=1024, wp=256 -> bh=8).
    ``itemsize`` is the compute dtype's byte width — f32 runs halve the
    band so the scratches stay inside Mosaic's 16MB scoped VMEM (CLAUDE.md:
    a fixed block that fits the bench shape WILL OOM at other dtypes).
    Also capped at hp/2 so the clipped-halo row windows always have >= 2
    bands to span (the first/last-band zero staging assumes it)."""
    budget = max(1, (4 << 20) // max(1, wp * kin * itemsize))
    bh = max(1, min(hp // 2, 8, budget))
    while hp % bh:
        bh -= 1
    return bh


def _stage_patches(x_ref, patch_ref, *, n_rows, wp, cin, hi, nb, shift):
    """Stage quad patches for ``n_rows`` consecutive quad rows (patch_ref
    (n_rows, wp, 16*cin)) from the 5D block x_ref (1, n_rows+2, 2, wp,
    2*cin). ``shift`` encodes the alignment between the patch window's
    first quad row (qstart) and the x block's start (xstart):
    qstart - xstart = 1 + shift; patch row j's tap rp then reads x local
    row j + ty + 1 + shift. Both call sites use clipped windows where
    shift is -1 / 0(ish) / +1 on the first / middle / last bands.

    Border phases stage ZEROS (the SAME padding): rp=0 at global quad row
    0 (image row -1) — in the first band (hi == 0) the window's FIRST
    patch row in both call sites; rp=3 at quad row hp-1 (image row H) —
    the last band's LAST patch row; cp=0 / cp=3 zero the first / last
    column (same scheme as conv_pallas._conv_kernel_nopad)."""
    zrow = jnp.zeros((1, wp, cin), x_ref.dtype)

    def store_cols(rows_val, rp, row_lo, row_hi):
        n = row_hi - row_lo
        for cp in range(4):
            tx, px = PHASES[cp]
            k = (rp * 4 + cp) * cin
            src = rows_val[:, :, px * cin:(px + 1) * cin]
            if tx == -1:
                patch_ref[row_lo:row_hi, 1:wp, k:k + cin] = src[:, :wp - 1]
                patch_ref[row_lo:row_hi, 0:1, k:k + cin] = jnp.zeros(
                    (n, 1, cin), x_ref.dtype
                )
            elif tx == 1:
                patch_ref[row_lo:row_hi, 0:wp - 1, k:k + cin] = src[:, 1:]
                patch_ref[row_lo:row_hi, wp - 1:wp, k:k + cin] = jnp.zeros(
                    (n, 1, cin), x_ref.dtype
                )
            else:
                patch_ref[row_lo:row_hi, :, k:k + cin] = src

    for rp in range(4):
        ty, py = PHASES[rp]
        off = ty + 1 + shift
        if rp == 0:
            @pl.when(hi != 0)
            def _i0(off=off, py=py):
                store_cols(x_ref[0, pl.ds(off, n_rows), py, :, :],
                           0, 0, n_rows)

            @pl.when(hi == 0)
            def _f0(py=py):
                # quad row 0's rp=0 phase = image row -1 -> zeros; rows
                # 1..n_rows-1 read globals 0..n_rows-2 (locals, xstart=0).
                store_cols(x_ref[0, 0:n_rows - 1, py, :, :], 0, 1, n_rows)
                for cp in range(4):
                    k = cp * cin
                    patch_ref[0:1, :, k:k + cin] = zrow
        elif rp == 3:
            @pl.when(hi != nb - 1)
            def _i3(off=off, py=py):
                store_cols(x_ref[0, pl.ds(off, n_rows), py, :, :],
                           3, 0, n_rows)

            @pl.when(hi == nb - 1)
            def _l3(py=py):
                # quad row hp-1's rp=3 phase = image row H -> zeros; rows
                # 0..n_rows-2 read locals 3..n_rows+1 (shift = +1).
                store_cols(x_ref[0, 3:n_rows + 2, py, :, :],
                           3, 0, n_rows - 1)
                for cp in range(4):
                    k = (12 + cp) * cin
                    patch_ref[n_rows - 1:n_rows, :, k:k + cin] = zrow
        else:
            store_cols(x_ref[0, pl.ds(off, n_rows), py, :, :],
                       rp, 0, n_rows)


TILE_SLOTS = (1, 0, 3, 2)     # per-rp cp order of the tile-staged K axis


def pack_weights_tile(w, b):
    """pack_weights_phase with the per-rp cp axis permuted to TILE_SLOTS —
    the K order _stage_patches_tile emits. The lane swap that the masked
    staging performs (cp0's px1 source lands at the LOW lane half) is
    absorbed here instead: Mosaic has no bf16 vector rotate (measured
    round 5: `tpu.dynamic_rotate ... not implemented: Rotate with
    non-32-bit data`), so the kernel stores where-merged tiles in source
    lane order and the weight rows follow."""
    wq, bq = pack_weights_phase(w, b)
    cin = w.shape[2]
    return (wq.reshape(4, 4, cin, -1)[:, TILE_SLOTS, :, :]
            .reshape(16 * cin, -1)), bq


def _stage_patches_tile(x_ref, patch_ref, *, n_rows, wp, cin, hi, nb,
                        shift):
    """_stage_patches for 2*cin == 128 (conv1_2's z5 input): the same
    patch VALUES, staged as 8 full-lane-tile aligned stores per band
    instead of 16 lane-masked 64-lane read-modify-writes. Per row phase
    rp the four cp slots span lanes [rp*256, rp*256+256) = exactly two
    (., 128) tiles, in TILE_SLOTS order so every tile is a pure
    where-select of shifted sources (no lane moves):

        tile A = [cp1 | cp0] = [v(px0)  | sd(px1)]
        tile B = [cp3 | cp2] = [su(px0) | v(px1)]

    with v the unshifted source rows, sd/su the col -1/+1 shifts (zero
    borders). Weights must come from pack_weights_tile. The K axis is a
    within-tile permutation of the masked layout, so outputs agree with
    the masked path to MXU/f32 reassociation (tolerance-tested, not
    bit-equal; the f32 chain keeps the masked path — _use_tile_staging)."""
    zrow = jnp.zeros((1, wp, 2 * cin), x_ref.dtype)

    def store_tiles(rows_val, rp, row_lo, row_hi):
        n = row_hi - row_lo
        lane = jax.lax.broadcasted_iota(jnp.int32, (n, wp, 2 * cin), 2)
        lo = lane < cin
        sd = jnp.pad(rows_val, ((0, 0), (1, 0), (0, 0)))[:, :wp, :]
        su = jnp.pad(rows_val, ((0, 0), (0, 1), (0, 0)))[:, 1:, :]
        k0 = rp * 4 * cin
        tile_a = jnp.where(lo, rows_val, sd)
        tile_b = jnp.where(lo, su, rows_val)
        patch_ref[row_lo:row_hi, :, k0:k0 + 2 * cin] = tile_a
        patch_ref[row_lo:row_hi, :, k0 + 2 * cin:k0 + 4 * cin] = tile_b

    for rp in range(4):
        ty, py = PHASES[rp]
        off = ty + 1 + shift
        if rp == 0:
            @pl.when(hi != 0)
            def _i0(off=off, py=py):
                store_tiles(x_ref[0, pl.ds(off, n_rows), py, :, :],
                            0, 0, n_rows)

            @pl.when(hi == 0)
            def _f0(py=py):
                store_tiles(x_ref[0, 0:n_rows - 1, py, :, :], 0, 1, n_rows)
                patch_ref[0:1, :, 0:2 * cin] = zrow
                patch_ref[0:1, :, 2 * cin:4 * cin] = zrow
        elif rp == 3:
            @pl.when(hi != nb - 1)
            def _i3(off=off, py=py):
                store_tiles(x_ref[0, pl.ds(off, n_rows), py, :, :],
                            3, 0, n_rows)

            @pl.when(hi == nb - 1)
            def _l3(py=py):
                store_tiles(x_ref[0, 3:n_rows + 2, py, :, :],
                            3, 0, n_rows - 1)
                k0 = 12 * cin
                patch_ref[n_rows - 1:n_rows, :, k0:k0 + 2 * cin] = zrow
                patch_ref[n_rows - 1:n_rows, :,
                          k0 + 2 * cin:k0 + 4 * cin] = zrow
        else:
            store_tiles(x_ref[0, pl.ds(off, n_rows), py, :, :],
                        rp, 0, n_rows)


def _use_tile_staging(cin: int, dtype) -> bool:
    """Tile staging applies to the bf16 hot path only: the f32 chain is
    the exactness surface (tpu_smoke check 7 compares it same-math against
    the jnp reference, whose quad_patches_ref keeps the masked K order) —
    and the within-tile K permutation reassociates the f32 MXU sums.
    ``ST3D_NO_S1_WIDE=1`` reverts bf16 to the masked staging too."""
    import os

    return (cin == 64 and jnp.dtype(dtype) == jnp.bfloat16
            and not os.environ.get("ST3D_NO_S1_WIDE"))


def _band_rows_c11_bwd(hp: int, wp: int, itemsize: int = 2) -> int:
    """conv1_1 bwd band rows. Unlike the fwd (where the 16*cin=48-wide
    patch scratch dominates and _band_rows_packed's budget is the right
    model), this kernel's VMEM is dominated by the (bh+2)-HALO-row
    buffers: the 128-channel dz5/z5 blocks (double-buffered), the saved
    P48 input block, and the f32 dp48/route temps — so the budget rides
    (bh+2)*wp. Pre-r5 anchors (kernel then ALSO carried the (bh+4)-row
    x5 block + a patch scratch, ~1.2KB/unit more): bf16 fit 2560 units,
    OOM'd at 3840 (17.09M); f32 fit 1024, OOM'd at 1536 (16.44M) —
    i.e. ~6.4KB(bf16)/10.7KB(f32) per unit. Round-5 (saved-P48 form)
    drops ~0.97KB/2.0KB per unit; limits below leave >=8% headroom to
    the 16M scoped budget and are re-anchored on device by
    scripts/stage1_ladder_check.py. Keeps bh | hp; callers fall back to
    the jnp reference backward below 2."""
    limit = 2880 if itemsize == 2 else 1700
    bh = max(1, min(hp // 2, 8))
    while bh > 1 and (bh + 2) * wp > limit:
        bh -= 1
    while hp % bh:
        bh -= 1
    return bh


def _band_rows_c12_bwd(hp: int, wp: int, itemsize: int = 2) -> int:
    """conv1_2 bwd band rows: the (bh+4, wp+2, 1024)-wide dP scratch
    dominates, so the budget is on (bh+4)*(wp+2) directly. Limits anchor
    on on-device proven points: bf16 fits (wp=256, bh=8) and (wp=384,
    bh=4) but OOMs at (wp=512, bh=4) — 1024² ladder check. f32 at
    (wp=256, bh=4) is MARGINAL: 16.25M — compiles standalone but 256K
    over the limit inside the full 2D-ST step graph (first_e2e r4d), so
    the f32 limit sits one band step lower. Returns bh | hp (callers
    fall back to the jnp reference backward below bh=2)."""
    limit = 3096 if itemsize == 2 else 1548
    bh = max(1, min(hp // 2, 8))
    while bh > 1 and (bh + 4) * (wp + 2) > limit:
        bh -= 1
    while hp % bh:
        bh -= 1
    return bh


def _band_shift(hi, nb):
    """Clipped-window alignment for the standard fwd banding."""
    return jnp.where(hi == 0, -1, 0) + jnp.where(hi == nb - 1, 1, 0)


def _conv1_1_kernel(x_ref, w_ref, b_ref, o_ref, g_ref, s_ref,
                    *rest, bh, wp, cin, nb):
    # rest = (patch_ref,) on the primal path, (p_ref, patch_ref) when the
    # VJP fwd exports the staged patch matrix for the backward kernel
    # (saves the bwd's 16x3-lane re-staging loop; see conv1_1_bwd_dx).
    if len(rest) == 2:
        p_out_ref, patch_ref = rest
    else:
        p_out_ref, (patch_ref,) = None, rest
    hi = pl.program_id(1)
    _stage_patches(x_ref, patch_ref, n_rows=bh, wp=wp, cin=cin, hi=hi,
                   nb=nb, shift=_band_shift(hi, nb))
    if p_out_ref is not None:
        p_out_ref[0] = patch_ref[...]
    p = patch_ref[...].reshape(bh * wp, 16 * cin)
    acc = jnp.dot(p, w_ref[...], preferred_element_type=jnp.float32)
    acc = jnp.maximum(acc + b_ref[0].astype(jnp.float32), 0.0)
    n = acc.shape[1]
    y = acc.astype(o_ref.dtype).reshape(bh, wp, n)
    o_ref[0, :, 0, :, :] = y[:, :, :n // 2]
    o_ref[0, :, 1, :, :] = y[:, :, n // 2:]
    gp = jnp.dot(p.T, p, preferred_element_type=jnp.float32)
    # s output rides a (1, 1, 48) block: Mosaic requires the last two
    # block dims to be (8,128)-divisible or equal to the array's — a 2D
    # (B, 48) array with block (1, 48) violates the sublane rule on TPU
    # (block row 1 != B), so the stats carry a singleton middle axis.
    sp = jnp.sum(p.astype(jnp.float32), axis=0).reshape(1, -1)

    @pl.when(hi == 0)
    def _init():
        g_ref[0] = gp
        s_ref[0] = sp

    @pl.when(hi != 0)
    def _acc():
        g_ref[0] += gp
        s_ref[0] += sp


def _conv1_2_kernel(x_ref, w_ref, b_ref, o_ref, i_ref,
                    patch_ref, *, bh, wp, cin, nb, tile_stage=False):
    from st3d.kernels.conv_pallas import _pool4_first_max

    hi = pl.program_id(1)
    stage = _stage_patches_tile if tile_stage else _stage_patches
    stage(x_ref, patch_ref, n_rows=bh, wp=wp, cin=cin, hi=hi,
          nb=nb, shift=_band_shift(hi, nb))
    p = patch_ref[...].reshape(bh * wp, 16 * cin)
    acc = jnp.dot(p, w_ref[...], preferred_element_type=jnp.float32)
    acc = jnp.maximum(acc + b_ref[0].astype(jnp.float32), 0.0)
    pool_c = acc.shape[1] // 4
    pv, idx = _pool4_first_max(acc, pool_c, o_ref.dtype)
    o_ref[0] = pv.astype(o_ref.dtype).reshape(bh, wp, pool_c)
    i_ref[0] = idx.astype(i_ref.dtype).reshape(bh, wp, pool_c)


def _zero_dq_guards(dq_ref, rows, wp, kq):
    """Zero the dP scratch's guard rows (0 and rows+1) and border columns;
    shared by both backward kernels — their folds rely on every
    out-of-image read resolving EXACTLY to one of these zeros."""
    dq_ref[0:1, :, :] = jnp.zeros((1, wp + 2, kq), dq_ref.dtype)
    dq_ref[rows + 1:rows + 2, :, :] = jnp.zeros((1, wp + 2, kq),
                                                dq_ref.dtype)
    zc = jnp.zeros((rows, 1, kq), dq_ref.dtype)
    dq_ref[1:rows + 1, 0:1, :] = zc
    dq_ref[1:rows + 1, wp + 1:wp + 2, :] = zc


def _fold_dq_to_packed(dq_ref, o_ref, shift, bh, wp, cin):
    """The 16-term shifted overlap-add fold from the dP scratch back to
    the packed (1, bh, 2, wp, 2cin) output block, shared by both backward
    kernels: out[Y, py, X, px*cin+c] sums dP[Y-ty, X-tx, (rp,cp,c)] over
    the 2 row-phases matching py and the 2 col-phases matching px; a fold
    read for quad row Y-ty at out-row r sits at scratch row r + (2 +
    shift - ty), so every out-of-image quad row resolves to a guard row
    (base = 2+shift-ty in [0,4], no masks or branches)."""
    for py in range(2):
        accs = [jnp.zeros((bh, wp, cin), jnp.float32) for _ in range(2)]
        for rp in range(4):
            ty, pyr = PHASES[rp]
            if pyr != py:
                continue
            base = 2 + shift - ty
            for cp in range(4):
                tx, px = PHASES[cp]
                k = (rp * 4 + cp) * cin
                accs[px] = accs[px] + dq_ref[
                    pl.ds(base, bh), pl.ds(1 - tx, wp), k:k + cin
                ].astype(jnp.float32)
        o_ref[0, :, py, :, 0:cin] = accs[0].astype(o_ref.dtype)
        o_ref[0, :, py, :, cin:2 * cin] = accs[1].astype(o_ref.dtype)


def _conv1_2_bwd_kernel(dp_ref, i_ref, p_ref, w_ref, o_ref, dpre_ref,
                        dq_ref, *, bh, wp, cout, cin, nb):
    """dz5 from (dpool, idx, pooled): route the pool cotangent to its
    argmax quad phase (relu-masked), one K=4cout -> 16cin transpose
    matmul per scratch row, then the 16-term shifted fold back to the
    packed input layout — all in VMEM; the output IS the (1, bh, 2, wp,
    2cin) dz5 block (no unpack ever exists).

    Blocks dp/i/p: (1, bh+2, wp, cout) quad rows at start = clip(hi*bh-1,
    0, hp-bh-2) — the quad grid == the pooled grid, so no grid mismatch.
    dq_ref scratch: (bh+4, wp+2, 16cin) dP with GUARD zeros — row 0, row
    bh+3 and the two border columns stay zero, and dP of quad row g lands
    at local (g - start) + 1. A fold read for quad row Y-ty at out-row r
    then sits at scratch row r + (2 + shift - ty), and every out-of-image
    quad row (-1 at the first band, hp at the last) resolves EXACTLY to a
    guard row: base = 2+shift-ty in [0,4] covers all cases with no masks
    or branches (shift = -1/0/+1 first/middle/last, as in the staging)."""
    hi = pl.program_id(1)
    shift = jnp.where(hi == 0, -1, 0) + jnp.where(hi == nb - 1, 1, 0)
    rows = bh + 2

    # 1. Route (f32 compares — Mosaic has no bf16 vector compare here).
    d_all = (dp_ref[0].astype(jnp.float32)
             * (p_ref[0].astype(jnp.float32) > 0).astype(jnp.float32))
    ix = i_ref[0].astype(jnp.float32)
    for q in range(4):
        dpre_ref[:, :, q * cout:(q + 1) * cout] = (
            d_all * (ix == float(q)).astype(jnp.float32)
        ).astype(dpre_ref.dtype)

    # 2. Guard zeros + the transpose matmul, row-chunked so the f32
    # product stays ~1MB per row (a full-band f32 temp would blow the
    # 16MB scoped VMEM).
    kq = 16 * cin
    _zero_dq_guards(dq_ref, rows, wp, kq)
    for r in range(rows):
        dq_ref[r + 1, 1:wp + 1, :] = jnp.dot(
            dpre_ref[r], w_ref[...], preferred_element_type=jnp.float32,
        ).astype(dq_ref.dtype)

    # 3. Fold (see _fold_dq_to_packed).
    _fold_dq_to_packed(dq_ref, o_ref, shift, bh, wp, cin)


def _conv1_1_bwd_kernel(dz_ref, z_ref, p_ref, w_ref, g_ref, s_ref, o_ref,
                        dq_ref, *, bh, wp, cin, nb, hp):
    """dx5 from (dz5, saved z5, saved P48, sym(dG48), ds48): per band,
    read the fwd-saved quad patches for the bh+2 halo quad rows (the fold
    crosses band edges by one row), assemble the relu-masked conv
    cotangent, run

        dP48 = dacc @ W48ᵀ + P48 @ sym(dG48) + 1 · ds48ᵀ

    and fold dP48 back to the packed input layout with the same guard-row
    scheme as _conv1_2_bwd_kernel. Output IS the (1, bh, 2, wp, 2cin) dx5
    block. dz/z/p blocks: (1, bh+2, ..., wp, .) at start = clip(hi*bh-1,
    0, hp-bh-2). P48 is the fwd kernel's own staged patch matrix
    (bit-identical to re-staging it from x5, which this kernel did until
    round 5 — 16 lane-masked 3-lane stores per band, the single largest
    VPU cost in the whole stage-1 chain)."""
    hi = pl.program_id(1)
    rows = bh + 2
    kq = 16 * cin

    # Relu-masked cotangent, split by qy so no 256-lane concat is built:
    # W48's N order is (qy*128 | qx*64 | o), so the two lane halves of wt
    # (rows qy*128:(qy+1)*128) pair with the two qy planes of dz5.
    p = p_ref[0].reshape(rows * wp, kq)
    dp48 = jnp.dot(p.astype(jnp.float32), g_ref[0],
                   preferred_element_type=jnp.float32)
    dp48 = dp48 + s_ref[0].astype(jnp.float32)    # broadcast (1, 48)
    half = w_ref.shape[0] // 2                    # = 2*cout lanes per qy
    for qy in range(2):
        d = (dz_ref[0, :, qy, :, :].astype(jnp.float32)
             * (z_ref[0, :, qy, :, :].astype(jnp.float32) > 0
                ).astype(jnp.float32))
        dp48 = dp48 + jnp.dot(
            d.reshape(rows * wp, -1).astype(dz_ref.dtype),
            w_ref[qy * half:(qy + 1) * half, :],
            preferred_element_type=jnp.float32,
        )

    # Guard-row fold (shared helpers): dP of quad row g lands at dq local
    # (g - start) + 1; rows 0 / rows+1 and border cols are zero.
    _zero_dq_guards(dq_ref, rows, wp, kq)
    dq_ref[1:rows + 1, 1:wp + 1, :] = dp48.reshape(rows, wp, kq).astype(
        dq_ref.dtype
    )
    _fold_dq_to_packed(dq_ref, o_ref, _band_shift(hi, nb), bh, wp, cin)


def conv1_1_bwd_dx(dz5, z5, p48, x, w, dg48, ds48, interpret=False):
    """The dx-emitting backward kernel for conv1_1_packed (see
    _conv1_1_bwd_kernel). ``p48`` is the fwd-saved patch matrix
    (B, hp, wp, 48). Returns dx in the caller's (B, H, W, cin)."""
    bsz, h, wi, cin = x.shape
    hp, wp = h // 2, wi // 2
    wq, _ = pack_weights_phase(
        w.astype(dz5.dtype), jnp.zeros((w.shape[3],), dz5.dtype)
    )
    wt = wq.T                                    # (4cout, 16cin)
    sym = (dg48 + jnp.swapaxes(dg48, -1, -2)).astype(jnp.float32)
    bh = _band_rows_c11_bwd(hp, wp, dz5.dtype.itemsize)
    assert bh >= 2 and hp - bh - 4 >= 0, (hp, bh)  # caller gates (see _c11_bwd)
    nb = hp // bh
    kern = functools.partial(_conv1_1_bwd_kernel, bh=bh, wp=wp, cin=cin,
                             nb=nb, hp=hp)
    zspec = pl.BlockSpec(
        (pl.Element(1), pl.Element(bh + 2), pl.Element(2), pl.Element(wp),
         pl.Element(dz5.shape[-1])),
        lambda bi, hi: (bi, jnp.clip(hi * bh - 1, 0, hp - bh - 2),
                        0, 0, 0),
    )
    pspec = pl.BlockSpec(
        (pl.Element(1), pl.Element(bh + 2), pl.Element(wp),
         pl.Element(16 * cin)),
        lambda bi, hi: (bi, jnp.clip(hi * bh - 1, 0, hp - bh - 2), 0, 0),
    )
    dx5 = pl.pallas_call(
        kern,
        grid=(bsz, nb),
        in_specs=[
            zspec, zspec, pspec,
            pl.BlockSpec(wt.shape, lambda bi, hi: (0, 0)),
            pl.BlockSpec((1, 16 * cin, 16 * cin),
                         lambda bi, hi: (bi, 0, 0)),
            # singleton middle axis: see _conv1_1_kernel's s output block
            pl.BlockSpec((1, 1, 16 * cin), lambda bi, hi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, bh, 2, wp, 2 * cin), lambda bi, hi: (bi, hi, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, 2, wp, 2 * cin),
                                       dz5.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh + 4, wp + 2, 16 * cin), dz5.dtype),
        ],
        interpret=interpret,
    )(dz5, z5, p48, wt, sym, ds48.astype(jnp.float32).reshape(bsz, 1, -1))
    return unpack_output5(dx5).astype(x.dtype)


def _packed_call(x5, wq, bq, kernel, out_specs, out_shape, scratch,
                 interpret):
    bsz, hp, _, wp, cin2 = x5.shape
    cin = cin2 // 2
    bh = _band_rows_packed(hp, wp, 16 * cin, x5.dtype.itemsize)
    nb = hp // bh
    kern = functools.partial(kernel, bh=bh, wp=wp, cin=cin, nb=nb)
    x_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(bh + 2), pl.Element(2), pl.Element(wp),
         pl.Element(cin2)),
        lambda bi, hi: (bi, jnp.clip(hi * bh - 1, 0, hp - bh - 2), 0, 0, 0),
    )
    return pl.pallas_call(
        kern,
        grid=(bsz, nb),
        in_specs=[
            x_spec,
            pl.BlockSpec(wq.shape, lambda bi, hi: (0, 0)),
            pl.BlockSpec((1, bq.shape[0]), lambda bi, hi: (0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(x5, wq, bq.reshape(1, -1))


def _conv1_1_call(x, w, b, interpret, export_patches):
    """Shared guts of conv1_1_packed: returns (z5, g48, s48[, p48]).
    ``export_patches`` additionally emits the staged patch matrix
    (B, hp, wp, 48) for the backward kernel (VJP fwd path only — primal
    callers never pay the extra HBM write)."""
    bsz, h, wi, cin = x.shape
    hp, wp = h // 2, wi // 2
    cout = w.shape[3]
    bh = _band_rows_packed(hp, wp, 16 * cin, jnp.dtype(x.dtype).itemsize)
    assert bh >= 2
    wq, bq = pack_weights_phase(w.astype(x.dtype), b.astype(x.dtype))
    x5 = pack_input5(x)
    out_specs = [
        pl.BlockSpec((1, bh, 2, wp, 2 * cout),
                     lambda bi, hi: (bi, hi, 0, 0, 0)),
        pl.BlockSpec((1, 16 * cin, 16 * cin), lambda bi, hi: (bi, 0, 0)),
        pl.BlockSpec((1, 1, 16 * cin), lambda bi, hi: (bi, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, hp, 2, wp, 2 * cout), x.dtype),
        jax.ShapeDtypeStruct((bsz, 16 * cin, 16 * cin), jnp.float32),
        jax.ShapeDtypeStruct((bsz, 1, 16 * cin), jnp.float32),
    ]
    if export_patches:
        out_specs.append(pl.BlockSpec((1, bh, wp, 16 * cin),
                                      lambda bi, hi: (bi, hi, 0, 0)))
        out_shape.append(
            jax.ShapeDtypeStruct((bsz, hp, wp, 16 * cin), x.dtype))
    scratch = [pltpu.VMEM((bh, wp, 16 * cin), x.dtype)]
    outs = _packed_call(
        x5, wq, bq, _conv1_1_kernel, out_specs, out_shape, scratch,
        interpret,
    )
    z5, g48, s48 = outs[:3]
    s48 = s48.reshape(bsz, 16 * cin)
    if export_patches:
        return z5, g48, s48, outs[3]
    return z5, g48, s48


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv1_1_packed(x, w, b, interpret=False):
    """Packed relu(conv1_1(x)+b) + quad-patch Gram stats.

    x: (B, H, W, 3) with H, W even. Returns (z5 (B,H/2,2,W/2,128) in x's
    dtype, g48 (B,48,48) f32, s48 (B,48) f32). Differentiable w.r.t. ``x``
    only (VGG weights frozen); backward = autodiff of the pure-jnp
    reference (phase 1, exact for the identical math — module docstring).
    """
    bsz, h, wi, cin = x.shape
    hp, wp = h // 2, wi // 2
    bh = _band_rows_packed(hp, wp, 16 * cin, jnp.dtype(x.dtype).itemsize)
    if bh < 2:
        # bh==1 (prime hp or hp < 4): the kernels' first/last-band
        # boundary staging degenerates (zero-length Pallas slices) —
        # pure-jnp reference fallback; _c11_bwd mirrors this gate.
        return _conv1_1_packed_ref(x, w, b)
    return _conv1_1_call(x, w, b, interpret, export_patches=False)


def _c11_fwd(x, w, b, interpret):
    bsz, h, wi, cin = x.shape
    hp, wp = h // 2, wi // 2
    bh = _band_rows_packed(hp, wp, 16 * cin, jnp.dtype(x.dtype).itemsize)
    bh_bwd = _band_rows_c11_bwd(hp, wp, jnp.dtype(x.dtype).itemsize)
    if bh < 2 or not (bh_bwd >= 2 and hp - bh_bwd - 4 >= 0):
        # Fallback shapes (either direction): no point exporting patches.
        z5, g48, s48 = conv1_1_packed(x, w, b, interpret)
        return (z5, g48, s48), (x, z5, None, w, b)
    z5, g48, s48, p48 = _conv1_1_call(x, w, b, interpret,
                                      export_patches=True)
    return (z5, g48, s48), (x, z5, p48, w, b)


def _c11_bwd(interpret, res, cts):
    x, z5, p48, w, b = res
    dz5, dg48, ds48 = cts
    if p48 is not None:
        dx = conv1_1_bwd_dx(dz5.astype(z5.dtype), z5, p48, x, w, dg48,
                            ds48, interpret)
    else:  # bh==1 (prime hp: the bwd boundary staging keys on hi==0 /
        # hi==nb-1 and assumes the border quad rows live only in the
        # first/last band) or window too short for the fold's halo:
        # jnp fallback
        _, vjp = jax.vjp(lambda xx: _conv1_1_packed_ref(xx, w, b), x)
        (dx,) = vjp((dz5.astype(z5.dtype), dg48, ds48))
    return dx, None, None


conv1_1_packed.defvjp(_c11_fwd, _c11_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv1_2_packed_pool(z5, w, b, interpret=False):
    """maxpool2x2(relu(conv3x3(z)+b)) consuming the PACKED z5 directly:
    returns (pooled (B,hp,wp,cout), idx) exactly like
    conv_pallas.conv3x3_bias_relu_pool_packed — without the XLA-side
    pad/reshape glue. Differentiable w.r.t. ``z5`` (cotangent comes back
    in the packed layout; phase-1 backward = autodiff of the reference)."""
    bsz, hp, _, wp, cin2 = z5.shape
    cin = cin2 // 2
    cout = w.shape[3]
    bh = _band_rows_packed(hp, wp, 16 * cin, jnp.dtype(z5.dtype).itemsize)
    if bh < 2:
        # Degenerate banding: jnp reference fallback (see conv1_1_packed).
        return _conv1_2_ref_with_idx(z5, w, b)
    tile = _use_tile_staging(cin, z5.dtype)
    pack = pack_weights_tile if tile else pack_weights_phase
    wq, bq = pack(w.astype(z5.dtype), b.astype(z5.dtype))
    out_sd = jax.ShapeDtypeStruct((bsz, hp, wp, cout), z5.dtype)
    out_specs = [
        pl.BlockSpec((1, bh, wp, cout), lambda bi, hi: (bi, hi, 0, 0)),
        pl.BlockSpec((1, bh, wp, cout), lambda bi, hi: (bi, hi, 0, 0)),
    ]
    scratch = [pltpu.VMEM((bh, wp, 16 * cin), z5.dtype)]
    return _packed_call(
        z5, wq, bq, functools.partial(_conv1_2_kernel, tile_stage=tile),
        out_specs, [out_sd, out_sd], scratch,
        interpret,
    )


def conv1_2_bwd_dz5(ct_p, pooled, idx, w, interpret=False):
    """The dz5-emitting backward kernel (see _conv1_2_bwd_kernel)."""
    bsz, hp, wp, cout = pooled.shape
    cin = w.shape[2]
    wq, _ = pack_weights_phase(w.astype(ct_p.dtype),
                               jnp.zeros((cout,), ct_p.dtype))
    wt = wq.T                                     # (4cout, 16cin)
    bh = _band_rows_c12_bwd(hp, wp, ct_p.dtype.itemsize)
    assert bh >= 2, (hp, bh)          # caller gates (see _c12_bwd)
    nb = hp // bh
    kern = functools.partial(_conv1_2_bwd_kernel, bh=bh, wp=wp, cout=cout,
                             cin=cin, nb=nb)
    qspec = pl.BlockSpec(
        (pl.Element(1), pl.Element(bh + 2), pl.Element(wp),
         pl.Element(cout)),
        lambda bi, hi: (bi, jnp.clip(hi * bh - 1, 0, hp - bh - 2), 0, 0),
    )
    return pl.pallas_call(
        kern,
        grid=(bsz, nb),
        in_specs=[qspec, qspec, qspec,
                  pl.BlockSpec(wt.shape, lambda bi, hi: (0, 0))],
        out_specs=pl.BlockSpec(
            (1, bh, 2, wp, 2 * cin), lambda bi, hi: (bi, hi, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, 2, wp, 2 * cin),
                                       ct_p.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh + 2, wp, 4 * cout), ct_p.dtype),
            pltpu.VMEM((bh + 4, wp + 2, 16 * cin), ct_p.dtype),
        ],
        interpret=interpret,
    )(ct_p, idx, pooled, wt)


def _c12_fwd(z5, w, b, interpret):
    p, idx = conv1_2_packed_pool(z5, w, b, interpret)
    return (p, idx), (p, idx, w, z5, b)


def _c12_bwd(interpret, res, cts):
    ct_p, _ = cts                        # idx is non-differentiable
    pooled, idx, w, z5, b = res
    hp, wp = z5.shape[1], z5.shape[3]
    bh = _band_rows_c12_bwd(hp, wp, jnp.dtype(ct_p.dtype).itemsize)
    if bh < 2:
        # bh==1 (prime hp): the bwd kernel's boundary staging keys on
        # hi==0 / hi==nb-1 and assumes border quad rows live only in the
        # first/last band. Reference autodiff fallback (pool-tie routing
        # may differ from the kernel's first-max idx on exact ties).
        _, vjp = jax.vjp(lambda z: _conv1_2_ref(z, w, b), z5)
        (dz5,) = vjp(ct_p.astype(pooled.dtype))
        return dz5, None, None
    return conv1_2_bwd_dz5(ct_p, pooled, idx, w, interpret), None, None


conv1_2_packed_pool.defvjp(_c12_fwd, _c12_bwd)


def stage1_supported(x, dtype=None) -> bool:
    """Shape gate: H, W even and large enough for both kernels' clipped
    halo windows (nb >= 2 bands, bh >= 2 — the backward kernels' boundary
    staging keys on first/last band — and hp >= bh + 2 each). ``dtype``
    is the compute dtype the kernels will run in (defaults to x's)."""
    h, wi = x.shape[1], x.shape[2]
    if h % 2 or wi % 2:
        return False
    hp, wp = h // 2, wi // 2
    if wp < 2:
        return False
    itemsize = jnp.dtype(dtype if dtype is not None else x.dtype).itemsize
    for kin in (48, 1024):                 # conv1_1 / conv1_2 patch widths
        bh = _band_rows_packed(hp, wp, kin, itemsize)
        if bh < 2 or hp // bh < 2 or hp - bh - 2 < 0:
            return False
    return True
