"""Phase-aligned packed VGG stage 1, v3: lane-aligned slab staging and
matmul-based backward folds (VERDICT r4 item 1a).

Same math and layout contract as st3d/kernels/stage1_pallas.py (the v2
kernels): x5[b, Y, py, X, px*C + c] = x[b, 2Y+py, 2X+px, c], quad conv with
phases PHASES[v] = [(-1,1), (0,0), (0,1), (1,0)][v], conv1_1 -> relu ->
conv1_2 -> relu -> pool1 with zero XLA glue. What changes is the IN-KERNEL
data movement, which the round-5 512**2 trace showed dominating all four
kernels (5.0ms measured vs ~1.5ms roofline — conv1_1 bwd 1592us, conv1_2
fwd 1491us, conv1_2 bwd 1032us, conv1_1 fwd 881us):

  * v2 staged a 16-slot quad-patch scratch with sixteen 64-lane (conv1_2)
    or 3-lane (conv1_1) masked stores per band. v3 stages SIX slabs — the
    two boundary-row-phase mid slabs (rp0/rp3) and the four edge slabs —
    as full-2cin-lane stores, and feeds the two interior mid phases
    (rp1/rp2, ty=0: never out of image) straight from the input block into
    their own matmuls. The at-roofline conv_pallas kernels prove the
    direct-read idiom; only the lane-misaligned stores were the poison.
  * v2's backwards materialized the 16*cin-wide dP scratch and folded it
    with sixteen shifted 64-lane reads. v3 never builds dP: the fold is
    LINEAR, so it rides the weights — dz5[.., py, ..] =
    sum_{ty, tx} shifted_read(dacc) @ W2[py, ty, tx], nine (bh, wp, 4cout)
    reads from a guard-padded dacc scratch and twelve matmuls, with direct
    full-lane output stores.
  * the conv1_1 Gram stats change from the 48x48 quad-patch Gram (+
    fold_gram48's selection-matrix einsums) to the DIRECT 64x64 Gram of
    the rounded pre-relu output, accumulated in-kernel exactly like
    conv_pallas._conv_gram_kernel does for conv2_1+: g64 = sum_q y_qᵀ y_q
    over the four quad phases. This matches gram_matrix_nhwc on the
    exported tap bit-closer than the algebraic route (same rounding of A)
    and removes the conv1_1 backward's dependence on input patches: its
    Gram cotangent is just dacc += y_q @ sym(dG), so the backward needs NO
    quad-patch scratch at all — it recomputes apre with the forward's own
    slab scheme.

Backwards are autodiff-exact against the pure-jnp references below (same
math; f32 runs compare exactly, bf16 at rounding tolerance), in line with
the repo's custom-VJP invariant (CLAUDE.md). Pool-tie routing keeps v2's
first-max semantics (_pool4_first_max, f32 compares — Mosaic has no bf16
vector compare).

Replaces the capability of the reference's first two VGG feature layers
(style_transfer.py:10-27, torchvision modules 0-4). Gated by
st3d.models.vgg (OPT-IN via ST3D_STAGE1=v3; the round-5 full-step A/B
measured v3 at 40.9 vs v2's 45.0 it/s @512² bf16 — the conv1_1 backward
fold pays full 128-lane MXU cost for 6 useful lanes — so v2 stays the
default. ST3D_NO_STAGE1_V2 disables both).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from st3d.kernels.stage1_pallas import (
    PHASES,
    _acc_to_z5,
    _band_shift,
    pack_input5,
    pack_weights_phase,
    quad_patches_ref,
    unpack_output5,
)

# Row phases whose mid slab is staged (ty != 0 -> can fall off the image);
# rp1/rp2 (ty=0) feed their mid matmuls by direct block reads.
_STAGED_MID = {0: 0, 3: 1}
# ty values contributing to each output py in the backward fold
# (PHASES: rp0=(-1,1), rp1=(0,0), rp2=(0,1), rp3=(1,0)).
_TYS_BY_PY = {0: (0, 1), 1: (-1, 0)}


# ---------------------------------------------------------------------------
# Weight packing
# ---------------------------------------------------------------------------

def pack_weights_v3(w, b):
    """(3,3,cin,cout) HWIO -> ((16*cin, 4*cout), (4*cout,)) with v3's row
    order: [mid0 | mid3 | edge0..edge3 | mid1 | mid2], each 2cin rows.
    Mid slab lanes: [px0 <- cp=1 tap | px1 <- cp=2]; edge slab lanes:
    [px0 col+1 <- cp=3 | px1 col-1 <- cp=0]."""
    cin = w.shape[2]
    wq, bq = pack_weights_phase(w, b)

    def rows(rp, cp):
        return wq[(rp * 4 + cp) * cin:(rp * 4 + cp + 1) * cin]

    def mid(rp):
        return jnp.concatenate([rows(rp, 1), rows(rp, 2)], axis=0)

    def edge(rp):
        return jnp.concatenate([rows(rp, 3), rows(rp, 0)], axis=0)

    wv3 = jnp.concatenate(
        [mid(0), mid(3), edge(0), edge(1), edge(2), edge(3),
         mid(1), mid(2)], axis=0)
    return wv3, bq


def pack_weights_bwd_fold(w, dtype):
    """Fold weights: (12 * 4cout, 2cin), blocks indexed (py, i_ty, i_tx)
    with i_ty over _TYS_BY_PY[py] and tx in (-1, 0, 1):

        dz5[Y, py, X, px*cin+c] = sum dacc[Y-ty, X-tx] @ W2[py, ty, tx]

    where W2[py,ty,tx][n, px*cin+c] = Wq[(rp*4+cp)*cin+c, n] for the
    (rp, cp) with PHASES[rp] == (ty, py) and PHASES[cp] == (tx, px)."""
    cin, cout = w.shape[2], w.shape[3]
    wq, _ = pack_weights_phase(
        w.astype(dtype), jnp.zeros((cout,), dtype))
    rp_by = {(ty, py): rp for rp, (ty, py) in enumerate(PHASES)}
    blocks = []
    for py in (0, 1):
        for ty in _TYS_BY_PY[py]:
            rp = rp_by[(ty, py)]
            for tx in (-1, 0, 1):
                blk = jnp.zeros((4 * cout, 2 * cin), dtype)
                for cp, (txc, px) in enumerate(PHASES):
                    if txc != tx:
                        continue
                    r = wq[(rp * 4 + cp) * cin:(rp * 4 + cp + 1) * cin, :]
                    blk = blk.at[:, px * cin:(px + 1) * cin].set(r.T)
                blocks.append(blk)
    return jnp.concatenate(blocks, axis=0)


# ---------------------------------------------------------------------------
# Pure-jnp references (phase-1 backward + test oracle)
# ---------------------------------------------------------------------------

def _conv1_1_v3_ref(x, w, b):
    """Reference (z5, g64) — identical math to the v3 kernel. z5 is
    bit-identical to the v2 reference's; g64 is the direct Gram of the
    ROUNDED pre-relu packed output (== gram_matrix_nhwc on the unpacked
    pre-relu tap, up to f32 accumulation order)."""
    x5 = pack_input5(x)
    p48 = quad_patches_ref(x5)
    wq, bq = pack_weights_phase(w.astype(x.dtype), b.astype(x.dtype))
    acc = jnp.einsum("bhwk,kn->bhwn", p48, wq,
                     preferred_element_type=jnp.float32)
    acc = acc + bq.astype(jnp.float32)
    z5 = _acc_to_z5(jnp.maximum(acc, 0.0).astype(x.dtype))
    y = acc.astype(x.dtype)
    cout = wq.shape[1] // 4
    yq = y.reshape(y.shape[:3] + (4, cout)).astype(jnp.float32)
    g64 = jnp.einsum("bhwqo,bhwqp->bop", yq, yq)
    return z5, g64


# ---------------------------------------------------------------------------
# Slab staging (shared by conv1_1/conv1_2 forwards and the conv1_1 bwd
# recompute)
# ---------------------------------------------------------------------------

def _stage_slabs(x_ref, s_ref, *, n_rows, wp, cin, hi, nb, shift):
    """Stage the rp0/rp3 mid slabs and all four edge slabs into s_ref
    (n_rows, wp, 6*2cin). ``shift`` aligns the window to the block as in
    stage1_pallas._stage_patches (qstart - xstart = 1 + shift). Border
    phases stage zeros: rp0's row at the window's first row when hi == 0
    (image row -1), rp3's at the last row when hi == nb-1 (image row H),
    and the edge slabs' out-of-image columns."""
    c2 = 2 * cin
    zrow_m = jnp.zeros((1, wp, c2), x_ref.dtype)

    def store_mid(v, slot, row_lo, row_hi):
        s_ref[row_lo:row_hi, :, slot * c2:(slot + 1) * c2] = v

    def store_edge(v, slot, row_lo, row_hi):
        n = row_hi - row_lo
        k = slot * c2
        zc = jnp.zeros((n, 1, cin), x_ref.dtype)
        s_ref[row_lo:row_hi, 0:wp - 1, k:k + cin] = v[:, 1:wp, 0:cin]
        s_ref[row_lo:row_hi, wp - 1:wp, k:k + cin] = zc
        s_ref[row_lo:row_hi, 1:wp, k + cin:k + c2] = v[:, 0:wp - 1,
                                                       cin:c2]
        s_ref[row_lo:row_hi, 0:1, k + cin:k + c2] = zc

    def zero_row(slot, r):
        s_ref[r:r + 1, :, slot * c2:(slot + 1) * c2] = zrow_m

    for rp in range(4):
        ty, py = PHASES[rp]
        off = ty + 1 + shift
        eslot = 2 + rp
        if rp == 0:
            @pl.when(hi != 0)
            def _i0(off=off, py=py, eslot=eslot):
                v = x_ref[0, pl.ds(off, n_rows), py, :, :]
                store_mid(v, 0, 0, n_rows)
                store_edge(v, eslot, 0, n_rows)

            @pl.when(hi == 0)
            def _f0(py=py, eslot=eslot):
                v = x_ref[0, 0:n_rows - 1, py, :, :]
                store_mid(v, 0, 1, n_rows)
                store_edge(v, eslot, 1, n_rows)
                zero_row(0, 0)
                zero_row(eslot, 0)
        elif rp == 3:
            @pl.when(hi != nb - 1)
            def _i3(off=off, py=py, eslot=eslot):
                v = x_ref[0, pl.ds(off, n_rows), py, :, :]
                store_mid(v, 1, 0, n_rows)
                store_edge(v, eslot, 0, n_rows)

            @pl.when(hi == nb - 1)
            def _l3(py=py, eslot=eslot):
                v = x_ref[0, 3:n_rows + 2, py, :, :]
                store_mid(v, 1, 0, n_rows - 1)
                store_edge(v, eslot, 0, n_rows - 1)
                zero_row(1, n_rows - 1)
                zero_row(eslot, n_rows - 1)
        else:
            v = x_ref[0, pl.ds(off, n_rows), py, :, :]
            store_edge(v, eslot, 0, n_rows)


def _conv_acc(x_ref, s_ref, w_ref, *, n_rows, wp, cin, shift,
              n_lo=0, n_hi=None):
    """The forward matmuls: staged slabs (three K=2*2cin dots over slab
    pairs — pairwise so the operand values retire between dots instead of
    one whole-scratch load sitting on the Mosaic stack) + the two direct
    interior mid phases (rp1 py=0, rp2 py=1; off = 1+shift is always in
    block). ``n_lo:n_hi`` optionally restricts the output-lane range (the
    conv1_1 backward recomputes apre per qy half to halve its peak stack).
    Returns the f32 (n_rows*wp, n_hi-n_lo) accumulator (no bias)."""
    c2 = 2 * cin
    if n_hi is None:
        n_hi = w_ref.shape[1]
    acc = jnp.zeros((n_rows * wp, n_hi - n_lo), jnp.float32)
    for pair in range(3):                                # slab pairs
        p = s_ref[:, :, pair * 2 * c2:(pair + 1) * 2 * c2]
        acc = acc + jnp.dot(
            p.reshape(n_rows * wp, 2 * c2),
            w_ref[pair * 2 * c2:(pair + 1) * 2 * c2, n_lo:n_hi],
            preferred_element_type=jnp.float32,
        )
    for i, py in enumerate((0, 1)):                      # rp1, rp2
        v = x_ref[0, pl.ds(1 + shift, n_rows), py, :, :]
        acc = acc + jnp.dot(
            v.reshape(n_rows * wp, c2),
            w_ref[(6 + i) * c2:(7 + i) * c2, n_lo:n_hi],
            preferred_element_type=jnp.float32,
        )
    return acc


# ---------------------------------------------------------------------------
# Forward kernels
# ---------------------------------------------------------------------------

def _c11_fwd_kernel(x_ref, w_ref, b_ref, o_ref, g_ref, s_ref, *,
                    bh, wp, cin, nb):
    hi = pl.program_id(1)
    shift = _band_shift(hi, nb)
    _stage_slabs(x_ref, s_ref, n_rows=bh, wp=wp, cin=cin, hi=hi, nb=nb,
                 shift=shift)
    acc = _conv_acc(x_ref, s_ref, w_ref, n_rows=bh, wp=wp, cin=cin,
                    shift=shift)
    apre = acc + b_ref[0].astype(jnp.float32)
    n = apre.shape[1]
    cout = n // 4
    z = jnp.maximum(apre, 0.0).astype(o_ref.dtype).reshape(bh, wp, n)
    o_ref[0, :, 0, :, :] = z[:, :, :n // 2]
    o_ref[0, :, 1, :, :] = z[:, :, n // 2:]
    y = apre.astype(o_ref.dtype)                 # rounded pre-relu tap
    partial = jnp.zeros((cout, cout), jnp.float32)
    for q in range(4):
        yq = y[:, q * cout:(q + 1) * cout]
        partial = partial + jnp.dot(yq.T, yq,
                                    preferred_element_type=jnp.float32)

    @pl.when(hi == 0)
    def _init():
        g_ref[0] = partial

    @pl.when(hi != 0)
    def _acc():
        g_ref[0] += partial


def _c12_fwd_kernel(x_ref, w_ref, b_ref, o_ref, i_ref, s_ref, *,
                    bh, wp, cin, nb):
    from st3d.kernels.conv_pallas import _pool4_first_max

    hi = pl.program_id(1)
    shift = _band_shift(hi, nb)
    _stage_slabs(x_ref, s_ref, n_rows=bh, wp=wp, cin=cin, hi=hi, nb=nb,
                 shift=shift)
    acc = _conv_acc(x_ref, s_ref, w_ref, n_rows=bh, wp=wp, cin=cin,
                    shift=shift)
    acc = jnp.maximum(acc + b_ref[0].astype(jnp.float32), 0.0)
    pool_c = acc.shape[1] // 4
    pv, idx = _pool4_first_max(acc, pool_c, o_ref.dtype)
    o_ref[0] = pv.astype(o_ref.dtype).reshape(bh, wp, pool_c)
    i_ref[0] = idx.astype(i_ref.dtype).reshape(bh, wp, pool_c)


# ---------------------------------------------------------------------------
# Backward fold: dacc scratch -> packed dz/dx via weight-side shifts
# ---------------------------------------------------------------------------

def _zero_fold_guards(d_ref, rows, wp, kq):
    """Zero the dacc scratch's guard rows (0 and rows+1) and border
    columns; the fold reads rely on every out-of-image row/col resolving
    exactly to one of these zeros."""
    d_ref[0:1, :, :] = jnp.zeros((1, wp + 2, kq), d_ref.dtype)
    d_ref[rows + 1:rows + 2, :, :] = jnp.zeros((1, wp + 2, kq),
                                               d_ref.dtype)
    zc = jnp.zeros((rows, 1, kq), d_ref.dtype)
    d_ref[1:rows + 1, 0:1, :] = zc
    d_ref[1:rows + 1, wp + 1:wp + 2, :] = zc


def _fold_from_dacc(d_ref, w2_ref, o_ref, *, shift, bh, wp, cin, cout4,
                    out_dtype):
    """dz5[Y, py, X] = sum_{ty, tx} dacc[Y-ty, X-tx] @ W2[py, ty, tx].
    dacc of quad row g sits at scratch row (g - start) + 1, so the read
    for out row j and shift ty is ds(j + 2 + shift - ty); out-of-image
    rows/cols land exactly on the guard zeros. Nine reads (ty, tx), twelve
    matmuls (each ty serves the matching py)."""
    c2 = 2 * cin
    accs = [jnp.zeros((bh * wp, c2), jnp.float32) for _ in range(2)]
    for ty in (-1, 0, 1):
        pys = [py for py in (0, 1) if ty in _TYS_BY_PY[py]]
        for i_tx, tx in enumerate((-1, 0, 1)):
            v = d_ref[pl.ds(2 + shift - ty, bh), pl.ds(1 - tx, wp), :]
            v = v.reshape(bh * wp, cout4)
            for py in pys:
                i_ty = _TYS_BY_PY[py].index(ty)
                r = ((py * 2 + i_ty) * 3 + i_tx) * cout4
                accs[py] = accs[py] + jnp.dot(
                    v, w2_ref[r:r + cout4, :],
                    preferred_element_type=jnp.float32,
                )
    for py in (0, 1):
        o_ref[0, :, py, :, :] = accs[py].reshape(bh, wp, c2).astype(
            out_dtype)


def _c12_bwd_kernel(dp_ref, i_ref, p_ref, w2_ref, o_ref, dacc_ref, *,
                    bh, wp, cout, cin, nb):
    """dz5 from (dpool, idx, pooled): route the pool cotangent by the
    saved idx (relu-masked, f32 compares), land it in the guard-padded
    dacc scratch, then the matmul fold — no dP scratch ever exists."""
    hi = pl.program_id(1)
    shift = _band_shift(hi, nb)
    rows = bh + 2
    c4 = 4 * cout
    _zero_fold_guards(dacc_ref, rows, wp, c4)
    d_all = (dp_ref[0].astype(jnp.float32)
             * (p_ref[0].astype(jnp.float32) > 0).astype(jnp.float32))
    ix = i_ref[0].astype(jnp.float32)
    for q in range(4):
        dacc_ref[1:rows + 1, 1:wp + 1, q * cout:(q + 1) * cout] = (
            d_all * (ix == float(q)).astype(jnp.float32)
        ).astype(dacc_ref.dtype)
    _fold_from_dacc(dacc_ref, w2_ref, o_ref, shift=shift, bh=bh, wp=wp,
                    cin=cin, cout4=c4, out_dtype=o_ref.dtype)


def _c11_bwd_kernel(dz_ref, x_ref, wf_ref, w2_ref, b_ref, sym_ref, o_ref,
                    s_ref, dacc_ref, *, bh, wp, cin, cout, nb, hp):
    """dx5 from (dz5, x5, sym(dG64)): recompute apre for the bh+2 halo
    quad rows with the forward's slab scheme, assemble the total conv
    cotangent

        dacc = relu_mask(apre) * dz5  +  y_q @ sym(dG64)   (per quad phase)

    land it in the guard-padded scratch and run the matmul fold. No
    quad-patch Gram machinery — the direct output Gram's cotangent is a
    matmul on the recomputed (rounded) tap."""
    hi = pl.program_id(1)
    rows = bh + 2
    c2, c4 = 2 * cin, 4 * cout
    start = jnp.clip(hi * bh - 1, 0, hp - bh - 2)
    shift2 = start - 1 - jnp.clip(start - 1, 0, hp - bh - 4)
    _stage_slabs(x_ref, s_ref, n_rows=rows, wp=wp, cin=cin, hi=hi, nb=nb,
                 shift=shift2)
    _zero_fold_guards(dacc_ref, rows, wp, c4)
    # Per qy half: recompute apre for the half's 2cout output lanes only —
    # the full-width (rows*wp, 4cout) f32 value was the Mosaic STACK item
    # that blew the 16MB scope at 768²+ (first on-device run of v3).
    for qy in range(2):
        apre = _conv_acc(x_ref, s_ref, wf_ref, n_rows=rows, wp=wp,
                         cin=cin, shift=shift2,
                         n_lo=qy * 2 * cout, n_hi=(qy + 1) * 2 * cout)
        apre = apre + b_ref[0, qy * 2 * cout:(qy + 1) * 2 * cout
                            ].astype(jnp.float32)
        mask = (apre > 0).astype(jnp.float32)
        dz_q = dz_ref[0, :, qy, :, :].reshape(rows * wp, 2 * cout)
        d = dz_q.astype(jnp.float32) * mask
        y = apre.astype(dz_ref.dtype)           # rounded pre-relu tap
        gs = [jnp.dot(y[:, qx * cout:(qx + 1) * cout].astype(jnp.float32),
                      sym_ref[0], preferred_element_type=jnp.float32)
              for qx in range(2)]
        d = d + jnp.concatenate(gs, axis=-1)
        dacc_ref[1:rows + 1, 1:wp + 1, qy * 2 * cout:(qy + 1) * 2 * cout
                 ] = d.reshape(rows, wp, 2 * cout).astype(dacc_ref.dtype)
    _fold_from_dacc(dacc_ref, w2_ref, o_ref, shift=_band_shift(hi, nb),
                    bh=bh, wp=wp, cin=cin, cout4=c4,
                    out_dtype=o_ref.dtype)


# ---------------------------------------------------------------------------
# Banding + VMEM fit (anchors refined on-device; the ladder check script
# fail-fast-compiles every rung — CLAUDE.md: a band that fits one
# (wp, dtype) WILL OOM at another)
# ---------------------------------------------------------------------------

# Mosaic's scoped-VMEM limit is 16MB shared by scratch, double-buffered
# in/out blocks AND stack temporaries (big live VALUES like f32
# accumulators). The first on-device v3 run proved the stack matters: the
# conv1_1 bwd modeled at 7.5M measured 16.71M (OOM) — the estimators below
# therefore include block and dominant-stack terms plus a safety factor,
# and the ladder check anchors them per rung.
_VMEM_BUDGET = 15 << 20
# f32 rungs hold larger multi-pass MXU temporaries than the estimators
# model (the 512² f32 c12-bwd measured 16.03M against a 15M
# estimate-budget — 32K over the 16M hard limit). Budget f32 rungs lower
# so they band smaller.
_VMEM_BUDGET_F32 = 13 << 20
_STACK_FACTOR = 1.2


def _budget(itemsize):
    return _VMEM_BUDGET_F32 if itemsize >= 4 else _VMEM_BUDGET


def _lanes(c):
    return max(c, 128)           # VMEM lanes pad to the 128 tile


def _fwd_vmem(bh, wp, cin, cout4, itemsize):
    s = bh * wp * _lanes(6 * 2 * cin) * itemsize
    acc = bh * wp * cout4 * 4                       # f32 accumulator
    slab = bh * wp * _lanes(4 * cin) * itemsize     # pairwise dot operand
    epi = 2 * bh * wp * _lanes(cout4 // 4) * 4      # pool/gram temps
    xblk = 2 * (bh + 2) * 2 * wp * _lanes(2 * cin) * itemsize
    oblk = 2 * bh * 2 * wp * 128 * itemsize
    return _STACK_FACTOR * (s + acc + slab + epi + xblk + oblk)


def _c12_bwd_vmem(bh, wp, cout, itemsize):
    rows = bh + 2
    dacc = (bh + 4) * (wp + 2) * 4 * cout * itemsize
    blks = 2 * 3 * rows * wp * _lanes(cout) * itemsize
    oblk = 2 * bh * 2 * wp * 128 * itemsize
    accs = 2 * bh * wp * 128 * 4                    # fold f32 accumulators
    v = bh * wp * 4 * cout * itemsize               # fold read operand
    route = rows * wp * _lanes(cout) * 4            # d_all f32
    return _STACK_FACTOR * (dacc + blks + oblk + accs + v + route)


def _c11_bwd_vmem(bh, wp, cin, cout, itemsize):
    rows = bh + 2
    s = rows * wp * _lanes(6 * 2 * cin) * itemsize
    stackq = 3 * rows * wp * _lanes(2 * cout) * 4   # apre/mask/d per qy
    dacc = (bh + 4) * (wp + 2) * 4 * cout * itemsize
    dzblk = 2 * rows * 2 * wp * _lanes(2 * cout) * itemsize
    xblk = 2 * (bh + 4) * 2 * wp * _lanes(2 * cin) * itemsize
    oblk = 2 * bh * 2 * wp * _lanes(2 * cin) * itemsize
    accs = 2 * bh * wp * 128 * 4 + bh * wp * 4 * cout * itemsize
    return _STACK_FACTOR * (s + stackq + dacc + dzblk + xblk + oblk
                            + accs)


def _pick_bh(hp, fits):
    bh = max(1, min(hp // 2, 8))
    while bh > 1 and not fits(bh):
        bh -= 1
    while hp % bh:
        bh -= 1
    return bh


def _bh_fwd(hp, wp, cin, cout4, itemsize):
    return _pick_bh(
        hp, lambda bh: _fwd_vmem(bh, wp, cin, cout4, itemsize)
        <= _budget(itemsize))


def _bh_c12_bwd(hp, wp, cout, itemsize):
    return _pick_bh(
        hp, lambda bh: _c12_bwd_vmem(bh, wp, cout, itemsize)
        <= _budget(itemsize))


def _bh_c11_bwd(hp, wp, cin, cout, itemsize):
    return _pick_bh(
        hp, lambda bh: _c11_bwd_vmem(bh, wp, cin, cout, itemsize)
        <= _budget(itemsize))


def stage1_v3_supported(x, dtype=None) -> bool:
    """Shape gate: H, W even, wp >= 2 and every kernel's banding leaves
    >= 2 bands of >= 2 rows (the boundary staging keys on first/last
    band), with the conv1_1 bwd's double-halo window in range."""
    h, wi = x.shape[1], x.shape[2]
    if h % 2 or wi % 2:
        return False
    hp, wp = h // 2, wi // 2
    if wp < 2:
        return False
    itemsize = jnp.dtype(dtype if dtype is not None else x.dtype).itemsize
    for bh in (
        _bh_fwd(hp, wp, 3, 256, itemsize),
        _bh_fwd(hp, wp, 64, 256, itemsize),
        _bh_c12_bwd(hp, wp, 64, itemsize),
        _bh_c11_bwd(hp, wp, 3, 64, itemsize),
    ):
        if bh < 2 or hp // bh < 2 or hp - bh - 4 < 0:
            return False
    return True


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJPs
# ---------------------------------------------------------------------------

def _x_spec(bh, wp, c2, hp, halo):
    """Element block (1, bh+halo, 2, wp, c2) at the clipped row window."""
    if halo == 2:
        def idx(bi, hi):
            return (bi, jnp.clip(hi * bh - 1, 0, hp - bh - 2), 0, 0, 0)
    else:                                           # halo == 4 (c11 bwd x)
        def idx(bi, hi):
            return (bi,
                    jnp.clip(jnp.clip(hi * bh - 1, 0, hp - bh - 2) - 1,
                             0, hp - bh - 4), 0, 0, 0)
    return pl.BlockSpec(
        (pl.Element(1), pl.Element(bh + halo), pl.Element(2),
         pl.Element(wp), pl.Element(c2)), idx)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv1_1_packed_v3(x, w, b, interpret=False):
    """Packed relu(conv1_1(x)+b) + the direct pre-relu output Gram.

    x: (B, H, W, 3), H, W even. Returns (z5 (B,H/2,2,W/2,128) in x's
    dtype, g64 (B,64,64) f32 == unnormalized Gram of the rounded pre-relu
    conv1_1 tap). Differentiable w.r.t. ``x`` only (VGG weights frozen)."""
    bsz, h, wi, cin = x.shape
    hp, wp = h // 2, wi // 2
    cout = w.shape[3]
    itemsize = jnp.dtype(x.dtype).itemsize
    bh = _bh_fwd(hp, wp, cin, 4 * cout, itemsize)
    if bh < 2 or hp // bh < 2:
        return _conv1_1_v3_ref(x, w, b)
    nb = hp // bh
    wv3, bq = pack_weights_v3(w.astype(x.dtype), b.astype(x.dtype))
    x5 = pack_input5(x)
    c2 = 2 * cin
    kern = functools.partial(_c11_fwd_kernel, bh=bh, wp=wp, cin=cin, nb=nb)
    z5, g64 = pl.pallas_call(
        kern,
        grid=(bsz, nb),
        in_specs=[
            _x_spec(bh, wp, c2, hp, 2),
            pl.BlockSpec(wv3.shape, lambda bi, hi: (0, 0)),
            pl.BlockSpec((1, bq.shape[0]), lambda bi, hi: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bh, 2, wp, 2 * cout),
                         lambda bi, hi: (bi, hi, 0, 0, 0)),
            pl.BlockSpec((1, cout, cout), lambda bi, hi: (bi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, hp, 2, wp, 2 * cout), x.dtype),
            jax.ShapeDtypeStruct((bsz, cout, cout), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bh, wp, 6 * c2), x.dtype)],
        interpret=interpret,
    )(x5, wv3, bq.reshape(1, -1))
    return z5, g64


def _c11_v3_fwd(x, w, b, interpret):
    out = conv1_1_packed_v3(x, w, b, interpret)
    return out, (x, w, b)


def _c11_v3_bwd(interpret, res, cts):
    x, w, b = res
    dz5, dg64 = cts
    bsz, h, wi, cin = x.shape
    hp, wp = h // 2, wi // 2
    cout = w.shape[3]
    dt = dz5.dtype
    itemsize = jnp.dtype(dt).itemsize
    bh = _bh_c11_bwd(hp, wp, cin, cout, itemsize)
    if bh < 2 or hp // bh < 2 or hp - bh - 4 < 0:
        _, vjp = jax.vjp(lambda xx: _conv1_1_v3_ref(xx, w, b), x)
        (dx,) = vjp((dz5.astype(dt), dg64))
        return dx, None, None
    nb = hp // bh
    wv3, bq = pack_weights_v3(w.astype(dt), b.astype(dt))
    w2 = pack_weights_bwd_fold(w, dt)
    sym = (dg64 + jnp.swapaxes(dg64, -1, -2)).astype(jnp.float32)
    x5 = pack_input5(x.astype(dt))
    c2, c4 = 2 * cin, 4 * cout
    kern = functools.partial(_c11_bwd_kernel, bh=bh, wp=wp, cin=cin,
                             cout=cout, nb=nb, hp=hp)
    dx5 = pl.pallas_call(
        kern,
        grid=(bsz, nb),
        in_specs=[
            _x_spec(bh, wp, 2 * cout, hp, 2),        # dz5
            _x_spec(bh, wp, c2, hp, 4),              # x5 (double halo)
            pl.BlockSpec(wv3.shape, lambda bi, hi: (0, 0)),
            pl.BlockSpec(w2.shape, lambda bi, hi: (0, 0)),
            pl.BlockSpec((1, bq.shape[0]), lambda bi, hi: (0, 0)),
            pl.BlockSpec((1, cout, cout), lambda bi, hi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, bh, 2, wp, c2), lambda bi, hi: (bi, hi, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, 2, wp, c2), dt),
        scratch_shapes=[
            pltpu.VMEM((bh + 2, wp, 6 * c2), dt),
            pltpu.VMEM((bh + 4, wp + 2, c4), dt),
        ],
        interpret=interpret,
    )(dz5.astype(dt), x5, wv3, w2, bq.reshape(1, -1), sym)
    return unpack_output5(dx5).astype(x.dtype), None, None


conv1_1_packed_v3.defvjp(_c11_v3_fwd, _c11_v3_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv1_2_packed_pool_v3(z5, w, b, interpret=False):
    """maxpool2x2(relu(conv3x3(z)+b)) consuming the packed z5 directly:
    (pooled (B,hp,wp,cout), idx) — v2's contract, v3's data movement."""
    from st3d.kernels.stage1_pallas import _conv1_2_ref_with_idx

    bsz, hp, _, wp, cin2 = z5.shape
    cin = cin2 // 2
    cout = w.shape[3]
    itemsize = jnp.dtype(z5.dtype).itemsize
    bh = _bh_fwd(hp, wp, cin, 4 * cout, itemsize)
    if bh < 2 or hp // bh < 2:
        return _conv1_2_ref_with_idx(z5, w, b)
    nb = hp // bh
    wv3, bq = pack_weights_v3(w.astype(z5.dtype), b.astype(z5.dtype))
    out_sd = jax.ShapeDtypeStruct((bsz, hp, wp, cout), z5.dtype)
    kern = functools.partial(_c12_fwd_kernel, bh=bh, wp=wp, cin=cin, nb=nb)
    return pl.pallas_call(
        kern,
        grid=(bsz, nb),
        in_specs=[
            _x_spec(bh, wp, cin2, hp, 2),
            pl.BlockSpec(wv3.shape, lambda bi, hi: (0, 0)),
            pl.BlockSpec((1, bq.shape[0]), lambda bi, hi: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bh, wp, cout), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, bh, wp, cout), lambda bi, hi: (bi, hi, 0, 0)),
        ],
        out_shape=[out_sd, out_sd],
        scratch_shapes=[pltpu.VMEM((bh, wp, 6 * cin2), z5.dtype)],
        interpret=interpret,
    )(z5, wv3, bq.reshape(1, -1))


def _c12_v3_fwd(z5, w, b, interpret):
    p, idx = conv1_2_packed_pool_v3(z5, w, b, interpret)
    return (p, idx), (p, idx, w, z5, b)


def _c12_v3_bwd(interpret, res, cts):
    from st3d.kernels.stage1_pallas import _conv1_2_ref

    ct_p, _ = cts
    pooled, idx, w, z5, b = res
    bsz, hp, wp, cout = pooled.shape
    cin = w.shape[2]
    dt = ct_p.dtype
    itemsize = jnp.dtype(dt).itemsize
    bh = _bh_c12_bwd(hp, wp, cout, itemsize)
    if bh < 2 or hp // bh < 2:
        _, vjp = jax.vjp(lambda z: _conv1_2_ref(z, w, b), z5)
        (dz5,) = vjp(ct_p.astype(pooled.dtype))
        return dz5, None, None
    nb = hp // bh
    w2 = pack_weights_bwd_fold(w, dt)
    c2, c4 = 2 * cin, 4 * cout
    kern = functools.partial(_c12_bwd_kernel, bh=bh, wp=wp, cout=cout,
                             cin=cin, nb=nb)
    qspec = pl.BlockSpec(
        (pl.Element(1), pl.Element(bh + 2), pl.Element(wp),
         pl.Element(cout)),
        lambda bi, hi: (bi, jnp.clip(hi * bh - 1, 0, hp - bh - 2), 0, 0),
    )
    dz5 = pl.pallas_call(
        kern,
        grid=(bsz, nb),
        in_specs=[qspec, qspec, qspec,
                  pl.BlockSpec(w2.shape, lambda bi, hi: (0, 0))],
        out_specs=pl.BlockSpec(
            (1, bh, 2, wp, c2), lambda bi, hi: (bi, hi, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, 2, wp, c2), dt),
        scratch_shapes=[pltpu.VMEM((bh + 4, wp + 2, c4), dt)],
        interpret=interpret,
    )(ct_p, idx, pooled, w2)
    return dz5, None, None


conv1_2_packed_pool_v3.defvjp(_c12_v3_fwd, _c12_v3_bwd)
