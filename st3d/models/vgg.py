"""VGG-19 feature extractor in JAX (XLA convs on the MXU).

Replaces torchvision's ``vgg19(weights=IMAGENET1K_V1).features`` as loaded by
the reference's ``get_vgg`` (utils.py:48-52) and traversed by
``get_features`` (style_transfer.py:10-27).

Parity-critical details (SURVEY.md §2.1):
  * Taps are the outputs of conv modules {0, 5, 10, 19, 21, 28} →
    {conv1_1, conv2_1, conv3_1, conv4_1, conv4_2, conv5_1}, taken
    **pre-ReLU** (the reference collects ``x = layer(x)`` right after the
    Conv2d itself).
  * Inputs are raw [0, 1] RGB — **no ImageNet mean/std normalization**
    (utils.py:34-44 applies only ToTensor).
  * The reference runs all 37 Sequential modules every call even though
    nothing past index 28 is used; we stop at conv5_1 (identical outputs,
    ~15% fewer conv FLOPs).

Weights: torchvision pretrained weights cannot be downloaded in a zero-egress
environment; weight resolution order is (1) explicit path argument,
(2) ``$ST3D_VGG_WEIGHTS``, (3) ``<repo>/weights/vgg19_imagenet.npz``,
(4) deterministic He-initialized random weights (warns once). The converter
``scripts/convert_vgg_weights.py`` produces the ``.npz`` from torchvision on
any machine that has it. All of st3d's math is weight-agnostic; tests verify
conv-stack parity against a hand-built torch replica sharing the same
weights.

Layout: params are stored HWIO and compute runs NHWC (TPU-native). The
public API accepts NCHW (B, 3, H, W) images to mirror the reference call
sites, transposing once at the boundary. ``dtype=jnp.bfloat16`` runs the conv
stack in bf16 on the MXU with f32 accumulation.
"""

from __future__ import annotations

import os
import warnings
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

# Configuration "E" of VGG (torchvision.models.vgg19): conv channel widths
# with 'M' = 2x2/stride-2 max-pool between blocks.
VGG19_CFG: Tuple = (
    64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
    512, 512, 512, 512, "M", 512, 512, 512, 512, "M",
)

# Conv-counter index (0-based among the 16 convs) for each named tap.
# torchvision Sequential indices in comments (reference style_transfer.py:12-18).
TAP_CONV_INDEX: Dict[str, int] = {
    "conv1_1": 0,   # features[0]
    "conv2_1": 2,   # features[5]
    "conv3_1": 4,   # features[10]
    "conv4_1": 8,   # features[19]
    "conv4_2": 9,   # features[21]  (content layer)
    "conv5_1": 12,  # features[28]
}
LAST_TAP_CONV = max(TAP_CONV_INDEX.values())  # stop after conv5_1


@struct.dataclass
class VGG19:
    """Frozen VGG-19 feature stack: 16 convs' (kernel HWIO, bias)."""

    kernels: Tuple[jnp.ndarray, ...]
    biases: Tuple[jnp.ndarray, ...]

    @property
    def num_convs(self) -> int:
        return len(self.kernels)


def _conv_shapes() -> List[Tuple[int, int]]:
    """(in_ch, out_ch) of each conv in order."""
    shapes = []
    c_in = 3
    for v in VGG19_CFG:
        if v == "M":
            continue
        shapes.append((c_in, int(v)))
        c_in = int(v)
    return shapes


def init_random_vgg19(seed: int = 0) -> VGG19:
    """Deterministic He-initialized weights (fallback when no pretrained
    .npz is available; see module docstring)."""
    key = jax.random.PRNGKey(seed)
    kernels, biases = [], []
    for c_in, c_out in _conv_shapes():
        key, k1 = jax.random.split(key)
        fan_in = 3 * 3 * c_in
        w = jax.random.normal(k1, (3, 3, c_in, c_out), jnp.float32)
        w = w * jnp.sqrt(2.0 / fan_in)
        kernels.append(w)
        biases.append(jnp.zeros((c_out,), jnp.float32))
    return VGG19(kernels=tuple(kernels), biases=tuple(biases))


def load_vgg19_npz(path: str) -> VGG19:
    """Load weights from the converter's .npz: keys conv{i}_kernel (HWIO)
    and conv{i}_bias for i in 0..15."""
    data = np.load(path)
    kernels, biases = [], []
    for i, (c_in, c_out) in enumerate(_conv_shapes()):
        w = np.asarray(data[f"conv{i}_kernel"], np.float32)
        b = np.asarray(data[f"conv{i}_bias"], np.float32)
        if w.shape != (3, 3, c_in, c_out):
            raise ValueError(
                f"conv{i}_kernel has shape {w.shape}, want {(3,3,c_in,c_out)}"
            )
        kernels.append(jnp.asarray(w))
        biases.append(jnp.asarray(b))
    return VGG19(kernels=tuple(kernels), biases=tuple(biases))


_warned_random = False


def get_vgg(weights_path: Optional[str] = None) -> VGG19:
    """Reference-named constructor (utils.py:48-52). Resolution order: arg,
    $ST3D_VGG_WEIGHTS, <repo>/weights/vgg19_imagenet.npz, random fallback.
    An explicitly requested ``weights_path`` that is missing raises — it
    never silently falls through to the env/repo/random channels."""
    global _warned_random
    candidates = []
    if weights_path:
        if not os.path.isfile(weights_path):
            raise FileNotFoundError(weights_path)
        candidates.append(weights_path)
    env = os.environ.get("ST3D_VGG_WEIGHTS")
    if env:
        candidates.append(env)
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    candidates.append(os.path.join(repo_root, "weights", "vgg19_imagenet.npz"))
    for cand in candidates:
        if os.path.isfile(cand):
            return load_vgg19_npz(cand)
    if not _warned_random:
        warnings.warn(
            "No pretrained VGG-19 weights found (zero-egress environment); "
            "using deterministic random init. Run "
            "scripts/convert_vgg_weights.py where torchvision is available "
            "and point ST3D_VGG_WEIGHTS at the produced .npz.",
            stacklevel=2,
        )
        _warned_random = True
    return init_random_vgg19()


# Conv layers routed through the Pallas row-band kernel on TPU: every 3x3
# conv except conv1_1 (which runs as im2col — Cin=3 starves the MXU either
# way). Measured at the 512**2 bench workload: 23.5 it/s all-XLA, 27.1 with
# stages 1-2, 28.6 with all twelve — XLA's conv strategies drown the early
# stages in layout copies and still leave a few percent on the later ones.
# Env-overridable for experiments: ST3D_PALLAS_CONVS="1,2,3" (conv
# indices), "" disables. Read per call (like ST3D_NO_PALLAS_CONV) so both
# experiment overrides share the same set-any-time semantics (advisor r2).


def _pallas_convs() -> frozenset:
    env = os.environ.get("ST3D_PALLAS_CONVS")
    if env is None:
        return frozenset(range(1, 13))
    return frozenset(int(t) for t in env.split(",") if t)


def _fused_gram_convs() -> frozenset:
    """Conv indices whose style Gram is accumulated inside the Pallas conv
    kernel (the tap is never exported). conv2_1 by default (+2.6% measured,
    round 3); ST3D_NO_FUSED_GRAM2 removes it. The deeper style taps
    conv3_1/conv4_1/conv5_1 are ALSO default since round 4: the r4f
    interleaved A/B put them above the tap-export route in all 5 windows
    (median 44.95 vs 44.64 it/s @512² bf16, +0.7%); ST3D_NO_FUSED_GRAM_DEEP
    reverts (ST3D_FUSED_GRAM_DEEP stays accepted as a force-on)."""
    convs = set()
    if not os.environ.get("ST3D_NO_FUSED_GRAM2"):
        convs.add(TAP_CONV_INDEX["conv2_1"])
    if (not os.environ.get("ST3D_NO_FUSED_GRAM_DEEP")
            or os.environ.get("ST3D_FUSED_GRAM_DEEP")):
        convs.update(TAP_CONV_INDEX[n]
                     for n in ("conv3_1", "conv4_1", "conv5_1"))
    return frozenset(convs)


def _pallas_conv_ok(x: jnp.ndarray) -> bool:
    """Gate: real TPU backend, spatial dims the kernel's banding accepts."""
    if os.environ.get("ST3D_NO_PALLAS_CONV"):
        return False
    if jax.default_backend() != "tpu":
        return False
    h, w = x.shape[1], x.shape[2]
    return h % 8 == 0 and w % 8 == 0


def gram1_closed_form(ptp, s27, w, b, n_pixels):
    """The algebraic conv1_1 Gram from im2col patch stats (all f32):

        G = Wᵀ PᵀP W + u bᵀ + b uᵀ + N b bᵀ,   u = s27 W

    with PᵀP (B, 27, 27), s27 (B, 27) the per-image patch sums, W the
    HWIO kernel flattened to (27, 64), b (64,) and N the pixel count.
    This is THE single home of the parity-critical formula — both the
    default algebraic gram1 path below and stage1_pallas.fold_gram48
    (which first folds its 48-wide quad stats down to 27) call it."""
    w27 = w.reshape(27, -1).astype(jnp.float32)
    bf = b.astype(jnp.float32)
    u = s27 @ w27                                           # (B, 64)
    g = jnp.einsum("ko,bkl,lp->bop", w27, ptp, w27)
    return (g + u[:, :, None] * bf[None, None, :]
            + bf[None, :, None] * u[:, None, :]
            + float(n_pixels) * bf[None, :, None] * bf[None, None, :])


def _stage1_v2_ok(x: jnp.ndarray, gram1: bool, wanted) -> bool:
    """Gate for the phase-aligned packed stage 1 (st3d.kernels.
    stage1_pallas): needs the gram1 hot-loop mode (the conv1_1 tap is
    replaced by its Gram — the fused path never materializes the tap)
    plus the usual TPU/shape gates. ON by default since round 4
    (ab_bench: 44.0 vs 35.7 it/s at 512² bf16, +23%; f32 512² full-chain
    grad == reference autodiff to boundary-flip measure ~2e-4);
    ``ST3D_NO_STAGE1_V2=1`` reverts to the round-3 packed conv1_2 path
    (``ST3D_STAGE1_V2`` is accepted as a no-op for A/B script compat)."""
    if os.environ.get("ST3D_NO_STAGE1_V2"):
        return False
    if not (gram1 and "conv1_1" in wanted):
        return False
    if 1 not in _pallas_convs():       # conv1_2 routed to Pallas at all
        return False
    if not _pallas_conv_ok(x):
        return False
    from st3d.kernels.stage1_pallas import stage1_supported

    return stage1_supported(x)


def _reduce_window_max_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _up2x2(a: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(B, h2, w2, C) → (B, h, w, C): broadcast each value over its 2x2
    window (h = 2*h2, w = 2*w2)."""
    bsz, h2, w2, c = a.shape
    return jnp.broadcast_to(
        a[:, :, None, :, None, :], (bsz, h2, 2, w2, 2, c)
    ).reshape(bsz, h, w, c)


@jax.custom_vjp
def _max_pool_2x2_routed(x: jnp.ndarray) -> jnp.ndarray:
    return _reduce_window_max_2x2(x)


def _mp_fwd(x):
    y = _reduce_window_max_2x2(x)
    return y, (x, y)


def _mp_bwd(res, dy):
    """Exact SelectAndScatter replacement: route ``dy`` to the FIRST
    (window scan order) element equal to the window max — the same
    routing XLA's ge-select SelectAndScatter probes, but as fusable
    elementwise ops + one small rank-score reduce_window instead of the
    serial window probe (profiler: SelectAndScatter ran pools 2-3 at
    ~4x their bandwidth roofline, 660us/step at 512²). Equality-tested
    against the autodiff gradient incl. crafted ties / all-zero windows
    (tests/test_vgg.py::test_pool_bwd_routed_exact)."""
    x, y = res
    bsz, h2, w2, c = y.shape
    xe = x[:, :h2 * 2, :w2 * 2, :]
    eq = xe == _up2x2(y, h2 * 2, w2 * 2)
    ri = jax.lax.broadcasted_iota(jnp.int32, xe.shape, 1) % 2
    ci = jax.lax.broadcasted_iota(jnp.int32, xe.shape, 2) % 2
    # Rank 0..3 in window scan order; 4 = "not a max". Values are exact
    # in bf16, so the score rides the activation dtype (half the HBM
    # traffic of an i32/f32 score).
    rank = (ri * 2 + ci).astype(x.dtype)
    score = jnp.where(eq, rank, jnp.asarray(4, x.dtype))
    min_rank = -_reduce_window_max_2x2(-score)
    take = eq & (rank == _up2x2(min_rank, h2 * 2, w2 * 2))
    dxe = jnp.where(take, _up2x2(dy, h2 * 2, w2 * 2),
                    jnp.zeros_like(xe, dy.dtype))
    if xe.shape != x.shape:  # odd H/W: floor-mode rows/cols get zero grad
        dxe = jnp.pad(dxe, ((0, 0), (0, x.shape[1] - xe.shape[1]),
                            (0, x.shape[2] - xe.shape[2]), (0, 0)))
    return (dxe,)


_max_pool_2x2_routed.defvjp(_mp_fwd, _mp_bwd)


def _max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(kernel=2, stride=2) in NHWC (floor mode == VALID).

    ``ST3D_POOL_BWD=routed`` (A/B candidate, round 5) swaps the backward
    from XLA's SelectAndScatter to the first-max routed formulation in
    ``_mp_bwd`` (identical forward, bit-identical gradients). Measured a
    LOSS on the full step (47.39 vs 49.34 it/s @512² bf16, 5 agreeing
    windows) — SelectAndScatter is already the faster backward; kept as
    a documented dead end.

    ``ST3D_POOL=stride`` (experiment — measured 2x SLOWER end-to-end on
    TPU, ab_bench 15.7 vs 30.5 it/s: the strided quadrant slices force
    terrible layouts; kept only as a documented dead end): max of the four
    strided slices — same forward values; backward select-masks instead of
    SelectAndScatter.
    """
    h2, w2 = (x.shape[1] // 2) * 2, (x.shape[2] // 2) * 2
    if os.environ.get("ST3D_POOL") == "stride":
        return jnp.maximum(
            jnp.maximum(x[:, 0:h2:2, 0:w2:2], x[:, 1:h2:2, 0:w2:2]),
            jnp.maximum(x[:, 0:h2:2, 1:w2:2], x[:, 1:h2:2, 1:w2:2]),
        )
    if os.environ.get("ST3D_POOL_BWD") == "routed":
        return _max_pool_2x2_routed(x)
    return _reduce_window_max_2x2(x)


def get_features(
    images: jnp.ndarray,
    model: VGG19,
    layers: Optional[Dict[str, str]] = None,
    dtype: jnp.dtype = jnp.float32,
    layout: str = "NCHW",
    input_layout: str = "NCHW",
    gram1: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Tap dict for a batch of images, mirroring the reference
    ``get_features(image, model)`` (style_transfer.py:10-27).

    images: (B, 3, H, W) in [0, 1] (NCHW, reference layout). Returns
    {name: (B, C, H', W') float32} with pre-ReLU conv outputs.

    ``layers`` accepts the reference's {torchvision_index: name} dict for API
    parity; names are what matters here.

    ``layout="NHWC"`` is the TPU hot-loop mode: taps come back (B, H', W', C)
    in the COMPUTE dtype, skipping the NCHW transpose + f32 materialization
    (a pure relayout — the f32 cast adds no information to a bf16 conv
    output, and the Gram/MSE consumers accumulate in f32 regardless).

    ``input_layout="NHWC"`` accepts (B, H, W, 3) images directly — the
    renderer produces NHWC, so hot loops skip the NCHW round trip entirely
    (profiler: the transpose pair forced a channel-major layout onto the
    frame-assembly scatter, the single most expensive op of the step).

    ``gram1=True`` replaces the conv1_1 tap with its Gram matrix, computed
    ALGEBRAICALLY from the im2col patches: with A = P·W + 1·bᵀ,
    G = AᵀA = Wᵀ(PᵀP)W + (Wᵀs)bᵀ + b(Wᵀs)ᵀ + N·bbᵀ where PᵀP is (B, 27, 27)
    and s = Pᵀ1 — so the full-size (B, H, W, 64) tap is never exported to a
    second consumer (profiler: the tap's layout fork + the Gram cotangent
    re-entering the conv chain cost ~10ms/step at 512², PERF_NOTES §2).
    The returned key is ``"conv1_1:gram"`` ((B, 64, 64) float32); loss
    consumers use it directly in place of gramming the tap. In f32 mode the
    matrix equals ``gram_matrix_nhwc(tap)`` up to float reassociation
    (torch-parity tested). In bf16 mode there is a SYSTEMATIC numerics
    difference, not just reassociation noise: the tap route rounds the conv
    output A to bf16 before gramming, while the algebraic route never
    materializes A (PᵀP accumulates the bf16 patches in f32 and the W/b
    terms apply in f32) — so against targets computed via
    ``gram_matrix_nhwc`` the conv1_1 style term carries a small nonzero
    floor of order the bf16 rounding of A (advisor r3). Measured: the bf16
    A/B trajectory delta sits inside the run-to-run noise band
    (tests/test_vgg.py::test_gram1_bf16_close_to_tap_route pins the
    magnitude). Disabled by env ``ST3D_NO_GRAM1`` for A/B experiments.
    """
    if os.environ.get("ST3D_NO_GRAM1"):
        gram1 = False
    wanted = set(TAP_CONV_INDEX)
    if layers is not None:
        wanted = set(layers.values())

    if input_layout == "NHWC":
        x = images.astype(dtype)
    else:
        x = jnp.transpose(images.astype(dtype), (0, 2, 3, 1))  # NHWC
    feats: Dict[str, jnp.ndarray] = {}
    name_by_conv = {v: k for k, v in TAP_CONV_INDEX.items()}

    conv_i = 0
    skip_pool = False
    skip_convs = 0
    for cfg_i, v in enumerate(VGG19_CFG):
        if v == "M":
            if skip_pool:
                skip_pool = False
            else:
                x = _max_pool_2x2(x)
            continue
        if skip_convs:                 # consumed by a fused multi-layer op
            skip_convs -= 1
            conv_i += 1
            continue
        w = model.kernels[conv_i].astype(dtype)
        b = model.biases[conv_i].astype(dtype)
        did_relu = False
        if conv_i == 0 and _stage1_v2_ok(x, gram1, wanted):
            # Phase-aligned packed stage 1: conv1_1 emits its relu'd
            # activation DIRECTLY in the space-to-depth packed layout (its
            # unpacked (B,H,W,64) form never exists); conv1_2+pool1 consume
            # it with zero XLA glue — kills the pad/reshape/slice ops
            # around the round-3 packed conv1_2 AND the conv1_1 im2col
            # chain (~4-6ms/step at 512², PERF_NOTES round 4). v3 adds
            # lane-aligned staging + matmul-based backward folds and a
            # direct 64x64 pre-relu output Gram, but the round-5 full-step
            # A/B measured it SLOWER (40.9 vs 45.0 it/s @512² bf16 — the
            # conv1_1 backward fold pays full 128-lane MXU cost for 6
            # useful lanes), so v2 stays the default; ST3D_STAGE1=v3 opts
            # into the v3 kernels for A/B.
            from st3d.kernels.stage1v3_pallas import stage1_v3_supported

            bsz, h, wd, _ = x.shape
            use_v3 = (os.environ.get("ST3D_STAGE1") == "v3"
                      and stage1_v3_supported(x))
            if use_v3:
                from st3d.kernels.stage1v3_pallas import (
                    conv1_1_packed_v3, conv1_2_packed_pool_v3,
                )

                z5, g64 = conv1_1_packed_v3(x, w, b)
                feats["conv1_1:gram"] = g64
                x, _ = conv1_2_packed_pool_v3(
                    z5, model.kernels[1].astype(dtype),
                    model.biases[1].astype(dtype),
                )
            else:
                from st3d.kernels.stage1_pallas import (
                    conv1_1_packed, conv1_2_packed_pool, fold_gram48,
                )

                z5, g48, s48 = conv1_1_packed(x, w, b)
                feats["conv1_1:gram"] = fold_gram48(
                    g48, s48, model.kernels[0], model.biases[0], h * wd
                )
                x, _ = conv1_2_packed_pool(
                    z5, model.kernels[1].astype(dtype),
                    model.biases[1].astype(dtype),
                )
            skip_convs = 1             # conv1_2 consumed here
            skip_pool = True           # pool1 consumed here
            did_relu = True
        elif conv_i == 0:
            # conv1_1 has Cin=3: as a conv the MXU runs at <3% of its lanes
            # and XLA pads/relayouts around it (profiler: several ms of
            # "data formatting" at 512**2). As im2col + one (27, 64) matmul
            # it is dense MXU work — same zero-padded SAME semantics, same
            # values (patch order (dy, dx, c) matches the HWIO flatten).
            bsz, h, wd, _ = x.shape
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            patches = jnp.concatenate(
                [xp[:, dy:dy + h, dx:dx + wd, :]
                 for dy in range(3) for dx in range(3)], axis=-1,
            )
            x = jnp.einsum(
                "bhwk,ko->bhwo", patches, w.reshape(27, -1),
                preferred_element_type=dtype,
            ) + b
            if gram1 and "conv1_1" in wanted:
                # Algebraic Gram from the (already materialized) patches —
                # see the docstring. Small matrices in f32; the only
                # pixel-count work is PᵀP ((B,27,27), one MXU pass).
                ptp = jnp.einsum(
                    "bhwk,bhwl->bkl", patches, patches,
                    preferred_element_type=jnp.float32,
                )
                s = jnp.sum(patches.astype(jnp.float32), axis=(1, 2))
                feats["conv1_1:gram"] = gram1_closed_form(
                    ptp, s, model.kernels[conv_i], model.biases[conv_i],
                    h * wd,
                )
        elif (gram1 and conv_i in _fused_gram_convs()
              and name_by_conv.get(conv_i) in wanted
              and conv_i in _pallas_convs() and _pallas_conv_ok(x)):
            # Style-tap Grams accumulated inside the conv kernel's VMEM
            # band — the tap is never exported to a second consumer (same
            # motivation as the algebraic conv1_1 Gram above). conv2_1 is
            # default ON since round 3's packed conv1_2 landed (ab_bench
            # medians 35.53 vs 34.64 it/s, +2.6%; it was noise-level
            # before — the packed layout removed the ops this fusion used
            # to hide behind; ST3D_NO_FUSED_GRAM2 reverts). The deeper
            # style taps (conv3_1/conv4_1/conv5_1, smaller spatial) are
            # default ON since round 4 (r4f A/B: above the tap route in
            # all 5 windows, +0.7% median; ST3D_NO_FUSED_GRAM_DEEP
            # reverts).
            from st3d.kernels.conv_pallas import conv3x3_bias_gram

            x, g = conv3x3_bias_gram(x, w, b)
            feats[name_by_conv[conv_i] + ":gram"] = g
        elif (conv_i not in name_by_conv
              and not os.environ.get("ST3D_NO_FUSED_RELU")
              and conv_i in _pallas_convs() and _pallas_conv_ok(x)):
            # Non-tap layers fuse the ReLU into the conv kernel's output
            # write — XLA cannot fuse elementwise ops into a custom call,
            # so the standalone max costs a full activation round trip per
            # layer (ab_bench: +2.9%; ST3D_NO_FUSED_RELU reverts).
            next_is_pool = (cfg_i + 1 < len(VGG19_CFG)
                            and VGG19_CFG[cfg_i + 1] == "M")
            if (next_is_pool and x.shape[3] < 128
                    and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
                    and not os.environ.get("ST3D_NO_PACKED1")):
                # conv1_2 (cin=64): the one layer whose K=64/N=64 matmuls
                # quarter-fill the MXU — run it space-to-depth packed
                # (2x2 VALID conv, K=N=256) with the ReLU and the
                # following maxpool fused as an in-VMEM channel-group max
                # (profiler: ~2.3ms fwd vs a ~0.4ms roofline unpacked;
                # pool1's reduce_window + SelectAndScatter fold in free).
                # Env ST3D_NO_PACKED1 reverts for A/B.
                from st3d.kernels.conv_pallas import (
                    conv3x3_bias_relu_pool_packed,
                )

                x, _ = conv3x3_bias_relu_pool_packed(x, w, b)
                skip_pool = True
            elif (next_is_pool
                    and os.environ.get("ST3D_FUSED_POOL")):
                # Experimental (env ST3D_FUSED_POOL): pre-pool layers
                # additionally fuse the 2x2 max-pool — the full-size
                # activation never leaves VMEM; backward replaces
                # SelectAndScatter with an argmax-index-routed expansion.
                # MEASURED A NET LOSS at the 512² bench (ab_bench medians:
                # fwd neutral — in-VMEM relayouts eat the saved traffic —
                # bwd +0.7ms from the strided interleave expansion), so
                # off by default; kept as a validated, tested kernel
                # (bit-exact bwd vs the unfused chain on-device).
                from st3d.kernels.conv_pallas import conv3x3_bias_relu_pool

                x, _ = conv3x3_bias_relu_pool(x, w, b)
                skip_pool = True
            else:
                from st3d.kernels.conv_pallas import conv3x3_bias_relu

                x = conv3x3_bias_relu(x, w, b)
            did_relu = True
        elif conv_i in _pallas_convs() and _pallas_conv_ok(x):
            # Stage-1/2 convs (64-128 ch at large spatial): XLA's conv
            # strategy drowns these in layout copies; the Pallas kernel
            # keeps a row band in VMEM and writes the output once
            # (st3d/kernels/conv_pallas.py).
            from st3d.kernels.conv_pallas import conv3x3_bias

            x = conv3x3_bias(x, w, b)
        else:
            # preferred_element_type must equal the operand dtype here: with
            # a f32 preference on bf16 operands, the conv TRANSPOSE rule
            # feeds a f32 cotangent back into a bf16 conv and fails. TPU MXU
            # still accumulates bf16 convs in f32 internally.
            x = jax.lax.conv_general_dilated(
                x, w,
                window_strides=(1, 1),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dtype,
            ) + b
        if conv_i in name_by_conv and name_by_conv[conv_i] in wanted:
            if name_by_conv[conv_i] + ":gram" in feats:
                pass  # Gram exported above instead of the tap
            elif layout == "NHWC":
                feats[name_by_conv[conv_i]] = x
            else:
                feats[name_by_conv[conv_i]] = jnp.transpose(
                    x, (0, 3, 1, 2)
                ).astype(jnp.float32)
        if conv_i >= LAST_TAP_CONV:
            break
        if not did_relu:
            x = jnp.maximum(x, 0.0)  # ReLU between convs (pre-ReLU taps)
        conv_i += 1
        continue
    return feats
