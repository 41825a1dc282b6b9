"""Pallas 3x3 conv kernel vs lax.conv_general_dilated (interpret mode on
CPU; the TPU path compiles the same kernel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from st3d.kernels import conv_pallas
from st3d.kernels.conv_pallas import conv3x3_bias


def _xla_conv(x, w, b):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    ) + b


@pytest.mark.parametrize("shape,cout", [
    ((2, 64, 48, 16), 24),    # uneven W, Cin != Cout
    ((1, 16, 16, 64), 64),    # square, matches BLOCK_ROWS
    ((3, 40, 8, 3), 32),      # tiny width, RGB input
])
def test_forward_matches_xla(shape, cout):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, jnp.float32)
    w = jax.random.normal(
        jax.random.fold_in(key, 1), (3, 3, shape[3], cout), jnp.float32
    ) * 0.1
    b = jax.random.normal(jax.random.fold_in(key, 2), (cout,), jnp.float32)
    out = jax.jit(lambda xx: conv3x3_bias(xx, w, b, True))(x)
    ref = jax.jit(lambda xx: _xla_conv(xx, w, b))(x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_input_gradient_matches_xla():
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 32, 24, 8), jnp.float32)
    w = jax.random.normal(
        jax.random.fold_in(key, 1), (3, 3, 8, 16), jnp.float32
    ) * 0.1
    b = jnp.zeros((16,), jnp.float32)
    tgt = jax.random.normal(jax.random.fold_in(key, 2), (2, 32, 24, 16),
                            jnp.float32)

    g_pal = jax.jit(jax.grad(
        lambda xx: jnp.sum((conv3x3_bias(xx, w, b, True) - tgt) ** 2)
    ))(x)
    g_ref = jax.jit(jax.grad(
        lambda xx: jnp.sum((_xla_conv(xx, w, b) - tgt) ** 2)
    ))(x)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), atol=1e-4, rtol=1e-4
    )
    assert float(jnp.abs(g_pal).max()) > 0


@pytest.mark.parametrize("group", [1, 3, 9])
@pytest.mark.parametrize("cin", [64, 128])
def test_tap_groupings_match_xla(monkeypatch, group, cin):
    """All K-groupings (9 separate taps / per-dy K=3cin / full im2col
    K=9cin) are the same conv; forward AND input-grad equality."""
    monkeypatch.setenv("ST3D_CONV_KGROUP", str(group))
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (1, 16, 24, cin), jnp.float32)
    w = jax.random.normal(
        jax.random.fold_in(key, 1), (3, 3, cin, 32), jnp.float32
    ) * 0.05
    b = jax.random.normal(jax.random.fold_in(key, 2), (32,), jnp.float32)
    out = jax.jit(lambda xx: conv3x3_bias(xx, w, b, True))(x)
    ref = jax.jit(lambda xx: _xla_conv(xx, w, b))(x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )
    g_pal = jax.grad(lambda xx: jnp.sum(conv3x3_bias(xx, w, b, True) ** 2))(x)
    g_ref = jax.grad(lambda xx: jnp.sum(_xla_conv(xx, w, b) ** 2))(x)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), atol=1e-4, rtol=1e-4
    )


@pytest.mark.parametrize("bad", ["2", "banana", "0"])
def test_kgroup_env_validated(monkeypatch, bad):
    """ST3D_CONV_KGROUP outside {1,3,9} raises a clear error instead of
    silently falling through to the ungrouped kernel (advisor r3)."""
    from st3d.kernels.conv_pallas import _tap_group

    monkeypatch.setenv("ST3D_CONV_KGROUP", bad)
    with pytest.raises(ValueError, match="ST3D_CONV_KGROUP"):
        _tap_group(64)


@pytest.mark.parametrize("shape", [
    ((1, 32, 16, 8)),   # bh=16, 2 bands: first/last-band zero-halo logic
    ((1, 48, 16, 8)),   # 3 bands: interior band takes the base=0 path
])
def test_kernel_halo_matches_padded(monkeypatch, shape):
    """The in-kernel-halo (nopad) variant == the HBM-padded variant == XLA
    at shapes that activate it (group=9, >=2 bands of >=2 rows)."""
    key = jax.random.PRNGKey(13)
    x = jax.random.normal(key, shape, jnp.float32)
    w = jax.random.normal(
        jax.random.fold_in(key, 1), (3, 3, shape[3], 16), jnp.float32
    ) * 0.1
    b = jax.random.normal(jax.random.fold_in(key, 2), (16,), jnp.float32)
    ref = _xla_conv(x, w, b)
    monkeypatch.delenv("ST3D_NO_KERNEL_HALO", raising=False)
    out = jax.jit(lambda xx: conv3x3_bias(xx, w, b, True))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    monkeypatch.setenv("ST3D_NO_KERNEL_HALO", "1")
    pad = jax.jit(lambda xx: conv3x3_bias(xx, w, b, True))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pad),
                               atol=0, rtol=0)


def test_single_row_band_falls_back():
    """bh==1 must NOT take the in-kernel-halo path: its border stores
    (patch_ref[1:1], x_ref[3:bh+2]) have out-of-range slice starts that
    JAX rejects at trace time — seen on-device at 1024-wide f32. The
    fallback padded path must produce the right answer."""
    key = jax.random.PRNGKey(17)
    x = jax.random.normal(key, (1, 4, 768, 8), jnp.float32)   # bh == 1
    w = jax.random.normal(
        jax.random.fold_in(key, 1), (3, 3, 8, 16), jnp.float32
    ) * 0.1
    b = jnp.zeros((16,), jnp.float32)
    out = jax.jit(lambda xx: conv3x3_bias(xx, w, b, True))(x)
    ref = _xla_conv(x, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_get_features_fused_pool_loop_bookkeeping(monkeypatch):
    """get_features with the fused conv+pool path active (gate forced on,
    kernels in interpret mode) produces the same taps as the pure-XLA
    path — validates the skip_pool lookahead never double-pools or skips
    a real pool, across all five tap layers."""
    import st3d.models.vgg as vggmod
    import st3d.kernels.conv_pallas as cp

    model = vggmod.init_random_vgg19(0)
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 3, 32, 32))

    ref = vggmod.get_features(x, model)

    real_cb, real_cr, real_crp = (cp.conv3x3_bias, cp.conv3x3_bias_relu,
                                  cp.conv3x3_bias_relu_pool)
    real_prp = cp.conv3x3_bias_relu_pool_packed
    monkeypatch.setenv("ST3D_FUSED_POOL", "1")
    monkeypatch.setattr(vggmod, "_pallas_conv_ok", lambda _x: True)
    monkeypatch.setattr(cp, "conv3x3_bias",
                        lambda xx, w, b, i=False: real_cb(xx, w, b, True))
    monkeypatch.setattr(cp, "conv3x3_bias_relu",
                        lambda xx, w, b, i=False: real_cr(xx, w, b, True))
    monkeypatch.setattr(cp, "conv3x3_bias_relu_pool",
                        lambda xx, w, b, i=False: real_crp(xx, w, b, True))
    # conv1_2 (cin<128 pre-pool) routes through the PACKED kernel by
    # default — patch it into interpret mode too so both fused-pool
    # flavors' skip_pool bookkeeping is exercised in one pass.
    monkeypatch.setattr(cp, "conv3x3_bias_relu_pool_packed",
                        lambda xx, w, b, i=False: real_prp(xx, w, b, True))

    out = vggmod.get_features(x, model)
    assert set(out) == set(ref)
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=1e-4, rtol=1e-4)


def test_get_features_gate_off_cpu():
    """On the CPU backend get_features must take the XLA conv path (the
    Pallas gate requires a real TPU)."""
    from st3d.models.vgg import _pallas_conv_ok

    x = jnp.zeros((1, 64, 64, 3))
    assert jax.default_backend() != "tpu"
    assert not _pallas_conv_ok(x)


def test_conv_gram_fused_matches_separate():
    """conv3x3_bias_gram == (conv, gram of its output): values and input
    gradients (including the Gram cotangent folding into dy)."""
    key = jax.random.PRNGKey(11)
    x = jax.random.normal(key, (2, 16, 24, 8), jnp.float32)
    w = jax.random.normal(
        jax.random.fold_in(key, 1), (3, 3, 8, 16), jnp.float32
    ) * 0.1
    b = jax.random.normal(jax.random.fold_in(key, 2), (16,), jnp.float32)

    from st3d.kernels.conv_pallas import conv3x3_bias_gram

    y, g = jax.jit(lambda xx: conv3x3_bias_gram(xx, w, b, True))(x)
    y_ref = _xla_conv(x, w, b)
    g_ref = jnp.einsum("bhwc,bhwd->bcd", y_ref, y_ref)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=1e-3, rtol=1e-4)

    tgt = jax.random.normal(jax.random.fold_in(key, 3), g.shape, jnp.float32)
    wgt = jax.random.normal(jax.random.fold_in(key, 4), y.shape, jnp.float32)

    def loss_fused(xx):
        y, g = conv3x3_bias_gram(xx, w, b, True)
        return jnp.sum(y * wgt) + jnp.mean((g - tgt) ** 2)

    def loss_sep(xx):
        y = _xla_conv(xx, w, b)
        g = jnp.einsum("bhwc,bhwd->bcd", y, y)
        return jnp.sum(y * wgt) + jnp.mean((g - tgt) ** 2)

    gf = jax.grad(loss_fused)(x)
    gs = jax.grad(loss_sep)(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gs),
                               atol=1e-3, rtol=1e-3)
    assert float(jnp.abs(gf).max()) > 0


@pytest.mark.parametrize("shape,cout", [
    ((2, 32, 16, 8), 16),     # multi-band, multi-view
    ((1, 48, 24, 8), 16),     # 3 bands (odd band count)
    ((1, 16, 16, 64), 64),    # conv1_2-like channels
])
def test_conv_relu_pool_fused_matches_separate(shape, cout):
    """conv3x3_bias_relu_pool == maxpool2x2(relu(conv)): pooled values,
    idx range, and input gradients vs the autodiff of the unfused chain
    (exact argmax routing through the saved quadrant map)."""
    from st3d.kernels.conv_pallas import conv3x3_bias_relu_pool

    def ref(x, w, b):
        y = _xla_conv(x, w, b)
        y = jnp.maximum(y, 0.0)
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )

    key = jax.random.PRNGKey(23)
    x = jax.random.normal(key, shape, jnp.float32)
    w = jax.random.normal(
        jax.random.fold_in(key, 1), (3, 3, shape[3], cout), jnp.float32
    ) * 0.1
    b = jax.random.normal(jax.random.fold_in(key, 2), (cout,), jnp.float32)

    p, idx = jax.jit(lambda xx: conv3x3_bias_relu_pool(xx, w, b, True))(x)
    pref = ref(x, w, b)
    np.testing.assert_allclose(np.asarray(p), np.asarray(pref),
                               atol=1e-5, rtol=1e-5)
    assert set(np.unique(np.asarray(idx))) <= {0.0, 1.0, 2.0, 3.0}

    wgt = jax.random.normal(jax.random.fold_in(key, 3), p.shape, jnp.float32)
    gf = jax.grad(lambda xx: jnp.sum(
        conv3x3_bias_relu_pool(xx, w, b, True)[0] * wgt))(x)
    gs = jax.grad(lambda xx: jnp.sum(ref(xx, w, b) * wgt))(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gs),
                               atol=1e-4, rtol=1e-4)
    assert float(jnp.abs(gf).max()) > 0


def test_conv_relu_fused_matches_separate():
    """conv3x3_bias_relu == relu(conv): values and input gradients (the
    backward mask comes from the saved output)."""
    from st3d.kernels.conv_pallas import conv3x3_bias_relu

    key = jax.random.PRNGKey(21)
    x = jax.random.normal(key, (2, 16, 24, 8), jnp.float32)
    w = jax.random.normal(
        jax.random.fold_in(key, 1), (3, 3, 8, 16), jnp.float32
    ) * 0.1
    b = jax.random.normal(jax.random.fold_in(key, 2), (16,), jnp.float32)

    z = jax.jit(lambda xx: conv3x3_bias_relu(xx, w, b, True))(x)
    z_ref = jnp.maximum(_xla_conv(x, w, b), 0.0)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               atol=1e-5, rtol=1e-5)

    wgt = jax.random.normal(jax.random.fold_in(key, 3), z.shape, jnp.float32)
    gf = jax.grad(lambda xx: jnp.sum(
        conv3x3_bias_relu(xx, w, b, True) * wgt))(x)
    gs = jax.grad(lambda xx: jnp.sum(
        jnp.maximum(_xla_conv(xx, w, b), 0.0) * wgt))(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gs),
                               atol=1e-4, rtol=1e-4)
    assert float(jnp.abs(gf).max()) > 0


@pytest.mark.parametrize("shape,cout", [
    ((2, 32, 16, 8), 16),     # multi-band, multi-view
    ((1, 48, 24, 8), 16),     # 3 bands (odd band count)
    ((1, 16, 16, 64), 64),    # conv1_2-like channels
])
def test_conv_packed_pool_matches_separate(shape, cout):
    """conv3x3_bias_relu_pool_packed (space-to-depth 2x2 conv, in-VMEM
    channel-group pool) == maxpool2x2(relu(conv)): pooled values, idx
    range, and input gradients vs autodiff of the unfused chain."""
    from st3d.kernels.conv_pallas import conv3x3_bias_relu_pool_packed

    def ref(x, w, b):
        y = jnp.maximum(_xla_conv(x, w, b), 0.0)
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )

    key = jax.random.PRNGKey(29)
    x = jax.random.normal(key, shape, jnp.float32)
    w = jax.random.normal(
        jax.random.fold_in(key, 1), (3, 3, shape[3], cout), jnp.float32
    ) * 0.1
    b = jax.random.normal(jax.random.fold_in(key, 2), (cout,), jnp.float32)

    p, idx = jax.jit(
        lambda xx: conv3x3_bias_relu_pool_packed(xx, w, b, True))(x)
    np.testing.assert_allclose(np.asarray(p), np.asarray(ref(x, w, b)),
                               atol=1e-5, rtol=1e-5)
    assert set(np.unique(np.asarray(idx))) <= {0.0, 1.0, 2.0, 3.0}

    wgt = jax.random.normal(jax.random.fold_in(key, 3), p.shape, jnp.float32)
    gf = jax.grad(lambda xx: jnp.sum(
        conv3x3_bias_relu_pool_packed(xx, w, b, True)[0] * wgt))(x)
    gs = jax.grad(lambda xx: jnp.sum(ref(xx, w, b) * wgt))(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gs),
                               atol=1e-4, rtol=1e-4)
    assert float(jnp.abs(gf).max()) > 0


def test_conv_packed_bwd_v2_bit_equal(monkeypatch):
    """The v2 packed backward (direct channel-range stores instead of the
    4x64-lane concat; env ST3D_PACKED_BWD=v2) is bit-identical to v1 —
    routing placement only, no arithmetic change."""
    from st3d.kernels.conv_pallas import conv3x3_bias_relu_pool_packed

    key = jax.random.PRNGKey(41)
    x = jax.random.normal(key, (2, 32, 24, 8), jnp.float32)
    w = jax.random.normal(
        jax.random.fold_in(key, 1), (3, 3, 8, 16), jnp.float32) * 0.1
    b = jax.random.normal(jax.random.fold_in(key, 2), (16,), jnp.float32)

    def loss(xx):
        return jnp.sum(conv3x3_bias_relu_pool_packed(xx, w, b, True)[0] ** 2)

    monkeypatch.delenv("ST3D_PACKED_BWD", raising=False)
    g1 = jax.grad(loss)(x)
    monkeypatch.setenv("ST3D_PACKED_BWD", "v2")
    g2 = jax.grad(loss)(x)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    assert float(jnp.abs(g1).max()) > 0


def test_conv_packed_pool_idx_first_max_wins():
    """Tie routing: with a delta kernel (only the center tap nonzero) the
    conv is an exact copy in BOTH the packed and unpacked accumulation
    orders (the other taps add exact zeros), so constructed ties are
    bit-exact and the argmax map must pick the FIRST max in window scan
    order — SelectAndScatter's probed semantics. (Comparing idx maps
    between the two kernels on random weights is NOT a valid test: their
    different f32 summation orders legitimately break near-ties
    differently.)"""
    from st3d.kernels.conv_pallas import (conv3x3_bias_relu_pool,
                                          conv3x3_bias_relu_pool_packed)

    c = 8
    w = jnp.zeros((3, 3, c, c), jnp.float32)
    w = w.at[1, 1].set(jnp.eye(c))              # conv == identity copy
    b = jnp.zeros((c,), jnp.float32)
    key = jax.random.PRNGKey(31)
    # Quantized values create frequent exact ties inside 2x2 windows.
    x = jnp.round(jax.random.uniform(key, (1, 16, 16, c)) * 3.0) / 2.0

    p2, i2 = jax.jit(
        lambda xx: conv3x3_bias_relu_pool_packed(xx, w, b, True))(x)
    p1, i1 = jax.jit(lambda xx: conv3x3_bias_relu_pool(xx, w, b, True))(x)

    xn = np.asarray(x)
    wins = xn.reshape(1, 8, 2, 8, 2, c).transpose(0, 1, 3, 2, 4, 5)
    wins = wins.reshape(1, 8, 8, 4, c)          # window scan order
    expect_p = np.maximum(wins.max(axis=3), 0.0)
    expect_i = wins.argmax(axis=3).astype(np.float32)  # np argmax = first
    np.testing.assert_allclose(np.asarray(p2), expect_p, atol=0, rtol=0)
    np.testing.assert_array_equal(np.asarray(i2), expect_i)
    np.testing.assert_array_equal(np.asarray(i1), expect_i)
    assert (expect_i > 0).any()                 # ties + non-ties exercised


def test_conv_packed_pool_bf16_interpret():
    """bf16 packed kernel in interpret mode: values match the bf16 XLA
    chain loosely (accumulation-order rounding) and the idx map stays in
    range — catches dtype regressions (e.g. in-kernel compares must run
    in f32: Mosaic has no bf16 vector compare on TPU)."""
    from st3d.kernels.conv_pallas import conv3x3_bias_relu_pool_packed

    key = jax.random.PRNGKey(37)
    x = jax.random.normal(key, (2, 32, 16, 8), jnp.bfloat16)
    w = (jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 8, 16),
                           jnp.float32) * 0.1).astype(jnp.bfloat16)
    b = jax.random.normal(jax.random.fold_in(key, 2), (16,), jnp.bfloat16)

    def ref(xx):
        y = jax.lax.conv_general_dilated(
            xx, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16) + b
        y = jnp.maximum(y, 0.0)
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    p, idx = jax.jit(
        lambda xx: conv3x3_bias_relu_pool_packed(xx, w, b, True))(x)
    assert p.dtype == jnp.bfloat16 and idx.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(p, np.float32), np.asarray(ref(x), np.float32),
        atol=0.05, rtol=0.05)
    assert set(np.unique(np.asarray(idx, np.float32))) <= {0., 1., 2., 3.}
    g = jax.grad(lambda xx: jnp.sum(conv3x3_bias_relu_pool_packed(
        xx, w, b, True)[0].astype(jnp.float32)))(x)
    assert g.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(g.astype(jnp.float32)).all())
    assert float(jnp.abs(g.astype(jnp.float32)).max()) > 0


@pytest.mark.parametrize("shape,cout", [
    ((1, 8, 8, 128), 128),     # group=1 (cin>=128): the halo1 path
    ((2, 12, 8, 256), 128),
])
def test_halo1_matches_padded(monkeypatch, shape, cout):
    """The group=1 halo-scratch kernel (no HBM pad) is bit-identical to
    the padded-operand kernel, fwd and input-grad."""
    key = jax.random.PRNGKey(11)
    x = jax.random.normal(key, shape, jnp.float32)
    w = jax.random.normal(
        jax.random.fold_in(key, 1), (3, 3, shape[3], cout), jnp.float32
    ) * 0.05
    b = jax.random.normal(jax.random.fold_in(key, 2), (cout,)) * 0.1

    def run(relu):
        def f(xx):
            out = conv_pallas.conv3x3_bias_relu(xx, w, b, True) if relu \
                else conv_pallas.conv3x3_bias(xx, w, b, True)
            return jnp.sum(out ** 2), out
        (loss, out), grad = jax.value_and_grad(f, has_aux=True)(x)
        return out, grad

    monkeypatch.delenv("ST3D_NO_HALO1", raising=False)
    y1, g1 = run(relu=False)
    monkeypatch.setenv("ST3D_NO_HALO1", "1")
    y0, g0 = run(relu=False)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))


def test_gram_halo_matches_padded(monkeypatch):
    """conv3x3_bias_gram's halo-scratch staging == the padded variant
    bit-for-bit (y, gram, and input grad through both cotangents)."""
    key = jax.random.PRNGKey(13)
    x = jax.random.normal(key, (2, 8, 8, 128), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1),
                          (3, 3, 128, 128), jnp.float32) * 0.05
    b = jax.random.normal(jax.random.fold_in(key, 2), (128,)) * 0.1

    def f(xx):
        y, g = conv_pallas.conv3x3_bias_gram(xx, w, b, True)
        return jnp.sum(y ** 2) + jnp.sum(g ** 2), (y, g)

    monkeypatch.delenv("ST3D_NO_HALO1", raising=False)
    (_, (y1, g1)), dx1 = jax.value_and_grad(f, has_aux=True)(x)
    monkeypatch.setenv("ST3D_NO_HALO1", "1")
    (_, (y0, g0)), dx0 = jax.value_and_grad(f, has_aux=True)(x)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))
    np.testing.assert_array_equal(np.asarray(dx0), np.asarray(dx1))
