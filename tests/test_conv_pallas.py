"""Pallas 3x3 conv kernel vs lax.conv_general_dilated (interpret mode on
CPU; the TPU path compiles the same kernel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
