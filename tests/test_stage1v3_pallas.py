"""Stage-1 v3 kernels (st3d/kernels/stage1v3_pallas.py): kernel == pure-jnp
reference == unfused XLA chain, values and gradients, plus the get_features
integration. Interpret mode on CPU; the real-TPU compile is covered by
scripts/tpu_smoke.py."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from st3d.kernels.stage1_pallas import (
    _conv1_2_ref,
    unpack_output5,
)
from st3d.kernels.stage1v3_pallas import (
    _conv1_1_v3_ref,
    conv1_1_packed_v3,
    conv1_2_packed_pool_v3,
    stage1_v3_supported,
)


def _xla_conv(x, w, b):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    ) + b


def _mats(key, cin, cout, scale=0.1):
    w = jax.random.normal(key, (3, 3, cin, cout), jnp.float32) * scale
    b = jax.random.normal(jax.random.fold_in(key, 99), (cout,),
                          jnp.float32) * 0.1
    return w, b


@pytest.mark.parametrize("shape", [(2, 16, 24), (1, 32, 16), (1, 48, 48)])
def test_v3_kernels_match_reference_and_xla(shape):
    b_, h, wi = shape
    key = jax.random.PRNGKey(3)
    x = jax.random.uniform(key, (b_, h, wi, 3), jnp.float32)
    w1, b1 = _mats(jax.random.fold_in(key, 1), 3, 64, 0.2)
    w2, b2 = _mats(jax.random.fold_in(key, 2), 64, 64, 0.05)
    assert stage1_v3_supported(x)

    # conv1_1 kernel == reference == unpacked relu(conv).
    z5r, g64r = _conv1_1_v3_ref(x, w1, b1)
    z5, g64 = jax.jit(lambda xx: conv1_1_packed_v3(xx, w1, b1, True))(x)
    np.testing.assert_allclose(np.asarray(z5), np.asarray(z5r),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g64), np.asarray(g64r),
                               atol=1e-2, rtol=1e-4)
    y1 = jnp.maximum(_xla_conv(x, w1, b1), 0.0)
    np.testing.assert_allclose(np.asarray(unpack_output5(z5)),
                               np.asarray(y1), atol=1e-4, rtol=1e-4)

    # g64 == Gram of the pre-relu tap.
    tap = _xla_conv(x, w1, b1)
    g_ref = jnp.einsum("bhwc,bhwd->bcd", tap, tap)
    np.testing.assert_allclose(np.asarray(g64), np.asarray(g_ref),
                               atol=1e-2, rtol=1e-4)

    # conv1_2 kernel == v2 reference == maxpool(relu(conv)).
    p, idx = jax.jit(
        lambda zz: conv1_2_packed_pool_v3(zz, w2, b2, True))(z5)
    np.testing.assert_allclose(np.asarray(p),
                               np.asarray(_conv1_2_ref(z5r, w2, b2)),
                               atol=1e-4, rtol=1e-4)
    pooled_ref = jax.lax.reduce_window(
        jnp.maximum(_xla_conv(y1, w2, b2), 0.0), -jnp.inf, jax.lax.max,
        (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
    )
    np.testing.assert_allclose(np.asarray(p), np.asarray(pooled_ref),
                               atol=1e-4, rtol=1e-4)
    assert set(np.unique(np.asarray(idx))) <= {0.0, 1.0, 2.0, 3.0}


@pytest.mark.parametrize("shape", [(2, 16, 24), (1, 32, 16)])
def test_v3_conv1_2_bwd_matches_reference_autodiff(shape):
    """The matmul-fold dz5 backward == autodiff of the jnp reference under
    an arbitrary cotangent (f32: no pool ties, so idx routing and the
    reference argmax agree exactly)."""
    b_, h, wi = shape
    key = jax.random.PRNGKey(17)
    x = jax.random.uniform(key, (b_, h, wi, 3), jnp.float32)
    w1, b1 = _mats(jax.random.fold_in(key, 1), 3, 64, 0.2)
    w2, b2 = _mats(jax.random.fold_in(key, 2), 64, 64, 0.05)
    z5, _ = _conv1_1_v3_ref(x, w1, b1)
    ct = jax.random.normal(jax.random.fold_in(key, 3),
                           (b_, h // 2, wi // 2, 64), jnp.float32)

    def via_kernel(zz):
        p, _ = conv1_2_packed_pool_v3(zz, w2, b2, True)
        return jnp.sum(p * ct)

    def via_ref(zz):
        return jnp.sum(_conv1_2_ref(zz, w2, b2) * ct)

    gk = jax.grad(via_kernel)(z5)
    gr = jax.grad(via_ref)(z5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               atol=1e-4, rtol=1e-4)
    assert float(jnp.abs(gk).max()) > 0


@pytest.mark.parametrize("shape", [(2, 16, 24), (1, 32, 16)])
def test_v3_conv1_1_bwd_matches_reference_autodiff(shape):
    """The recompute-based dx backward handles both cotangents (dz5, dG64)
    == autodiff of the jnp reference."""
    b_, h, wi = shape
    key = jax.random.PRNGKey(23)
    x = jax.random.uniform(key, (b_, h, wi, 3), jnp.float32)
    w1, b1 = _mats(jax.random.fold_in(key, 1), 3, 64, 0.2)
    z5r, g64r = _conv1_1_v3_ref(x, w1, b1)
    ct_z = jax.random.normal(jax.random.fold_in(key, 2), z5r.shape,
                             jnp.float32)
    ct_g = jax.random.normal(jax.random.fold_in(key, 3), g64r.shape,
                             jnp.float32) * 1e-3

    def via_kernel(xx):
        z5, g64 = conv1_1_packed_v3(xx, w1, b1, True)
        return jnp.sum(z5 * ct_z) + jnp.sum(g64 * ct_g)

    def via_ref(xx):
        z5, g64 = _conv1_1_v3_ref(xx, w1, b1)
        return jnp.sum(z5 * ct_z) + jnp.sum(g64 * ct_g)

    gk = jax.grad(via_kernel)(x)
    gr = jax.grad(via_ref)(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               atol=1e-3, rtol=1e-3)
    assert float(jnp.abs(gk).max()) > 0


def test_v3_bf16_interpret():
    """bf16 end-to-end through both v3 kernels (values vs the bf16 jnp
    reference; Mosaic bf16 rules don't apply in interpret mode but dtype
    plumbing does)."""
    key = jax.random.PRNGKey(31)
    x = jax.random.uniform(key, (1, 16, 16, 3), jnp.bfloat16)
    w1, b1 = _mats(jax.random.fold_in(key, 1), 3, 64, 0.2)
    w2, b2 = _mats(jax.random.fold_in(key, 2), 64, 64, 0.05)
    z5, g64 = conv1_1_packed_v3(x, w1, b1, True)
    assert z5.dtype == jnp.bfloat16 and g64.dtype == jnp.float32
    z5r, g64r = _conv1_1_v3_ref(x, w1, b1)
    np.testing.assert_allclose(
        np.asarray(z5, np.float32), np.asarray(z5r, np.float32),
        atol=1e-2, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(g64), np.asarray(g64r),
                               atol=1.0, rtol=1e-2)
    p, idx = conv1_2_packed_pool_v3(z5, w2, b2, True)
    pr = _conv1_2_ref(z5r, w2, b2)
    np.testing.assert_allclose(
        np.asarray(p, np.float32), np.asarray(pr, np.float32),
        atol=1e-2, rtol=1e-2)


def test_v3_get_features_matches_default(monkeypatch):
    """get_features with the v3 stage-1 path engaged (gates monkeypatched
    for CPU interpret mode) returns the same taps, conv1_1 Gram, and input
    gradients as the default XLA path."""
    import st3d.kernels.stage1v3_pallas as s3
    import st3d.models.vgg as vggmod
    from st3d.models.vgg import get_features, init_random_vgg19

    model = init_random_vgg19(0)
    x = jnp.asarray(np.random.RandomState(5).rand(2, 32, 32, 3),
                    jnp.float32)

    feats_ref = get_features(x, model, layout="NHWC", input_layout="NHWC",
                             gram1=True)

    tgt = jnp.asarray(
        np.random.RandomState(7).rand(
            *feats_ref["conv1_1:gram"].shape), jnp.float32)

    def loss(xx):
        f = get_features(xx, model, layout="NHWC", input_layout="NHWC",
                         gram1=True)
        return (jnp.mean((f["conv1_1:gram"] - tgt) ** 2)
                + jnp.mean(f["conv5_1"].astype(jnp.float32) ** 2))

    g_ref = jax.grad(loss)(x)   # BEFORE the gates are patched

    monkeypatch.setenv("ST3D_STAGE1", "v3")   # v3 is opt-in since r5
    monkeypatch.setattr(vggmod, "_pallas_conv_ok", lambda _x: True)
    monkeypatch.setattr(
        vggmod, "_pallas_convs", lambda: frozenset(range(0, 2))
    )
    monkeypatch.setattr(
        s3, "conv1_1_packed_v3",
        lambda xx, w, b, interpret=False: conv1_1_packed_v3(
            xx, w, b, True),
    )
    monkeypatch.setattr(
        s3, "conv1_2_packed_pool_v3",
        lambda zz, w, b, interpret=False: conv1_2_packed_pool_v3(
            zz, w, b, True),
    )
    feats_v3 = get_features(x, model, layout="NHWC", input_layout="NHWC",
                            gram1=True)

    assert set(feats_v3) == set(feats_ref)
    for k in feats_ref:
        np.testing.assert_allclose(
            np.asarray(feats_v3[k]), np.asarray(feats_ref[k]),
            atol=5e-3, rtol=5e-4, err_msg=k,
        )

    g_v3 = jax.grad(loss)(x)
    np.testing.assert_allclose(np.asarray(g_v3), np.asarray(g_ref),
                               atol=1e-3, rtol=2e-3)


def test_v3_supported_gates():
    """Odd sizes and too-small windows fall back; bench shapes pass."""
    x_odd = jnp.zeros((1, 17, 16, 3))
    assert not stage1_v3_supported(x_odd)
    x_tiny = jnp.zeros((1, 4, 4, 3))
    assert not stage1_v3_supported(x_tiny)
    x_ok = jnp.zeros((4, 512, 512, 3), jnp.bfloat16)
    assert stage1_v3_supported(x_ok)
    assert stage1_v3_supported(x_ok, dtype=jnp.float32)
    x_768 = jnp.zeros((4, 768, 768, 3), jnp.bfloat16)
    assert stage1_v3_supported(x_768)


def test_v3_fallback_small_shapes_grad():
    """Below the banding gate the public entry points return the jnp
    reference (values and grads still correct)."""
    key = jax.random.PRNGKey(5)
    x = jax.random.uniform(key, (1, 6, 6, 3), jnp.float32)
    w1, b1 = _mats(jax.random.fold_in(key, 1), 3, 64, 0.2)
    assert not stage1_v3_supported(x)
    z5, g64 = conv1_1_packed_v3(x, w1, b1)
    z5r, g64r = _conv1_1_v3_ref(x, w1, b1)
    np.testing.assert_allclose(np.asarray(z5), np.asarray(z5r))
    np.testing.assert_allclose(np.asarray(g64), np.asarray(g64r))
    g = jax.grad(lambda xx: jnp.sum(conv1_1_packed_v3(xx, w1, b1)[1]))(x)
    gr = jax.grad(lambda xx: jnp.sum(_conv1_1_v3_ref(xx, w1, b1)[1]))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               atol=1e-4, rtol=1e-4)
