"""Phase-aligned packed stage 1 (st3d/kernels/stage1_pallas.py): kernel ==
pure-jnp reference == unfused XLA chain, values and gradients, plus the
get_features integration (env ST3D_STAGE1_V2). Interpret mode on CPU; the
real-TPU compile is covered by scripts/tpu_smoke.py."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from st3d.kernels.stage1_pallas import (
    _conv1_1_packed_ref,
    _conv1_2_ref,
    conv1_1_packed,
    conv1_2_packed_pool,
    fold_gram48,
    pack_input5,
    quad_patches_ref,
    stage1_supported,
    unpack_output5,
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
def test_kernels_match_reference_and_xla(shape):
    b_, h, wi = shape
    key = jax.random.PRNGKey(3)
    x = jax.random.uniform(key, (b_, h, wi, 3), jnp.float32)
    w1, b1 = _mats(jax.random.fold_in(key, 1), 3, 64, 0.2)
    w2, b2 = _mats(jax.random.fold_in(key, 2), 64, 64, 0.05)
    assert stage1_supported(x)

    # conv1_1 kernel == reference == unpacked relu(conv).
    z5r, g48r, s48r = _conv1_1_packed_ref(x, w1, b1)
    z5, g48, s48 = jax.jit(lambda xx: conv1_1_packed(xx, w1, b1, True))(x)
    np.testing.assert_allclose(np.asarray(z5), np.asarray(z5r),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g48), np.asarray(g48r),
                               atol=1e-2, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s48), np.asarray(s48r),
                               atol=1e-3, rtol=1e-4)
    y1 = jnp.maximum(_xla_conv(x, w1, b1), 0.0)
    np.testing.assert_allclose(np.asarray(unpack_output5(z5)),
                               np.asarray(y1), atol=1e-4, rtol=1e-4)

    # Gram fold == gram of the pre-relu tap.
    tap = _xla_conv(x, w1, b1)
    g_ref = jnp.einsum("bhwc,bhwd->bcd", tap, tap)
    np.testing.assert_allclose(
        np.asarray(fold_gram48(g48, s48, w1, b1, h * wi)),
        np.asarray(g_ref), atol=1e-2, rtol=1e-4,
    )

    # conv1_2 kernel == reference == maxpool(relu(conv)).
    p, idx = jax.jit(lambda zz: conv1_2_packed_pool(zz, w2, b2, True))(z5)
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

    # Full-chain input gradient (both custom VJPs + gram fold) vs XLA.
    def loss_k(xx):
        z5, g48, s48 = conv1_1_packed(xx, w1, b1, True)
        pv, _ = conv1_2_packed_pool(z5, w2, b2, True)
        g = fold_gram48(g48, s48, w1, b1, h * wi)
        return jnp.sum(pv ** 2) + 1e-6 * jnp.sum(g ** 2)

    def loss_x(xx):
        t = _xla_conv(xx, w1, b1)
        g = jnp.einsum("bhwc,bhwd->bcd", t, t)
        y2 = jnp.maximum(_xla_conv(jnp.maximum(t, 0.0), w2, b2), 0.0)
        pv = jax.lax.reduce_window(y2, -jnp.inf, jax.lax.max,
                                   (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        return jnp.sum(pv ** 2) + 1e-6 * jnp.sum(g ** 2)

    gk = jax.grad(loss_k)(x)
    gx = jax.grad(loss_x)(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx),
                               atol=2e-2, rtol=2e-3)
    assert float(jnp.abs(gk).max()) > 0


@pytest.mark.parametrize("shape", [(2, 16, 24), (1, 32, 16)])
def test_conv1_2_bwd_kernel_matches_reference_autodiff(shape):
    """The dz5-emitting backward kernel == autodiff of the jnp reference
    under an arbitrary cotangent (f32: no pool ties, so the idx routing
    and the reference argmax agree exactly)."""
    from st3d.kernels.stage1_pallas import _conv1_1_packed_ref

    b_, h, wi = shape
    key = jax.random.PRNGKey(17)
    x = jax.random.uniform(key, (b_, h, wi, 3), jnp.float32)
    w1, b1 = _mats(jax.random.fold_in(key, 1), 3, 64, 0.2)
    w2, b2 = _mats(jax.random.fold_in(key, 2), 64, 64, 0.05)
    z5, _, _ = _conv1_1_packed_ref(x, w1, b1)
    ct = jax.random.normal(jax.random.fold_in(key, 3),
                           (b_, h // 2, wi // 2, 64), jnp.float32)

    def via_kernel(zz):
        p, _ = conv1_2_packed_pool(zz, w2, b2, True)
        return jnp.sum(p * ct)

    def via_ref(zz):
        return jnp.sum(_conv1_2_ref(zz, w2, b2) * ct)

    gk = jax.grad(via_kernel)(z5)
    gr = jax.grad(via_ref)(z5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               atol=1e-4, rtol=1e-4)
    assert float(jnp.abs(gk).max()) > 0


@pytest.mark.parametrize("shape", [(2, 16, 24), (1, 32, 16)])
def test_conv1_1_bwd_kernel_matches_reference_autodiff(shape):
    """The dx-emitting backward kernel handles all three cotangents (dz5,
    dG48, ds48) == autodiff of the jnp reference."""
    from st3d.kernels.stage1_pallas import _conv1_1_packed_ref

    b_, h, wi = shape
    key = jax.random.PRNGKey(23)
    x = jax.random.uniform(key, (b_, h, wi, 3), jnp.float32)
    w1, b1 = _mats(jax.random.fold_in(key, 1), 3, 64, 0.2)
    z5r, g48r, s48r = _conv1_1_packed_ref(x, w1, b1)
    ct_z = jax.random.normal(jax.random.fold_in(key, 2), z5r.shape,
                             jnp.float32)
    ct_g = jax.random.normal(jax.random.fold_in(key, 3), g48r.shape,
                             jnp.float32) * 1e-3
    ct_s = jax.random.normal(jax.random.fold_in(key, 4), s48r.shape,
                             jnp.float32) * 1e-2

    def via_kernel(xx):
        z5, g48, s48 = conv1_1_packed(xx, w1, b1, True)
        return (jnp.sum(z5 * ct_z) + jnp.sum(g48 * ct_g)
                + jnp.sum(s48 * ct_s))

    def via_ref(xx):
        z5, g48, s48 = _conv1_1_packed_ref(xx, w1, b1)
        return (jnp.sum(z5 * ct_z) + jnp.sum(g48 * ct_g)
                + jnp.sum(s48 * ct_s))

    # interpret-mode kernel bwd is exercised (hp - bh - 4 >= 0 at these
    # shapes — the fallback branch would be jnp anyway).
    gk = jax.grad(via_kernel)(x)
    gr = jax.grad(via_ref)(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               atol=1e-3, rtol=1e-3)
    assert float(jnp.abs(gk).max()) > 0


def test_quad_patches_zero_borders():
    """Out-of-image phases are exact zeros — the SAME-padding contract."""
    x = jnp.ones((1, 8, 8, 3), jnp.float32)
    p = np.asarray(quad_patches_ref(pack_input5(x)))
    # K layout: (rp*4 + cp)*cin + c -> rp=0 spans k in [0, 12).
    # rp=0 (image row -1) slots zero on the first packed row only.
    assert (p[0, 0, :, 0:12] == 0).all()
    assert (p[0, 1:, :, 0:12] != 0).any()
    # rp=3 (image row H) slots zero on the last packed row.
    assert (p[0, -1, :, 36:48] == 0).all()
    # cp=0 / cp=3 zero the first / last packed column of their slots.
    for rp in range(1, 3):
        assert (p[0, :, 0, (rp * 4 + 0) * 3:(rp * 4 + 1) * 3] == 0).all()
        assert (p[0, :, -1, (rp * 4 + 3) * 3:(rp * 4 + 4) * 3] == 0).all()


def test_get_features_stage1_v2_matches_default(monkeypatch):
    """get_features with the stage-1 v2 path engaged (gates monkeypatched
    for CPU interpret mode) returns the same taps, conv1_1 Gram, and input
    gradients as the default XLA path."""
    import st3d.kernels.stage1_pallas as s1
    import st3d.models.vgg as vggmod
    from st3d.models.vgg import get_features, init_random_vgg19

    model = init_random_vgg19(0)
    x = jnp.asarray(np.random.RandomState(5).rand(2, 32, 32, 3), jnp.float32)

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

    monkeypatch.setenv("ST3D_STAGE1_V2", "1")
    monkeypatch.setenv("ST3D_STAGE1", "v2")   # explicit; v2 is the default
    monkeypatch.setattr(vggmod, "_pallas_conv_ok", lambda _x: True)
    monkeypatch.setattr(
        vggmod, "_pallas_convs", lambda: frozenset(range(0, 2))
    )
    # Interpret-mode kernels (CPU); conv2_1.. fall back to XLA (the
    # _pallas_convs patch keeps them off the TPU-only band kernels).
    monkeypatch.setattr(
        s1, "conv1_1_packed",
        lambda xx, w, b, interpret=False: conv1_1_packed(xx, w, b, True),
    )
    monkeypatch.setattr(
        s1, "conv1_2_packed_pool",
        lambda zz, w, b, interpret=False: conv1_2_packed_pool(
            zz, w, b, True),
    )
    feats_v2 = get_features(x, model, layout="NHWC", input_layout="NHWC",
                            gram1=True)

    assert set(feats_v2) == set(feats_ref)
    for k in feats_ref:
        np.testing.assert_allclose(
            np.asarray(feats_v2[k]), np.asarray(feats_ref[k]),
            atol=5e-3, rtol=5e-4, err_msg=k,
        )

    g_v2 = jax.grad(loss)(x)
    np.testing.assert_allclose(np.asarray(g_v2), np.asarray(g_ref),
                               atol=1e-3, rtol=2e-3)


def test_stage1_bf16_interpret():
    """bf16 end-to-end smoke: dtypes carried, values loosely match the
    bf16 XLA chain, gradient finite and bf16."""
    key = jax.random.PRNGKey(11)
    x = jax.random.uniform(key, (1, 16, 16, 3), jnp.bfloat16)
    w1 = (jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 3, 64),
                            jnp.float32) * 0.2).astype(jnp.bfloat16)
    b1 = jnp.zeros((64,), jnp.bfloat16)
    w2 = (jax.random.normal(jax.random.fold_in(key, 2), (3, 3, 64, 64),
                            jnp.float32) * 0.05).astype(jnp.bfloat16)
    b2 = jnp.zeros((64,), jnp.bfloat16)

    z5, g48, s48 = conv1_1_packed(x, w1, b1, True)
    assert z5.dtype == jnp.bfloat16 and g48.dtype == jnp.float32
    p, idx = conv1_2_packed_pool(z5, w2, b2, True)
    assert p.dtype == jnp.bfloat16

    ref = jax.lax.reduce_window(
        jnp.maximum(_xla_conv(
            jnp.maximum(_xla_conv(x, w1, b1), 0), w2, b2), 0),
        -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    np.testing.assert_allclose(np.asarray(p, np.float32),
                               np.asarray(ref, np.float32),
                               atol=0.05, rtol=0.05)
    g = jax.grad(lambda xx: jnp.sum(conv1_2_packed_pool(
        conv1_1_packed(xx, w1, b1, True)[0], w2, b2, True
    )[0].astype(jnp.float32)))(x)
    assert g.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(g.astype(jnp.float32)).all())


def test_band_rows_packed_itemsize_aware():
    """VMEM band sizing scales with the compute dtype's byte width
    (CLAUDE.md: a fixed block that fits the bench shape WILL OOM at other
    dtypes) — f32 halves the band where the budget binds."""
    from st3d.kernels.stage1_pallas import _band_rows_packed

    # Bench-like conv1_2 shape: hp=wp=256, kin=16*64=1024.
    assert _band_rows_packed(256, 256, 1024, 2) == 8       # bf16
    assert _band_rows_packed(256, 256, 1024, 4) == 4       # f32: half
    # Where the budget doesn't bind, itemsize changes nothing.
    assert (_band_rows_packed(16, 12, 1024, 2)
            == _band_rows_packed(16, 12, 1024, 4))
    # The result always divides hp (grid invariant).
    for hp in (10, 24, 256):
        for item in (2, 4):
            assert hp % _band_rows_packed(hp, 128, 1024, item) == 0


def test_bh1_shapes_gated_and_grads_fall_back():
    """Prime half-heights force bh == 1, where the backward kernels'
    first/last-band boundary staging is invalid: stage1_supported must
    reject the shape, and the custom-VJP entry points must still return
    correct gradients via the jnp reference fallback."""
    key = jax.random.PRNGKey(29)
    x = jax.random.uniform(key, (1, 10, 16, 3), jnp.float32)  # hp=5 prime
    w1, b1 = _mats(jax.random.fold_in(key, 1), 3, 64, 0.2)
    w2, b2 = _mats(jax.random.fold_in(key, 2), 64, 64, 0.05)
    assert not stage1_supported(x)

    # conv1_1: kernel-forward + fallback-backward == reference autodiff.
    z5r, g48r, s48r = _conv1_1_packed_ref(x, w1, b1)
    ct_z = jax.random.normal(jax.random.fold_in(key, 3), z5r.shape,
                             jnp.float32)
    ct_g = jax.random.normal(jax.random.fold_in(key, 4), g48r.shape,
                             jnp.float32) * 1e-3

    def via_kernel(xx):
        z5, g48, _ = conv1_1_packed(xx, w1, b1, True)
        return jnp.sum(z5 * ct_z) + jnp.sum(g48 * ct_g)

    def via_ref(xx):
        z5, g48, _ = _conv1_1_packed_ref(xx, w1, b1)
        return jnp.sum(z5 * ct_z) + jnp.sum(g48 * ct_g)

    np.testing.assert_allclose(
        np.asarray(jax.grad(via_kernel)(x)),
        np.asarray(jax.grad(via_ref)(x)), atol=1e-3, rtol=1e-3,
    )

    # conv1_2: same at the packed-input level.
    ct_p = jax.random.normal(jax.random.fold_in(key, 5),
                             (1, 5, 8, 64), jnp.float32)
    gk = jax.grad(lambda zz: jnp.sum(
        conv1_2_packed_pool(zz, w2, b2, True)[0] * ct_p))(z5r)
    gr = jax.grad(lambda zz: jnp.sum(
        _conv1_2_ref(zz, w2, b2) * ct_p))(z5r)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               atol=1e-4, rtol=1e-4)
    assert float(jnp.abs(gk).max()) > 0


def test_pack_weights_tile_is_exact_k_permutation():
    """pack_weights_tile + the TILE_SLOTS-ordered patch axis is the SAME
    linear map as pack_weights_phase + quad_patches_ref's K order: the
    per-rp cp permutation of the patches cancels against the permuted
    weight rows (pure-jnp check, no kernel)."""
    from st3d.kernels.stage1_pallas import (
        TILE_SLOTS,
        _conv1_1_packed_ref,
        pack_weights_tile,
        quad_patches_ref,
    )
    from st3d.kernels.stage1_pallas import pack_weights_phase

    key = jax.random.PRNGKey(37)
    x = jax.random.uniform(key, (1, 16, 24, 3), jnp.float32)
    w1, b1 = _mats(jax.random.fold_in(key, 1), 3, 64, 0.2)
    w2, b2 = _mats(jax.random.fold_in(key, 2), 64, 64, 0.05)
    z5 = _conv1_1_packed_ref(x, w1, b1)[0]
    p_old = quad_patches_ref(z5)                       # (B, hp, wp, 1024)
    cin = 64
    p_tile = (p_old.reshape(p_old.shape[:3] + (4, 4, cin))
              [..., TILE_SLOTS, :].reshape(p_old.shape))
    wq_old, bq_old = pack_weights_phase(w2, b2)
    wq_tile, bq_tile = pack_weights_tile(w2, b2)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("bhwk,kn->bhwn", p_old, wq_old)),
        np.asarray(jnp.einsum("bhwk,kn->bhwn", p_tile, wq_tile)),
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(bq_old), np.asarray(bq_tile))


def test_conv1_2_tile_staging_matches_masked_bf16(monkeypatch):
    """The bf16 tile-staged kernel (8 aligned full-tile stores, permuted
    K absorbed by pack_weights_tile) == the masked-staging kernel up to
    MXU/f32 reassociation: pooled values within ~1 bf16 ULP, pool idx
    routing identical except where reassociation flipped a tie."""
    from st3d.kernels.stage1_pallas import _conv1_1_packed_ref

    key = jax.random.PRNGKey(31)
    x = jax.random.uniform(key, (2, 24, 16, 3), jnp.float32)
    w1, b1 = _mats(jax.random.fold_in(key, 1), 3, 64, 0.2)
    w2, b2 = _mats(jax.random.fold_in(key, 2), 64, 64, 0.05)
    z5 = _conv1_1_packed_ref(x, w1, b1)[0].astype(jnp.bfloat16)
    w2d, b2d = w2.astype(jnp.bfloat16), b2.astype(jnp.bfloat16)

    monkeypatch.delenv("ST3D_NO_S1_WIDE", raising=False)
    p_t, i_t = jax.jit(
        lambda zz: conv1_2_packed_pool(zz, w2d, b2d, True))(z5)
    monkeypatch.setenv("ST3D_NO_S1_WIDE", "1")
    p_m, i_m = jax.jit(
        lambda zz: conv1_2_packed_pool(zz, w2d, b2d, True),
    ).lower(z5).compile()(z5)  # fresh lowering: env read at trace time

    pt = np.asarray(p_t, np.float32)
    pm = np.asarray(p_m, np.float32)
    scale = np.abs(pm).max()
    np.testing.assert_allclose(pt, pm, atol=0.01 * scale, rtol=0.01)
    idx_same = np.mean(np.asarray(i_t) == np.asarray(i_m))
    assert idx_same > 0.995, idx_same
