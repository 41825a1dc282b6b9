"""VGG-19 parity vs torch CPU (SURVEY.md §4 item 5).

torchvision isn't installed here, so the torch side is a hand-built
Sequential with the exact VGG-19 "features" layout, loaded with the SAME
weights as the JAX side — this validates the conv stack, pooling, tap
indices and pre-ReLU semantics independent of pretrained weight values.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from st3d.models.vgg import (
    VGG19_CFG,
    TAP_CONV_INDEX,
    get_features,
    get_vgg,
    init_random_vgg19,
    load_vgg19_npz,
)

torch = pytest.importorskip("torch")


def build_torch_vgg19_features(model):
    """nn.Sequential replica of torchvision vgg19().features with st3d
    weights copied in (HWIO -> OIHW)."""
    import torch.nn as nn

    layers = []
    c_in = 3
    conv_i = 0
    for v in VGG19_CFG:
        if v == "M":
            layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
            continue
        conv = nn.Conv2d(c_in, int(v), kernel_size=3, padding=1)
        w = np.asarray(model.kernels[conv_i])  # HWIO
        b = np.asarray(model.biases[conv_i])
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(np.transpose(w, (3, 2, 0, 1))))
            conv.bias.copy_(torch.from_numpy(b))
        layers.append(conv)
        layers.append(nn.ReLU(inplace=False))
        c_in = int(v)
        conv_i += 1
    return nn.Sequential(*layers)


def torch_get_features(image, seq):
    """The reference's get_features traversal (style_transfer.py:10-27):
    tap right after the module at the named torchvision indices."""
    layers = {
        "0": "conv1_1", "5": "conv2_1", "10": "conv3_1",
        "19": "conv4_1", "21": "conv4_2", "28": "conv5_1",
    }
    features = {}
    x = image
    for name, layer in seq._modules.items():
        x = layer(x)
        if name in layers:
            features[layers[name]] = x
    return features


def test_sequential_indices_match_torchvision_layout():
    model = init_random_vgg19(seed=0)
    seq = build_torch_vgg19_features(model)
    # torchvision vgg19 features: convs at 0,2,5,7,10,12,14,16,19,21,...
    import torch.nn as nn

    conv_idx = [i for i, m in enumerate(seq) if isinstance(m, nn.Conv2d)]
    assert conv_idx[:9] == [0, 2, 5, 7, 10, 12, 14, 16, 19]
    assert conv_idx[9] == 21 and conv_idx[12] == 28
    assert len(conv_idx) == 16
    # Our named taps sit at the right torchvision indices.
    for name, ci in TAP_CONV_INDEX.items():
        assert isinstance(seq[conv_idx[ci]], nn.Conv2d), name


@pytest.mark.parametrize("hw", [32, 67])  # odd size exercises floor pooling
def test_features_match_torch(hw):
    model = init_random_vgg19(seed=1)
    seq = build_torch_vgg19_features(model).eval()
    rng = np.random.RandomState(0)
    img = rng.rand(2, 3, hw, hw).astype(np.float32)

    with torch.no_grad():
        want = torch_get_features(torch.from_numpy(img), seq)
    got = get_features(jnp.asarray(img), model)

    assert set(got) == set(want)
    for name in want:
        w = want[name].numpy()
        g = np.asarray(got[name])
        assert g.shape == w.shape, name
        err = np.abs(g - w).max()
        scale = max(np.abs(w).max(), 1.0)
        assert err / scale < 1e-4, f"{name}: {err} vs scale {scale}"


def test_get_vgg_fallback_warns_and_is_deterministic():
    import warnings

    import st3d.models.vgg as vggmod

    vggmod._warned_random = False
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        m1 = get_vgg()
    assert any("pretrained" in str(r.message).lower() or
               "random" in str(r.message).lower() for r in rec)
    m2 = init_random_vgg19()
    for a, b in zip(m1.kernels, m2.kernels):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_npz_roundtrip(tmp_path):
    model = init_random_vgg19(seed=2)
    arrays = {}
    for i, (k, b) in enumerate(zip(model.kernels, model.biases)):
        arrays[f"conv{i}_kernel"] = np.asarray(k)
        arrays[f"conv{i}_bias"] = np.asarray(b)
    p = tmp_path / "w.npz"
    np.savez(p, **arrays)
    loaded = load_vgg19_npz(str(p))
    img = jnp.asarray(np.random.RandomState(3).rand(1, 3, 32, 32), jnp.float32)
    a = get_features(img, model)["conv5_1"]
    b = get_features(img, loaded)["conv5_1"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_weights_runbook_resolution_order(tmp_path, monkeypatch):
    """The VGG-weights runbook (README 'VGG-19 weights'): an externally
    produced vgg19_imagenet.npz drops in through every resolution channel
    — explicit arg beats $ST3D_VGG_WEIGHTS beats <repo>/weights/ — and a
    malformed npz / missing explicit path fail loudly (VERDICT r4 item 6)."""
    import pytest

    import st3d.models.vgg as vggmod

    def fake_npz(path, seed):
        model = init_random_vgg19(seed=seed)
        arrays = {}
        for i, (k, b) in enumerate(zip(model.kernels, model.biases)):
            arrays[f"conv{i}_kernel"] = np.asarray(k)
            arrays[f"conv{i}_bias"] = np.asarray(b)
        np.savez(path, **arrays)
        return model

    m_arg = fake_npz(tmp_path / "arg.npz", seed=11)
    m_env = fake_npz(tmp_path / "env.npz", seed=12)

    # env alone
    monkeypatch.setenv("ST3D_VGG_WEIGHTS", str(tmp_path / "env.npz"))
    got = get_vgg()
    np.testing.assert_array_equal(np.asarray(got.kernels[0]),
                                  np.asarray(m_env.kernels[0]))
    # explicit arg beats env
    got = get_vgg(str(tmp_path / "arg.npz"))
    np.testing.assert_array_equal(np.asarray(got.kernels[0]),
                                  np.asarray(m_arg.kernels[0]))
    # explicitly requested but missing -> hard error (no silent fallback)
    with pytest.raises(FileNotFoundError):
        get_vgg(str(tmp_path / "nope.npz"))
    # malformed shapes -> loud error
    bad = {f"conv{i}_kernel": np.zeros((3, 3, 1, 1), np.float32)
           for i in range(16)}
    bad.update({f"conv{i}_bias": np.zeros((1,), np.float32)
                for i in range(16)})
    np.savez(tmp_path / "bad.npz", **bad)
    with pytest.raises(ValueError):
        get_vgg(str(tmp_path / "bad.npz"))
    # and the features from a dropped-in npz match the in-memory weights
    monkeypatch.delenv("ST3D_VGG_WEIGHTS")
    img = jnp.asarray(np.random.RandomState(7).rand(1, 3, 32, 32),
                      jnp.float32)
    a = get_features(img, m_arg)["conv4_2"]
    b = get_features(img, get_vgg(str(tmp_path / "arg.npz")))["conv4_2"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    vggmod._warned_random = True  # don't let later tests double-warn


def test_algebraic_gram1_matches_tap_gram():
    """gram1=True: the algebraic conv1_1 Gram (from im2col patches) equals
    gramming the exported tap — values AND input gradients."""
    import jax

    from st3d.ops.losses import gram_matrix_nhwc

    model = init_random_vgg19(0)
    key = jnp.asarray(np.random.RandomState(5).rand(2, 3, 32, 32), jnp.float32)

    feats_ref = get_features(key, model)
    g_ref = gram_matrix_nhwc(
        jnp.transpose(feats_ref["conv1_1"], (0, 2, 3, 1))
    )
    feats_alg = get_features(key, model, gram1=True)
    assert "conv1_1" not in feats_alg
    g_alg = feats_alg["conv1_1:gram"]
    np.testing.assert_allclose(
        np.asarray(g_alg), np.asarray(g_ref), rtol=2e-4, atol=1e-3
    )

    # Gradient of a gram-consuming scalar w.r.t. the input images.
    tgt = jnp.asarray(np.random.RandomState(6).rand(*g_ref.shape), jnp.float32)

    def loss_tap(imgs):
        f = get_features(imgs, model)
        g = gram_matrix_nhwc(jnp.transpose(f["conv1_1"], (0, 2, 3, 1)))
        return jnp.mean((g - tgt) ** 2)

    def loss_alg(imgs):
        f = get_features(imgs, model, gram1=True)
        return jnp.mean((f["conv1_1:gram"] - tgt) ** 2)

    gt = jax.grad(loss_tap)(key)
    ga = jax.grad(loss_alg)(key)
    np.testing.assert_allclose(
        np.asarray(ga), np.asarray(gt), rtol=2e-3, atol=1e-5
    )


def test_style_content_loss_gram1_path():
    """Full loss equality: style_content_loss on gram1 features equals the
    tap-gram path (both layouts' target shapes feed the same divisor)."""
    import jax

    from st3d.ops.losses import StyleContentTargets, style_content_loss

    model = init_random_vgg19(0)
    rs = np.random.RandomState(7)
    content = jnp.asarray(rs.rand(2, 3, 32, 32), jnp.float32)
    style = jnp.asarray(rs.rand(2, 3, 32, 32), jnp.float32)
    cur_nhwc = jnp.asarray(rs.rand(2, 32, 32, 3), jnp.float32)

    targets = StyleContentTargets.create(content, style, model, layout="NHWC")

    def loss(gram1):
        feats = get_features(cur_nhwc, model, layout="NHWC",
                             input_layout="NHWC", gram1=gram1)
        return style_content_loss(feats, targets, 1e6, 1.0, layout="NHWC")

    l_ref, l_alg = float(loss(False)), float(loss(True))
    np.testing.assert_allclose(l_alg, l_ref, rtol=1e-5)

    g_ref = jax.grad(lambda x: style_content_loss(
        get_features(x, model, layout="NHWC", input_layout="NHWC"),
        targets, 1e6, 1.0, layout="NHWC"))(cur_nhwc)
    g_alg = jax.grad(lambda x: style_content_loss(
        get_features(x, model, layout="NHWC", input_layout="NHWC",
                     gram1=True),
        targets, 1e6, 1.0, layout="NHWC"))(cur_nhwc)
    np.testing.assert_allclose(
        np.asarray(g_alg), np.asarray(g_ref), rtol=2e-3, atol=3e-5
    )


def test_fused_gram_deep_matches_tap_route(monkeypatch):
    """ST3D_FUSED_GRAM_DEEP=1 (conv3_1/conv4_1/conv5_1 Grams accumulated
    inside the conv kernel, gates monkeypatched for CPU interpret mode)
    returns the same loss and input gradients as the tap-export route."""
    import jax

    import st3d.kernels.conv_pallas as cp
    import st3d.models.vgg as vggmod
    from st3d.ops.losses import StyleContentTargets, style_content_loss

    model = init_random_vgg19(0)
    rs = np.random.RandomState(3)
    content = jnp.asarray(rs.rand(2, 3, 32, 32), jnp.float32)
    style = jnp.asarray(rs.rand(2, 3, 32, 32), jnp.float32)
    cur = jnp.asarray(rs.rand(2, 32, 32, 3), jnp.float32)
    targets = StyleContentTargets.create(content, style, model, layout="NHWC")

    def loss(x):
        feats = get_features(x, model, layout="NHWC", input_layout="NHWC",
                             gram1=True)
        return style_content_loss(feats, targets, 1e6, 1.0, layout="NHWC")

    l_ref = float(loss(cur))
    g_ref = jax.grad(loss)(cur)     # BEFORE the gates are patched

    monkeypatch.setenv("ST3D_FUSED_GRAM_DEEP", "1")
    monkeypatch.setattr(vggmod, "_pallas_conv_ok", lambda _x: True)
    monkeypatch.setattr(
        vggmod, "_pallas_convs",
        lambda: frozenset({2, 4, 8, 12}),   # the fused-gram style taps
    )
    orig = cp.conv3x3_bias_gram
    monkeypatch.setattr(
        cp, "conv3x3_bias_gram",
        lambda x, w, b, interpret=False: orig(x, w, b, True),
    )

    feats = get_features(cur, model, layout="NHWC", input_layout="NHWC",
                         gram1=True)
    for name in ("conv2_1", "conv3_1", "conv4_1", "conv5_1"):
        assert name + ":gram" in feats, name

    l_deep = float(loss(cur))
    np.testing.assert_allclose(l_deep, l_ref, rtol=1e-5)
    g_deep = jax.grad(loss)(cur)
    np.testing.assert_allclose(
        np.asarray(g_deep), np.asarray(g_ref), rtol=2e-3, atol=3e-5
    )


def test_gram1_bf16_close_to_tap_route():
    """Pin the bf16-mode asymmetry of the algebraic conv1_1 Gram (advisor
    r3): the tap route rounds the conv output A to bf16 before gramming;
    the algebraic route never materializes A. The two routes must stay
    within bf16 rounding of each other (relative ~2^-8 per element, i.e.
    well under 1% on the Gram), so the style-loss floor this creates is
    inside the optimization's noise band — not a correctness fork."""
    from st3d.ops.losses import gram_matrix_nhwc

    model = init_random_vgg19(0)
    imgs = jnp.asarray(
        np.random.RandomState(11).rand(2, 3, 32, 32), jnp.float32
    )

    f_tap = get_features(imgs, model, dtype=jnp.bfloat16, layout="NHWC")
    g_tap = np.asarray(gram_matrix_nhwc(f_tap["conv1_1"]), np.float64)
    f_alg = get_features(imgs, model, dtype=jnp.bfloat16, layout="NHWC",
                         gram1=True)
    g_alg = np.asarray(f_alg["conv1_1:gram"], np.float64)

    scale = np.abs(g_tap).max()
    rel = np.abs(g_alg - g_tap).max() / scale
    # bf16 mantissa is 8 bits; the Gram averages the per-element rounding
    # over H*W pixels, so the relative gap lands far below a single ulp of
    # one element. 1% is the documented bound (vgg.py gram1 docstring).
    assert rel < 0.01, rel
    # And it is genuinely a bf16 effect: f32 mode agrees to reassociation.
    g32_tap = np.asarray(gram_matrix_nhwc(
        get_features(imgs, model, layout="NHWC")["conv1_1"]), np.float64)
    g32_alg = np.asarray(get_features(
        imgs, model, layout="NHWC", gram1=True)["conv1_1:gram"], np.float64)
    assert np.abs(g32_alg - g32_tap).max() / scale < 1e-4


def test_pool_bwd_routed_exact():
    """The routed maxpool backward (_mp_bwd) equals the autodiff
    SelectAndScatter gradient bit-for-bit — including crafted ties
    (quantized inputs), all-zero windows (the post-relu common case),
    odd floor-mode shapes, and bf16."""
    import jax

    from st3d.models.vgg import _max_pool_2x2_routed, _reduce_window_max_2x2

    key = jax.random.PRNGKey(7)
    for dtype in (jnp.float32, jnp.bfloat16):
        for shape in [(2, 8, 8, 3), (1, 6, 10, 4), (2, 7, 9, 2)]:
            x = jax.random.normal(key, shape).astype(dtype)
            xq = jnp.round(x * 2) / 2          # forced in-window ties
            for xx in (x, xq, jnp.zeros(shape, dtype)):
                y_ref, vjp_ref = jax.vjp(_reduce_window_max_2x2, xx)
                y_new, vjp_new = jax.vjp(_max_pool_2x2_routed, xx)
                np.testing.assert_array_equal(np.asarray(y_ref),
                                              np.asarray(y_new))
                dy = jax.random.normal(
                    jax.random.fold_in(key, 1), y_ref.shape).astype(dtype)
                (dx_ref,) = vjp_ref(dy)
                (dx_new,) = vjp_new(dy)
                np.testing.assert_array_equal(
                    np.asarray(dx_ref, np.float32),
                    np.asarray(dx_new, np.float32))


def test_pool_bwd_routed_env_flows_through_get_features(monkeypatch):
    """ST3D_POOL_BWD=routed leaves every tap's value and image gradient
    identical to the default SelectAndScatter path."""
    import jax

    model = get_vgg()
    key = jax.random.PRNGKey(3)
    img = jax.random.uniform(key, (2, 3, 64, 64), jnp.float32)

    def loss(images):
        feats = get_features(images, model)
        return sum(jnp.sum(f.astype(jnp.float32) ** 2)
                   for f in feats.values())

    monkeypatch.delenv("ST3D_POOL_BWD", raising=False)
    l0, g0 = jax.value_and_grad(loss)(img)
    monkeypatch.setenv("ST3D_POOL_BWD", "routed")
    l1, g1 = jax.value_and_grad(loss)(img)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))
