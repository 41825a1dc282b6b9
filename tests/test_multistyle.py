"""Multi-style batched optimization (BASELINE config 4)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from st3d.engine.config import PipelineConfig
from st3d.engine.multistyle import run_multistyle

REF = "/root/reference"
HAVE = os.path.isfile(f"{REF}/objects/cow_mesh/cow.obj")


@pytest.mark.skipif(not HAVE, reason="reference assets absent")
def test_multistyle_two_styles(tmp_path):
    cfg = PipelineConfig(
        obj_path=f"{REF}/objects/cow_mesh/cow.obj",
        n_views=2, batch_size=2, size=64,
        output_path=str(tmp_path / "ms"),
        raster_backend="xla", randomize_views=False, epochs=3,
    )
    styles = [f"{REF}/imgs/Style_1.jpg", f"{REF}/imgs/Style_5.png"]
    results = run_multistyle(cfg, styles)
    assert set(results) == {"Style_1", "Style_5"}
    # Each style's texture was optimized (changed from the original), and
    # the two trajectories are independent (nonzero divergence — small at 3
    # tiny epochs, but strictly separate parameters).
    t1 = np.asarray(results["Style_1"].texture)
    t5 = np.asarray(results["Style_5"].texture)
    assert np.abs(t1 - t5).max() > 1e-6
    for name in results:
        assert os.path.isfile(tmp_path / "ms" / name / "final.obj")
        assert os.path.isfile(
            tmp_path / "ms" / name / "final_render" / "view_0.png"
        )
    # Log carries per-epoch summed loss; losses decrease.
    with open(tmp_path / "ms" / "log.txt") as f:
        lines = f.read().strip().splitlines()[1:]
    losses = [float(l.rsplit(" ", 1)[1]) for l in lines]
    assert len(losses) == 3 and losses[-1] < losses[0]


@pytest.mark.skipif(not HAVE, reason="reference assets absent")
def test_fleet_two_meshes_two_styles(tmp_path):
    """Config-5 shape: meshes x styles in one invocation; the UV-less
    teapot auto-recovers via spherical UVs."""
    import fleet

    fleet.main([
        "--obj_paths",
        f"{REF}/objects/cow_mesh/cow.obj,{REF}/objects/teapot_mesh/teapot.obj",
        "--style_paths",
        f"{REF}/imgs/Style_1.jpg,{REF}/imgs/Style_5.png",
        "--n_views", "2", "--batch_size", "2", "--size", "64",
        "--epochs", "2", "--randomize_views", "False",
        "--raster_backend", "xla",
        "--output_path", str(tmp_path / "fleet"),
    ])
    for mesh in ("cow", "teapot"):
        for style in ("Style_1", "Style_5"):
            assert os.path.isfile(
                tmp_path / "fleet" / mesh / style / "final.obj"
            ), (mesh, style)


@pytest.mark.skipif(not HAVE, reason="reference assets absent")
def test_multistyle_style_sharded(tmp_path):
    """8 styles sharded over 8 virtual devices produce the same losses as
    the single-device run (no collectives: disjoint parameters)."""
    import jax

    styles = [f"{REF}/imgs/Style_1.jpg", f"{REF}/imgs/Style_5.png",
              f"{REF}/imgs/Style_3.png", f"{REF}/imgs/Style_4.jpeg"] * 2

    def run(dp, out):
        cfg = PipelineConfig(
            obj_path=f"{REF}/objects/cow_mesh/cow.obj",
            n_views=2, batch_size=2, size=64,
            output_path=str(tmp_path / out),
            raster_backend="xla", randomize_views=False, epochs=2,
            data_parallel=dp,
        )
        return run_multistyle(cfg, styles)

    r_dp = run(True, "dp")
    r_sd = run(False, "sd")
    for name in r_sd:
        np.testing.assert_allclose(
            np.asarray(r_dp[name].texture), np.asarray(r_sd[name].texture),
            atol=1e-5,
        )


@pytest.mark.skipif(not HAVE, reason="reference assets absent")
def test_multistyle_dp_bad_count(tmp_path):
    cfg = PipelineConfig(
        obj_path=f"{REF}/objects/cow_mesh/cow.obj",
        n_views=2, batch_size=2, size=64,
        output_path=str(tmp_path / "bad"),
        raster_backend="xla", randomize_views=False, epochs=1,
        data_parallel=True,
    )
    with pytest.raises(ValueError, match="divide"):
        run_multistyle(cfg, [f"{REF}/imgs/Style_1.jpg"] * 3)


def test_multi_style_loss_gram_keys_match_tap_path():
    """A feats dict carrying '<layer>:gram' keys (fused-gram kernels)
    produces the same per-style losses as gramming the taps, including the
    per-layer divisor heights at EVERY style depth — conv3_1/conv4_1/
    conv5_1 gram keys arrive under ST3D_FUSED_GRAM_DEEP=1 and used to
    KeyError here (advisor-style round-4 self-review fix)."""
    import jax.numpy as jnp
    import numpy as np

    from st3d.engine.multistyle import _multi_style_content_loss
    from st3d.ops.losses import STYLE_LAYERS, gram_matrix_nhwc

    rs = np.random.RandomState(3)
    s, b, size = 2, 2, 16
    shapes = {"conv1_1": (size, 64), "conv2_1": (size // 2, 128),
              "conv3_1": (size // 4, 256), "conv4_1": (size // 8, 512),
              "conv4_2": (size // 8, 512), "conv5_1": (size // 16, 512)}
    feats = {
        l: jnp.asarray(rs.rand(s, b, h, h, c), jnp.float32)
        for l, (h, c) in shapes.items()
    }
    cfeat = jnp.asarray(rs.rand(b, size // 8, size // 8, 512), jnp.float32)
    grams = {l: gram_matrix_nhwc(
        jnp.asarray(rs.rand(s * b, *(shapes[l][0],) * 2, shapes[l][1]),
                    jnp.float32)
    ).reshape(s, b, shapes[l][1], shapes[l][1]) for l in STYLE_LAYERS}

    want = _multi_style_content_loss(feats, cfeat, grams, 1e6, 1.0, size)

    feats_g = dict(feats)
    for l in STYLE_LAYERS:
        feats_g[l + ":gram"] = jnp.stack([
            gram_matrix_nhwc(feats[l][i]) for i in range(s)
        ])
        del feats_g[l]
    got = _multi_style_content_loss(feats_g, cfeat, grams, 1e6, 1.0, size)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)
