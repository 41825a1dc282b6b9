"""Integration tests (SURVEY.md §4 item 4): tiny end-to-end runs of both
pipelines asserting loss decrease and the reference's output artifact
layout, plus checkpoint/resume and the 2D engine in isolation."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from st3d.engine.config import (
    PipelineConfig,
    parse_first_approach,
    parse_second_approach,
)
from st3d.engine.pipelines import run_first_approach, run_second_approach
from st3d.engine.style_transfer2d import style_transfer
from st3d.models.vgg import init_random_vgg19

REF = "/root/reference/objects/cow_mesh/cow.obj"
STYLE = "/root/reference/imgs/Style_1.jpg"
HAVE_ASSETS = os.path.isfile(REF) and os.path.isfile(STYLE)


def _tiny_cfg(tmp_path, **kw):
    base = dict(
        obj_path=REF,
        style_path=STYLE,
        n_views=2,
        batch_size=2,
        size=64,
        output_path=str(tmp_path / "out"),
        raster_backend="xla",
        n_style_transfer_steps=5,
        n_mse_steps=8,
        epochs=4,
        randomize_views=False,
        save_intermediate=False,
        seed=0,
    )
    base.update(kw)
    return PipelineConfig(**base)


def _read_log(path):
    with open(path) as f:
        lines = f.read().strip().splitlines()
    assert lines[0] == "Logger:"
    return lines[1:]


@pytest.mark.skipif(not HAVE_ASSETS, reason="reference assets absent")
def test_first_approach_end_to_end(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    run_first_approach(cfg)
    out = cfg.output_path
    lines = _read_log(os.path.join(out, "log.txt"))
    assert len(lines) == cfg.n_mse_steps
    assert lines[0].startswith("Batch 0, Step 0, Loss ")
    losses = [float(l.rsplit(" ", 1)[1]) for l in lines]
    assert losses[-1] < losses[0]  # monotone-ish decrease over the run
    # Artifacts (reference layout).
    assert os.path.isfile(os.path.join(out, "2d_style_transfer/view_0.png"))
    assert os.path.isfile(os.path.join(out, "2d_style_transfer/view_1.png"))
    for i in range(12):
        assert os.path.isfile(os.path.join(out, f"final_render/view_{i}.png"))
    assert os.path.isfile(os.path.join(out, "final.obj"))
    assert os.path.isfile(os.path.join(out, "final.mtl"))
    assert os.path.isfile(os.path.join(out, "metrics.jsonl"))


@pytest.mark.skipif(not HAVE_ASSETS, reason="reference assets absent")
def test_second_approach_end_to_end(tmp_path):
    cfg = _tiny_cfg(tmp_path, save_intermediate=True)
    run_second_approach(cfg)
    out = cfg.output_path
    lines = _read_log(os.path.join(out, "log.txt"))
    assert len(lines) == cfg.epochs
    assert lines[0].startswith("Epoch 0, Loss ")
    losses = [float(l.rsplit(" ", 1)[1]) for l in lines]
    assert losses[-1] < losses[0]
    assert os.path.isfile(os.path.join(out, "current_images/view_0.png"))
    assert os.path.isfile(os.path.join(out, "final.obj"))


@pytest.mark.skipif(not HAVE_ASSETS, reason="reference assets absent")
def test_second_approach_mesh_target_and_noise_bg(tmp_path):
    cfg = _tiny_cfg(
        tmp_path,
        optimization_target="both",
        content_background="noise",
        current_background="noise",
        epochs=2,
    )
    run_second_approach(cfg)
    lines = _read_log(os.path.join(cfg.output_path, "log.txt"))
    assert len(lines) == 2


@pytest.mark.skipif(not HAVE_ASSETS, reason="reference assets absent")
def test_checkpoint_resume(tmp_path):
    cfg = _tiny_cfg(tmp_path, epochs=3, checkpoint_every=1)
    run_second_approach(cfg)
    ckpt = os.path.join(cfg.output_path, "checkpoint.npz")
    assert os.path.isfile(ckpt)
    # Resume with more epochs: starts from epoch 3.
    cfg2 = _tiny_cfg(
        tmp_path, epochs=5, checkpoint_every=1, resume=True
    )
    run_second_approach(cfg2)
    lines = _read_log(os.path.join(cfg2.output_path, "log.txt"))
    # Fresh log file only contains the resumed epochs.
    assert lines[0].startswith("Epoch 3, ")
    assert lines[-1].startswith("Epoch 4, ")


def test_style_transfer_2d_reduces_loss():
    vgg = init_random_vgg19(0)
    rng = np.random.RandomState(0)
    content = jnp.asarray(rng.rand(1, 3, 32, 32), jnp.float32)
    style = jnp.asarray(rng.rand(1, 3, 32, 32), jnp.float32)
    from st3d.ops.losses import compute_perceptual_loss

    before = float(
        compute_perceptual_loss(content, content, style, vgg, 1e6, 1.0)
    )
    out = style_transfer(content, content, style, vgg, steps=30, lr=0.02,
                         progress=False)
    after = float(
        compute_perceptual_loss(out, content, style, vgg, 1e6, 1.0)
    )
    assert after < before
    assert out.shape == content.shape


def test_cli_flag_parsing_matches_reference_names():
    cfg = parse_first_approach([
        "--n_views", "4", "--n_mse_steps", "7", "--randomize_views", "False",
        "--optimization_target", "both", "--style_transfer_init", "noise",
        "--output_path", "/tmp/x",
    ])
    assert cfg.n_views == 4 and cfg.n_mse_steps == 7
    assert cfg.randomize_views is False
    assert cfg.optimization_target == "both"

    cfg = parse_second_approach(["--epochs", "11", "--lr", "0.5"])
    assert cfg.epochs == 11 and cfg.lr == 0.5

    # The reference's type=bool footgun is fixed: garbage is rejected.
    with pytest.raises(SystemExit):
        parse_first_approach(["--randomize_views", "banana"])


@pytest.mark.skipif(not HAVE_ASSETS, reason="reference assets absent")
def test_second_approach_data_parallel(tmp_path):
    """--data_parallel shards the view batch over the 8 virtual devices."""
    cfg = _tiny_cfg(
        tmp_path, n_views=8, batch_size=8, epochs=3, data_parallel=True,
        content_background="noise", current_background="noise",
    )
    run_second_approach(cfg)
    lines = _read_log(os.path.join(cfg.output_path, "log.txt"))
    assert len(lines) == 3
    losses = [float(l.rsplit(" ", 1)[1]) for l in lines]
    assert losses[-1] < losses[0]
    assert os.path.isfile(os.path.join(cfg.output_path, "final.obj"))


@pytest.mark.skipif(not HAVE_ASSETS, reason="reference assets absent")
def test_second_approach_data_parallel_bad_batch(tmp_path):
    cfg = _tiny_cfg(tmp_path, n_views=3, batch_size=3, data_parallel=True)
    with pytest.raises(ValueError, match="devices"):
        run_second_approach(cfg)


def test_debug_nan_guard_catches():
    import jax.numpy as jnp

    from st3d.utils.debug import jit_with_finite_guard

    f = jit_with_finite_guard(lambda x: jnp.log(x))
    f(jnp.asarray(1.0))
    with pytest.raises(Exception, match="nan"):
        f(jnp.asarray(-1.0))


@pytest.mark.skipif(not HAVE_ASSETS, reason="reference assets absent")
def test_second_approach_soft_raster_mesh_opt(tmp_path):
    """Geometry optimization with soft silhouette gradients runs and the
    vertices actually move (hard mode moves them only via interior UV
    shifts; soft adds boundary forces)."""
    cfg = _tiny_cfg(
        tmp_path, optimization_target="mesh", soft_raster=True, epochs=3,
        size=64,
    )
    from st3d.engine.pipelines import load_scene

    before = load_scene(cfg).verts
    final = run_second_approach(cfg)
    moved = float(jnp.abs(final.verts - before).max())
    assert moved > 0


@pytest.mark.skipif(not HAVE_ASSETS, reason="reference assets absent")
def test_profile_flag_writes_trace(tmp_path):
    cfg = _tiny_cfg(tmp_path, epochs=1, profile=True)
    run_second_approach(cfg)
    prof = os.path.join(cfg.output_path, "profile")
    assert os.path.isdir(prof)
    found = []
    for root, _dirs, files in os.walk(prof):
        found += files
    assert found  # trace events written


@pytest.mark.skipif(not HAVE_ASSETS, reason="reference assets absent")
def test_first_approach_resume(tmp_path):
    """Batch-level resume of the first approach: interrupted after batch 0,
    the resumed run skips it and completes batch 1."""
    cfg = _tiny_cfg(tmp_path, n_views=4, batch_size=2, n_mse_steps=4,
                    n_style_transfer_steps=2)
    run_first_approach(cfg)
    # Re-run with resume: checkpoint says all batches done -> no new steps,
    # but final artifacts regenerate fine.
    cfg2 = _tiny_cfg(tmp_path, n_views=4, batch_size=2, n_mse_steps=4,
                     n_style_transfer_steps=2, resume=True)
    run_first_approach(cfg2)
    lines = _read_log(os.path.join(cfg2.output_path, "log.txt"))
    assert lines == []  # everything was already done
    assert os.path.isfile(os.path.join(cfg2.output_path, "final.obj"))


@pytest.mark.skipif(not HAVE_ASSETS, reason="reference assets absent")
def test_chunked_epochs_match_per_step(tmp_path):
    """The scan-chunked epoch path (single batch, no intermediate saving)
    produces the same loss sequence as the per-step path."""
    def losses_of(out, save_intermediate):
        cfg = _tiny_cfg(tmp_path, epochs=5, output_path=str(tmp_path / out),
                        save_intermediate=save_intermediate)
        run_second_approach(cfg)
        lines = _read_log(os.path.join(cfg.output_path, "log.txt"))
        return [float(l.rsplit(" ", 1)[1]) for l in lines]

    chunked = losses_of("chunk", False)
    per_step = losses_of("step", True)
    np.testing.assert_allclose(chunked, per_step, rtol=1e-5)


@pytest.mark.skipif(not HAVE_ASSETS, reason="reference assets absent")
def test_first_approach_midbatch_resume(tmp_path, monkeypatch):
    """A crash right after a mid-batch checkpoint resumes the MSE phase from
    the stored step (with the stored 2D-ST targets) instead of re-running
    style transfer and over-optimizing the batch: the resumed run's final
    params match an uninterrupted run bit-for-bit."""
    import st3d.engine.pipelines as pl
    from st3d.utils.checkpoint import save_checkpoint as real_save

    kw = dict(n_mse_steps=8, n_style_transfer_steps=2, checkpoint_every=3)

    # Uninterrupted run -> golden final params (stored in the checkpoint).
    cfg_a = _tiny_cfg(tmp_path, output_path=str(tmp_path / "clean"), **kw)
    run_first_approach(cfg_a)
    golden = np.load(os.path.join(cfg_a.output_path, "checkpoint.npz"))

    # Interrupted run: crash right after the first mid-batch checkpoint
    # (done=3 of 8), then resume and finish.
    cfg_b = _tiny_cfg(tmp_path, output_path=str(tmp_path / "crash"), **kw)

    def crashing_save(path, step, params, opt_state, rng, extras=None):
        real_save(path, step, params, opt_state, rng, extras=extras)
        if extras is not None:
            raise RuntimeError("simulated crash")

    monkeypatch.setattr(pl, "save_checkpoint", crashing_save)
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_first_approach(cfg_b)
    monkeypatch.setattr(pl, "save_checkpoint", real_save)

    ck = np.load(os.path.join(cfg_b.output_path, "checkpoint.npz"))
    assert int(ck["x_mse_done"]) == 3  # mid-batch state persisted

    cfg_b2 = _tiny_cfg(tmp_path, output_path=str(tmp_path / "crash"),
                       resume=True, **kw)
    run_first_approach(cfg_b2)
    resumed = np.load(os.path.join(cfg_b2.output_path, "checkpoint.npz"))
    for key in golden.files:
        if key.startswith("p"):
            np.testing.assert_array_equal(resumed[key], golden[key])

    # Resumed log covers exactly the remaining steps 3..7.
    lines = _read_log(os.path.join(cfg_b2.output_path, "log.txt"))
    assert lines[0].startswith("Batch 0, Step 3, ")
    assert lines[-1].startswith("Batch 0, Step 7, ")


@pytest.mark.skipif(not HAVE_ASSETS, reason="reference assets absent")
def test_first_approach_checkpoint_every_not_multiple_of_chunk(tmp_path):
    """checkpoint_every values that are not multiples of the 25-step scan
    chunk still land on exact boundaries (advisor finding r1)."""
    import st3d.engine.pipelines as pl
    from st3d.utils.checkpoint import save_checkpoint as real_save

    seen = []

    def recording_save(path, step, params, opt_state, rng, extras=None):
        if extras is not None:
            seen.append(int(np.asarray(extras["mse_done"])))
        real_save(path, step, params, opt_state, rng, extras=extras)

    cfg = _tiny_cfg(tmp_path, n_mse_steps=70, n_style_transfer_steps=2,
                    checkpoint_every=30)
    import unittest.mock as mock

    with mock.patch.object(pl, "save_checkpoint", recording_save):
        run_first_approach(cfg)
    assert seen == [30, 60]


@pytest.mark.skipif(not HAVE_ASSETS, reason="reference assets absent")
def test_first_approach_data_parallel(tmp_path):
    """--data_parallel shards the MSE phase's view batch over the 8 virtual
    devices and matches the single-device run (pmean of per-shard means ==
    global mean; regularizers are view-independent)."""
    kw = dict(n_views=8, batch_size=8, n_mse_steps=6,
              n_style_transfer_steps=2)
    cfg_dp = _tiny_cfg(tmp_path, output_path=str(tmp_path / "dp"),
                       data_parallel=True, **kw)
    run_first_approach(cfg_dp)
    cfg_sd = _tiny_cfg(tmp_path, output_path=str(tmp_path / "sd"), **kw)
    run_first_approach(cfg_sd)

    def losses(cfg):
        lines = _read_log(os.path.join(cfg.output_path, "log.txt"))
        assert len(lines) == kw["n_mse_steps"]
        return [float(l.rsplit(" ", 1)[1]) for l in lines]

    np.testing.assert_allclose(losses(cfg_dp), losses(cfg_sd), rtol=1e-4)
    assert os.path.isfile(os.path.join(cfg_dp.output_path, "final.obj"))


@pytest.mark.skipif(not HAVE_ASSETS, reason="reference assets absent")
def test_first_approach_data_parallel_bad_batch(tmp_path):
    cfg = _tiny_cfg(tmp_path, n_views=3, batch_size=3, data_parallel=True)
    with pytest.raises(ValueError, match="devices"):
        run_first_approach(cfg)
