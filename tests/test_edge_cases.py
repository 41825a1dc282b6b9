"""Edge-case coverage: IO fallbacks, compat-surface soft rendering,
checkpoint mismatch errors, teapot through the first approach."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

TEAPOT = "/root/reference/objects/teapot_mesh/teapot.obj"
STYLE = "/root/reference/imgs/Style_1.jpg"


def test_save_image_jpeg_pil_fallback(tmp_path):
    """Non-PNG extensions go through PIL (the native writer is PNG-only)."""
    from PIL import Image

    from st3d.io.image import save_image

    t = np.random.RandomState(0).rand(3, 16, 16).astype(np.float32)
    p = str(tmp_path / "x.jpg")
    save_image(t, p)
    img = np.asarray(Image.open(p))
    assert img.shape == (16, 16, 3)


def test_save_image_python_fallback_when_native_missing(tmp_path, monkeypatch):
    import st3d.io.image as im

    def boom(*a, **k):
        raise RuntimeError("no native")

    monkeypatch.setattr("st3d.io.native.write_png", boom)
    t = np.random.RandomState(1).rand(3, 8, 8).astype(np.float32)
    p = str(tmp_path / "y.png")
    im.save_image(t, p)  # must not raise
    from PIL import Image

    assert np.asarray(Image.open(p)).shape == (8, 8, 3)


def test_compat_renderer_soft_settings(sphere_mesh, tmp_path):
    import utils

    renderer = utils.make_renderer(
        image_size=32, backend="bruteforce", soft=True, soft_sigma_px=1.0
    )
    imgs, masks = utils.render_meshes(renderer, sphere_mesh,
                                      utils.build_fixed_cameras(1))
    assert imgs.shape == (1, 3, 32, 32)
    # Soft alpha yields a fractional-coverage band somewhere.
    a = np.asarray(masks)
    assert a.min() >= 0.0 and a.max() <= 1.0


def test_checkpoint_shape_mismatch_error(tmp_path):
    import jax

    from st3d.utils.checkpoint import load_checkpoint, save_checkpoint

    p = str(tmp_path / "c.npz")
    params = {"texture": jnp.zeros((4, 4, 3))}
    save_checkpoint(p, 3, params, {"m": jnp.zeros(2)}, jax.random.PRNGKey(0))
    bad = {"texture": jnp.zeros((8, 8, 3))}
    with pytest.raises(ValueError, match="shape"):
        load_checkpoint(p, bad, {"m": jnp.zeros(2)}, jax.random.PRNGKey(0))


@pytest.mark.skipif(not (os.path.isfile(TEAPOT) and os.path.isfile(STYLE)),
                    reason="assets absent")
def test_teapot_first_approach_auto_uv(tmp_path):
    from st3d.engine.config import PipelineConfig
    from st3d.engine.pipelines import run_first_approach

    cfg = PipelineConfig(
        obj_path=TEAPOT, style_path=STYLE, n_views=2, batch_size=2,
        size=64, n_style_transfer_steps=3, n_mse_steps=4,
        output_path=str(tmp_path / "tp1"), raster_backend="xla",
        randomize_views=False, auto_uv="face_atlas",
    )
    run_first_approach(cfg)
    assert os.path.isfile(tmp_path / "tp1" / "final.obj")
