"""Batched multi-mesh fleet (BASELINE config 5): the whole mesh x style
grid in one SPMD program must reproduce the sequential per-mesh runs."""

import dataclasses
import os

import numpy as np
import pytest

from st3d.engine.config import PipelineConfig
from st3d.engine.fleetbatch import _pick_grid, run_fleet_batched
from st3d.engine.multistyle import run_multistyle

REF = "/root/reference"
HAVE = os.path.isfile(f"{REF}/objects/cow_mesh/cow.obj")

OBJS = [f"{REF}/objects/cow_mesh/cow.obj",
        f"{REF}/objects/teapot_mesh/teapot.obj"]
STYLES2 = [f"{REF}/imgs/Style_1.jpg", f"{REF}/imgs/Style_5.png"]


def _cfg(tmp_path, out, **kw):
    return PipelineConfig(
        n_views=2, batch_size=2, size=64,
        output_path=str(tmp_path / out),
        raster_backend="xla", randomize_views=False, epochs=2, **kw,
    )


def test_pick_grid():
    # Exact tilings pad nothing.
    assert _pick_grid(8, 2, 4) == (2, 4, 2, 4)
    assert _pick_grid(8, 4, 2) == (4, 2, 4, 2)
    assert _pick_grid(8, 8, 5) == (8, 1, 8, 5)
    assert _pick_grid(1, 3, 5) == (1, 1, 3, 5)
    # Non-tiling grids pad the cheapest axis with masked cells instead of
    # raising (VERDICT r2 item 2): the flagship config-5 grid shards.
    assert _pick_grid(8, 4, 5) == (4, 2, 4, 6)
    assert _pick_grid(8, 3, 3) == (2, 4, 4, 4)
    assert _pick_grid(8, 1, 1) == (1, 8, 1, 8)


@pytest.mark.skipif(not HAVE, reason="reference assets absent")
def test_batched_matches_sequential(tmp_path):
    """Disjoint parameters + elementwise Adam => the batched grid's
    per-cell textures equal M independent multistyle runs."""
    cfg = _cfg(tmp_path, "batched")
    batched = run_fleet_batched(cfg, OBJS, STYLES2)

    for obj, stem, auto in ((OBJS[0], "cow", "none"),
                            (OBJS[1], "teapot", "sphere")):
        seq = run_multistyle(
            dataclasses.replace(
                _cfg(tmp_path, f"seq_{stem}"), obj_path=obj, auto_uv=auto,
            ),
            STYLES2,
        )
        for style in seq:
            np.testing.assert_allclose(
                np.asarray(batched[stem][style].texture),
                np.asarray(seq[style].texture),
                atol=2e-4,
                err_msg=f"{stem}/{style}",
            )

    # Output layout matches the sequential fleet driver's.
    for stem in ("cow", "teapot"):
        for style in ("Style_1", "Style_5"):
            assert os.path.isfile(
                tmp_path / "batched" / stem / style / "final.obj"
            )
            assert os.path.isfile(
                tmp_path / "batched" / stem / style / "final_render"
                / "view_0.png"
            )


@pytest.mark.skipif(not HAVE, reason="reference assets absent")
def test_batched_grid_sharded(tmp_path):
    """2 meshes x 4 styles over the 8 virtual devices (2x4 device mesh)
    matches the single-device run."""
    styles4 = [f"{REF}/imgs/Style_1.jpg", f"{REF}/imgs/Style_5.png",
               f"{REF}/imgs/Style_3.png", f"{REF}/imgs/Style_4.jpeg"]
    r_dp = run_fleet_batched(
        _cfg(tmp_path, "dp", data_parallel=True), OBJS, styles4
    )
    r_sd = run_fleet_batched(
        _cfg(tmp_path, "sd", data_parallel=False), OBJS, styles4
    )
    for stem in r_sd:
        for style in r_sd[stem]:
            np.testing.assert_allclose(
                np.asarray(r_dp[stem][style].texture),
                np.asarray(r_sd[stem][style].texture),
                atol=1e-5, err_msg=f"{stem}/{style}",
            )


@pytest.mark.skipif(not HAVE, reason="reference assets absent")
def test_duplicate_stems_raise(tmp_path):
    cfg = _cfg(tmp_path, "bad")
    with pytest.raises(ValueError, match="duplicate style stems"):
        run_fleet_batched(cfg, OBJS, [f"{REF}/imgs/Style_1.jpg"] * 3)
    with pytest.raises(ValueError, match="duplicate mesh stems"):
        run_fleet_batched(cfg, [OBJS[0]] * 2, STYLES2)


@pytest.mark.skipif(not HAVE, reason="reference assets absent")
def test_flagship_grid_padded_dp(tmp_path):
    """BASELINE config 5 shape: 4 meshes x 5 styles on 8 devices (pads the
    style axis 5 -> 6 with masked cells). DP must match single-device
    exactly on every REAL cell."""
    import shutil

    objs = OBJS + [f"{REF}/objects/bob_mesh/bob.obj"]
    cow2 = str(tmp_path / "cow2.obj")
    shutil.copy(f"{REF}/objects/cow_mesh/cow.obj", cow2)
    # cow.obj references cow.mtl/texture relatively; keep them resolvable.
    for aux in ("cow.mtl", "cow_texture.png"):
        src = f"{REF}/objects/cow_mesh/{aux}"
        if os.path.isfile(src):
            shutil.copy(src, str(tmp_path / aux))
    styles5 = [f"{REF}/imgs/Style_1.jpg", f"{REF}/imgs/Style_5.png",
               f"{REF}/imgs/Style_3.png", f"{REF}/imgs/Style_4.jpeg"]
    s2 = str(tmp_path / "Style_2sub.jpg")
    shutil.copy(styles5[0], s2)
    styles5.append(s2)

    r_dp = run_fleet_batched(
        _cfg(tmp_path, "dp5", data_parallel=True),
        objs + [cow2], styles5, epochs=1,
    )
    r_sd = run_fleet_batched(
        _cfg(tmp_path, "sd5", data_parallel=False),
        objs + [cow2], styles5, epochs=1,
    )
    assert set(r_dp) == {"cow", "teapot", "bob", "cow2"}
    for stem in r_sd:
        assert set(r_dp[stem]) == set(r_sd[stem])
        for style in r_sd[stem]:
            np.testing.assert_allclose(
                np.asarray(r_dp[stem][style].texture),
                np.asarray(r_sd[stem][style].texture),
                atol=1e-5, err_msg=f"{stem}/{style}",
            )


@pytest.mark.skipif(not HAVE, reason="reference assets absent")
def test_batched_rejects_soft_raster_settings(tmp_path):
    """The batched fleet step shades via compact visibility (hard K=1
    only); soft/blur/multi-K configs must raise instead of silently
    optimizing a different objective than run_second_approach would."""
    for kw in ({"soft_raster": True}, {"blur_radius": 0.01},
               {"faces_per_pixel": 2}):
        cfg = _cfg(tmp_path, "rej", **kw)
        with pytest.raises(ValueError, match="hard K=1"):
            run_fleet_batched(cfg, OBJS[:1], STYLES2[:1])
