"""Multi-chip (8 virtual CPU devices) view-sharded data parallelism
(SURVEY.md §4 item 6): SPMD step == single-device step on the same batch,
and the driver's dryrun_multichip entry runs."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from st3d.parallel.sharding import (
    VIEW_AXIS,
    make_device_mesh,
    make_view_parallel_step,
    replicate,
    shard_views,
)


def test_eight_virtual_devices_present():
    assert len(jax.devices()) >= 8


def test_view_parallel_step_matches_single_device():
    n_dev = 8
    mesh = make_device_mesh(n_dev)

    # Toy "views": quadratic loss whose gradient depends on per-view data.
    data = jnp.arange(n_dev * 4, dtype=jnp.float32).reshape(n_dev, 4)
    params = {"w": jnp.ones((4,))}
    optimizer = optax.adam(0.1)
    opt_state = optimizer.init(params)

    def loss_fn(p, x):
        pred = x @ p["w"]
        return jnp.mean(pred ** 2)

    # Single-device reference update.
    loss_ref, grads = jax.value_and_grad(loss_fn)(params, data)
    updates, _ = optimizer.update(grads, opt_state, params)
    params_ref = optax.apply_updates(params, updates)

    # Sharded update.
    step = make_view_parallel_step(loss_fn, optimizer, mesh, donate=False)
    p_sh = replicate(params, mesh)
    st_sh = replicate(opt_state, mesh)
    x_sh = shard_views(data, mesh)
    p_out, st_out, loss = step(p_sh, st_sh, x_sh)

    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p_out["w"]), np.asarray(params_ref["w"]), rtol=1e-6
    )


def test_render_step_sharded_over_views(sphere_mesh):
    """Full render+texture-grad step sharded across 8 devices."""
    from st3d.core.cameras import build_fixed_cameras, FoVPerspectiveCameras
    from st3d.render.rasterize import RasterizationSettings
    from st3d.render.renderer import render_meshes

    n_dev = 8
    mesh_dev = make_device_mesh(n_dev)
    cams = build_fixed_cameras(n_dev, shuffle=False)
    settings = RasterizationSettings(image_size=32, backend="xla")
    target = jnp.zeros((1, 3, 32, 32))

    def loss_fn(p, R, T):
        local = FoVPerspectiveCameras.create(R=R, T=T)
        imgs, masks = render_meshes(
            sphere_mesh.replace(texture=p["tex"]), local, settings
        )
        return jnp.mean((imgs * masks - target) ** 2)

    optimizer = optax.adam(0.01)
    params = {"tex": sphere_mesh.texture}
    opt_state = optimizer.init(params)

    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(params, cams.R, cams.T)

    step = make_view_parallel_step(loss_fn, optimizer, mesh_dev, donate=False)
    p_out, st_out, loss = step(
        replicate(params, mesh_dev),
        replicate(opt_state, mesh_dev),
        shard_views(cams.R, mesh_dev),
        shard_views(cams.T, mesh_dev),
    )
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    assert float(jnp.abs(p_out["tex"] - params["tex"]).max()) > 0


def test_dryrun_multichip_entry():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_mesh_too_many_devices_error():
    with pytest.raises(ValueError, match="devices"):
        make_device_mesh(len(jax.devices()) + 1)


def test_tiled_render_matches_single_device(sphere_mesh):
    """Row-sharded rendering across 8 devices == the plain renderer, for
    values AND texture/vertex gradients."""
    from st3d.core.cameras import FoVPerspectiveCameras
    from st3d.parallel.tiles import make_tile_mesh, render_rgba_tiled
    from st3d.render.rasterize import RasterizationSettings
    from st3d.render.renderer import render_rgba

    cam = FoVPerspectiveCameras.create(T=jnp.array([[0.0, 0.0, 3.0]]))
    settings = RasterizationSettings(image_size=64, backend="xla")
    tile_mesh = make_tile_mesh(8)

    want = render_rgba(sphere_mesh, cam, settings)
    got = render_rgba_tiled(sphere_mesh, cam, settings, tile_mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    wgt = jnp.linspace(0.0, 1.0, 64)[None, :, None, None]

    def loss_plain(tex, verts):
        m = sphere_mesh.replace(texture=tex, verts=verts)
        return jnp.sum(render_rgba(m, cam, settings)[..., :3] * wgt)

    def loss_tiled(tex, verts):
        m = sphere_mesh.replace(texture=tex, verts=verts)
        return jnp.sum(
            render_rgba_tiled(m, cam, settings, tile_mesh)[..., :3] * wgt
        )

    g_plain = jax.grad(loss_plain, argnums=(0, 1))(
        sphere_mesh.texture, sphere_mesh.verts
    )
    g_tiled = jax.grad(loss_tiled, argnums=(0, 1))(
        sphere_mesh.texture, sphere_mesh.verts
    )
    for a, b in zip(g_tiled, g_plain):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    assert float(jnp.abs(g_plain[0]).sum()) > 0


def test_save_render_tile_parallel_1024(sphere_mesh, tmp_path):
    """The productized --tile_parallel path (VERDICT r2 item 5): save_render
    at 1024^2 rows-sharded over the 8 virtual devices writes the SAME pixels
    as the single-device render."""
    from st3d.core.cameras import FoVPerspectiveCameras
    from st3d.engine.pipelines import save_render
    from st3d.render.rasterize import RasterizationSettings
    from PIL import Image

    cam = FoVPerspectiveCameras.create(T=jnp.array([[0.0, 0.0, 3.0]]))
    settings = RasterizationSettings(image_size=1024, backend="xla")

    save_render(sphere_mesh, cam, settings, str(tmp_path / "tiled"),
                tile_parallel=True)
    save_render(sphere_mesh, cam, settings, str(tmp_path / "plain"),
                tile_parallel=False)
    a = np.asarray(Image.open(tmp_path / "tiled" / "view_0.png"))
    b = np.asarray(Image.open(tmp_path / "plain" / "view_0.png"))
    assert a.shape == (1024, 1024, 3)
    np.testing.assert_array_equal(a, b)


def test_tile_parallel_cli_flag():
    from st3d.engine.config import parse_second_approach

    cfg = parse_second_approach(["--tile_parallel", "true"])
    assert cfg.tile_parallel is True
    assert parse_second_approach([]).tile_parallel is False


def test_pick_tile_count():
    from st3d.parallel.tiles import pick_tile_count

    assert pick_tile_count(1024, 8) == 8
    assert pick_tile_count(100, 8) == 5   # largest divisor <= 8
    assert pick_tile_count(64, 1) == 1


def test_tiled_render_rejects_soft_settings():
    """The tiled epilogue shades hard K=1 only; soft/blur/multi-K configs
    must raise instead of silently rendering a different image than the
    single-device renderer (the docstring promises bit-identity)."""
    import pytest as _pytest

    from st3d.core.primitives import ico_sphere
    from st3d.core.cameras import FoVPerspectiveCameras, look_at_view_transform
    from st3d.render.rasterize import RasterizationSettings
    from st3d.parallel.tiles import render_meshes_tiled

    mesh = ico_sphere(1, texture_size=8)
    R, T = look_at_view_transform(dist=3.0, elev=0.0, azim=0.0)
    cams = FoVPerspectiveCameras.create(R=R, T=T)
    for kw in ({"soft": True}, {"blur_radius": 0.01},
               {"faces_per_pixel": 2}):
        st = RasterizationSettings(image_size=16, backend="xla", **kw)
        with _pytest.raises(ValueError, match="hard K=1"):
            render_meshes_tiled(mesh, cams, st)


def test_single_view_rasterize_keeps_nearest_face():
    """rasterize() (the public single-view API) must carry soft mode's
    nearest_face plane through the unbatching — shade_soft callers need
    it for silhouette gradients."""
    import jax.numpy as jnp

    from st3d.render.rasterize import RasterizationSettings, rasterize

    fv = jnp.asarray([[[-0.5, -0.5, 0.5], [0.5, -0.5, 0.5],
                       [0.0, 0.5, 0.5]]], jnp.float32)
    frags = rasterize(fv, RasterizationSettings(image_size=8, soft=True,
                                                backend="xla"))
    assert frags.nearest_face is not None
    assert frags.nearest_face.shape == (8, 8)
    frags_hard = rasterize(fv, RasterizationSettings(image_size=8,
                                                     backend="xla"))
    assert frags_hard.nearest_face is None
