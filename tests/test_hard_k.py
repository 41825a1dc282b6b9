"""Hard-mode blur_radius > 0 and faces_per_pixel > 1 (PyTorch3D
RasterizationSettings API parity, SURVEY.md D4; reference config
first_approach.py:107) vs a from-first-principles oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from st3d.core.cameras import FoVPerspectiveCameras
from st3d.render.rasterize import (
    BIG_Z,
    RasterizationSettings,
    face_verts_screen,
    rasterize_batch,
)
from st3d.render.soft import signed_distance_to_faces
from st3d.render.topk import blur_window_px, rasterize_hard_k


def _cam():
    return FoVPerspectiveCameras.create(T=jnp.array([[0.0, 0.0, 2.0]]))


def _oracle_hard_k(fv, size, k, blur):
    """PyTorch3D admission + ranking, computed exhaustively: a candidate
    covers the pixel or has exact squared NDC boundary distance < blur;
    the K nearest by (plane-extrapolated) inverse depth win."""
    f = fv.shape[0]
    h = w = size
    # Exact signed pixel distance of EVERY face at every pixel.
    sd = jnp.stack(
        [
            signed_distance_to_faces(fv, jnp.full((h, w), i, jnp.int32))
            for i in range(f)
        ],
        axis=-1,
    )  # (H, W, F), positive inside
    sd_ndc2 = (sd * (2.0 / size)) ** 2
    covered = sd >= 0.0
    eligible = covered | ((sd < 0) & (sd_ndc2 < blur))

    # Inverse depth from the affine 1/z plane (the framework's ranking).
    x = fv[:, :, 0]
    y = fv[:, :, 1]
    z = fv[:, :, 2]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    py, px = jnp.meshgrid(ys, xs, indexing="ij")
    w0 = ((x[:, 2] - x[:, 1]) * (py[..., None] - y[:, 1])
          - (y[:, 2] - y[:, 1]) * (px[..., None] - x[:, 1]))
    w1 = ((x[:, 0] - x[:, 2]) * (py[..., None] - y[:, 2])
          - (y[:, 0] - y[:, 2]) * (px[..., None] - x[:, 2]))
    w2 = ((x[:, 1] - x[:, 0]) * (py[..., None] - y[:, 0])
          - (y[:, 1] - y[:, 0]) * (px[..., None] - x[:, 0]))
    area = ((x[:, 1] - x[:, 0]) * (y[:, 2] - y[:, 0])
            - (y[:, 1] - y[:, 0]) * (x[:, 2] - x[:, 0]))
    b0, b1, b2 = w0 / area, w1 / area, w2 / area
    invz = b0 / z[:, 0] + b1 / z[:, 1] + b2 / z[:, 2]

    score = jnp.where(eligible, invz, -jnp.inf)
    vals, ids = jax.lax.top_k(score.reshape(h * w, f), k)
    ids = jnp.where(vals > -jnp.inf, ids, -1)
    return np.asarray(ids.reshape(h, w, k))


@pytest.fixture
def scene(sphere_mesh):
    size = 32
    fv = face_verts_screen(sphere_mesh.verts, sphere_mesh.faces, _cam(),
                           size)
    return fv, size


@pytest.mark.parametrize("backend", ["bruteforce", "xla", "pallas"])
def test_hard_k2_blur0_matches_oracle(scene, backend):
    """faces_per_pixel=2, blur=0: exactly the two nearest covering faces
    (front + back of the sphere)."""
    fv, size = scene
    settings = RasterizationSettings(
        image_size=size, backend=backend, faces_per_pixel=2
    )
    got = rasterize_hard_k(fv, settings)
    want = _oracle_hard_k(fv[0], size, 2, 0.0)
    np.testing.assert_array_equal(np.asarray(got.pix_to_face[0]), want)
    # Both slots filled inside the silhouette (front and back faces).
    inside = want[..., 0] >= 0
    assert (want[..., 1][inside] >= 0).mean() > 0.9


@pytest.mark.parametrize("backend", ["bruteforce", "xla"])
def test_blur_radius_dilates_and_matches_oracle(scene, backend):
    fv, size = scene
    blur = (4.0 / (size / 2.0)) ** 2  # 4-pixel window in NDC^2 units
    assert abs(blur_window_px(blur, size) - 4.0) < 1e-6
    settings = RasterizationSettings(
        image_size=size, backend=backend, blur_radius=blur,
        faces_per_pixel=1,
    )
    got = rasterize_hard_k(fv, settings)
    want = _oracle_hard_k(fv[0], size, 1, blur)
    got_ids = np.asarray(got.pix_to_face[0])

    hard = rasterize_batch(
        fv, RasterizationSettings(image_size=size, backend=backend)
    )
    cov0 = np.asarray(hard.pix_to_face[0]) >= 0
    covb = got_ids[..., 0] >= 0
    assert covb.sum() > cov0.sum()          # silhouette dilated
    assert (covb & cov0).sum() == cov0.sum()  # superset of hard coverage

    # Admission matches the oracle everywhere; the winning id may differ
    # only in the dilation ring where several non-covering faces near-tie.
    np.testing.assert_array_equal(covb, want[..., 0] >= 0)
    agree = (got_ids[..., 0] == want[..., 0])
    assert agree[cov0].all()                 # covered pixels: exact
    assert agree[covb].mean() > 0.95         # ring: near-ties only

    # dists: PyTorch3D sign convention (negative inside, positive in the
    # ring, within the window), -1 sentinel when empty.
    dists = np.asarray(got.dists[0, ..., 0])
    sd = np.asarray(
        signed_distance_to_faces(
            fv[0], jnp.maximum(got.pix_to_face[0, ..., 0], 0)
        )
    )
    inside = covb & (sd > 0)
    ring = covb & (sd < 0)
    assert (dists[inside] < 0).all()
    assert (dists[ring] > 0).all()
    assert (dists[ring] < blur).all()
    assert (dists[~covb] == -1.0).all()


def test_rasterize_batch_blur_slot0(scene):
    """rasterize_batch accepts blur>0 / fpp>1 (the reference's API surface)
    and returns the nearest slot with a consistent zbuf."""
    fv, size = scene
    blur = (2.0 / (size / 2.0)) ** 2
    frags = rasterize_batch(
        fv, RasterizationSettings(image_size=size, backend="xla",
                                  blur_radius=blur, faces_per_pixel=3)
    )
    hk = rasterize_hard_k(
        fv, RasterizationSettings(image_size=size, backend="xla",
                                  blur_radius=blur, faces_per_pixel=3)
    )
    np.testing.assert_array_equal(
        np.asarray(frags.pix_to_face), np.asarray(hk.pix_to_face[..., 0])
    )
    p2f = np.asarray(frags.pix_to_face)
    zb = np.asarray(frags.zbuf)
    assert (zb[p2f < 0] == BIG_Z).all()
    assert (zb[p2f >= 0] < BIG_Z).all()

    # blur=0, K=2: slot 0 equals the plain hard rasterizer's winner.
    frags2 = rasterize_batch(
        fv, RasterizationSettings(image_size=size, backend="xla",
                                  faces_per_pixel=2)
    )
    hard = rasterize_batch(
        fv, RasterizationSettings(image_size=size, backend="xla")
    )
    np.testing.assert_array_equal(
        np.asarray(frags2.pix_to_face), np.asarray(hard.pix_to_face)
    )


def test_hard_k_zbuf_and_bary(scene):
    """zbuf is the perspective-correct interpolated depth and bary sums to
    1 on covered slots."""
    fv, size = scene
    settings = RasterizationSettings(
        image_size=size, backend="bruteforce", faces_per_pixel=2
    )
    got = rasterize_hard_k(fv, settings)
    hard = rasterize_batch(
        fv, RasterizationSettings(image_size=size, backend="bruteforce")
    )
    cov = np.asarray(hard.pix_to_face[0]) >= 0
    z_k = np.asarray(got.zbuf[0, ..., 0])
    z_hard = np.asarray(hard.zbuf[0])
    np.testing.assert_allclose(z_k[cov], z_hard[cov], rtol=1e-5)
    bary = np.asarray(got.bary[0, ..., 0, :])
    np.testing.assert_allclose(bary[cov].sum(-1), 1.0, atol=1e-5)


def _eviction_scene(n_slivers=7, size=32):
    """Adversarial slack scene: a covering triangle at z=5 behind
    ``n_slivers`` thin slivers whose tips sit DIAGONALLY 3.2px from the
    probe pixel (16,16). For each sliver the proxy distance (min of
    edge-line and bbox distances, rasterize._pixel_depth_and_cover) is
    ~-3.2px — inside a 4px admission window — while the EXACT segment
    distance is sqrt(2)*3.2 = 4.5px, outside the blur radius: all are
    proxy-admitted, exact-rejected, and nearer in depth than the true
    covering face."""
    faces = [[[4.0, 4.0, 5.0], [28.0, 4.0, 5.0], [16.0, 28.0, 5.0]]]
    for i in range(n_slivers):
        j = 0.02 * i
        tx, ty, z = 19.2 + j, 19.2 - j, 1.0 + 0.05 * i
        faces.append([
            [tx, ty, z], [tx + 8.8, ty + 8.4, z], [tx + 8.4, ty + 8.8, z],
        ])
    return jnp.asarray(np.array(faces, np.float32))


@pytest.mark.parametrize("backend", ["bruteforce", "xla"])
def test_adversarial_slack_eviction_is_loud(backend):
    """>slack proxy-only candidates ahead of a true candidate (VERDICT r2
    item 7): the default slack misses the covering face at the probe pixel
    but REPORTS it via HardKFragments.saturated; raising
    settings.hard_k_slack restores exactness and zeroes the diagnostic."""
    size = 32
    blur = (4.0 / (size / 2.0)) ** 2          # 4px admission window
    fv = _eviction_scene()[None]
    settings = RasterizationSettings(
        image_size=size, blur_radius=blur, faces_per_pixel=1,
        backend=backend,
    )

    frags = rasterize_hard_k(fv, settings)    # default hard_k_slack=4
    assert int(frags.pix_to_face[0, 16, 16, 0]) == -1   # true face evicted
    assert int(frags.saturated[0]) > 0                  # ...and reported

    frags_ok = rasterize_hard_k(fv, settings.replace(hard_k_slack=8))
    assert int(frags_ok.saturated[0]) == 0              # provably exact
    assert int(frags_ok.pix_to_face[0, 16, 16, 0]) == 0
    want = _oracle_hard_k(fv[0], size, 1, blur)
    np.testing.assert_array_equal(
        np.asarray(frags_ok.pix_to_face[0]), want
    )


def test_saturation_check_warns_with_remedy():
    """check_hard_k_saturation (the production surface of the diagnostic,
    VERDICT r3 item 6): a saturating scene warns with the raise-slack
    remedy; enough slack is silent; non-saturable configs short-circuit."""
    import warnings

    from st3d.render.topk import check_hard_k_saturation

    size = 32
    blur = (4.0 / (size / 2.0)) ** 2
    fv = _eviction_scene()[None]
    settings = RasterizationSettings(
        image_size=size, blur_radius=blur, faces_per_pixel=1, backend="xla",
    )

    with pytest.warns(UserWarning, match="hard_k_slack"):
        n = check_hard_k_saturation(fv, settings, context="unit test")
    assert n > 0

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert check_hard_k_saturation(
            fv, settings.replace(hard_k_slack=8)
        ) == 0
        # Default K=1/blur=0 cannot saturate: returns 0 without rasterizing.
        assert check_hard_k_saturation(
            fv, RasterizationSettings(image_size=size, backend="xla")
        ) == 0


def test_pipeline_surfaces_saturation(monkeypatch):
    """The pipelines' warn_if_hard_k_saturated wrapper fires on a
    saturating projected scene (face_verts_screen patched to the sliver
    scene) and is a no-op for the default config."""
    import warnings

    import st3d.render.renderer as rmod

    size = 32
    blur = (4.0 / (size / 2.0)) ** 2
    monkeypatch.setattr(
        rmod, "face_verts_screen", lambda *a, **k: _eviction_scene()[None]
    )

    class _M:  # only .verts/.faces are touched once fv is patched
        verts = jnp.zeros((3, 3))
        faces = jnp.zeros((1, 3), jnp.int32)

    settings = RasterizationSettings(
        image_size=size, blur_radius=blur, faces_per_pixel=1, backend="xla",
    )
    with pytest.warns(UserWarning, match="hard_k_slack"):
        n = rmod.warn_if_hard_k_saturated(_M(), _cam(), settings,
                                          context="pipeline test")
    assert n > 0
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert rmod.warn_if_hard_k_saturated(
            _M(), _cam(), RasterizationSettings(image_size=size,
                                                backend="xla")
        ) == 0


def test_blur_and_slack_cli_flags_flow():
    """--blur_radius/--hard_k_slack parse into the config (the remedy the
    saturation warning names must be reachable from the CLI)."""
    from st3d.engine.config import parse_first_approach

    cfg = parse_first_approach([
        "--blur_radius", "0.01", "--hard_k_slack", "6",
    ])
    assert cfg.blur_radius == 0.01 and cfg.hard_k_slack == 6
