#!/usr/bin/env python
"""On-device TPU kernel regression smoke (one command, run once per round).

The CI suite runs Pallas kernels only in interpret mode on CPU, so Mosaic
compile/layout miscompiles are structurally invisible to it (this repo has
already hit two — see CLAUDE.md). This script runs the COMPILED kernels on
the real chip and asserts:

  1. pallas == xla pix_to_face / zbuf, hard mode, cow @512², 4 views
  2. pallas == xla nearest_face, soft mode (same scene)
  3. donation-sensitive jit paths: the donated scan-chunked optimization
     step produces the same loss trajectory as the undonated variant
     (donation bugs only manifest on real TPU — CPU ignores donation)

Writes TPU_SMOKE.json at the repo root; exit code 0 iff everything passed.

Usage:  python scripts/tpu_smoke.py        (takes a few minutes: remote
        Mosaic compiles of the fused graphs dominate)
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZE = 512
VIEWS = 4


def main() -> int:
    t_start = time.time()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from st3d.utils.compilecache import enable_compilation_cache

    enable_compilation_cache()

    results = {"backend": jax.default_backend(), "checks": {}}
    ok = True

    def record(name, passed, detail=""):
        nonlocal ok
        results["checks"][name] = {"ok": bool(passed), "detail": detail}
        ok = ok and bool(passed)
        print(f"[{'PASS' if passed else 'FAIL'}] {name} {detail}",
              file=sys.stderr)

    if jax.default_backend() != "tpu":
        record("backend_is_tpu", False,
               f"default backend is {jax.default_backend()}; this smoke "
               "must run on the real chip")
        _write(results, ok=False)
        return 1

    from st3d.core.cameras import build_fixed_cameras
    from st3d.io.obj import load_mesh
    from st3d.render.rasterize import (
        RasterizationSettings,
        face_verts_screen,
        rasterize_batch,
    )
    from st3d.utils.assets import resolve_asset

    mesh = load_mesh(resolve_asset("./objects/cow_mesh/cow.obj"))
    cams = build_fixed_cameras(VIEWS, shuffle=False)
    fv = face_verts_screen(mesh.verts, mesh.faces, cams, SIZE)

    # --- 1. hard mode: compiled pallas vs xla ------------------------------
    # On-device the two backends use different FMA orderings, so true depth
    # near-ties may flip the winner on a handful of pixels (the bit-exact
    # invariant holds in interpret mode, where the fp paths match — CI
    # enforces it). A Mosaic miscompile instead produces WRONG faces:
    # mismatched pixels whose depths disagree, or coverage appearing /
    # vanishing wholesale. So: mismatch fraction must be tiny AND every
    # both-covered mismatch must be a depth tie.
    hard_p = RasterizationSettings(image_size=SIZE, backend="pallas")
    hard_x = RasterizationSettings(image_size=SIZE, backend="xla")
    t0 = time.time()
    frags_p = jax.jit(lambda v: rasterize_batch(v, hard_p))(fv)
    frags_x = jax.jit(lambda v: rasterize_batch(v, hard_x))(fv)
    p2f_p = np.asarray(frags_p.pix_to_face)
    p2f_x = np.asarray(frags_x.pix_to_face)
    zb_p = np.asarray(frags_p.zbuf)
    zb_x = np.asarray(frags_x.zbuf)
    diff = p2f_p != p2f_x
    frac = diff.mean()
    both = diff & (p2f_p >= 0) & (p2f_x >= 0)
    ties_ok = True
    if both.any():
        rel = np.abs(zb_p[both] - zb_x[both]) / np.maximum(zb_x[both], 1e-6)
        ties_ok = bool(rel.max() < 1e-3)
    cov_flips = int((diff & ~both).sum())
    record(
        "hard_pix_to_face_pallas_vs_xla",
        frac < 5e-5 and ties_ok and cov_flips <= 8,
        f"{int(diff.sum())} / {p2f_p.size} pixels differ "
        f"({cov_flips} coverage flips, depth-ties={ties_ok}; "
        f"compile+run {time.time() - t0:.0f}s)",
    )
    cov = (p2f_x >= 0) & ~diff
    zrel = (np.abs(zb_p - zb_x)[cov] / zb_x[cov]).max() if cov.any() else 0.0
    record("hard_zbuf_close", float(zrel) < 1e-3,
           f"max rel |dz| = {float(zrel):.2e}")

    # --- 2. soft mode: observable silhouette coverage agreement ------------
    # nearest_face ids legitimately differ outside the cull margin (where
    # coverage is saturated ~0) and on selection-proxy ties; the observable
    # is sigmoid(sd / sigma). Compare its error distribution.
    from st3d.render.soft import signed_distance_to_faces

    soft_p = RasterizationSettings(image_size=SIZE, backend="pallas",
                                   soft=True)
    soft_x = RasterizationSettings(image_size=SIZE, backend="xla", soft=True)
    t0 = time.time()
    sfrags_p = jax.jit(lambda v: rasterize_batch(v, soft_p))(fv)
    sfrags_x = jax.jit(lambda v: rasterize_batch(v, soft_x))(fv)

    @jax.jit
    def coverages(nf_p, nf_x):
        a_p = jax.vmap(
            lambda f, ids: jax.nn.sigmoid(
                signed_distance_to_faces(f, ids) / 1.0)
        )(fv, nf_p)
        a_x = jax.vmap(
            lambda f, ids: jax.nn.sigmoid(
                signed_distance_to_faces(f, ids) / 1.0)
        )(fv, nf_x)
        return a_p, a_x

    a_p, a_x = coverages(sfrags_p.nearest_face, sfrags_x.nearest_face)
    d = np.abs(np.asarray(a_p) - np.asarray(a_x))
    record(
        "soft_coverage_pallas_vs_xla",
        d.mean() < 3e-3 and (d > 0.05).mean() < 0.01,
        f"mean |da| = {d.mean():.2e}, frac>0.05 = {(d > 0.05).mean():.2e} "
        f"(compile+run {time.time() - t0:.0f}s)",
    )

    # --- 2b. streaming kernel (large-face-count path) compiles + agrees ----
    # The streaming variant (VMEM O(face_chunk)) must match the resident
    # kernel's output on-device; also exercised at a face count where it is
    # the auto-selected path.
    from st3d.kernels.raster_pallas import rasterize_pallas_batched

    t0 = time.time()
    strm = jax.jit(
        lambda v: rasterize_pallas_batched(v, SIZE, stream=True)
    )(fv)
    sp = np.asarray(strm.pix_to_face)
    sdiff = sp != p2f_p
    record(
        "stream_matches_resident_on_device", sdiff.mean() < 5e-5,
        f"{int(sdiff.sum())} / {sp.size} pixels differ "
        f"(compile+run {time.time() - t0:.0f}s)",
    )

    import sys as _sys
    _sys.path.insert(0, os.path.join(REPO, "tests"))
    from conftest import make_ico_sphere

    big = make_ico_sphere(level=6)  # 81,920 faces -> auto-streams
    bigfv = face_verts_screen(
        big.verts, big.faces,
        build_fixed_cameras(1, shuffle=False), SIZE,
    )
    t0 = time.time()
    bg = jax.jit(
        lambda v: rasterize_batch(
            v, RasterizationSettings(image_size=SIZE, backend="pallas"))
    )(bigfv)
    bw = jax.jit(
        lambda v: rasterize_batch(
            v, RasterizationSettings(image_size=SIZE, backend="xla"))
    )(bigfv)
    bp = np.asarray(bg.pix_to_face)
    bx = np.asarray(bw.pix_to_face)
    bdiff = bp != bx
    bcov = float((bx >= 0).mean())
    record(
        "stream_81920_faces_vs_xla",
        bdiff.mean() < 5e-4 and bcov > 0.1,
        f"{int(bdiff.sum())} / {bp.size} pixels differ, coverage {bcov:.2f} "
        f"(compile+run {time.time() - t0:.0f}s)",
    )

    # --- 3. donation-sensitive jit paths -----------------------------------
    # The production second-approach step scans with donated (params,
    # opt_state) buffers. A donation bug (aliased buffer read after write)
    # only manifests on the real chip. Run 3 chunks donated vs undonated
    # from identical initial state: trajectories must match bitwise.
    import functools

    import optax

    from st3d.engine.optim import apply_params, setup_optimizations
    from st3d.models.vgg import get_features, get_vgg
    from st3d.ops.losses import StyleContentTargets, style_content_loss
    from st3d.render.renderer import render_meshes

    small = 256
    settings = RasterizationSettings(image_size=small, backend="pallas")
    tex = jax.image.resize(mesh.texture, (small, small, 3), "bilinear")
    smesh = mesh.replace(texture=tex)
    vgg = get_vgg()
    style_b = jnp.broadcast_to(
        jnp.linspace(0, 1, small * small * 3).reshape(1, 3, small, small),
        (VIEWS, 3, small, small),
    )
    content_imgs, _ = jax.jit(
        lambda m, c: render_meshes(m, c, settings)
    )(smesh, cams)
    targets = StyleContentTargets.create(content_imgs, style_b, vgg)
    params0, optimizer, opt_state0 = setup_optimizations(
        "texture", smesh, 0.01
    )

    def loss_fn(p):
        imgs, _ = render_meshes(apply_params(smesh, p), cams, settings)
        return style_content_loss(
            get_features(imgs, vgg), targets, 1e6, 1.0
        )

    def scan_steps(p, st, n):
        def one(carry, _):
            p, st = carry
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, st = optimizer.update(grads, st, p)
            p = optax.apply_updates(p, updates)
            return (p, st), loss

        (p, st), losses = jax.lax.scan(one, (p, st), None, length=n)
        return p, st, losses

    donated = jax.jit(functools.partial(scan_steps, n=5),
                      donate_argnums=(0, 1))
    plain = jax.jit(functools.partial(scan_steps, n=5))

    def run(step):
        p = jax.tree_util.tree_map(jnp.copy, params0)
        st = jax.tree_util.tree_map(jnp.copy, opt_state0)
        traj = []
        for _ in range(3):
            p, st, losses = step(p, st)
            traj.append(np.asarray(losses))
        return np.concatenate(traj), np.asarray(p["texture"])

    t0 = time.time()
    traj_d, tex_d = run(donated)
    traj_u, tex_u = run(plain)
    traj_eq = bool(np.array_equal(traj_d, traj_u))
    tex_eq = bool(np.array_equal(tex_d, tex_u))
    record(
        "donated_scan_matches_undonated", traj_eq and tex_eq,
        f"losses {'==' if traj_eq else '!='}, texture "
        f"{'==' if tex_eq else '!='} "
        f"(compile+run {time.time() - t0:.0f}s); "
        f"final loss {traj_d[-1]:.4g}",
    )
    finite = bool(np.isfinite(traj_d).all())
    decreasing = bool(traj_d[-1] < traj_d[0])
    record("donated_trajectory_sane", finite and decreasing,
           f"finite={finite} decreasing={decreasing}")

    # --- 4. compiled Pallas conv kernel vs XLA conv --------------------
    from st3d.kernels.conv_pallas import conv3x3_bias

    for dtype, shape, cout, tol in (
        (jnp.bfloat16, (2, 512, 512, 64), 64, 0.25),
        (jnp.float32, (2, 768, 768, 64), 64, 1e-3),   # wide-image banding
        (jnp.bfloat16, (2, 64, 64, 512), 512, 4.0),   # deep-layer banding
    ):
        key = jax.random.PRNGKey(7)
        xc = jax.random.normal(key, shape, dtype)
        wc = (jax.random.normal(jax.random.fold_in(key, 1),
                                (3, 3, shape[3], cout), jnp.float32)
              * 0.05).astype(dtype)
        bc = jax.random.normal(jax.random.fold_in(key, 2), (cout,), dtype)
        ref = jax.jit(lambda xx: jax.lax.conv_general_dilated(
            xx, wc, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dtype) + bc)(xc)
        out = jax.jit(lambda xx: conv3x3_bias(xx, wc, bc))(xc)
        diff = float(jnp.max(jnp.abs(
            ref.astype(jnp.float32) - out.astype(jnp.float32))))
        record(
            f"pallas_conv_{shape[1]}x{shape[3]}_{jnp.dtype(dtype).name}",
            diff <= tol, f"max|pallas-xla|={diff:.3g} (tol {tol})",
        )

    # --- 5. fused conv+relu+pool kernel: fwd values + bwd routing ------
    # Forward compares against pure XLA (loose: conv accumulation-order
    # rounding). Backward compares against the PALLAS unfused chain
    # (conv3x3_bias_relu + reduce_window): identical conv rounding means
    # identical bf16 pool ties, so the argmax routing — and therefore the
    # gradient — must match tightly; a pure-XLA bwd comparison is
    # meaningless in max norm (a tie broken differently moves a whole
    # |dp| to another pixel).
    from st3d.kernels.conv_pallas import (conv3x3_bias_relu,
                                          conv3x3_bias_relu_pool)

    def _xla_crp(xx, wc, bc, dtype):
        y = jax.lax.conv_general_dilated(
            xx, wc, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dtype) + bc
        y = jnp.maximum(y, 0.0)
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    def _pallas_unfused(xx, wc, bc):
        y = conv3x3_bias_relu(xx, wc, bc)
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    for dtype, shape, cout, ftol, btol in (
        (jnp.bfloat16, (2, 512, 512, 64), 64, 0.25, 1e-3),
        (jnp.bfloat16, (2, 256, 256, 128), 128, 0.5, 1e-3),
    ):
        key = jax.random.PRNGKey(9)
        xc = jax.random.normal(key, shape, dtype)
        wc = (jax.random.normal(jax.random.fold_in(key, 1),
                                (3, 3, shape[3], cout), jnp.float32)
              * 0.05).astype(dtype)
        bc = jax.random.normal(jax.random.fold_in(key, 2), (cout,), dtype)
        pref = jax.jit(lambda xx: _xla_crp(xx, wc, bc, dtype))(xc)
        pout = jax.jit(lambda xx: conv3x3_bias_relu_pool(xx, wc, bc)[0])(xc)
        dfwd = float(jnp.max(jnp.abs(
            pref.astype(jnp.float32) - pout.astype(jnp.float32))))
        wgt = jax.random.normal(jax.random.fold_in(key, 3), pref.shape, dtype)
        gf = jax.jit(jax.grad(lambda xx: jnp.sum(
            (conv3x3_bias_relu_pool(xx, wc, bc)[0] * wgt
             ).astype(jnp.float32))))(xc)
        gs = jax.jit(jax.grad(lambda xx: jnp.sum(
            (_pallas_unfused(xx, wc, bc) * wgt).astype(jnp.float32))))(xc)
        dbwd = float(jnp.max(jnp.abs(
            gf.astype(jnp.float32) - gs.astype(jnp.float32))))
        record(
            f"pallas_conv_pool_{shape[1]}x{shape[3]}",
            dfwd <= ftol and dbwd <= btol,
            f"fwd max|d|={dfwd:.3g} (tol {ftol}) vs XLA; "
            f"bwd max|d|={dbwd:.3g} (tol {btol}) vs pallas-unfused",
        )

    # --- 6. packed (space-to-depth) conv1_2 kernel --------------------
    # Forward vs XLA (loose bf16 tol as above). Backward vs the pallas
    # unfused chain, tie-flip tolerant: the packed kernel's 4xK=256
    # accumulation order differs from the 9-tap form, so a few pool
    # candidates can round to different bf16 values and legitimately
    # re-route their tie — bound the FRACTION of gradient entries that
    # moved, not the max norm.
    from st3d.kernels.conv_pallas import conv3x3_bias_relu_pool_packed

    dtype, shape, cout = jnp.bfloat16, (2, 512, 512, 64), 64
    key = jax.random.PRNGKey(11)
    xc = jax.random.normal(key, shape, dtype)
    wc = (jax.random.normal(jax.random.fold_in(key, 1),
                            (3, 3, shape[3], cout), jnp.float32)
          * 0.05).astype(dtype)
    bc = jax.random.normal(jax.random.fold_in(key, 2), (cout,), dtype)
    t0 = time.time()
    pref = jax.jit(lambda xx: _xla_crp(xx, wc, bc, dtype))(xc)
    pout = jax.jit(
        lambda xx: conv3x3_bias_relu_pool_packed(xx, wc, bc)[0])(xc)
    dfwd = float(jnp.max(jnp.abs(
        pref.astype(jnp.float32) - pout.astype(jnp.float32))))
    wgt = jax.random.normal(jax.random.fold_in(key, 3), pref.shape, dtype)
    gf = jax.jit(jax.grad(lambda xx: jnp.sum(
        (conv3x3_bias_relu_pool_packed(xx, wc, bc)[0] * wgt
         ).astype(jnp.float32))))(xc)
    gs = jax.jit(jax.grad(lambda xx: jnp.sum(
        (_pallas_unfused(xx, wc, bc) * wgt).astype(jnp.float32))))(xc)
    dabs = jnp.abs(gf.astype(jnp.float32) - gs.astype(jnp.float32))
    frac_moved = float(jnp.mean((dabs > 1e-3).astype(jnp.float32)))
    record(
        "pallas_conv_packed_512x64",
        dfwd <= 0.25 and frac_moved <= 1e-4,
        f"fwd max|d|={dfwd:.3g} (tol 0.25) vs XLA; bwd frac moved "
        f"(>1e-3)={frac_moved:.2e} (tol 1e-4) vs pallas-unfused "
        f"(compile+run {time.time() - t0:.0f}s)",
    )

    # --- 7. phase-aligned packed stage 1 (stage1_pallas) ----------------
    # conv1_1_packed -> conv1_2_packed_pool on-device vs the XLA chain:
    # fwd pooled values (loose bf16 tol), the folded conv1_1 Gram, and the
    # full-chain input gradient in F32 vs autodiff of the jnp reference.
    # The gradient check MUST be f32 + same-math: comparing bf16 chains
    # with different forwards (kernel vs XLA conv) flips ~1% of relu
    # masks / pool argmaxes at bf16 rounding boundaries, and every dx
    # entry sums 576 mask-gated terms — measured frac-moved 0.72 between
    # two CORRECT bf16 implementations (round 4). In f32 the boundary
    # measure collapses: same chains measure 2e-4 (flips need the
    # pre-activation within f32 reassociation noise of 0).
    from st3d.kernels.stage1_pallas import (
        _conv1_1_packed_ref,
        _conv1_2_ref,
        conv1_1_packed,
        conv1_2_packed_pool,
        fold_gram48,
        unpack_output5,
    )

    dtype, shape = jnp.bfloat16, (2, 512, 512, 3)
    key = jax.random.PRNGKey(13)
    xc = jax.random.uniform(key, shape, dtype)
    w1 = (jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 3, 64),
                            jnp.float32) * 0.2).astype(dtype)
    b1 = (jax.random.normal(jax.random.fold_in(key, 2), (64,),
                            jnp.float32) * 0.1).astype(dtype)
    w2 = (jax.random.normal(jax.random.fold_in(key, 3), (3, 3, 64, 64),
                            jnp.float32) * 0.05).astype(dtype)
    b2 = (jax.random.normal(jax.random.fold_in(key, 4), (64,),
                            jnp.float32) * 0.1).astype(dtype)

    def _xla_conv11(xx):
        return jax.lax.conv_general_dilated(
            xx, w1, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dtype) + b1

    t0 = time.time()

    @jax.jit
    def s1_fwd(xx):
        z5, g48, s48 = conv1_1_packed(xx, w1, b1)
        p, _ = conv1_2_packed_pool(z5, w2, b2)
        g = fold_gram48(g48, s48, w1.astype(jnp.float32),
                        b1.astype(jnp.float32), shape[1] * shape[2])
        return p, g, unpack_output5(z5)

    p_s1, g_s1, y1_s1 = s1_fwd(xc)
    tap = jax.jit(_xla_conv11)(xc)
    y1 = jnp.maximum(tap, 0.0)
    p_ref = jax.jit(lambda yy: _xla_crp(yy, w2, b2, dtype))(y1)
    g_ref = jnp.einsum("bhwc,bhwd->bcd", tap.astype(jnp.float32),
                       tap.astype(jnp.float32))
    d_y1 = float(jnp.max(jnp.abs(
        y1_s1.astype(jnp.float32) - y1.astype(jnp.float32))))
    d_p = float(jnp.max(jnp.abs(
        p_s1.astype(jnp.float32) - p_ref.astype(jnp.float32))))
    d_g = float(jnp.max(jnp.abs(g_s1 - g_ref))
                / max(float(jnp.max(jnp.abs(g_ref))), 1e-9))
    xf = xc.astype(jnp.float32)
    w1f, b1f = w1.astype(jnp.float32), b1.astype(jnp.float32)
    w2f, b2f = w2.astype(jnp.float32), b2.astype(jnp.float32)
    wgt = jax.random.normal(jax.random.fold_in(key, 5), p_ref.shape,
                            jnp.float32)
    g_k = jax.jit(jax.grad(lambda xx: jnp.sum(conv1_2_packed_pool(
        conv1_1_packed(xx, w1f, b1f)[0], w2f, b2f
    )[0] * wgt)))(xf)
    g_r = jax.jit(jax.grad(lambda xx: jnp.sum(_conv1_2_ref(
        _conv1_1_packed_ref(xx, w1f, b1f)[0], w2f, b2f
    ) * wgt)))(xf)
    dabs = jnp.abs(g_k - g_r)
    gscale = max(float(jnp.max(jnp.abs(g_r))), 1e-9)
    frac_moved = float(jnp.mean((dabs > 1e-4 * gscale).astype(jnp.float32)))
    record(
        "stage1_packed_512",
        d_y1 <= 0.25 and d_p <= 0.5 and d_g <= 0.02 and frac_moved <= 1e-3,
        f"conv1_1 max|d|={d_y1:.3g} pooled max|d|={d_p:.3g} "
        f"gram rel|d|={d_g:.3g} f32 bwd frac moved (>1e-4*scale)="
        f"{frac_moved:.2e} (compile+run {time.time() - t0:.0f}s)",
    )

    # --- 7b. stage-1 v3 (stage1v3_pallas, opt-in via ST3D_STAGE1=v3;
    # v2 stayed default after the round-5 A/B measured v3 slower) --------
    # Check 7's f32 same-math discipline does NOT transfer to v3: v3's
    # in-kernel f32 dots round at MXU-pass level on device (unlike v2's —
    # measured round 5, fwd rel ~2e-3 vs the XLA f32 reference), so the
    # full-chain f32 gradient comparison sees sparse relu/pool boundary
    # flips at full value scale (measured frac(>1e-4*scale)=0.89,
    # max|d|=0.20*scale; the identical comparison is EXACT in interpret
    # mode — tests/test_stage1v3_pallas.py — so the banding/fold logic is
    # certified there). Gate what the device can prove: bf16 fwd values,
    # the f32 gram-cotangent input grad (relu-free VJP path: dacc =
    # y@sym(dG) then the linear fold — measured 3.6e-3 rel), and finite
    # execution of the f32 conv1_2 backward at the 512² banding.
    from st3d.kernels.stage1v3_pallas import (
        _conv1_1_v3_ref,
        conv1_1_packed_v3,
        conv1_2_packed_pool_v3,
        stage1_v3_supported,
    )

    t0 = time.time()
    assert stage1_v3_supported(xc) and stage1_v3_supported(xf)

    @jax.jit
    def s1v3_fwd(xx):
        z5, g64 = conv1_1_packed_v3(xx, w1, b1)
        p, _ = conv1_2_packed_pool_v3(z5, w2, b2)
        return p, g64, unpack_output5(z5)

    p_s3, g_s3, y1_s3 = s1v3_fwd(xc)
    d3_y1 = float(jnp.max(jnp.abs(
        y1_s3.astype(jnp.float32) - y1.astype(jnp.float32))))
    d3_p = float(jnp.max(jnp.abs(
        p_s3.astype(jnp.float32) - p_ref.astype(jnp.float32))))
    # v3's g64 grams the ROUNDED pre-relu tap (same rounding as the tap
    # route) — compare against the bf16 tap's gram, not the f32 one.
    g_ref_b = jnp.einsum(
        "bhwc,bhwd->bcd",
        tap.astype(jnp.float32), tap.astype(jnp.float32))
    d3_g = float(jnp.max(jnp.abs(g_s3 - g_ref_b))
                 / max(float(jnp.max(jnp.abs(g_ref_b))), 1e-9))
    ctg = jax.random.normal(jax.random.fold_in(key, 6), g_s3.shape,
                            jnp.float32) * 1e-3

    # f32 gram-cotangent-only input grad: exercises the conv1_1 backward
    # kernel (recompute + y@sym(dG) + fold) on a relu-mask-free cotangent
    # path, so flips can't hide real fold bugs and rounding is the only
    # residual.
    gg_k = jax.jit(jax.grad(lambda xx: jnp.sum(
        conv1_1_packed_v3(xx, w1f, b1f)[1] * ctg)))(xf)
    gg_r = jax.jit(jax.grad(lambda xx: jnp.sum(
        _conv1_1_v3_ref(xx, w1f, b1f)[1] * ctg)))(xf)
    gg_scale = max(float(jnp.max(jnp.abs(gg_r))), 1e-9)
    gg_rel = float(jnp.max(jnp.abs(gg_k - gg_r))) / gg_scale

    # f32 conv1_2 backward at the 512² banding: must execute (VMEM fit)
    # and stay finite; the value diff vs the XLA reference is flip-bounded
    # so it is recorded informationally, not gated.
    z5f = jax.jit(lambda xx: _conv1_1_v3_ref(xx, w1f, b1f)[0])(xf)
    c12_k = jax.jit(jax.grad(lambda zz: jnp.sum(
        conv1_2_packed_pool_v3(zz, w2f, b2f)[0] * wgt)))(z5f)
    c12_r = jax.jit(jax.grad(lambda zz: jnp.sum(
        _conv1_2_ref(zz, w2f, b2f) * wgt)))(z5f)
    c12_scale = max(float(jnp.max(jnp.abs(c12_r))), 1e-9)
    c12_rel = float(jnp.max(jnp.abs(c12_k - c12_r))) / c12_scale
    c12_finite = bool(jnp.all(jnp.isfinite(c12_k)))
    record(
        "stage1_v3_512",
        d3_y1 <= 0.25 and d3_p <= 0.5 and d3_g <= 0.02
        and gg_rel <= 5e-2 and c12_finite,
        f"bf16 fwd: conv1_1 max|d|={d3_y1:.3g} pooled max|d|={d3_p:.3g} "
        f"gram rel|d|={d3_g:.3g}; f32 gram-ct bwd rel max|d|="
        f"{gg_rel:.2e} (tol 5e-2, relu-free path); f32 c12 bwd "
        f"finite={c12_finite} rel max|d|={c12_rel:.3g} (flip-bounded, "
        f"ungated; exact in interpret — see PERF_NOTES r5) "
        f"(compile+run {time.time() - t0:.0f}s)",
    )

    # --- 8. fused conv+Gram at the DEEP style-tap shapes ----------------
    # conv2_1's fused Gram has been in production since round 3 (512²-input
    # shape); the deep fused Grams (conv3_1/conv4_1/conv5_1 through the same
    # kernel at cin 128->512) are DEFAULT ON since r4f (+0.7% measured;
    # ST3D_NO_FUSED_GRAM_DEEP reverts). fwd conv + Gram vs XLA, bwd (incl.
    # a Gram cotangent) vs the unfused chain.
    from st3d.kernels.conv_pallas import conv3x3_bias_gram

    for dtype, shape, cout, ftol, gtol in (
        (jnp.bfloat16, (2, 128, 128, 128), 256, 1.0, 0.02),   # conv3_1
        (jnp.bfloat16, (2, 32, 32, 512), 512, 4.0, 0.02),     # conv5_1
    ):
        key = jax.random.PRNGKey(17)
        xc = jax.random.normal(key, shape, dtype)
        wc = (jax.random.normal(jax.random.fold_in(key, 1),
                                (3, 3, shape[3], cout), jnp.float32)
              * 0.05).astype(dtype)
        bc = jax.random.normal(jax.random.fold_in(key, 2), (cout,), dtype)
        t0 = time.time()

        def _xla_cg(xx):
            y = jax.lax.conv_general_dilated(
                xx, wc, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dtype) + bc
            g = jnp.einsum("bhwc,bhwd->bcd", y.astype(jnp.float32),
                           y.astype(jnp.float32))
            return y, g

        y_ref, g_ref = jax.jit(_xla_cg)(xc)
        y_k, g_k = jax.jit(lambda xx: conv3x3_bias_gram(xx, wc, bc))(xc)
        dfwd = float(jnp.max(jnp.abs(
            y_ref.astype(jnp.float32) - y_k.astype(jnp.float32))))
        dg = float(jnp.max(jnp.abs(g_k - g_ref))
                   / max(float(jnp.max(jnp.abs(g_ref))), 1e-9))
        ctg = jax.random.normal(jax.random.fold_in(key, 3),
                                g_ref.shape, jnp.float32)
        wgt = jax.random.normal(jax.random.fold_in(key, 4), y_ref.shape,
                                dtype)

        def _loss(fn):
            def go(xx):
                y, g = fn(xx)
                return (jnp.sum((y * wgt).astype(jnp.float32))
                        + jnp.sum(g * ctg))
            return go

        gb_k = jax.jit(jax.grad(_loss(
            lambda xx: conv3x3_bias_gram(xx, wc, bc))))(xc)
        gb_r = jax.jit(jax.grad(_loss(_xla_cg)))(xc)
        dabs = jnp.abs(gb_k.astype(jnp.float32) - gb_r.astype(jnp.float32))
        scale = max(float(jnp.max(jnp.abs(gb_r.astype(jnp.float32)))), 1e-9)
        dbwd = float(jnp.max(dabs)) / scale
        record(
            f"pallas_conv_gram_{shape[1]}x{shape[3]}",
            dfwd <= ftol and dg <= gtol and dbwd <= 0.05,
            f"fwd max|d|={dfwd:.3g} (tol {ftol}) gram rel|d|={dg:.3g} "
            f"bwd rel max|d|={dbwd:.3g} (compile+run {time.time()-t0:.0f}s)",
        )

    results["total_s"] = round(time.time() - t_start, 1)
    _write(results, ok)
    return 0 if ok else 1


def _write(results, ok):
    results["ok"] = bool(ok)
    path = os.path.join(REPO, "TPU_SMOKE.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"ok": results["ok"],
                      "checks": {k: v["ok"]
                                 for k, v in results["checks"].items()}}))


if __name__ == "__main__":
    raise SystemExit(main())
