#!/usr/bin/env python
"""Profile the bench step on TPU and print per-HLO-op times.

Method (docs/PERF_NOTES.md "How to profile"): jax.profiler.trace around 2
scan calls, parse the xplane with xprof's hlo_stats converter, divide by
50 steps (2 calls x 25 scanned). The `while` row wraps the whole scan —
excluded from the category sums.

Usage: python scripts/perf_trace.py [out.json] [--size N] [--st2d]

``--st2d`` traces hot loop A (the 2D style-transfer step, VERDICT r3
weakness 3: it had no PERF_NOTES decomposition) instead of the 3D bench
step — same workload shape as scripts/bench_st2d.py.
"""

import glob
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import jax

    import bench

    if "--size" in sys.argv:
        i = sys.argv.index("--size")
        bench.SIZE = int(sys.argv[i + 1])
        del sys.argv[i:i + 2]

    assert jax.default_backend() == "tpu", "profile on the TPU backend"
    if "--st2d" in sys.argv:
        sys.argv.remove("--st2d")
        import jax.numpy as jnp
        import optax

        from st3d.engine.style_transfer2d import _scan_steps
        from st3d.io.image import load_as_tensor
        from st3d.models.vgg import get_vgg
        from st3d.ops.losses import StyleContentTargets
        from st3d.utils.assets import resolve_asset

        size, views, n = bench.SIZE, bench.VIEWS, 25
        vgg = get_vgg()
        style = load_as_tensor(resolve_asset("./imgs/Style_1.jpg"), size)
        style_b = jnp.broadcast_to(style[None], (views,) + style.shape)
        targets = StyleContentTargets.create(
            style_b, style_b, vgg, dtype=jnp.bfloat16, layout="NHWC")
        imgs = jnp.transpose(style_b, (0, 2, 3, 1))
        opt_state = optax.adam(0.003).init(imgs)

        def steps(im, st):
            im, st, losses = _scan_steps(
                im, st, targets, vgg, jnp.float32(1e6), jnp.float32(1.0),
                n, 0.003, jnp.bfloat16)
            return im, st, losses

        params, opt_state = imgs, opt_state
    else:
        steps, params, opt_state, n = bench.build_step("bfloat16")
    params, opt_state, losses = steps(params, opt_state)  # compile+warm
    losses.block_until_ready()

    tmp = tempfile.mkdtemp(prefix="st3d_trace_")
    with jax.profiler.trace(tmp):
        for _ in range(2):
            params, opt_state, losses = steps(params, opt_state)
        losses.block_until_ready()

    xplanes = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"),
                        recursive=True)
    assert xplanes, f"no xplane under {tmp}"
    from xprof.convert.raw_to_tool_data import xspace_to_tool_data

    data, _ = xspace_to_tool_data([xplanes[0]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    rows = json.loads(data)
    # hlo_stats gtable: first entry describes columns; find total-time col.
    cols = [c["label"] for c in rows["cols"]]
    out = []
    for r in rows["rows"]:
        vals = [c.get("v") for c in r["c"]]
        rec = dict(zip(cols, vals))
        out.append(rec)

    # Column names as of xprof 2.x: 'HLO op text'/'Total time (us)' vary;
    # dump whatever is there, sorted by the first numeric 'time' column.
    tcol = next((c for c in cols if "time" in c.lower()
                 and "%" not in c), None)
    ncol = next((c for c in cols if "name" in c.lower()
                 or "expression" in c.lower()), cols[0])
    ccol = next((c for c in cols if "categor" in c.lower()), None)
    out.sort(key=lambda r: -(r.get(tcol) or 0))
    n_steps = 2 * n
    print(f"# per-step times (total/{n_steps}); columns: {cols}",
          file=sys.stderr)
    fcol = next((c for c in cols if "framework" in c.lower()), None)
    ocol = next((c for c in cols if "occurrence" in c.lower()), None)
    cat_sum = {}
    for r in out[:60]:
        t_us = (r.get(tcol) or 0) / n_steps
        name = str(r.get(ncol))[:60]
        cat = str(r.get(ccol)) if ccol else "?"
        fw = str(r.get(fcol) or "")[:90] if fcol else ""
        occ = r.get(ocol) if ocol else ""
        if "while" not in name:
            cat_sum[cat] = cat_sum.get(cat, 0.0) + t_us
        print(f"{t_us:10.1f} us x{occ:>3} {cat:22s} {name:60s} {fw}")
    print("--- category sums (top-60 rows, while excluded) ---")
    for k, v in sorted(cat_sum.items(), key=lambda kv: -kv[1]):
        print(f"{v:10.1f} us  {k}")
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
