#!/usr/bin/env python
"""Config-5 flagship on the real chip (VERDICT r3 item 4): 4 meshes x 5
styles through the batched fleet engine, single-chip, at a reduced size
that fits one v5e's HBM. Writes FLEET_TPU.json {steady it/s, per-style
losses finite, peak HBM}.

Substitutions (upstream-missing assets, VERDICT "What's missing" 3):
bunny.obj does not exist in the reference snapshot -> ico_sphere(level=4);
Style_2.jpg is absent -> Content.jpg stands in as the 5th style image.

Usage: python scripts/fleet_tpu.py [--size 256] [--epochs 6]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default=256, type=int)
    ap.add_argument("--epochs", default=6, type=int)
    ap.add_argument("--n_views", default=4, type=int)
    ap.add_argument("--out", default=os.path.join(REPO, "FLEET_TPU.json"))
    ap.add_argument("--output_path", default="/tmp/fleet_tpu_out")
    ap.add_argument("--dtype", default="bfloat16",
                    help="float32 for CPU validation (the CPU backend has "
                    "no bf16xbf16->f32 dot)")
    args = ap.parse_args()

    import jax

    from st3d.core.primitives import ico_sphere
    from st3d.engine.config import PipelineConfig
    from st3d.engine.fleetbatch import run_fleet_batched
    from st3d.io.obj import save_mesh
    from st3d.utils.compilecache import enable_compilation_cache

    enable_compilation_cache()
    # The axon tunnel exposes no device.memory_stats(); have the engine
    # AOT-compile the step and record XLA's memory analysis instead
    # (fleetbatch writes <output_path>/xla_mem.json).
    os.environ.setdefault("ST3D_FLEET_MEMLOWER", "1")

    sub_dir = "/tmp/fleet_sub"
    os.makedirs(sub_dir, exist_ok=True)
    bunny_sub = os.path.join(sub_dir, "bunny_sub.obj")
    if not os.path.isfile(bunny_sub):
        save_mesh(ico_sphere(level=4, texture_size=args.size), bunny_sub)

    objs = [
        "./objects/cow_mesh/cow.obj",
        "./objects/bob_mesh/bob.obj",
        "./objects/teapot_mesh/teapot.obj",   # auto-UV (no UVs upstream)
        bunny_sub,
    ]
    styles = [
        "./imgs/Style_1.jpg",
        "./imgs/Style_3.png",
        "./imgs/Style_4.jpeg",
        "./imgs/Style_5.png",
        "./imgs/Content.jpg",                 # Style_2.jpg absent upstream
    ]

    # auto_uv stays "none": _load_fleet_meshes auto-detects UV-less meshes
    # (teapot) and applies spherical UVs to THOSE only.
    cfg = PipelineConfig(
        size=args.size, n_views=args.n_views, batch_size=args.n_views,
        epochs=args.epochs, output_path=args.output_path,
        randomize_views=False, save_intermediate=False,
        compute_dtype=args.dtype,
    )
    t0 = time.time()
    run_fleet_batched(cfg, objs, styles)
    wall_s = time.time() - t0

    # Steady-state it/s from metrics.jsonl timestamps (epoch 0 carries the
    # compile; use deltas between later epochs).
    records = []
    with open(os.path.join(args.output_path, "metrics.jsonl")) as f:
        for line in f:
            records.append(json.loads(line))
    ts = [r["t"] for r in records if "epoch" in r]
    deltas = [b - a for a, b in zip(ts[1:], ts[2:])]  # skip epoch0->1 too
    it_s = (1.0 / (sorted(deltas)[len(deltas) // 2])) if deltas else None

    epoch_records = [r for r in records if "epoch" in r]
    last = epoch_records[-1]
    per_cell = last.get("per_cell", {})
    finite = (
        all(v == v and abs(v) != float("inf") for v in per_cell.values())
        and last["loss"] == last["loss"]
        and abs(last["loss"]) != float("inf")
    )

    hbm = None
    try:
        ms = jax.local_devices()[0].memory_stats()
        if ms:
            hbm = {k: ms[k] for k in ("bytes_in_use", "peak_bytes_in_use",
                                      "bytes_limit") if k in ms}
    except Exception as e:
        print(f"memory_stats unavailable: {e}", file=sys.stderr)

    xla_mem = None
    mem_path = os.path.join(args.output_path, "xla_mem.json")
    if os.path.isfile(mem_path):
        with open(mem_path) as f:
            xla_mem = json.load(f)

    res = {
        "workload": (f"fleet batched: 4 meshes x 5 styles, "
                     f"{args.n_views} views @{args.size}^2, bf16, "
                     f"{args.epochs} epochs, single chip"),
        "backend": jax.default_backend(),
        "device_kind": jax.devices()[0].device_kind,
        "steady_epochs_per_sec": round(it_s, 3) if it_s else None,
        "wall_s": round(wall_s, 1),
        "final_loss": last["loss"],
        "per_cell_final": per_cell,
        "losses_finite": bool(finite),
        "peak_hbm": hbm,
        "xla_memory_analysis": xla_mem,
        "substitutions": "bunny->ico_sphere(level=4); Style_2->Content.jpg",
    }
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
