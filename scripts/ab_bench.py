#!/usr/bin/env python
"""Within-process interleaved A/B benchmark.

Cross-process bench runs of the IDENTICAL graph vary by ~8% on the
tunneled chip (measured: 31.07 vs 28.61 it/s for the same program), which
drowns single-digit-percent effects. This harness compiles every variant
in ONE process and interleaves timing windows (round-robin), so slow
drift affects all variants equally; the median window speed per variant
is the comparison.

Usage: python scripts/ab_bench.py [windows_per_variant]
Variants are (name, env, build kwargs) tuples in VARIANTS below.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (name, env overrides applied at TRACE time, build_step kwargs)
# Round-4 ablation: the v2 packed-conv1_2 backward routing (direct
# channel-range stores vs the 4x64-lane concat; PERF_NOTES bwd-roofline
# gap). Override via $ST3D_AB_VARIANTS="name=ENV:VAL+ENV2:VAL2,name2=".
VARIANTS = [
    ("default", {}, {}),
    ("packed_bwd_v2", {"ST3D_PACKED_BWD": "v2"}, {}),
    ("no_stage1", {"ST3D_NO_STAGE1_V2": "1"}, {}),
    ("no_tree", {"ST3D_NO_PLAN_TREE": "1"}, {}),
    # r4f flipped fused_gram_deep + the formally-correct frame scatter to
    # default (A/B: 44.95 / 44.87 vs 44.64 default median); the reverts:
    ("no_gram_deep", {"ST3D_NO_FUSED_GRAM_DEEP": "1"}, {}),
    ("scatter_unique", {"ST3D_SCATTER_UNIQUE": "1"}, {}),
]

if os.environ.get("ST3D_AB_VARIANTS"):
    VARIANTS = []
    for spec in os.environ["ST3D_AB_VARIANTS"].split(","):
        name, _, envs = spec.partition("=")
        env = {}
        for pair in envs.split("+"):
            if pair:
                k, _, v = pair.partition(":")
                env[k] = v
        VARIANTS.append((name, env, {}))


def main() -> int:
    windows = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    import jax

    from st3d.utils.compilecache import enable_compilation_cache

    enable_compilation_cache()

    import bench

    # Ladder tuning (VERDICT r3 item 2): $ST3D_AB_SIZE re-points the whole
    # A/B at another rung (e.g. 768, the reference default) — the variant
    # machinery is size-agnostic.
    if os.environ.get("ST3D_AB_SIZE"):
        bench.SIZE = int(os.environ["ST3D_AB_SIZE"])

    built = []
    failed = {}
    for name, env, kwargs in VARIANTS:
        saved = {}
        for k, v in env.items():
            saved[k] = os.environ.get(k)
            os.environ[k] = v
        try:
            t0 = time.time()
            steps, params, opt_state, n = bench.build_step(**kwargs)
            params, opt_state, losses = steps(params, opt_state)
            losses.block_until_ready()
            print(f"[compile] {name}: {time.time()-t0:.1f}s", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — one broken variant must not
            # kill the whole interleaved batch (a stage1 lowering bug cost a
            # full TPU window this way); record and keep going. NOTE: a
            # mid-LOWERING failure can poison jax's cached_primitive_lowerings
            # for sub-jaxprs shared with later variants (seen: KeyError
            # 'closed_call' on the variant after a Pallas block-shape error),
            # so clear compile caches before the next build.
            import traceback
            traceback.print_exc()
            print(f"[compile-FAILED] {name}: {type(e).__name__}: {e}",
                  file=sys.stderr)
            failed[name] = f"{type(e).__name__}: {e}"
            jax.clear_caches()
            continue
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        built.append({"name": name, "steps": steps, "state": (params, opt_state),
                      "n": n, "windows": []})

    for w in range(windows):
        for v in built:
            steps, n = v["steps"], v["n"]
            params, opt_state = v["state"]
            t0 = time.time()
            params, opt_state, losses = steps(params, opt_state)
            losses.block_until_ready()
            dt = time.time() - t0
            v["state"] = (params, opt_state)
            v["windows"].append(n / dt)
        print(f"[window {w}] " + "  ".join(
            f"{v['name']}={v['windows'][-1]:.2f}" for v in built
        ), file=sys.stderr)

    out = {}
    for v in built:
        xs = sorted(v["windows"])
        med = xs[len(xs) // 2]
        out[v["name"]] = {
            "median_iters_per_sec": round(med, 3),
            "windows": [round(x, 3) for x in v["windows"]],
        }
    for name, err in failed.items():
        out[name] = {"error": err}
    print(json.dumps(out, indent=1))
    return 1 if failed and not built else 0


if __name__ == "__main__":
    raise SystemExit(main())
