#!/usr/bin/env python
"""Face-count scaling bench (TPU): resident vs streaming raster kernel
timings across mesh sizes (SURVEY.md §5 scaling axes: resolution AND face
count). Writes BENCH_FACES.json at the repo root.

Usage: python scripts/bench_faces.py   (on the TPU backend)
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SIZE = 512
VIEWS = 4
REPS = 20


def main() -> int:
    import jax
    import numpy as np

    from st3d.utils.compilecache import enable_compilation_cache

    enable_compilation_cache()

    # NOT tests/conftest.make_ico_sphere: importing conftest force-selects
    # the CPU platform (its job for the test suite), which silently turned
    # this TPU bench into a CPU one.
    from st3d.core.primitives import ico_sphere as make_ico_sphere
    from st3d.core.cameras import build_fixed_cameras
    from st3d.kernels.raster_pallas import rasterize_pallas_batched
    from st3d.render.rasterize import face_verts_screen

    assert jax.default_backend() == "tpu", "run on the TPU backend"
    cams = build_fixed_cameras(VIEWS, shuffle=False)
    results = {"image_size": SIZE, "n_views": VIEWS, "points": []}

    for level in (3, 4, 5, 6, 7):
        mesh = make_ico_sphere(level=level)
        f = mesh.faces.shape[0]
        fv = face_verts_screen(mesh.verts, mesh.faces, cams, SIZE)

        point = {"faces": int(f)}
        for name, stream in (("resident", False), ("stream", True)):
            if name == "resident" and f * 20 * 4 > 12 * 1024 * 1024:
                point[name + "_ms_per_view"] = None  # would blow VMEM
                continue
            fn = jax.jit(
                lambda v, s=stream: rasterize_pallas_batched(
                    v, SIZE, stream=s
                ).pix_to_face
            )
            try:
                out = fn(fv)
                out.block_until_ready()
            except Exception as e:  # VMEM OOM etc.
                point[name + "_error"] = str(e)[:200]
                continue
            t0 = time.time()
            for _ in range(REPS):
                out = fn(fv)
            out.block_until_ready()
            ms = (time.time() - t0) / REPS / VIEWS * 1e3
            point[name + "_ms_per_view"] = round(ms, 3)
            point[name + "_coverage"] = round(
                float((np.asarray(out) >= 0).mean()), 4
            )
        results["points"].append(point)
        print(point, file=sys.stderr)

    # Crossover analysis: the face count where streaming first beats the
    # resident kernel sets RESIDENT_COEFF_BUDGET (coeff bytes = F*20*4).
    cross = None
    for p in results["points"]:
        r, s = p.get("resident_ms_per_view"), p.get("stream_ms_per_view")
        if r is not None and s is not None and s < r:
            cross = p["faces"]
            break
    results["stream_beats_resident_at_faces"] = cross
    results["suggested_resident_coeff_budget"] = (
        cross * 20 * 4 if cross else None
    )

    with open(os.path.join(REPO, "BENCH_FACES.json"), "w") as fjson:
        json.dump(results, fjson, indent=1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
