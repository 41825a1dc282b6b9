#!/bin/bash
# Round-4 TPU measurement batch (run serially — ONE TPU process at a time;
# see CLAUDE.md). Each stage appends to /tmp/perf_r4.log and writes its
# artifact; stages are independent so a failure doesn't kill the batch.
#
# ORDERED BY ROUND PRIORITY (the axon pool has been flaky for hours at a
# time this round — if the window is short, the top stages are the ones
# VERDICT r3 blocks on): green bench artifact > A/B decisions > ladder >
# traces > fleet/e2e extras.
set -u
cd /root/repo
LOG=/tmp/perf_r4.log
echo "=== perf_r4 start $(date) ===" >> "$LOG"

run() {
  local name="$1" tmo="$2"; shift 2
  echo "--- $name: $* ($(date)) ---" >> "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "--- $name rc=$? ($(date)) ---" >> "$LOG"
}

# 1. Official bench, cold (VERDICT item 1 — THE round artifact; also
#    writes the AOT executable blob that makes the driver's own round-end
#    bench.py run warm-start). bench.py retries internally. Runs FIRST:
#    if the outage window reopens only briefly, this is the stage that
#    must complete. (Kernel defaults are unchanged since TPU_SMOKE.json
#    went green, so running it before the smoke is safe.)
run bench_cold 10000 python bench.py

# 2. Official bench, warm (AOT load — VERDICT item 7 evidence).
run bench_warm 10000 python bench.py

# 3. Kernel/donation smoke (regenerates TPU_SMOKE.json; must stay green —
#    validates every kernel the stages below lean on).
run smoke 3600 python scripts/tpu_smoke.py

# 4. Round-4 kernel candidates, interleaved A/B (VERDICT items 5a/5b):
#    default vs packed-bwd v2 vs stage1_v2 vs fused_gram_deep. 4 variants
#    x ~450s compile each -> generous bound.
run ab_kernels 6000 python scripts/ab_bench.py 7

# 5. Hot loop A (2D ST) throughput with the NHWC buffer (VERDICT item 3).
run st2d 3000 python scripts/bench_st2d.py

# 6. 768² tuning sweep (VERDICT item 2): conv band budget + the round-4
#    kernel candidates at the reference's default size, interleaved in one
#    process. Results feed the ladder re-tune.
ST3D_AB_SIZE=768 ST3D_AB_VARIANTS="default=,bp4096=ST3D_CONV_BLOCK_PIXELS:4096,bp16384=ST3D_CONV_BLOCK_PIXELS:16384,stage1_v2=ST3D_STAGE1_V2:1,gram_deep=ST3D_FUSED_GRAM_DEEP:1" \
  run ab_768 9000 python scripts/ab_bench.py 5

# 7. Resolution ladder with MFU (VERDICT item 2) -> BENCH_LADDER.json.
run ladder 9000 python scripts/bench_ladder.py

# 8. Per-HLO-op trace at 768² (diagnose the MFU drop at the reference's
#    default size, VERDICT weakness 2).
run trace768 4000 python scripts/perf_trace.py /tmp/trace768.json --size 768

# 9. Hot loop A decomposition (VERDICT weakness 3: no PERF_NOTES entry).
run trace_st2d 4000 python scripts/perf_trace.py /tmp/trace_st2d.json --st2d

# 10. Config-5 flagship on the real chip (VERDICT item 4) -> FLEET_TPU.json.
run fleet 6000 python scripts/fleet_tpu.py --size 256 --epochs 6

# 11. End-to-end CLI drive (verify recipe): tiny first approach on TPU —
#     exercises hot loop A (NHWC), MSE phase, renders, log/obj outputs.
run verify_cli 3000 python first_approach.py --size 128 --n_views 2 \
  --batch_size 2 --n_style_transfer_steps 20 --n_mse_steps 10 \
  --output_path /tmp/verify_out

# 12. First-approach end-to-end wall clock at 512² (VERDICT item 3 "Done"
#     criterion): one real batch of 3000 ST + 100 MSE steps; the stage's
#     rc-line timestamps in this log are the measurement.
run first_e2e 3000 python first_approach.py --size 512 --n_views 4 \
  --batch_size 4 --n_style_transfer_steps 3000 --n_mse_steps 100 \
  --save_intermediate False --output_path /tmp/first_e2e_out

echo "=== perf_r4 done $(date) ===" >> "$LOG"
