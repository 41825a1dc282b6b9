#!/bin/bash
# Watch for the axon TPU backend to come back, then launch the round-4
# measurement batch (scripts/perf_r4.sh) exactly once.
#
# Usage: nohup bash scripts/tpu_autolaunch.sh >/tmp/tpu_autolaunch.log 2>&1 &
#        echo $! > /tmp/tpu_autolaunch.pid
#
# ONE TPU process at a time (CLAUDE.md): the probe and the batch are
# strictly serial within this script; nothing else should touch the chip
# while it runs.
set -u
cd /root/repo
MARKER=/tmp/perf_r4_launched
PROBE_LOG=/tmp/tpu_probe_last.log

if [ -e "$MARKER" ]; then
  echo "batch already launched ($(cat "$MARKER")); exiting"
  exit 0
fi

i=0
while true; do
  i=$((i + 1))
  # A cheap real-compute probe; a healthy backend answers in ~30s
  # (init + tiny compile), a broken one errors out in ~2min. During the
  # round-4 outage the failure mode shifted from a fast error to a hang
  # right after plugin registration — a recovering backend may just be
  # slow, so give it 15min before declaring the probe dead.
  if timeout 900 python - >"$PROBE_LOG" 2>&1 <<'EOF'
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != "cpu", jax.devices()
x = jnp.ones((256, 256), jnp.bfloat16)
print((x @ x).sum())
EOF
  then
    echo "probe $i OK $(date) — launching perf_r4.sh"
    date > "$MARKER"
    bash scripts/perf_r4.sh
    echo "perf_r4.sh finished rc=$? $(date)"
    exit 0
  fi
  echo "probe $i failed $(date)"
  sleep 240
done
