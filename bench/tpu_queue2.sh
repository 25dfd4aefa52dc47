#!/bin/bash
# Round-3 follow-up queue: radix-8 pass-width A/B on the real chip
# (FHE_TPU_NTT32_PASS_WIDTH=3 — see ops/ntt32.py and ARCHITECTURE §17 for
# why the earlier radix-8 rejection needed re-measuring), then the long
# hi-prec bootstrap bench last. Run AFTER bench/tpu_queue.sh.
# Usage: bash bench/tpu_queue2.sh [logdir]
LOG=${1:-/tmp/r3logs}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

echo "[$(date +%H:%M:%S)] waiting for tunnel..."
until timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  sleep 60
done
echo "[$(date +%H:%M:%S)] TUNNEL UP - starting queue2"

run() {
  name=$1; shift
  echo "[$(date +%H:%M:%S)] START $name"
  timeout 3600 "$@" >"$LOG/$name.log" 2>&1
  echo "[$(date +%H:%M:%S)] DONE $name (rc=$?)"
}

run r8_ntt  env FHE_TPU_NTT32_PASS_WIDTH=3 python bench.py --metric ntt
run r8_pbs  env FHE_TPU_NTT32_PASS_WIDTH=3 python bench.py
run r8_fhew env FHE_TPU_NTT32_PASS_WIDTH=3 python bench.py --metric fhew
run ckks_boot_hi python bench.py --metric ckks_bootstrap --hi-prec
echo "[$(date +%H:%M:%S)] queue2 complete"
