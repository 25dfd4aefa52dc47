#!/bin/bash
# Round-3 TPU measurement queue: waits for the axon tunnel, then runs the
# queued on-chip measurements sequentially, one log per step.
# All timing now syncs via bench.fetch_sync (block_until_ready through the
# tunnel has been observed to return early — see bench.py docstring).
# Usage: bash bench/tpu_queue.sh [logdir]
LOG=${1:-/tmp/r3logs}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

echo "[$(date +%H:%M:%S)] waiting for tunnel..."
until timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  sleep 60
done
echo "[$(date +%H:%M:%S)] TUNNEL UP - starting queue"

run() {
  name=$1; shift
  echo "[$(date +%H:%M:%S)] START $name"
  timeout 3600 "$@" >"$LOG/$name.log" 2>&1
  echo "[$(date +%H:%M:%S)] DONE $name (rc=$?)"
}

run ntt_stage       python bench.py --metric ntt
run ntt_fourstep    python bench.py --metric ntt --fourstep
run fourstep14      python bench/fourstep14_experiment.py
run pbs_cliff       python bench/pbs_cliff_probe.py
run tfhe_plain      python bench.py
run verify_fourstep python bench/verify_fourstep.py
run multikey_full   python examples/multi_key_uint8.py --full
run ckks_mul        python bench.py --metric ckks
run ckks_boot_hi    python bench.py --metric ckks_bootstrap --hi-prec
echo "[$(date +%H:%M:%S)] queue complete"
