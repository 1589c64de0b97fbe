#!/bin/bash
# Wait for the TPU worker to come back (it wedges after a killed
# mid-dispatch process and takes minutes to restart), then run the
# round-4 on-chip queue. Probes every 120s, gives up after ~2h.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r4_onchip}
mkdir -p "$LOG"
for i in $(seq 1 60); do
    if timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16)
assert float(jnp.sum(x@x)) == 16777216.0" >/dev/null 2>&1; then
        echo "[wait $(date +%H:%M:%S)] chip back after $i probes" | tee -a "$LOG/driver.log"
        exec bash benchmarks/round4_onchip.sh "$LOG"
    fi
    echo "[wait $(date +%H:%M:%S)] probe $i: chip still down" >> "$LOG/driver.log"
    sleep 120
done
echo "[wait $(date +%H:%M:%S)] giving up after 60 probes" | tee -a "$LOG/driver.log"
exit 1
