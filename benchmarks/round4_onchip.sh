#!/bin/bash
# Round-4 on-chip measurement queue, reordered after the 08-19 21:45
# wedge: deliverables first (config4 numbers, bench rehearsal, scale
# refresh, soak), wedge-risky fused-attention experiments LAST — both
# wedges today followed a fused bert-base scale run, so a late wedge
# must not be able to take the driver-facing results.
#
# The tunneled worker also flaps (a probe can succeed and the next
# process hang seconds later), so probes RETRY with waits instead of
# aborting: a wedge mid-queue parks the queue until the worker returns,
# then the next phase proceeds. Incremental output files per phase.
# Usage: bash benchmarks/round4_onchip.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r4_onchip}
mkdir -p "$LOG"
log() { echo "[r4 $(date +%H:%M:%S)] $*" | tee -a "$LOG/driver.log"; }

# Wait until the chip answers: up to 12 attempts (~1h10 worst case).
# Returns 1 only if the worker never comes back.
probe() {
    for a in $(seq 1 12); do
        if timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16)
assert float(jnp.sum(x@x)) == 16777216.0" >> "$LOG/driver.log" 2>&1; then
            [ "$a" -gt 1 ] && log "chip back (probe attempt $a)"
            return 0
        fi
        log "probe attempt $a failed; waiting"
        sleep 120
    done
    return 1
}

log "initial probe"
probe || { log "chip never came back - aborting"; exit 1; }

if [ "${SKIP_SELFTEST:-0}" = "1" ]; then
    log "phase 1: kernel selftest skipped (SKIP_SELFTEST=1; prior pass on record)"
else
    log "phase 1: kernel selftest (incl. fused attention)"
    timeout 600 python benchmarks/tpu_selftest.py > "$LOG/selftest.log" 2>&1 \
        && log "selftest OK" || log "selftest FAILED (see selftest.log)"
    probe || { log "wedged for good after selftest"; exit 2; }
fi

log "phase 2: config-4 packed inference numbers (argument-passing build)"
timeout 900 python benchmarks/run_all.py --only config4 \
    --out "$LOG/config4.json" > "$LOG/config4.log" 2>&1 \
    && log "config4 OK" || log "config4 FAILED"
probe || { log "wedged for good after config4"; exit 2; }

log "phase 3: bench.py rehearsal (the driver's deliverable; watchdog check)"
timeout 2700 python bench.py > "$LOG/bench.json" 2>&1 \
    && log "bench OK" || log "bench FAILED"
probe || { log "wedged for good after bench"; exit 2; }

log "phase 4: full scale table, einsum + save_dots (known-good best)"
timeout 3000 python benchmarks/scale_mfu.py \
    --remat-policy save_dots \
    --out "$LOG/scale_all_einsum.json" > "$LOG/scale_all_einsum.log" 2>&1 \
    && log "scale table OK" || log "scale table FAILED"
probe || { log "wedged for good after scale table"; exit 2; }

log "phase 5: config-4 soak (the VERDICT done-bar: >=30 min, 0 crashes)"
timeout 3000 python benchmarks/config4_soak.py --iters 20 --dispatches 50 \
    --out benchmarks/config4_soak_r4.jsonl > "$LOG/soak.log" 2>&1 \
    && log "soak OK" || log "soak FAILED/stopped (see soak.log)"
probe || { log "wedged for good after soak"; exit 2; }

log "phase 6: clean fused-attention bert-base measurement (wedge-risky)"
timeout 600 python benchmarks/scale_mfu.py --configs bert-base \
    --attn fused --remat-policy save_dots \
    --out "$LOG/scale_bb_fused_clean.json" > "$LOG/scale_bb_fused_clean.log" 2>&1 \
    && log "bert-base fused OK" || log "bert-base fused FAILED"
probe || { log "wedged for good after fused measurement"; exit 3; }

log "phase 7: profile the fused config (attribution for BENCHMARKS.md)"
timeout 600 python benchmarks/scale_profile.py --config bert-base \
    --remat-policy save_dots --attn fused --top 40 \
    --out "$LOG/prof_fused.json" > "$LOG/prof_fused.log" 2>&1 \
    && log "profile OK" || log "profile FAILED"

log "queue complete"
