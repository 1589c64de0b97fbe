#!/bin/bash
# Priority-ordered on-chip measurement run for a freshly recovered axon
# chip. Per the wedge history (BENCHMARKS.md "config-4 crash chase"):
# warm the cache with SMALL programs first, one TPU process at a time,
# every phase under an external watchdog. Usage:
#   bash benchmarks/onchip_recovery.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-benchmarks}
log() { echo "[recovery $(date +%H:%M:%S)] $*"; }

log "probe"
timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16)
print('probe ok', float(jnp.sum(x@x)))" || { log "chip still wedged"; exit 1; }

log "selftest (small programs, warms cache)"
timeout 600 python benchmarks/tpu_selftest.py || log "selftest failed (continuing)"

log "bench.py (headline numbers + compile cache for the driver)"
timeout 3000 python bench.py | tee "$OUT/bench_recovery.json" || log "bench failed"

log "index bench f32 vs int8 (small sizes)"
timeout 900 python benchmarks/index_bench.py --corpus-sizes 100000 \
    --query-batches 32 --out "$OUT/index_bench_f32.json" || true
timeout 900 python benchmarks/index_bench.py --corpus-sizes 100000 \
    --query-batches 32 --int8 --out "$OUT/index_bench_int8.json" || true

log "gradcache sweep (quick)"
timeout 1800 python benchmarks/mfu_attack.py --quick --gradcache \
    --skip-profile --out "$OUT/mfu_gradcache.json" || true

log "done"
