#!/bin/bash
# Round-5 on-chip queue #2: hoisted-step forensics (where do the
# remaining ~50 ms vs the dense ceiling go?), ref-scale forensics
# (VERDICT item 2), then the bounded serving deliverables (items 5/6).
# One subprocess per entry; a wedge or OOM cannot take down the queue.
set -u
cd /root/repo
LOG=benchmarks/r5/queue2.log
echo "QUEUE2 START $(date -u +%H:%M:%S)" >> "$LOG"
for p in hoist hoistraw profhoist refbase reffixthr profref; do
  echo "=== probe=$p start $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 1200 python benchmarks/r5/mfu_probe.py --probe "$p" >> "$LOG" 2>&1
  echo "=== probe=$p exit=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
done
echo "=== batch512 start $(date -u +%H:%M:%S) ===" >> "$LOG"
timeout 1200 python benchmarks/r5/batch512_probe.py >> "$LOG" 2>&1
echo "=== batch512 exit=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
echo "=== canary_packed start $(date -u +%H:%M:%S) ===" >> "$LOG"
timeout 300 python benchmarks/canary_packed.py --timeout 240 >> "$LOG" 2>&1
echo "=== canary_packed exit=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
echo "=== composed_serving start $(date -u +%H:%M:%S) ===" >> "$LOG"
timeout 1500 python benchmarks/composed_serving.py >> "$LOG" 2>&1
echo "=== composed_serving exit=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
echo "QUEUE2 DONE $(date -u +%H:%M:%S)" >> "$LOG"
