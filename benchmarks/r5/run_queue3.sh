#!/bin/bash
# Round-5 on-chip queue #3: deliverables first (VERDICT items 5, 2, 6),
# forensics last — sized for the remaining round wall-clock.
# One subprocess per entry; a wedge or OOM cannot take down the queue.
set -u
cd /root/repo
LOG=benchmarks/r5/queue3.log
echo "QUEUE3 START $(date -u +%H:%M:%S)" >> "$LOG"
echo "=== canary_packed start $(date -u +%H:%M:%S) ===" >> "$LOG"
timeout 300 python benchmarks/canary_packed.py --timeout 240 >> "$LOG" 2>&1
echo "=== canary_packed exit=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
echo "=== batch512 start $(date -u +%H:%M:%S) ===" >> "$LOG"
timeout 900 python benchmarks/r5/batch512_probe.py >> "$LOG" 2>&1
echo "=== batch512 exit=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
echo "=== composed_serving start $(date -u +%H:%M:%S) ===" >> "$LOG"
timeout 1200 python benchmarks/composed_serving.py >> "$LOG" 2>&1
echo "=== composed_serving exit=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
for p in refbase reffixthr profref; do
  echo "=== probe=$p start $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 600 python benchmarks/r5/mfu_probe.py --probe "$p" >> "$LOG" 2>&1
  echo "=== probe=$p exit=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
done
echo "QUEUE3 DONE $(date -u +%H:%M:%S)" >> "$LOG"
