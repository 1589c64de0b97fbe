#!/bin/bash
# Round-5 MFU probe queue: one subprocess per probe so an OOM or wedge
# cannot take down the sweep. Bounded; appends to probes.log.
set -u
cd /root/repo
LOG=benchmarks/r5/probes.log
for p in baseline fixthr noremat dense; do
  echo "=== probe=$p start $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 1500 python benchmarks/r5/mfu_probe.py --probe "$p" >> "$LOG" 2>&1
  echo "=== probe=$p exit=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
done
echo "ALL PROBES DONE $(date -u +%H:%M:%S)" >> "$LOG"
