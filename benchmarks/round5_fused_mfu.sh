#!/bin/bash
# Round-5 job one (VERDICT.md item 1): einsum-vs-fused MFU rows per scale
# config, measured back-to-back in one on-chip session so the numbers are
# comparable. Writes per-impl files, then merges into scale_mfu_r5.json.
set -u
cd /root/repo
mkdir -p benchmarks/r5
for attn in fused einsum; do
  echo "=== attn=$attn $(date -u +%H:%M:%S) ===" >> benchmarks/r5/fused_mfu.log
  timeout 2400 python benchmarks/scale_mfu.py \
    --attn "$attn" --remat-policy save_dots \
    --out "benchmarks/r5/scale_mfu_r5_${attn}.json" \
    >> benchmarks/r5/fused_mfu.log 2>&1
  echo "=== attn=$attn exit=$? $(date -u +%H:%M:%S) ===" >> benchmarks/r5/fused_mfu.log
done
python - <<'EOF'
import json
rows = []
for attn in ("einsum", "fused"):
    try:
        rows += json.load(open(f"benchmarks/r5/scale_mfu_r5_{attn}.json"))
    except Exception as e:
        rows.append({"attn_impl": attn, "error": repr(e)})
json.dump(rows, open("benchmarks/scale_mfu_r5.json", "w"), indent=2)
print("merged", len(rows), "rows")
EOF
