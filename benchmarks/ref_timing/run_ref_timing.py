#!/usr/bin/env python
"""Time the ACTUAL reference train.py once (VERDICT round-4 item 3).

Runs ``/root/reference/train.py`` — the genuine script, unmodified —
for one bounded epoch at the README recipe's settings
(``--dataset fashion_mnist --batch-size 256 --use-rpb --distill
--sparsity 0.3``, readme.md:110, epochs clamped to 1) on torch-CPU,
and parses the script's own per-epoch progress prints
(``Epoch 1 | Batch N/188 | ... | Time: Ts``, reference train.py:231-237)
into imgs/sec. This replaces the in-process "torch-CPU equivalent
step" denominator that BENCH_r01-r04 used for ``vs_baseline``.

Environment adaptations (both recorded in the output JSON):
- torchvision is not installed on this box and cannot be (zero
  egress); a minimal shim (benchmarks/ref_timing/shim/torchvision)
  provides the two dataset classes + five transforms the reference
  imports, dispatching to the same PIL/tensor ops.
- Fashion-MNIST bytes cannot be downloaded; the shim substitutes a
  deterministic synthetic stand-in with the real split sizes, so
  epoch length / batch count / pipeline work match the genuine run.
  Throughput is content-independent.

Writes benchmarks/ref_timing/ref_train_timing.json.
"""

import json
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
REF = "/root/reference"
BATCH = 256
TIMEOUT_S = 3600


def main():
    scratch = "/tmp/ref_timing_run"
    os.makedirs(scratch, exist_ok=True)
    env = dict(os.environ)
    # Shim first so `import torchvision` resolves; reference dir so the
    # script's own `from models...` imports resolve (python adds the
    # script dir itself, but subpackage imports under cwd!=script-dir
    # still need it explicitly on some layouts).
    env["PYTHONPATH"] = os.path.join(HERE, "shim") + os.pathsep + REF
    env.setdefault("MPLBACKEND", "Agg")

    cmd = [sys.executable, os.path.join(REF, "train.py"),
           "--dataset", "fashion_mnist", "--batch-size", str(BATCH),
           "--epochs", "1", "--use-rpb", "--distill", "--sparsity", "0.3"]
    t0 = time.time()
    try:
        out = subprocess.run(cmd, cwd=scratch, env=env, capture_output=True,
                             text=True, timeout=TIMEOUT_S)
        rc, stdout, stderr = out.returncode, out.stdout, out.stderr
    except subprocess.TimeoutExpired as e:
        rc = -1
        stdout = (e.stdout or b"").decode() if isinstance(
            e.stdout, bytes) else (e.stdout or "")
        stderr = f"timeout after {TIMEOUT_S}s"
    wall = time.time() - t0

    # Last progress line of epoch 1 carries cumulative batches + time.
    batches = total = None
    t_train = None
    for m in re.finditer(
            r"Epoch 1 \| Batch (\d+)/(\d+) \|.*Time: ([0-9.]+)s", stdout):
        batches, total, t_train = int(m.group(1)), int(m.group(2)), float(
            m.group(3))

    record = {
        "what": "actual reference train.py, measured (one epoch)",
        "cmd": " ".join(cmd[1:]),
        "device": "cpu (torch)",
        "adaptations": [
            "torchvision shim (not installed; zero-egress box) — "
            "benchmarks/ref_timing/shim, same PIL/tensor ops",
            "synthetic Fashion-MNIST bytes at real split sizes "
            "(download impossible; throughput is content-independent)",
        ],
        "rc": rc,
        "wall_s_total_script": round(wall, 1),
    }
    if batches and t_train and t_train > 0:
        imgs_per_sec = batches * BATCH / t_train
        record.update({
            "epoch_batches_timed": batches,
            "epoch_batches_total": total,
            "epoch_train_time_s": t_train,
            "imgs_per_sec": round(imgs_per_sec, 1),
            "source_line": "reference train.py:231-237 progress print "
                           "(cumulative epoch timer)",
        })
        print(json.dumps({"imgs_per_sec": record["imgs_per_sec"]}))
    else:
        record["error"] = "could not parse epoch progress line"
        record["stdout_tail"] = stdout[-2000:]
        record["stderr_tail"] = stderr[-2000:]
        print(json.dumps({"error": record["error"]}), file=sys.stderr)

    with open(os.path.join(HERE, "ref_train_timing.json"), "w") as f:
        json.dump(record, f, indent=1)
    return 0 if "imgs_per_sec" in record else 1


if __name__ == "__main__":
    sys.exit(main())
