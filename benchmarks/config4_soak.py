#!/usr/bin/env python
"""Config-4 (packed serving) crash soak.

Round-2 caveat: the packed-inference program nondeterministically crashed
the TPU worker — even with ATQ_NO_PALLAS=1, so it is NOT a Pallas kernel
bug — and each crash wedges the tunneled chip for a long time. This soak
drives toward the verdict's bar (100 consecutive clean runs) while
protecting the chip:

- every iteration runs in its OWN subprocess (a worker crash cannot take
  the soak loop down) with a hard timeout;
- after each iteration a tiny probe subprocess checks the chip still
  answers; on a wedge the soak stops immediately and records it rather
  than hammering a sick chip;
- results append to a JSONL ledger (`--out`) so progress survives
  interruption, and `--resume` continues the count.

Usage: ``python benchmarks/config4_soak.py --iters 100
[--out benchmarks/config4_soak.jsonl] [--no-pallas]``.
"""

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

_RUN_ONE = r"""
import sys
sys.path.insert(0, __REPO__)
from atq_tpu.utils.platform import apply_platform_env
apply_platform_env()
import numpy as np
import jax, jax.numpy as jnp
from atq_tpu.models.image_classifier import ATQImageClassifier
from atq_tpu.serve.packed_model import PackedClassifier

batch = 64
model = ATQImageClassifier(use_rpb=True)
x = jnp.asarray(np.random.RandomState(0).randn(batch, 28, 28, 1)
                .astype(np.float32))
variables = model.init(jax.random.PRNGKey(0), x)
served = PackedClassifier(variables["params"], variables["quant"],
                          variables["batch_stats"])
dense = jax.jit(lambda v, x: model.apply(v, x, train=False))
ref = jax.device_get(dense(variables, x))
# DISPATCHES back-to-back calls (the crash was nondeterministic, so keep
# the pressure). SYNC_EVERY=1 blocks on every call — the throttled
# variant that distinguishes "kernel bug" from "runtime race under
# rapid micro-program dispatch".
import os as _os
dispatches = int(_os.environ.get("ATQ_SOAK_DISPATCHES", "20"))
sync_every = _os.environ.get("ATQ_SOAK_SYNC", "0") == "1"
for i in range(dispatches):
    out = served(x)
    if sync_every:
        out.block_until_ready()
out = jax.device_get(out)
# Correctness gate scaled to the output: the packed kernel computes in
# bf16 on an untrained random-init model whose logits are O(600), so
# absolute drift of ~0.4% of max|ref| is expected rounding, not a wrong
# result. Require bf16-scale closeness AND identical argmax decisions.
scale = float(abs(ref).max())
assert abs(out - ref).max() <= 0.02 * scale, (
    f"packed drift {abs(out - ref).max()} vs scale {scale}")
assert (out.argmax(-1) == ref.argmax(-1)).mean() >= 0.98, "argmax moved"
print("CONFIG4_OK")
"""

_PROBE = r"""
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
print("PROBE_OK", float(jnp.sum(x @ x)))
"""


def _sub(code: str, timeout: float, extra_env=None) -> tuple:
    env = dict(os.environ)
    env.update(extra_env or {})
    try:
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=timeout)
        return r.returncode, r.stdout + r.stderr
    except subprocess.TimeoutExpired as e:
        return -9, f"timeout after {timeout}s: {e.stdout or ''}"


def main():
    # Kill-switch: each config-4 crash wedges the tunneled chip for 1-2 h
    # (BENCHMARKS.md round-3/4 chase), so soaking is destructive when the
    # chip is needed for other measurements. Touching this file makes any
    # already-queued soak invocation exit cleanly instead.
    skip = os.environ.get("ATQ_SOAK_SKIP_FILE", "/tmp/atq_skip_soak")
    if os.path.exists(skip):
        print(f"soak skipped: {skip} exists (destructive on this "
              "runtime; see BENCHMARKS.md config-4 chase)", flush=True)
        return

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--out", type=str,
                    default="benchmarks/config4_soak.jsonl")
    ap.add_argument("--no-pallas", action="store_true",
                    help="soak the ATQ_NO_PALLAS=1 (pure XLA) variant")
    ap.add_argument("--pack32", action="store_true",
                    help="soak the ATQ_PACK32=1 (int32 native-lane "
                         "planes) variant")
    ap.add_argument("--sync-every", action="store_true",
                    help="block_until_ready after every dispatch "
                         "(throttled variant: isolates dispatch-rate "
                         "effects)")
    ap.add_argument("--dispatches", type=int, default=20)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--run-timeout", type=float, default=420.0)
    args = ap.parse_args()

    done = 0
    if args.resume and os.path.exists(args.out):
        with open(args.out) as f:
            done = sum(1 for line in f
                       if json.loads(line).get("ok"))
        print(f"resuming at {done} clean runs", flush=True)

    extra = {"ATQ_SOAK_DISPATCHES": str(args.dispatches)}
    if args.no_pallas:
        extra["ATQ_NO_PALLAS"] = "1"
    if args.pack32:
        extra["ATQ_PACK32"] = "1"
    if args.sync_every:
        extra["ATQ_SOAK_SYNC"] = "1"
    code = _RUN_ONE.replace("__REPO__", repr(_REPO))
    with open(args.out, "a") as ledger:
        for i in range(done, args.iters):
            t0 = time.time()
            rc, out = _sub(code, args.run_timeout, extra)
            ok = rc == 0 and "CONFIG4_OK" in out
            row = {"i": i, "ok": ok, "rc": rc,
                   "sec": round(time.time() - t0, 1),
                   "no_pallas": args.no_pallas, "pack32": args.pack32,
                   "sync_every": args.sync_every,
                   "dispatches": args.dispatches}
            if not ok:
                row["tail"] = out[-2000:]
            ledger.write(json.dumps(row) + "\n")
            ledger.flush()
            print(f"run {i}: {'OK' if ok else 'FAIL rc=' + str(rc)} "
                  f"({row['sec']}s)", flush=True)
            prc, pout = _sub(_PROBE, 90.0)
            if prc != 0 or "PROBE_OK" not in pout:
                ledger.write(json.dumps(
                    {"i": i, "wedged_after": True}) + "\n")
                print("chip wedged — stopping the soak to let it recover",
                      flush=True)
                return 2
            if not ok:
                print("worker crash recorded; chip still alive — "
                      "continuing", flush=True)
    print(f"soak complete: see {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
