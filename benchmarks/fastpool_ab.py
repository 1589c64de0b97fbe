#!/usr/bin/env python
"""A/B the dense max-pool backward (ATQ_FAST_POOL) on the real chip.

The round-3 profile (benchmarks/mfu_profile_join.json) measured the
ResNet stem maxpool backward (XLA ``select-and-scatter``) at 0.80
ms/step — 5.9% of device time — in the tuned retrieval config (batch
128 + bf16 AMP). ``atq_tpu/ops/fast_pool.py`` replaces it with dense
strided masked adds. This wrapper runs the shared env-var A/B harness
(benchmarks/ab_harness.py) on the same config-5 step.

Measured verdict (benchmarks/fastpool_ab.json): 0.775x — the dense
backward LOSES to select-and-scatter on this chip, so ATQ_FAST_POOL
ships off by default.

Usage: ``python benchmarks/fastpool_ab.py [--batch 128] [--no-amp]
[--out <json>]``
"""

import os

from ab_harness import run_ab

if __name__ == "__main__":
    run_ab("ATQ_FAST_POOL", "xla_pool", "fast_pool",
           default_out=os.path.join(os.path.dirname(
               os.path.abspath(__file__)), "fastpool_ab.json"))
