#!/usr/bin/env python
"""A/B the space-to-depth ResNet stem (ATQ_S2D_STEM) on the real chip.

The round-3 profile-HLO join put the stem conv1 (7x7/2, 3 input
channels) at the top of the op table — its 3-channel contraction
starves the MXU. ``atq_tpu/ops/s2d_stem.py`` rewrites it exactly as a
4x4/stride-1 conv over a 2x2 space-to-depth input (12 channels). This
wrapper runs the shared env-var A/B harness (benchmarks/ab_harness.py)
on the tuned config-5 step.

Usage: ``python benchmarks/s2d_ab.py [--batch 128] [--no-amp]
[--out <json>]``
"""

import os

from ab_harness import run_ab

if __name__ == "__main__":
    run_ab("ATQ_S2D_STEM", "direct_stem", "s2d_stem",
           default_out=os.path.join(os.path.dirname(
               os.path.abspath(__file__)), "s2d_ab.json"))
