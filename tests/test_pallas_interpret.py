"""Pallas kernel semantics on CPU via interpret mode.

The production kernels (one-launch order statistic, packed ternary
matmuls) normally run only on TPU hardware; ``ATQ_PALLAS_INTERPRET=1``
routes the SAME kernel bodies through the Pallas interpreter so their
semantics regress on every CPU test run, not just on-chip sessions.

Runs in a subprocess: the interpret flag is read at trace time and the
kernels may already be traced without it in this process. Fast-gate
eligible (~11 s: one extra jax import, small shapes).
"""

import os
import subprocess
import sys

_SCRIPT = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["ATQ_PALLAS_INTERPRET"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys_path = os.environ["ATQ_REPO"]
import sys
sys.path.insert(0, sys_path)

from atq_tpu.ops.order_stat import (
    order_stat_eligible,
    order_statistic_reductions,
)
from atq_tpu.ops.ternary_matmul import (
    packed_ternary_matmul,
    packed_ternary_matmul_rpb,
    pallas_eligible,
)
from atq_tpu.core.packing import pack_planar, pack_planar32

assert order_stat_eligible(1000)          # interpret mode unlocks CPU
assert pallas_eligible((8, 512), (128, 512))

# --- one-launch order statistic: bit-exact vs the sort ---------------
rng = np.random.RandomState(0)
w = np.abs(rng.randn(1000).astype(np.float32))  # padding: 1000 % 128 != 0
srt = np.sort(w)
for rank in (0, 1, 299, 998, 999):
    stat, mx, sm = order_statistic_reductions(jnp.asarray(w),
                                              jnp.int32(rank))
    assert float(stat) == float(srt[rank]), (rank, float(stat))
assert float(mx) == float(w.max())
assert np.isclose(float(sm), w.sum(), rtol=1e-5)

# --- packed planar matmul kernel vs dense ----------------------------
def random_ternary(shape, seed):
    r = np.random.RandomState(seed)
    return r.choice([-1.0, 0.0, 1.0], size=shape,
                    p=[0.35, 0.3, 0.35]).astype(np.float32)

w2 = random_ternary((128, 512), 7)
x = rng.randn(8, 512).astype(np.float32)
got = packed_ternary_matmul(jnp.asarray(x), pack_planar(jnp.asarray(w2)),
                            (128, 512), alpha=0.9)
np.testing.assert_allclose(np.asarray(got), x @ w2.T * 0.9,
                           rtol=1e-5, atol=5e-3)

# --- TTQ asymmetric scales from the same planes ----------------------
got = packed_ternary_matmul(jnp.asarray(x), pack_planar(jnp.asarray(w2)),
                            (128, 512), alpha=0.9, alpha_neg=0.4)
w_eff = 0.9 * np.maximum(w2, 0) + 0.4 * np.minimum(w2, 0)
np.testing.assert_allclose(np.asarray(got), x @ w_eff.T,
                           rtol=1e-5, atol=5e-3)

# --- int32-lane planar32 kernel --------------------------------------
got = packed_ternary_matmul(jnp.asarray(x),
                            pack_planar32(jnp.asarray(w2)),
                            (128, 512), alpha=1.1, layout="planar32")
np.testing.assert_allclose(np.asarray(got), x @ w2.T * 1.1,
                           rtol=1e-5, atol=5e-3)

# --- fused RPB correction kernel --------------------------------------
corr = (rng.randn(128, 512) * 0.01).astype(np.float32)
got = packed_ternary_matmul_rpb(jnp.asarray(x),
                                pack_planar(jnp.asarray(w2)),
                                jnp.asarray(corr), (128, 512), alpha=0.8)
np.testing.assert_allclose(np.asarray(got), x @ (w2 * 0.8 + corr).T,
                           rtol=1e-5, atol=5e-3)

# --- K-blocked grid variant (third grid dim accumulates byte slabs) --
# Trigger: tile_m * k_padded * 4 > 4MB VMEM budget -> M=128, K=8704.
wk = random_ternary((128, 8704), 13)
xk = rng.randn(128, 8704).astype(np.float32) * 0.1
got = packed_ternary_matmul(jnp.asarray(xk), pack_planar(jnp.asarray(wk)),
                            (128, 8704), alpha=0.5)
np.testing.assert_allclose(np.asarray(got), xk @ wk.T * 0.5,
                           rtol=1e-5, atol=5e-3)

print("PALLAS_INTERPRET_OK")
"""


def test_kernels_in_interpret_mode(tmp_path):
    script = tmp_path / "interp.py"
    script.write_text(_SCRIPT)
    env = dict(os.environ)
    env["ATQ_REPO"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    out = subprocess.run([sys.executable, str(script)], env=env,
                         capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "PALLAS_INTERPRET_OK" in out.stdout
