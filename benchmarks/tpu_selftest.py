"""On-TPU kernel self-test: every Pallas kernel vs its XLA-dense oracle.

pytest runs CPU-only (tests/conftest.py forces the CPU platform), so the
Pallas code paths are never exercised in CI — `pallas_eligible` returns
False off-TPU and everything falls back to XLA. This script is the on-chip
counterpart: run it whenever TPU hardware is available.

    python benchmarks/tpu_selftest.py

Covers (VERDICT round-1 weak #4):
- packed ternary matmul: standard, K-blocked (K=32768), RPB-fused variants
- small-M serving tiles (M=1)
- the fused training kernels (ops/fused_linear.py): forward, dx, dw/dalpha
  in both grad modes, with and without the RPB mask

Exits non-zero on any mismatch; prints one line per check.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


FAILURES = []


def check(name, got, want, rel=8e-3, atol=1e-5):
    """Tolerance is set at bf16-single-pass level relative to the result
    scale: the MXU computes f32 matmuls via bf16 passes whose effective
    precision varies with shape/lowering (an M=1 matvec lowers differently
    from an M=8 tile), so kernel-vs-oracle agreement is precision-limited at
    ~2^-8 * max|result| even when the kernel logic is exact. Logic bugs
    produce O(1) relative errors and are still caught."""
    got = np.asarray(got)
    want = np.asarray(want)
    diff = float(np.max(np.abs(got - want))) if got.size else 0.0
    scale = float(np.max(np.abs(want))) if want.size else 1.0
    ok = diff <= atol + rel * scale
    status = "OK " if ok else "FAIL"
    print(f"[{status}] {name}: max|diff|={diff:.3e} (scale {scale:.3e})")
    if not ok:
        FAILURES.append(name)


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        print(f"SKIP: backend is {jax.default_backend()!r}, not tpu — "
              "this self-test validates the Pallas kernels on hardware")
        return 0

    from atq_tpu.core.packing import pack_planar
    from atq_tpu.core.quantize import ternary_threshold
    from atq_tpu.ops.ternary_matmul import (
        packed_ternary_matmul,
        packed_ternary_matmul_rpb,
    )
    from atq_tpu.ops import fused_linear as fl

    rng = np.random.RandomState(0)

    # ---- packed ternary matmul across the shape grid -------------------
    for (m, n, k) in [(1, 128, 512), (8, 256, 3136), (128, 128, 128),
                      (64, 384, 192), (256, 512, 2048), (16, 128, 32768)]:
        x = jnp.asarray(rng.randn(m, k), jnp.float32)
        wt = jnp.asarray(rng.randint(-1, 2, (n, k)), jnp.float32)
        alpha = 0.63
        wp = pack_planar(wt)
        got = packed_ternary_matmul(x, wp, (n, k), alpha, layout="planar")
        want = jnp.matmul(x, wt.T) * alpha
        check(f"packed_matmul M={m} N={n} K={k}", got, want)

    # ---- RPB-fused serving kernel ---------------------------------------
    for (m, n, k) in [(1, 128, 512), (32, 256, 3136)]:
        x = jnp.asarray(rng.randn(m, k), jnp.float32)
        wt = jnp.asarray(rng.randint(-1, 2, (n, k)), jnp.float32)
        corr = jnp.asarray(
            rng.randn(n, k) * (rng.rand(n, k) < 0.1), jnp.float32)
        alpha = 0.5
        wp = pack_planar(wt)
        got = packed_ternary_matmul_rpb(x, wp, corr, (n, k), alpha)
        want = jnp.matmul(x, (wt * alpha
                              + corr.astype(jnp.bfloat16)
                              .astype(jnp.float32)).T)
        check(f"packed_matmul_rpb M={m} N={n} K={k}", got, want)

    # ---- fused training kernels -----------------------------------------
    for (m, n, k) in [(16, 24, 40), (256, 256, 3136), (7, 130, 200),
                      (1, 128, 512)]:
        x = jnp.asarray(rng.randn(m, k), jnp.float32)
        w = jnp.asarray(rng.randn(n, k), jnp.float32)
        alpha = jnp.asarray([0.7], jnp.float32)
        thr = ternary_threshold(w, sparsity_target=0.3)
        g = jnp.asarray(rng.randn(m, n), jnp.float32)
        for with_mask in (True, False):
            mask = ((jnp.asarray(rng.rand(n, k), jnp.float32) < 0.1)
                    .astype(jnp.float32) if with_mask else None)
            tag = f"M={m} N={n} K={k} mask={with_mask}"
            assert fl._fwd_eligible(m, n, k), f"shape not eligible: {tag}"

            got_y = fl._pallas_forward(x, w, mask, alpha, thr,
                                       has_mask=with_mask)
            want_y = fl._xla_forward(x, w, mask, alpha, thr)
            check(f"fused_fwd {tag}", got_y, want_y)

            got_dx = fl._pallas_dx(g, w, mask, alpha, thr,
                                   has_mask=with_mask)
            w_eff, wt = fl._w_eff(w, mask, alpha, thr)
            check(f"fused_dx {tag}", got_dx, jnp.matmul(g, w_eff))

            G = jnp.matmul(g.T, x)
            inv_m = 1.0 if mask is None else 1.0 - mask
            for ste in (False, True):
                got_dw, got_da = fl._pallas_dwda(
                    g, x, w, mask, alpha, thr, has_mask=with_mask, ste=ste)
                if with_mask:
                    want_dw = (G * (alpha * inv_m + mask) if ste
                               else G * mask)
                else:
                    want_dw = G * alpha if ste else jnp.zeros_like(G)
                want_da = jnp.sum(G * wt * inv_m)
                mode = "ste" if ste else "parity"
                check(f"fused_dw[{mode}] {tag}", got_dw, want_dw)
                check(f"fused_dalpha[{mode}] {tag}", got_da, want_da)

    # ---- sparse-correction serving path ---------------------------------
    from atq_tpu.nn.layers import ResidualPrecisionBoostLinear
    from atq_tpu.serve.packed_model import (
        pack_quantized_layer,
        packed_linear_apply,
    )

    xs = jnp.asarray(rng.randn(4, 3136), jnp.float32)
    layer = ResidualPrecisionBoostLinear(features=128, precision_ratio=0.05,
                                         sparsity_target=0.3)
    variables = layer.init(jax.random.PRNGKey(0), xs)
    want = layer.apply(variables, xs)
    sparse = pack_quantized_layer(variables["params"], variables["quant"])
    got = packed_linear_apply(sparse, xs)
    check("serve_sparse_correction vs RPB forward", got, want, rel=2e-2)

    # Fused single-block attention (ops/fused_attention.py) vs the
    # einsum-pair oracle, fwd and grads, with a lengths padding mask.
    from atq_tpu.ops.fused_attention import fused_attention, padding_bias

    B, H, S, D = 4, 4, 256, 64
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    kk = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    vv = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    lengths = jnp.asarray([S, 100, 7, S])
    bias = padding_bias(lengths, S)
    scale_a = 1.0 / np.sqrt(D)

    def oracle(q, k, v):
        sc = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale_a
        sc = sc + bias
        p = jax.nn.softmax(sc.astype(jnp.float32), -1).astype(v.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    got = jax.jit(lambda q, k, v: fused_attention(q, k, v, scale_a,
                                                  bias))(q, kk, vv)
    check("fused_attention fwd B4 H4 S256 D64", got, oracle(q, kk, vv))

    def loss_f(q, k, v):
        return jnp.sum(fused_attention(q, k, v, scale_a,
                                       bias).astype(jnp.float32) ** 2)

    def loss_o(q, k, v):
        return jnp.sum(oracle(q, k, v).astype(jnp.float32) ** 2)

    gf = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2)))(q, kk, vv)
    go = jax.jit(jax.grad(loss_o, argnums=(0, 1, 2)))(q, kk, vv)
    for name, a, b in zip("qkv", gf, go):
        check(f"fused_attention d{name}", a, b, rel=2e-2)

    print()
    if FAILURES:
        print(f"{len(FAILURES)} FAILED: {FAILURES}")
        return 1
    print("ALL KERNEL SELF-TESTS PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
