"""Expert parallelism: mixture-of-experts FFN with ternary experts.

Framework capability beyond the reference (SURVEY.md §2.6 records EP as
absent there — "no MoE anywhere"). The parity path never needs it; it
exists so ternary FFN capacity can scale past one chip's HBM: N experts'
(D, H) + (H, D) planes sharded over an ``expert`` mesh axis, tokens routed
to them over ICI.

Design (the standard GShard/TPU pattern, all static shapes):

- **Top-1 routing with fixed capacity.** Each token picks its argmax
  expert from a learned gate ``x @ gate_w``; each expert accepts at most
  ``capacity`` tokens per shard (position = running count via cumsum).
  Overflow tokens are dropped — their combine weight is zero, so they
  contribute nothing and the caller's residual connection carries them
  (``x + moe(x)``). Everything is one-hot einsums: no gather/scatter, no
  dynamic shapes, XLA tiles it all onto the MXU.
- **Dispatch/combine einsums.** ``dispatch`` (T, E, C) one-hot routes
  tokens into per-expert slot buffers ``(E, C, D)``; ``combine`` =
  dispatch × gate probability routes expert outputs back.
- **EP = one all_to_all each way.** Under ``shard_map`` with tokens AND
  experts sharded over the same mesh axis (the usual dp=ep layout), each
  device builds its local ``(E, C, D)`` dispatch buffer, a single
  ``lax.all_to_all`` re-shards it from token-major to expert-major
  — device i receives every device's slots for its E/n local experts —
  the local expert FFNs run, and the reverse all_to_all brings outputs
  home for the local combine. Both collectives ride ICI.
- **Ternary experts.** Optionally each expert's planes go through
  ``adaptive_ternary_quantization`` (same math as TernaryLinear,
  reference atq/quantizers.py:7-60) before the matmul, so the expert
  pool stores 2-bit-packable weights.

Parity: the sharded path equals the single-device ``moe_ffn`` on the same
shard layout exactly (same gating, same capacity accounting per shard);
with capacity ≥ tokens-per-shard it equals dense per-token expert compute.
Tested in tests/test_moe.py and exercised by __graft_entry__ dryrun (ep).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def init_moe_params(rng, d_model: int, d_hidden: int, n_experts: int):
    """Gate + per-expert FFN planes, fan-in scaled init."""
    kg, k1, k2 = jax.random.split(rng, 3)
    return {
        "gate": jax.random.normal(kg, (d_model, n_experts), jnp.float32)
        * (d_model ** -0.5),
        "w1": jax.random.normal(k1, (n_experts, d_model, d_hidden),
                                jnp.float32) * (d_model ** -0.5),
        "w2": jax.random.normal(k2, (n_experts, d_hidden, d_model),
                                jnp.float32) * (d_hidden ** -0.5),
    }


def _ternarize_expert_planes(w, sparsity_target: float):
    """Quantize each expert's plane independently (vmapped over E)."""
    from atq_tpu.core.quantize import adaptive_ternary_quantization

    def one(plane):
        w_t, alpha = adaptive_ternary_quantization(
            plane, sparsity_target=sparsity_target)
        return w_t * alpha

    return jax.vmap(one)(w)


def top1_dispatch(x, gate_w, n_experts: int, capacity: int,
                  token_mask=None):
    """Top-1 routing tensors for a token shard.

    Args:
        x: (T, D) tokens.
        gate_w: (D, E) gate.
        capacity: max tokens per expert for THIS shard.
        token_mask: optional (T,) bool, True = real token. Masked-out
            (padding) tokens are excluded from routing entirely: they
            consume no expert capacity, contribute nothing to the
            load-balance stats, and their combine weight is zero.

    Returns:
        dispatch: (T, E, C) one-hot token→slot routing.
        combine: (T, E, C) = dispatch × gate probability.
        aux: dict with load-balance stats (fraction per expert, aux loss
            per Shazeer et al. — mean(frac · mean_prob) · E).
    """
    logits = x @ gate_w                              # (T, E)
    probs = jax.nn.softmax(logits, axis=-1)
    expert = jnp.argmax(probs, axis=-1)              # (T,)
    # Slot accounting in int32 regardless of x.dtype: under bf16 AMP a
    # cumsum in x.dtype is inexact past 256, so with >256 tokens routed
    # to one expert slot positions would collide and two tokens' inputs
    # would silently sum into one expert slot.
    onehot_i = jax.nn.one_hot(expert, n_experts, dtype=jnp.int32)  # (T, E)
    if token_mask is not None:
        onehot_i = onehot_i * token_mask.astype(jnp.int32)[:, None]
    onehot = onehot_i.astype(x.dtype)
    gate = jnp.sum(probs * onehot, axis=-1)          # (T,)

    # Slot assignment: position of each token within its expert's queue.
    position = jnp.cumsum(onehot_i, axis=0) * onehot_i - onehot_i  # 0-based
    pos = jnp.sum(position, axis=-1)                 # (T,) int32
    keep = pos < capacity
    slot = jax.nn.one_hot(
        jnp.where(keep, pos, capacity), capacity,
        dtype=x.dtype)                               # (T, C); overflow → 0s
    dispatch = onehot[:, :, None] * slot[:, None, :] * keep[:, None, None]
    combine = dispatch * gate[:, None, None]

    probs_f = probs.astype(jnp.float32)
    if token_mask is None:
        n_valid = jnp.float32(onehot_i.shape[0])
    else:
        probs_f = probs_f * token_mask.astype(jnp.float32)[:, None]
        n_valid = jnp.maximum(
            jnp.sum(token_mask.astype(jnp.float32)), 1.0)
    frac = jnp.sum(onehot_i, axis=0).astype(jnp.float32) / n_valid  # (E,)
    aux_loss = jnp.mean(
        frac * (jnp.sum(probs_f, axis=0) / n_valid)) * n_experts ** 2
    return dispatch, combine, {"expert_fraction": frac,
                               "aux_loss": aux_loss}


def moe_ffn(x, params, capacity: int, ternary: bool = False,
            sparsity_target: float = 0.3, token_mask=None):
    """Single-device MoE FFN: route → per-expert GELU FFN → combine.

    Returns (y, aux). ``y`` excludes the residual — callers add ``x``.
    """
    n_experts = params["gate"].shape[-1]
    dispatch, combine, aux = top1_dispatch(x, params["gate"], n_experts,
                                           capacity, token_mask=token_mask)
    w1, w2 = params["w1"], params["w2"]
    if ternary:
        w1 = _ternarize_expert_planes(w1, sparsity_target)
        w2 = _ternarize_expert_planes(w2, sparsity_target)
    buf = jnp.einsum("tec,td->ecd", dispatch, x)     # (E, C, D)
    h = jax.nn.gelu(jnp.einsum("ecd,edh->ech", buf, w1))
    out = jnp.einsum("ech,ehd->ecd", h, w2)          # (E, C, D)
    y = jnp.einsum("tec,ecd->td", combine, out)
    return y, aux


def moe_ffn_sharded(x, params, mesh: Mesh, capacity: int,
                    axis: str = "expert", ternary: bool = False,
                    sparsity_target: float = 0.3, token_mask=None):
    """Expert-parallel MoE FFN over ``mesh[axis]``.

    ``x`` (T, D) is sharded over the axis (T % n == 0); the expert planes
    w1/w2 are sharded on their leading E axis (E % n == 0); the gate is
    replicated. ``capacity`` is per-shard per-expert. Output sharding
    matches ``x``. Per-shard math is identical to :func:`moe_ffn` on the
    corresponding token shard.
    """
    n = mesh.shape[axis]
    n_experts = params["gate"].shape[-1]
    if n_experts % n:
        raise ValueError(f"n_experts={n_experts} not divisible by "
                         f"mesh axis '{axis}' size {n}")

    if token_mask is None:
        token_mask = jnp.ones((x.shape[0],), jnp.bool_)

    def local(x_l, gate_w, w1_l, w2_l, mask_l):
        dispatch, combine, aux = top1_dispatch(x_l, gate_w, n_experts,
                                               capacity, token_mask=mask_l)
        if ternary:
            w1q = _ternarize_expert_planes(w1_l, sparsity_target)
            w2q = _ternarize_expert_planes(w2_l, sparsity_target)
        else:
            w1q, w2q = w1_l, w2_l
        buf = jnp.einsum("tec,td->ecd", dispatch, x_l)  # (E, C, D)
        # token-major → expert-major: device i keeps slots for its E/n
        # experts from every device: (E, C, D) → (E/n, n·C, D).
        buf = jax.lax.all_to_all(buf, axis, split_axis=0, concat_axis=1,
                                 tiled=True)
        h = jax.nn.gelu(jnp.einsum("ecd,edh->ech", buf, w1q))
        out = jnp.einsum("ech,ehd->ecd", h, w2q)        # (E/n, n·C, D)
        # expert-major → token-major: back to (E, C, D) locally.
        out = jax.lax.all_to_all(out, axis, split_axis=1, concat_axis=0,
                                 tiled=True)
        y = jnp.einsum("tec,ecd->td", combine, out)
        # Aux stats are per-shard; average over the axis so the P() out
        # spec really is replicated.
        aux = jax.tree_util.tree_map(
            lambda a: jax.lax.pmean(a, axis), aux)
        return y, aux

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P()),
        check_vma=False,
    )(x, params["gate"], params["w1"], params["w2"], token_mask)
