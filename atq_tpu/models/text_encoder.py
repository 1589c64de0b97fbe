"""ATQ text encoder (Flax).

Reference: /root/reference/models/text_encoder.py:252-432.

Architecture: full-precision embedding (init N(0, 0.02)) + embedding
LayerNorm + fixed sinusoidal positional encoding + dropout, N ternary
transformer layers, final LayerNorm, attention pooling, learnable output
scaling clamped to [1, 10].

Preserved quirks:
- the attention-pooling MLP ends in Softmax(axis=1) and, when a padding
  mask is present, the already-softmaxed weights are masked to -inf and
  softmaxed a SECOND time (text_encoder.py:292-311, :415-417) — reproduce
  as-is for metric parity;
- the positional encoding is a non-trainable 'constants'-collection
  variable, initialized to the sinusoidal table. NOTE a reference BUG we do
  NOT reproduce by default: the reference's ``_init_parameters``
  (text_encoder.py:343-352) loops over ``self.parameters()`` and
  xavier-reinitializes every parameter with dim > 1 — *including* the
  requires_grad=False positional-encoding Parameter — so the reference's
  PE is actually random, not sinusoidal. Checkpoint importers load the
  reference's (random) PE into the 'constants' variable for bitwise
  parity; from-scratch training here keeps the true sinusoidal table
  (use :func:`apply_reference_text_init` for strict reference-init runs);
- `src_key_padding_mask` may be a boolean mask (True = pad) or a vector of
  sequence lengths.
"""

from __future__ import annotations

import math

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from atq_tpu.nn.attention import _norm, _proj, lengths_to_padding_mask
from atq_tpu.nn.initializers import normal_std
from atq_tpu.nn.transformer import (
    ScannedTernaryStack,
    TernaryTransformerLayer,
)


def sinusoidal_positional_encoding(max_len: int, d_model: int) -> np.ndarray:
    """Classic fixed sin/cos table (reference text_encoder.py:334-341)."""
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32)
        * (-math.log(10000.0) / d_model)
    )
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe[None]  # (1, max_len, d_model)


class ATQTextEncoder(nn.Module):
    vocab_size: int
    embed_dim: int = 128
    num_heads: int = 8
    num_layers: int = 4
    dim_feedforward: int = 512
    dropout: float = 0.1
    use_rpb: bool = True
    sparsity_target: float = 0.3
    max_seq_length: int = 256
    grad_mode: str = "parity"
    dtype: Optional[jnp.dtype] = None  # matmul compute dtype (AMP)
    moe_experts: int = 0  # >0: MoE FFN in every transformer layer
    # (ternary experts, EP-shardable — nn/transformer.py)
    # Framework extension (off the parity path): build the layer stack
    # with nn.scan — depth-independent compiled program, required for
    # deep production stacks (see nn.transformer.ScannedTernaryStack;
    # params live under layers/scan/layer with a leading L axis, and
    # stack_layer_params converts unrolled checkpoints). remat_layers
    # applies only to the scanned stack.
    scan_layers: bool = False
    remat_layers: bool = True
    attn_impl: str = "einsum"  # 'fused' = ops/fused_attention.py kernel

    @nn.compact
    def __call__(self, x, src_key_padding_mask=None,
                 deterministic: bool = True):
        """Token ids (B, L) -> pooled text features (B, embed_dim)."""
        initial_sparsity = min(0.1, self.sparsity_target)

        if src_key_padding_mask is not None:
            src_key_padding_mask = jnp.asarray(src_key_padding_mask)
            if src_key_padding_mask.ndim == 1:
                src_key_padding_mask = lengths_to_padding_mask(
                    src_key_padding_mask, x.shape[1]
                )

        h = nn.Embed(self.vocab_size, self.embed_dim,
                     embedding_init=normal_std(0.02), name="embedding")(x)
        h = _norm(name="embed_norm")(h)

        pe_var = self.variable(
            "constants", "positional_encoding",
            lambda: jnp.asarray(sinusoidal_positional_encoding(
                self.max_seq_length, self.embed_dim)),
        )
        h = h + pe_var.value[:, : h.shape[1], :]
        h = nn.Dropout(self.dropout, name="embed_dropout")(
            h, deterministic=deterministic
        )

        if self.scan_layers:
            if self.moe_experts > 0:
                raise ValueError(
                    "scan_layers does not support moe_experts > 0 — the "
                    "per-layer aux-loss sow needs the unrolled stack")
            h = ScannedTernaryStack(
                num_layers=self.num_layers, embed_dim=self.embed_dim,
                num_heads=self.num_heads,
                dim_feedforward=self.dim_feedforward,
                dropout=self.dropout, use_rpb=self.use_rpb,
                sparsity_target=initial_sparsity,
                grad_mode=self.grad_mode, dtype=self.dtype,
                remat=self.remat_layers, attn_impl=self.attn_impl,
                name="layers",
            )(h, src_key_padding_mask=src_key_padding_mask,
              deterministic=deterministic)
            h = h.astype(jnp.float32)
        else:
            for i in range(self.num_layers):
                h = TernaryTransformerLayer(
                    embed_dim=self.embed_dim, num_heads=self.num_heads,
                    dim_feedforward=self.dim_feedforward,
                    dropout=self.dropout, dtype=self.dtype,
                    use_rpb=self.use_rpb,
                    sparsity_target=initial_sparsity,
                    layer_idx=i, grad_mode=self.grad_mode,
                    moe_experts=self.moe_experts,
                    attn_impl=self.attn_impl, name=f"layers_{i}",
                )(h, src_key_padding_mask=src_key_padding_mask,
                  deterministic=deterministic)

        h = _norm(name="norm")(h)

        # Attention pooling: RPB dim -> dim/2 -> 1 with Tanh, softmax over
        # the sequence axis (text_encoder.py:292-311).
        a = _proj(self.use_rpb, self.embed_dim // 2, 0.2, initial_sparsity,
                  "attention_pool_0", self.grad_mode, self.dtype)(h)
        a = jnp.tanh(a)
        a = _proj(self.use_rpb, 1, 0.2, initial_sparsity,
                  "attention_pool_2", self.grad_mode, self.dtype)(a)
        attn_weights = nn.softmax(a, axis=1)  # (B, L, 1)

        if src_key_padding_mask is not None:
            # Double-softmax quirk (text_encoder.py:415-417): mask the
            # already-softmaxed weights and renormalize.
            attn_weights = jnp.where(
                src_key_padding_mask[:, :, None], float("-inf"), attn_weights
            )
            attn_weights = nn.softmax(attn_weights, axis=1)

        text_features = jnp.sum(h * attn_weights, axis=1)  # (B, D)

        scaling = self.param(
            "scaling", lambda _k, shape: jnp.full(shape, 4.0, jnp.float32),
            (1,),
        )
        return text_features * jnp.clip(scaling, 1.0, 10.0)

    def extract_features(self, x, src_key_padding_mask=None,
                         deterministic: bool = True):
        return self(x, src_key_padding_mask, deterministic)


def apply_reference_text_init(variables: dict, rng) -> dict:
    """Reproduce the reference's ``_init_parameters`` exactly
    (text_encoder.py:343-352) for strict-parity from-scratch runs:
    xavier_uniform(gain=0.8) on EVERY parameter with ndim > 1 — including
    the positional-encoding constant, which the reference accidentally
    clobbers — then N(0, 0.02) on the embedding."""
    import jax

    new_params: dict = {}

    def set_in(tree, keys, value):
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value

    gain = 0.8
    for i, (path, leaf) in enumerate(
        jax.tree_util.tree_leaves_with_path(variables["params"])
    ):
        keys = [str(getattr(p, "key", p)) for p in path]
        key_rng = jax.random.fold_in(rng, i)
        # A scanned stack (ScannedTernaryStack) adds a leading layer
        # axis to every leaf; the reference's ndim>1 rule must apply to
        # the PER-LAYER rank, or (L, 1) gates/alphas and (L, out)
        # biases — untouched in the unrolled layout — get clobbered.
        eff_ndim = leaf.ndim - 1 if "scan" in keys else leaf.ndim
        if keys[-1] == "embedding":
            value = 0.02 * jax.random.normal(key_rng, leaf.shape, leaf.dtype)
        elif eff_ndim > 1:
            fan_in, fan_out = leaf.shape[-1], leaf.shape[-2]
            bound = gain * np.sqrt(6.0 / (fan_in + fan_out))
            value = jax.random.uniform(key_rng, leaf.shape, leaf.dtype,
                                       -bound, bound)
        else:
            value = leaf
        set_in(new_params, keys, value)

    new_constants = dict(variables.get("constants", {}))
    pe = new_constants.get("positional_encoding")
    if pe is not None:
        fan_in, fan_out = pe.shape[-1], pe.shape[-2]
        bound = gain * np.sqrt(6.0 / (fan_in + fan_out))
        new_constants["positional_encoding"] = jax.random.uniform(
            jax.random.fold_in(rng, 10_000), pe.shape, pe.dtype,
            -bound, bound,
        )
    return {**variables, "params": new_params, "constants": new_constants}
