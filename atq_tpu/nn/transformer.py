"""Ternary transformer encoder layer (Flax).

Reference: /root/reference/models/text_encoder.py:166-249.

Preserved quirks: pre-norm architecture; every layer is "critical"
(``is_critical = layer_idx >= 0``, text_encoder.py:182) so attention uses
precision 0.2 and FFN linear1/linear2 use 0.2/0.4; a single learnable sigmoid
gate (init 0.8) scales BOTH residual branches; GELU (exact, not tanh-approx)
in the FFN.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from atq_tpu.nn.attention import TernaryMultiheadAttention, _norm, _proj


class TernaryTransformerLayer(nn.Module):
    embed_dim: int
    num_heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    use_rpb: bool = True
    sparsity_target: float = 0.3
    layer_idx: int = 0
    grad_mode: str = "parity"
    dtype: Optional[jnp.dtype] = None  # matmul compute dtype (AMP)
    attn_impl: str = "einsum"  # 'fused' = ops/fused_attention.py kernel
    # Framework extension (0 = reference-parity dense FFN): replace the
    # FFN with a ternary-expert MoE (atq_tpu/parallel/moe.py). Expert
    # planes live on a leading E axis — shard it over an 'expert' mesh
    # axis under pjit and GSPMD turns the dispatch einsums into
    # expert-parallel all_to_alls. Load-balance aux loss is sown under
    # ('intermediates', 'moe_aux_loss').
    moe_experts: int = 0
    moe_capacity_factor: float = 1.25
    # Hoisted-quantization mode (nn/hoist.py): every ternary projection
    # consumes an already-effective weight (plain matmul). Set by
    # ScannedTernaryStack(hoist_quant=True); init is unaffected.
    pre_quantized: bool = False

    @nn.compact
    def __call__(self, src, src_mask=None, src_key_padding_mask=None,
                 deterministic: bool = True):
        initial_sparsity = min(0.1, self.sparsity_target)
        is_critical = self.layer_idx >= 0  # all layers (text_encoder.py:182)
        precision_ratio = 0.2 if is_critical else 0.05

        gate = self.param(
            "gate", lambda _key, shape: jnp.full(shape, 0.8, jnp.float32), (1,)
        )
        gate_value = nn.sigmoid(gate)

        # Self-attention block (pre-norm).
        src2 = _norm(name="norm1")(src)
        src2 = TernaryMultiheadAttention(
            embed_dim=self.embed_dim, num_heads=self.num_heads,
            dropout=self.dropout, use_rpb=self.use_rpb,
            sparsity_target=initial_sparsity, critical_attention=is_critical,
            grad_mode=self.grad_mode, dtype=self.dtype,
            attn_impl=self.attn_impl, pre_quantized=self.pre_quantized,
            name="self_attn",
        )(src2, src2, src2, attn_mask=src_mask,
          key_padding_mask=src_key_padding_mask, deterministic=deterministic)
        src = src + nn.Dropout(self.dropout)(
            src2, deterministic=deterministic
        ) * gate_value

        # Feed-forward block (pre-norm), GELU exact like torch F.gelu.
        src2 = _norm(name="norm2")(src)
        if self.moe_experts > 0:
            src2 = self._moe_ffn(src2, src_key_padding_mask)
        else:
            h = _proj(self.use_rpb, self.dim_feedforward, precision_ratio,
                      initial_sparsity, "linear1", self.grad_mode,
                      self.dtype, self.pre_quantized)(src2)
            h = jax.nn.gelu(h, approximate=False)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            src2 = _proj(self.use_rpb, self.embed_dim,
                         precision_ratio * 2, initial_sparsity, "linear2",
                         self.grad_mode, self.dtype, self.pre_quantized)(h)
        src = src + nn.Dropout(self.dropout)(
            src2, deterministic=deterministic
        ) * gate_value
        return src

    def _moe_ffn(self, x, key_padding_mask=None):
        """Ternary-expert MoE FFN over flattened (B·L, D) tokens.

        Padding tokens (key_padding_mask True, or beyond a lengths
        vector) are excluded from routing: they consume no expert
        capacity and don't skew the load-balance aux loss.
        """
        import math

        from atq_tpu.nn.attention import lengths_to_padding_mask
        from atq_tpu.parallel.moe import moe_ffn

        b, l, d = x.shape
        e = self.moe_experts
        params = {
            "gate": self.param(
                "moe_gate", nn.initializers.normal(d ** -0.5), (d, e)),
            "w1": self.param(
                "moe_w1", nn.initializers.normal(d ** -0.5),
                (e, d, self.dim_feedforward)),
            "w2": self.param(
                "moe_w2",
                nn.initializers.normal(self.dim_feedforward ** -0.5),
                (e, self.dim_feedforward, d)),
        }
        tokens = b * l
        capacity = max(1, math.ceil(tokens / e * self.moe_capacity_factor))
        token_mask = None
        if key_padding_mask is not None:
            pad = jnp.asarray(key_padding_mask)
            if pad.ndim == 1:  # lengths vector, like the attention path
                pad = lengths_to_padding_mask(pad, l)
            token_mask = jnp.logical_not(pad.astype(bool)).reshape(tokens)
        y, aux = moe_ffn(x.reshape(tokens, d), params, capacity=capacity,
                         ternary=True,
                         sparsity_target=self.sparsity_target,
                         token_mask=token_mask)
        self.sow("intermediates", "moe_aux_loss", aux["aux_loss"])
        return y.reshape(b, l, d)


class ScannedTernaryStack(nn.Module):
    """N TernaryTransformerLayers stacked with ``nn.scan``.

    The production way to build DEEP ternary encoders under XLA: one
    traced layer, weights stacked on a leading layer axis, so the
    compiled program is depth-independent (an unrolled 12-layer
    bert-base program is ~15x the HLO of the scanned one and can
    exceed compile-request limits on remote-compile runtimes) and
    compile time stops growing with depth. ``remat`` (default True)
    rematerializes each layer in the backward pass — without it XLA
    materializes the stacked (L, B, S, ffn) activation buffers, which
    at bert-base scale is 19.8 GB, past a v5e's HBM.

    Semantics match the unrolled loop exactly at fp32 (the reference
    layer treats every index as critical — text_encoder.py:182 — so
    ``layer_idx`` does not change the math). Under AMP the carry is
    kept in the compute dtype between layers, where the unrolled loop
    re-enters each layer in f32; both are tested equivalent to bf16
    tolerance. Parameters live under ``<name>/layer`` with a leading
    ``num_layers`` axis; :func:`stack_layer_params` /
    :func:`unstack_layer_params` convert to/from the unrolled
    ``layers_{i}`` layout (checkpoints on the reference-parity path
    always use the unrolled layout).

    MoE FFNs (``moe_experts > 0``) are not supported under scan: the
    load-balance aux loss is sown per layer into ``intermediates``,
    which scan would need to accumulate differently; use the unrolled
    stack for MoE.
    """

    num_layers: int
    embed_dim: int
    num_heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    use_rpb: bool = True
    sparsity_target: float = 0.3
    grad_mode: str = "parity"
    dtype: Optional[jnp.dtype] = None
    attn_impl: str = "einsum"  # 'fused' = ops/fused_attention.py kernel
    remat: bool = True
    # 'save_quantized' (default): remat everything EXCEPT the finished
    # dequantized weights (nn.layers tags them QUANTIZED_WEIGHT_NAME) —
    # the backward pass then reuses the small bf16 weight copies instead
    # of re-running quantize -> mask-blend -> cast per matmul use, which
    # profiling showed costs ~40% of each big matmul's time. 'save_dots'
    # additionally saves every projection-matmul OUTPUT
    # (dots_with_no_batch_dims_saveable): backward recomputes only
    # elementwise work and the batched attention einsums — fastest when
    # the ~O(tokens x width) bf16 residuals per layer fit in HBM.
    # 'full': plain remat, recompute everything (minimum memory).
    remat_policy: str = "save_quantized"
    # Hoist the quantization OUT of the scan (nn/hoist.py): all layers'
    # effective weights are computed once per step in one batched pass
    # before the scan (one grid-batched threshold kernel per weight kind,
    # one fused elementwise chain over the stacked (L, out, in) tensors),
    # and the scan body runs pure matmuls. Bit-identical ternary
    # decisions; forward/grad parity vs the in-scan path is pinned by
    # tests/test_hoist.py. Measured at bert-base QAT (benchmarks/r5/):
    # the in-scan quantize chains cost ~55 ms of a 158 ms step where the
    # batched chain costs a few ms.
    hoist_quant: bool = False

    @nn.compact
    def __call__(self, h, src_mask=None, src_key_padding_mask=None,
                 deterministic: bool = True):
        outer = self

        class Body(nn.Module):
            @nn.compact
            def __call__(self, carry, _):
                y = TernaryTransformerLayer(
                    embed_dim=outer.embed_dim,
                    num_heads=outer.num_heads,
                    dim_feedforward=outer.dim_feedforward,
                    dropout=outer.dropout, use_rpb=outer.use_rpb,
                    sparsity_target=outer.sparsity_target,
                    layer_idx=0, grad_mode=outer.grad_mode,
                    dtype=outer.dtype, attn_impl=outer.attn_impl,
                    pre_quantized=outer.hoist_quant,
                    name="layer",
                )(carry, src_mask=src_mask,
                  src_key_padding_mask=src_key_padding_mask,
                  deterministic=deterministic)
                # The layer norms in f32 and returns f32; a scan carry
                # must keep one type, so stay in the compute dtype.
                return y.astype(carry.dtype), None

        if self.remat:
            if self.remat_policy == "save_quantized":
                from atq_tpu.nn.layers import quantized_weight_policy

                body = nn.remat(Body, policy=quantized_weight_policy())
            elif self.remat_policy == "save_dots":
                from atq_tpu.nn.layers import (
                    quantized_weight_and_dots_policy,
                )

                body = nn.remat(
                    Body, policy=quantized_weight_and_dots_policy())
            else:
                body = nn.remat(Body)
        else:
            body = Body
        stack = nn.scan(
            body,
            variable_axes={"params": 0, "quant": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.num_layers,
        )
        if self.hoist_quant and not self.is_initializing():
            from atq_tpu.nn.hoist import make_hoist_transform

            quant_tree = (self.get_variable("quant", "scan")
                          if self.has_variable("quant", "scan") else {})
            stack = nn.map_variables(
                stack, ["params"],
                trans_in_fn=make_hoist_transform(
                    quant_tree, self.grad_mode, self.dtype),
                init=False,
            )
        if self.dtype is not None:
            h = h.astype(self.dtype)
        h, _ = stack(name="scan")(h, None)
        return h


def stack_layer_params(tree: dict, num_layers: int,
                       prefix: str = "layers_",
                       dest: str = "layers") -> dict:
    """Convert unrolled ``layers_{i}`` subtrees to the scanned layout.

    Takes one collection's tree (params or quant) containing
    ``layers_0 .. layers_{L-1}`` subtrees, stacks every leaf along a
    new leading axis, and returns the tree with those subtrees
    replaced by ``{dest: {"scan": {"layer": stacked}}}`` — the
    structure :class:`ScannedTernaryStack` (module name ``dest``)
    creates at init. Leaves must agree in shape across layers.
    """
    import jax

    keys = [f"{prefix}{i}" for i in range(num_layers)]
    missing = [k for k in keys if k not in tree]
    if missing:
        raise ValueError(f"unrolled layer subtrees missing: {missing}")
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves, axis=0),
        *[tree[k] for k in keys])
    out = {k: v for k, v in tree.items() if k not in keys}
    out[dest] = {"scan": {"layer": stacked}}
    return out


def unstack_layer_params(tree: dict, num_layers: int,
                         prefix: str = "layers_",
                         dest: str = "layers") -> dict:
    """Inverse of :func:`stack_layer_params` (for export/interop)."""
    import jax

    if dest not in tree or "scan" not in tree[dest]:
        raise ValueError(f"no scanned subtree '{dest}/scan' in tree")
    stacked = tree[dest]["scan"]["layer"]
    out = {k: v for k, v in tree.items() if k != dest}
    for i in range(num_layers):
        out[f"{prefix}{i}"] = jax.tree_util.tree_map(
            lambda leaf, i=i: leaf[i], stacked)
    return out


def is_scanned_text_layout(tree: dict, dest: str = "layers") -> bool:
    """True when a text-encoder collection subtree uses the scanned
    (``layers/scan/layer``) parameter layout."""
    node = tree.get(dest) if isinstance(tree, dict) else None
    return isinstance(node, dict) and "scan" in node


def _scanned_num_layers(tree: dict, dest: str = "layers") -> int:
    """Layer count of a scanned subtree = the stacked leaves' leading
    axis (every leaf carries it; read it off the first)."""
    import jax

    leaves = jax.tree_util.tree_leaves(tree[dest]["scan"])
    if not leaves:
        raise ValueError("scanned subtree has no leaves")
    return int(leaves[0].shape[0])


def normalize_text_encoder_layout(params_te: dict, quant_te: dict,
                                  num_layers: int | None = None):
    """Convert a text-encoder subtree to the UNROLLED layout if scanned.

    The scanned layout is a training-time compile/memory optimization;
    eval, serving, and torch export all operate on the unrolled
    ``layers_{i}`` layout (forward-only programs are small, and the
    reference's checkpoint naming is per-layer). The layer count is
    read off the stacked leaves' leading axis (``num_layers`` is
    accepted for API compatibility and cross-checked when given).
    Returns ``(params_te, quant_te, was_scanned)`` — no-op for
    unrolled input.
    """
    if not is_scanned_text_layout(params_te):
        return params_te, quant_te, False
    derived = _scanned_num_layers(params_te)
    if num_layers is not None and num_layers != derived:
        raise ValueError(
            f"scanned checkpoint has {derived} layers, caller expected "
            f"{num_layers}")
    params_te = unstack_layer_params(dict(params_te), derived)
    if isinstance(quant_te, dict) and is_scanned_text_layout(quant_te):
        quant_te = unstack_layer_params(dict(quant_te), derived)
    return params_te, quant_te, True


def normalize_checkpoint(ckpt: dict, verbose: bool = True):
    """Checkpoint-level wrapper: convert a retrieval checkpoint's
    ``text_encoder`` subtrees (params, quant, and ema_params when
    present) from the scanned to the unrolled layout. Returns
    ``(ckpt, was_scanned)``; the input dict is not mutated."""
    params = dict(ckpt.get("params", {}))
    if "text_encoder" not in params:
        return ckpt, False
    quant = dict(ckpt.get("quant", {}))
    te_p, te_q, was_scanned = normalize_text_encoder_layout(
        params["text_encoder"], quant.get("text_encoder", {}))
    if not was_scanned:
        return ckpt, False
    params["text_encoder"] = te_p
    quant["text_encoder"] = te_q
    out = {**ckpt, "params": params, "quant": quant}
    ema = ckpt.get("ema_params")
    if isinstance(ema, dict) and "text_encoder" in ema \
            and is_scanned_text_layout(ema["text_encoder"]):
        ema = dict(ema)
        ema["text_encoder"] = unstack_layer_params(
            dict(ema["text_encoder"]),
            _scanned_num_layers(ema["text_encoder"]))
        out["ema_params"] = ema
    if verbose:
        print("scanned text-stack checkpoint: converted to the unrolled "
              "layout")
    return out, True
