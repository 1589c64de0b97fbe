#!/usr/bin/env python
"""ATQ image-text retrieval CLI (Flickr8k).

Mirrors the reference driver's argparse surface flag-for-flag
(/root/reference/train_multimodal.py:822-872, underscore-style flags —
the two reference drivers deliberately disagree on flag style and we keep
that). Runs the jitted TPU pipeline in atq_tpu/train/retrieval.py.
"""

import argparse

from atq_tpu.utils.platform import (
    apply_platform_env,
    force_platform_from_argv,
)

force_platform_from_argv()  # honor --device cpu before backends init
apply_platform_env()

from atq_tpu.train.retrieval import RetrievalConfig, train_retrieval


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Train ATQ model for image-text retrieval"
    )
    # General settings
    parser.add_argument("--seed", type=int, default=42, help="Random seed")
    parser.add_argument("--use_cuda", action="store_true",
                        help="Accepted for API compatibility (TPU build)")
    parser.add_argument("--device", type=str, default="tpu",
                        choices=["cpu", "cuda", "mps", "tpu"],
                        help="Device to use (TPU build: tpu or cpu)")
    parser.add_argument("--output_dir", type=str,
                        default="./outputs/retrieval",
                        help="Output directory")
    parser.add_argument("--verbose", action="store_true",
                        help="Enable verbose output")
    parser.add_argument("--num_workers", type=int, default=2,
                        help="Number of workers for data loading")
    # Dataset settings
    parser.add_argument("--batch_size", type=int, default=16,
                        help="Batch size")
    parser.add_argument("--max_seq_length", type=int, default=50,
                        help="Maximum sequence length for text")
    parser.add_argument("--image_size", type=int, default=160,
                        help="Image size for resizing")
    # Model settings
    parser.add_argument("--embed_dim", type=int, default=192,
                        help="Embedding dimension for joint space")
    parser.add_argument("--hidden_dim", type=int, default=384,
                        help="Hidden dimension for encoders")
    parser.add_argument("--vision_sparsity", type=float, default=0.3,
                        help="Sparsity target for vision encoder")
    parser.add_argument("--text_sparsity", type=float, default=0.2,
                        help="Sparsity target for text encoder")
    parser.add_argument("--use_residual", action="store_true",
                        help="Use residual precision boosting")
    parser.add_argument("--reinit_model", action="store_true",
                        help="Reinitialize model weights")
    # Enhanced ATQ settings
    parser.add_argument("--gradual_quant", action="store_true",
                        help="Use gradual quantization schedule")
    parser.add_argument("--warmup_epochs", type=int, default=2,
                        help="Number of warmup epochs for quantization")
    # Training settings
    parser.add_argument("--epochs", type=int, default=10,
                        help="Number of epochs")
    parser.add_argument("--learning_rate", type=float, default=5e-5,
                        help="Learning rate")
    parser.add_argument("--weight_decay", type=float, default=1e-4,
                        help="Weight decay")
    parser.add_argument("--optimizer", type=str, default="adamw",
                        choices=["adam", "adamw", "sgd"], help="Optimizer")
    parser.add_argument("--clip_grad", action="store_true",
                        help="Apply gradient clipping")
    parser.add_argument("--modality_dropout", type=float, default=0.1,
                        help="Probability of dropping a modality")
    parser.add_argument("--checkpoint_freq", type=int, default=2,
                        help="Checkpoint save frequency (epochs)")
    parser.add_argument("--contrastive_reg", type=float, default=0.02,
                        help="Regularization for contrastive loss")
    # Advanced training options
    parser.add_argument("--use_amp", action="store_true",
                        help="Use mixed precision (bfloat16 on TPU)")
    parser.add_argument("--use_ema", action="store_true",
                        help="Use exponential moving average model")
    # Distillation settings
    parser.add_argument("--train_baseline", action="store_true",
                        help="Train baseline model for comparison")
    parser.add_argument("--distill", action="store_true",
                        help="Use knowledge distillation")
    parser.add_argument("--distill_weight", type=float, default=0.3,
                        help="Weight for distillation loss")
    # Memory optimization settings
    parser.add_argument("--grad_checkpointing", action="store_true",
                        help="Use gradient checkpointing to save memory")
    # Framework extensions (not part of the reference surface):
    parser.add_argument("--grad_mode", type=str, default="parity",
                        choices=["parity", "ste", "ttq"])
    parser.add_argument("--data_dir", type=str, default="./data/flickr8k")
    parser.add_argument("--dp", type=int, default=None,
                        help="Data-parallel device count (default: all)")
    parser.add_argument("--moe_experts", type=int, default=0,
                        help="Ternary-expert MoE FFN in the text encoder "
                             "(0 = reference-parity dense FFN)")
    parser.add_argument("--attn_impl", type=str, default="einsum",
                        choices=["einsum", "fused"],
                        help="Text-stack attention implementation; "
                             "'fused' keeps the (S,S) scores in VMEM "
                             "(ops/fused_attention.py) — identical math, "
                             "faster at training shapes. Requires "
                             "attention dropout 0.0: with dropout active "
                             "the fused kernel cannot run and training "
                             "falls back to einsum (a one-time warning "
                             "is emitted)")
    parser.add_argument("--scan_layers", action="store_true",
                        help="Build the text stack with nn.scan "
                             "(depth-independent compiled program + "
                             "threshold-saving remat; production option "
                             "for deep stacks, off the parity path)")
    parser.add_argument("--grad_accum_steps", type=int, default=1,
                        help="GradCache two-pass accumulation: N"
                             " microbatches per optimizer step with the"
                             " FULL-batch contrastive negative pool —"
                             " large pools at microbatch memory")
    parser.add_argument("--fsdp", action="store_true",
                        help="ZeRO-3-style fully-sharded data parallelism:"
                             " large state leaves (weights, masks, adam"
                             " moments, EMA) shard over 'data'; composes"
                             " with --tp (2-D weight sharding)")
    parser.add_argument("--tp", type=int, default=1,
                        help="Tensor-parallel size over the 'model' mesh "
                             "axis (FFN out-features sharded; dp*tp must "
                             "equal the device count)")
    parser.add_argument("--synthetic_images", type=int, default=400,
                        help="Synthetic corpus size when real data missing")
    parser.add_argument("--resume", action="store_true",
                        help="Resume from the latest Orbax training state")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="Capture a jax.profiler trace of epoch 1 here")
    parser.add_argument("--tensorboard_dir", type=str, default=None,
                        help="Write per-epoch TensorBoard scalars here "
                             "(opt-in; JSON artifacts stay canonical)")
    parser.add_argument("--vocab_file", type=str, default=None,
                        help="Use a recorded vocabulary JSON (exact token-id"
                             " parity with a previous run)")
    parser.add_argument("--use_multi_positive", action="store_true",
                        help="Train with MultiPositiveInfoNCE over the 5"
                             " captions per image (framework extension)")
    parser.add_argument("--imagenet_weights", type=str, default=None,
                        help="Path to a torchvision IMAGENET1K_V1 resnet18"
                             " .pth; grafts the pretrained backbone the"
                             " reference depends on (see"
                             " atq_tpu/models/resnet.py:IMAGENET_MANIFEST)")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = RetrievalConfig(**{
        f.name: getattr(args, f.name)
        for f in __import__("dataclasses").fields(RetrievalConfig)
        if hasattr(args, f.name)
    })
    return train_retrieval(cfg)


if __name__ == "__main__":
    main()
