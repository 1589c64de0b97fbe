#!/usr/bin/env python
"""Standalone evaluation CLI.

The reference README advertises an `evaluate.py` that does not exist in the
reference repo (readme.md:60; SURVEY.md §0) — this build supplies it.
Evaluates a saved checkpoint: classification accuracy for
mnist/fashion_mnist, Recall@K for flickr8k retrieval.
"""

import argparse
import json
import os
import warnings

from atq_tpu.utils.platform import apply_platform_env

apply_platform_env()


def build_parser():
    parser = argparse.ArgumentParser(description="Evaluate an ATQ model")
    parser.add_argument("--task", type=str, required=True,
                        choices=["classification", "retrieval"])
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="Path to a .npz checkpoint")
    parser.add_argument("--dataset", type=str, default="fashion_mnist",
                        choices=["mnist", "fashion_mnist"])
    parser.add_argument("--split", type=str, default="test",
                        choices=["val", "test"])
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--image_size", type=int, default=160)
    parser.add_argument("--max_seq_length", type=int, default=50)
    parser.add_argument("--embed_dim", type=int, default=192)
    parser.add_argument("--hidden_dim", type=int, default=384)
    parser.add_argument("--use_residual", action="store_true")
    parser.add_argument("--use-rpb", dest="use_rpb", action="store_true")
    parser.add_argument("--wider-layers", dest="wider_layers",
                        action="store_true")
    parser.add_argument("--data_dir", type=str, default=None)
    parser.add_argument("--vocab_file", type=str, default=None,
                        help="vocab.json forcing identical token ids "
                        "(retrieval). Defaults to the vocab.json next to "
                        "the checkpoint when present — train_retrieval "
                        "writes one precisely so later evaluation cannot "
                        "drift under different tokenization.")
    parser.add_argument("--moe_experts", type=int, default=0,
                        help="Match a checkpoint trained with "
                             "--moe_experts N")
    parser.add_argument("--grad-mode", "--grad_mode", dest="grad_mode",
                        type=str, default="auto",
                        choices=["auto", "parity", "ste", "ttq"],
                        help="gradient mode the checkpoint was trained "
                        "with. 'auto' (default) detects TTQ checkpoints "
                        "by their per-layer wp/wn scales; evaluating a "
                        "TTQ checkpoint with a non-ttq forward would "
                        "silently use the untrained alpha")
    parser.add_argument("--packed", action="store_true",
                        help="serve every quantized layer from exported "
                             "2-bit planes + sparse correction instead of "
                             "dense weights (deployment-form eval)")
    parser.add_argument("--int8_trunk", action="store_true",
                        help="(retrieval) serve the FP ResNet backbone "
                             "from per-channel int8 weights with BatchNorm "
                             "folded (serve/int8_trunk.py); composes with "
                             "--packed for a fully quantized image tower")
    parser.add_argument("--output", type=str, default=None,
                        help="Optional JSON file for the metrics")
    parser.add_argument("--save_index", type=str, default=None,
                        help="(retrieval) also embed the split's unique "
                             "images and save them as an EmbeddingIndex "
                             ".npz, servable via `serve.py --index_file`")
    return parser


def _params_have_ttq_scales(params) -> bool:
    """True if any layer carries TTQ's asymmetric wp/wn scale params."""
    if isinstance(params, dict):
        if "wp" in params and "wn" in params:
            return True
        return any(_params_have_ttq_scales(v) for v in params.values())
    return False


def resolve_grad_mode(requested: str, params) -> str:
    """Resolve --grad-mode against what the checkpoint actually contains.

    A TTQ checkpoint (params contain per-layer wp/wn) evaluated with the
    parity/ste forward would silently use the untrained alpha — layer
    outputs diverge with no error — so mismatches are fatal, not warnings.
    """
    has_ttq = _params_have_ttq_scales(params)
    if requested == "auto":
        return "ttq" if has_ttq else "parity"
    if has_ttq and requested != "ttq":
        raise SystemExit(
            f"checkpoint contains TTQ wp/wn scales but --grad-mode="
            f"{requested} was requested; evaluating it without "
            f"grad_mode='ttq' would silently use the untrained alpha. "
            f"Pass --grad-mode ttq (or auto).")
    if not has_ttq and requested == "ttq":
        raise SystemExit(
            "--grad-mode ttq requested but the checkpoint has no wp/wn "
            "scales; it was not trained with TTQ.")
    return requested


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax

    from atq_tpu.train.classifier import load_checkpoint

    ckpt = load_checkpoint(args.checkpoint)
    grad_mode = resolve_grad_mode(args.grad_mode, ckpt.get("params", {}))

    if args.task == "classification":
        from atq_tpu.data.mnist import (
            get_fashion_mnist_data,
            get_mnist_data,
        )
        from atq_tpu.models.image_classifier import ATQImageClassifier
        from atq_tpu.train.classifier import _run_eval, build_eval_step

        data_dir = args.data_dir or "./data"
        get_data = (get_mnist_data if args.dataset == "mnist"
                    else get_fashion_mnist_data)
        _, val_loader, test_loader = get_data(args.batch_size, data_dir,
                                              subset_fraction=1.0)
        loader = val_loader if args.split == "val" else test_loader

        model = ATQImageClassifier(
            use_rpb=args.use_rpb,
            hidden_size=256 if args.wider_layers else 128,
            grad_mode=grad_mode,
        )
        state = {
            "atq_params": ckpt["params"],
            "quant": ckpt.get("quant", {}),
            "atq_batch_stats": ckpt.get("batch_stats", {}),
        }
        packed = None
        if args.packed:
            from atq_tpu.serve.packed_model import export_packed_collection

            packed = export_packed_collection(ckpt["params"],
                                              ckpt.get("quant"))
        eval_fn = build_eval_step(model, "atq_params", "atq_batch_stats",
                                  packed=packed)
        acc, loss = _run_eval(eval_fn, state, loader)
        metrics = {"accuracy": acc, "loss": loss}
        print(f"{args.dataset} {args.split} accuracy: {acc:.2f}%")
    else:
        from atq_tpu.data.flickr8k import prepare_flickr8k_dataloaders
        from atq_tpu.models.retrieval import ATQMultimodalRetrieval
        from atq_tpu.train.retrieval import build_embed_fn, evaluate_model

        data_dir = args.data_dir or "./data/flickr8k"
        vocab_file = args.vocab_file
        if vocab_file is None:
            candidate = os.path.join(os.path.dirname(args.checkpoint),
                                     "vocab.json")
            vocab_file = candidate if os.path.exists(candidate) else None
        # Tokenizer-variant guard (ADVICE round 4): token ids are only
        # meaningful under the tokenizer that built the vocabulary.
        from atq_tpu.data.flickr8k import (
            active_tokenizer_variant,
            read_vocab_tokenizer,
            tokenizer_variants_compatible,
        )

        active_tok = active_tokenizer_variant()
        if vocab_file is None:
            warnings.warn(
                "no vocab.json found next to the checkpoint and no "
                "--vocab_file given: rebuilding the vocabulary from the "
                f"train captions under tokenizer '{active_tok}'. If the "
                "checkpoint was trained under a different tokenizer "
                "(e.g. pre-round-5 .split() runs), token ids will NOT "
                "match and the metrics below are meaningless — pass the "
                "training run's vocab.json.")
        else:
            saved_tok = read_vocab_tokenizer(vocab_file)
            if saved_tok is None:
                warnings.warn(
                    f"{vocab_file} carries no tokenizer stamp (saved "
                    "before round 5). Forcing its exact token ids is "
                    "still correct; just ensure the checkpoint really "
                    "was trained with this vocabulary.")
            elif not tokenizer_variants_compatible(saved_tok, active_tok):
                raise SystemExit(
                    f"vocab {vocab_file} was built with tokenizer "
                    f"'{saved_tok}' but the active tokenizer is "
                    f"'{active_tok}' (ATQ_SPLIT_TOKENIZER="
                    f"{os.environ.get('ATQ_SPLIT_TOKENIZER', '0')}). "
                    "Evaluating with mismatched tokenization produces "
                    "silently wrong metrics; align the environment "
                    "before re-running.")
        _, val_loader, test_loader, vocab_size, _ = (
            prepare_flickr8k_dataloaders(
                batch_size=args.batch_size, image_size=args.image_size,
                max_length=args.max_seq_length, root_dir=data_dir,
                vocab_file=vocab_file,
            )
        )
        loader = val_loader if args.split == "val" else test_loader
        model = ATQMultimodalRetrieval(
            vocab_size=vocab_size, embed_dim=args.embed_dim,
            hidden_dim=args.hidden_dim, use_residual=args.use_residual,
            max_seq_length=args.max_seq_length,
            text_moe_experts=args.moe_experts,
            grad_mode=grad_mode,
        )
        constants = ckpt.get("constants")
        if not constants:
            # Older checkpoints: recreate the non-trainable constants
            # (positional encoding) from a fresh init.
            import jax.numpy as jnp

            fresh = model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, args.image_size, args.image_size, 3)),
                jnp.zeros((1, args.max_seq_length), jnp.int32),
                jnp.asarray([5], jnp.int32),
            )
            constants = fresh.get("constants", {})
        # Checkpoints trained with --scan_layers carry the scanned
        # (layers/scan/layer) text-stack layout — a training-time
        # compile/memory optimization. Eval/serving/export run unrolled;
        # convert transparently.
        from atq_tpu.nn.transformer import normalize_checkpoint

        ckpt, _ = normalize_checkpoint(ckpt)
        state = {
            "params": ckpt["params"],
            "quant": ckpt.get("quant", {}),
            "constants": constants,
            "batch_stats": ckpt.get("batch_stats", {}),
        }
        packed = None
        if args.packed:
            from atq_tpu.serve.packed_model import export_packed_collection

            packed = export_packed_collection(ckpt["params"],
                                              ckpt.get("quant"))
        int8 = None
        if args.int8_trunk:
            from atq_tpu.serve.int8_trunk import export_int8_collection

            int8 = export_int8_collection(ckpt["params"],
                                          ckpt.get("batch_stats", {}))
        embed_fn = build_embed_fn(model, packed=packed, int8=int8)
        metrics = evaluate_model(embed_fn, state, loader)
        for k, v in metrics.items():
            print(f"{k}: {v:.2f}")

        if args.save_index:
            # Checkpoint -> servable corpus: embed each unique image of
            # the split (5 caption rows share one image; eval loaders
            # are unshuffled, so row order matches dataset.items) and
            # save in the EmbeddingIndex format for serve.py
            # --index_file.
            import numpy as np

            from atq_tpu.serve.index import EmbeddingIndex

            names = [n for n, _ in loader.dataset.items]
            index = EmbeddingIndex(dim=args.embed_dim)
            seen = set()
            row = 0
            for batch in loader:
                img_emb, _ = embed_fn(state, batch, False)
                for emb in np.asarray(jax.device_get(img_emb)):
                    name = names[row]
                    row += 1
                    if name not in seen:
                        seen.add(name)
                        index.add([name], emb[None, :])
            index.save(args.save_index)
            print(f"saved image index: {len(index)} unique images -> "
                  f"{args.save_index}")

    if args.output:
        with open(args.output, "w") as f:
            json.dump({k: float(v) for k, v in metrics.items()}, f, indent=4)


if __name__ == "__main__":
    main()
