#!/usr/bin/env bash
# One-command accuracy-parity run for the day real data/weights appear
# (this box has zero egress, so Fashion-MNIST/Flickr8k/IMAGENET weights
# cannot be downloaded here — see VERDICT round-1 weak #7/#8).
#
# Usage:
#   ./parity_when_data.sh [--weights path/to/resnet18-f37072fd.pth] [--dryrun]
#
# Expects (any that exist are used; missing ones fall back to synthetic):
#   ./data/FashionMNIST/raw/*-ubyte(.gz)      Fashion-MNIST IDX files
#   ./data/flickr8k/Flicker8k_Dataset/ + Flickr8k.token.txt (+ split files)
#   a torchvision resnet18 IMAGENET1K_V1 .pth (manifest:
#   atq_tpu/models/resnet.py:IMAGENET_MANIFEST)
#
# Runs BOTH reference README recipes (readme.md:110, readme.md:127) with
# the reference's exact hyperparameters, then evaluates, and prints the
# numbers next to the published targets (85.7% Fashion-MNIST accuracy;
# Flickr8k R@1/R@5).
#
# --dryrun (round-5 ask #8): prove the staged pipeline end-to-end WITHOUT
# real data — synthesizes a layout-real Flickr8k fixture
# (tests/data/flickr8k_fixture.py), shrinks epochs/sizes, and runs the
# very same train -> checkpoint -> evaluate chain. Exit 0 = known-good.
set -euo pipefail
cd "$(dirname "$0")"

WEIGHTS=""
DRYRUN=0
while [[ $# -gt 0 ]]; do
  case "$1" in
    --weights) WEIGHTS="$2"; shift 2 ;;
    --dryrun) DRYRUN=1; shift ;;
    *) echo "unknown arg: $1" >&2; exit 2 ;;
  esac
done

CLS_EPOCHS=25; CLS_EXTRA=()
RET_EPOCHS=10; RET_WARMUP=2; IMAGE_SIZE=160; RET_DATA=()
OUT_DIR=outputs/parity_retrieval
if [[ "$DRYRUN" == "1" ]]; then
  echo "== DRY RUN: synthesizing a Flickr8k-format fixture =="
  FIXTURE_DIR=outputs/flickr8k_fixture
  rm -rf "$FIXTURE_DIR"
  python tests/data/flickr8k_fixture.py "$FIXTURE_DIR" --n-images 24
  # Redirect the classification artifacts: the default --checkpoint-dir /
  # --plots-dir would overwrite the tracked demo checkpoint and training
  # curve with 1-epoch dryrun versions.
  CLS_EPOCHS=1; CLS_EXTRA=(--subset-fraction 0.02
    --checkpoint-dir outputs/parity_cls_dryrun
    --plots-dir outputs/parity_cls_dryrun)
  RET_EPOCHS=1; RET_WARMUP=0; IMAGE_SIZE=64
  RET_DATA=(--data_dir "$FIXTURE_DIR")
  OUT_DIR=outputs/parity_retrieval_dryrun
  export ATQ_NO_DOWNLOAD=1
fi

echo "== Recipe 1: Fashion-MNIST classification (readme.md:110) =="
python train.py --dataset fashion_mnist --batch-size 256 \
  --epochs "$CLS_EPOCHS" "${CLS_EXTRA[@]+"${CLS_EXTRA[@]}"}" \
  --use-rpb --distill --sparsity 0.3 2>&1 | tail -20

echo
echo "== Recipe 2: Flickr8k retrieval (readme.md:127) =="
RETRIEVAL_ARGS=(--batch_size 16 --embed_dim 192 --hidden_dim 384
  --epochs "$RET_EPOCHS" --learning_rate 5e-5 --image_size "$IMAGE_SIZE"
  --use_residual --reinit_model --gradual_quant
  --warmup_epochs "$RET_WARMUP" --contrastive_reg 0.05
  --output_dir "$OUT_DIR")
RETRIEVAL_ARGS+=("${RET_DATA[@]+"${RET_DATA[@]}"}")
if [[ -n "$WEIGHTS" ]]; then
  RETRIEVAL_ARGS+=(--imagenet_weights "$WEIGHTS")
fi
python train_multimodal.py "${RETRIEVAL_ARGS[@]}" 2>&1 | tail -20

echo
echo "== Evaluation =="
EVAL_DATA=()
if [[ "$DRYRUN" == "1" ]]; then EVAL_DATA=(--data_dir "$FIXTURE_DIR"); fi
python evaluate.py --task retrieval \
  --checkpoint "$OUT_DIR/final_model.npz" \
  --use_residual --embed_dim 192 --hidden_dim 384 \
  --image_size "$IMAGE_SIZE" "${EVAL_DATA[@]+"${EVAL_DATA[@]}"}" \
  --split test

echo
echo "Published targets (BASELINE.md): Fashion-MNIST 85.7% (ATQ) / 93.0%"
echo "(FP baseline); Flickr8k R@1 15-25% / R@5 40-50% (aspirational)."
