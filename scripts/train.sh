#!/usr/bin/env bash
# Two-stage training recipe (reference scripts/train.sh:1-8 +
# train_manager_mm.py:114-124).  Stage 1 optionally warm-starts from a
# converted CFBI checkpoint (pass --pretrained_path to this script via
# STAGE1_PRETRAIN); stage 2 chains from stage 1's newest checkpoint.
set -e
cd "$(dirname "$0")/.."

STAGE1_EXP=${STAGE1_EXP:-aoc_stage_1}
STAGE2_EXP=${STAGE2_EXP:-aoc_stage_2}

# Stage 1: 50k steps (warm start from CFBI when STAGE1_PRETRAIN is set)
stage1_args=()
if [ -n "${STAGE1_PRETRAIN:-}" ]; then
  stage1_args+=(--pretrained_path "$STAGE1_PRETRAIN")
fi
python -m rvos_tpu.cli.train --config resnet101_aocnet \
  --exp_name "$STAGE1_EXP" "${stage1_args[@]}" "$@"

# Stage 2: 400k steps continuing from stage 1's newest checkpoint
STAGE1_CKPT_DIR="workdir/result/${STAGE1_EXP}/ckpt"
python -m rvos_tpu.cli.train --config resnet101_aocnet_2 \
  --exp_name "$STAGE2_EXP" --pretrained_path "$STAGE1_CKPT_DIR" "$@"
