#!/usr/bin/env bash
# RPA evaluation (reference scripts/eval.sh:1-3).
python -m rvos_tpu.cli.eval --config resnet101_aocnet_2 --ckpt_step 400000 \
  --mem_every 5 --ucr 1.0 "$@"
