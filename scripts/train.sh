#!/usr/bin/env bash
# Two-stage training recipe (reference scripts/train.sh:1-8).
set -e
# Stage 1: warm-start-capable 50k-step run
python -m rvos_tpu.cli.train --config resnet101_aocnet --exp_name aoc_stage_1 "$@"
# Stage 2: 400k steps continuing from stage 1
python -m rvos_tpu.cli.train --config resnet101_aocnet_2 --exp_name aoc_stage_2 "$@"
