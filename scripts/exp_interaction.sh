#!/bin/bash
# Interaction suite for one model/dataset (reference scripts/exp_interaction.sh).
set -e
model=${1:-pointnet}
dataset=${2:-modelnet10}
shift $(( $# > 2 ? 2 : $# ))
python -m interpret_quality_tpu.cli.gen_pair           --model=$model --dataset=$dataset "$@"
python -m interpret_quality_tpu.cli.interaction_logits --model=$model --dataset=$dataset "$@"
python -m interpret_quality_tpu.cli.cal_interactions   --model=$model --dataset=$dataset "$@"
