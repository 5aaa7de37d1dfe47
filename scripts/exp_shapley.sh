#!/bin/bash
# Full Shapley suite for one model/dataset (reference scripts/exp_shapley.sh).
set -e
model=${1:-pointnet}
dataset=${2:-modelnet10}
shift $(( $# > 2 ? 2 : $# ))
python -m interpret_quality_tpu.cli.save_fps --dataset=$dataset "$@"
python -m interpret_quality_tpu.cli.shapley_value --model=$model --dataset=$dataset "$@"
python -m interpret_quality_tpu.cli.enum --mode=trans  --model=$model --dataset=$dataset "$@"
python -m interpret_quality_tpu.cli.enum --mode=rotate --model=$model --dataset=$dataset "$@"
python -m interpret_quality_tpu.cli.enum --mode=scale  --model=$model --dataset=$dataset "$@"
python -m interpret_quality_tpu.cli.smoothness_enum    --model=$model --dataset=$dataset "$@"
