#!/bin/bash
# Interaction plot suite (reference scripts/plot_inter.sh).
set -e
for dataset in modelnet10 shapenet; do
  for model in pointnet pointnet2 pointconv dgcnn gcnn gcnn_adv; do
    python -m interpret_quality_tpu.cli.plot_interaction \
      --plot_mode=single_region_vs_normal_avg --mode=rotate \
      --dataset=$dataset --model=$model "$@"
  done
done
python -m interpret_quality_tpu.cli.plot_interaction --plot_mode=all
