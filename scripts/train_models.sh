#!/bin/bash
# Train all 14 model x dataset configs (reference scripts/train_models.sh).
set -e
for dataset in modelnet10 shapenet; do
  for model in pointnet pointnet2 pointconv dgcnn gcnn; do
    python -m interpret_quality_tpu.cli.train --model=$model --dataset=$dataset "$@"
  done
  # adv-GCNN: rot-augmented GCNN first, then BIM adversarial fine-tuning
  python -m interpret_quality_tpu.cli.train --model=gcnn --dataset=$dataset --train_rot_all_perturbation "$@"
  python -m interpret_quality_tpu.cli.train_adv --dataset=$dataset --train_rot_all_perturbation \
    --resume_path=checkpoints/exp_MODEL_gcnn_DATA_${dataset}_POINTNUM_1024_clean_with_all_rot_da/models/model_99.msgpack "$@"
done
