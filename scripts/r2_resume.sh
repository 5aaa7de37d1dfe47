#!/bin/bash
# Round-2 resume queue (post machine reset: /tmp and checkpoints/ wiped).
# RESULTS.md already holds pointnet(syn+shapenet), dgcnn, gcnn, pointnet2 —
# this queue finishes the planned families:
#   1. pointconv  : train -> full suite -> append to RESULTS.md
#   2. gcnn       : train only (base checkpoint for the adv fine-tune;
#                   its suite is already recorded)
#   3. gcnn_adv   : BIM fine-tune -> full suite -> append
#   4. dgcnn/shapenet : train + suite on the ShapeNet fixture tree
# Serialized: one process owns the TPU.  Every stage takes --resume, so a
# tunnel wedge costs a probe + rerun, not lost work (see r2_chaser.sh).
cd "$(dirname "$0")/.."
SAMPLES=0,3,6
LABEL="TPU v5e-1 (axon), synthetic ModelNet-like set, trained ckpt"

append_and_commit() {  # $1 = model   (synthetic ModelNet-like runs only;
                       #  the ShapeNet leg appends inside r2_shapenet.sh)
  python scripts/make_results_md.py --model "$1" --synthetic \
    --samples "$SAMPLES" --label "$LABEL" --append --out RESULTS.md \
    && git add RESULTS.md \
    && git commit -m "RESULTS.md: production-scale $1 suite on TPU

No-Verification-Needed: generated results/doc-only append" || true
}

run_suite_retry() {  # $1 = model, rest = suite flags
  local M=$1; shift
  local try
  for try in 1 2 3; do
    if bash scripts/run_results_suite.sh "$M" "$@" >> "/tmp/tpu_suite_${M}.log" 2>&1; then
      return 0
    fi
    echo "[resume] $M suite attempt $try failed; probing tunnel before retry"
    bash scripts/tpu_probe.sh
  done
  return 1
}

train_retry() {  # $1 = model, rest = extra train flags
  local M=$1; shift
  python -u -m interpret_quality_tpu.cli.train --model "$M" --synthetic \
    --epochs 15 --best_acc_gate 0 "$@" > "/tmp/${M}_train.log" 2>&1 \
  || { echo "[resume] $M train attempt 1 failed; probing tunnel"; \
       bash scripts/tpu_probe.sh; \
       python -u -m interpret_quality_tpu.cli.train --model "$M" --synthetic \
         --epochs 15 --best_acc_gate 0 "$@" >> "/tmp/${M}_train.log" 2>&1; }
}

# 1) pointconv: train + suite + append
echo "[resume] ==== pointconv ===="
CK=checkpoints/exp_MODEL_pointconv_DATA_modelnet10_POINTNUM_1024_clean/models/model_best.msgpack
[ -f "$CK" ] || train_retry pointconv || echo "[resume] pointconv train FAILED"
if [ -f "$CK" ]; then
  run_suite_retry pointconv --synthetic --samples "$SAMPLES" \
    && append_and_commit pointconv \
    || echo "[resume] pointconv suite FAILED"
fi

# 2) gcnn: train only (adv base)
echo "[resume] ==== gcnn (base for adv) ===="
GCKPT=checkpoints/exp_MODEL_gcnn_DATA_modelnet10_POINTNUM_1024_clean/models/model_best.msgpack
[ -f "$GCKPT" ] || train_retry gcnn || echo "[resume] gcnn train FAILED"

# 3) gcnn_adv: BIM fine-tune + suite + append
ACKPT=checkpoints/exp_MODEL_gcnn_adv_DATA_modelnet10_POINTNUM_1024_clean_with_all_rot_da/models/model_best.msgpack
if [ -f "$GCKPT" ]; then
  echo "[resume] ==== gcnn_adv ===="
  { [ -f "$ACKPT" ] \
    || python -u -m interpret_quality_tpu.cli.train_adv --synthetic --epochs 8 \
         --best_acc_gate 0 --resume_path "$GCKPT" > /tmp/gcnn_adv_train.log 2>&1 \
    || { echo "[resume] gcnn_adv train attempt 1 failed; probing tunnel"; \
         bash scripts/tpu_probe.sh; \
         python -u -m interpret_quality_tpu.cli.train_adv --synthetic --epochs 8 \
           --best_acc_gate 0 --resume_path "$GCKPT" >> /tmp/gcnn_adv_train.log 2>&1; }; } \
    && run_suite_retry gcnn_adv --synthetic --samples "$SAMPLES" \
         --model_path "$ACKPT" \
    && append_and_commit gcnn_adv
fi

# 4) dgcnn on the ShapeNet fixture tree (RESULTS.md has only pointnet/shapenet)
echo "[resume] ==== dgcnn / shapenet ===="
MODELS=dgcnn bash scripts/r2_shapenet.sh
echo "[resume] ALL DONE"
