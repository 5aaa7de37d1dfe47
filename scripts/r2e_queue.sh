#!/bin/bash
# Round-2 (session e) chip-work queue: the r2d tail that never ran in the
# previous container.  The kNN A/B is already measured and recorded in
# docs/PERF.md §3, so only the two missing RESULTS families remain:
#
#   1. pointconv: train -> full results suite -> append to RESULTS.md
#   2. gcnn: train only (prerequisite checkpoint for the BIM fine-tune)
#   3. gcnn_adv: BIM fine-tune from gcnn -> suite -> append to RESULTS.md
#
# Logs to /tmp; commits only generated RESULTS.md appends (same contract as
# scripts/r2d_queue.sh).
cd "$(dirname "$0")/.." || exit 1
SAMPLES=0,3,6
LABEL="TPU v5e-1 (axon), synthetic ModelNet-like set, trained ckpt"

append_and_commit() {  # $1 = model
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
    echo "[r2e] $M suite attempt $try failed; probing tunnel before retry"
    bash scripts/tpu_probe.sh
  done
  return 1
}

train_retry() {  # $1 = model
  local M=$1
  python -u -m interpret_quality_tpu.cli.train --model "$M" --synthetic \
    --epochs 15 --best_acc_gate 0 > "/tmp/${M}_train.log" 2>&1 \
  || { echo "[r2e] $M train attempt 1 failed; probing tunnel"; \
       bash scripts/tpu_probe.sh; \
       python -u -m interpret_quality_tpu.cli.train --model "$M" --synthetic \
         --epochs 15 --best_acc_gate 0 >> "/tmp/${M}_train.log" 2>&1; }
}

echo "[r2e] ==== pointconv ===="
CK=checkpoints/exp_MODEL_pointconv_DATA_modelnet10_POINTNUM_1024_clean/models/model_best.msgpack
[ -f "$CK" ] || train_retry pointconv || { echo "[r2e] pointconv train FAILED"; }
if [ -f "$CK" ]; then
  run_suite_retry pointconv --synthetic --samples "$SAMPLES" \
    && append_and_commit pointconv \
    || echo "[r2e] pointconv suite FAILED"
fi

echo "[r2e] ==== gcnn (checkpoint only) ===="
GCKPT=checkpoints/exp_MODEL_gcnn_DATA_modelnet10_POINTNUM_1024_clean/models/model_best.msgpack
[ -f "$GCKPT" ] || train_retry gcnn || echo "[r2e] gcnn train FAILED"

echo "[r2e] ==== gcnn_adv ===="
ACKPT=checkpoints/exp_MODEL_gcnn_adv_DATA_modelnet10_POINTNUM_1024_clean_with_all_rot_da/models/model_best.msgpack
if [ -f "$GCKPT" ]; then
  { [ -f "$ACKPT" ] \
    || python -u -m interpret_quality_tpu.cli.train_adv --synthetic --epochs 8 \
         --best_acc_gate 0 --resume_path "$GCKPT" > /tmp/gcnn_adv_train.log 2>&1 \
    || { echo "[r2e] gcnn_adv train attempt 1 failed; probing tunnel"; \
         bash scripts/tpu_probe.sh; \
         python -u -m interpret_quality_tpu.cli.train_adv --synthetic --epochs 8 \
           --best_acc_gate 0 --resume_path "$GCKPT" >> /tmp/gcnn_adv_train.log 2>&1; }; } \
    && run_suite_retry gcnn_adv --synthetic --samples "$SAMPLES" \
         --model_path "$ACKPT" \
    && append_and_commit gcnn_adv \
    || echo "[r2e] gcnn_adv FAILED"
fi
echo "[r2e] ALL DONE"
