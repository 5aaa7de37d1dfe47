#!/bin/bash
# Round-2 chip-work queue: wait for the in-flight dgcnn suite, then train +
# run the full results suite for the remaining model families, appending each
# to RESULTS.md as it lands.  Serialized so only one process owns the TPU.
#
# Usage: scripts/r2_chaser.sh [WAIT_PID]
cd "$(dirname "$0")/.."
WAIT_PID=${1:-}
SAMPLES=0,3,6
LABEL="TPU v5e-1 (axon), synthetic ModelNet-like set, trained ckpt"

if [ -n "$WAIT_PID" ]; then
  echo "[chaser] waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

append_and_commit() {  # $1 = model
  python scripts/make_results_md.py --model "$1" --synthetic \
    --samples "$SAMPLES" --label "$LABEL" --append --out RESULTS.md \
    && git add RESULTS.md \
    && git commit -m "RESULTS.md: production-scale $1 suite on TPU

No-Verification-Needed: generated results/doc-only append" || true
}

# Tunnel wedges mid-suite are a known failure mode (they self-recover in
# ~30 min).  Every restartable stage takes --resume, so the cheapest fix is:
# on failure, block on a fresh-compile probe, then rerun the whole suite —
# completed per-sample work is skipped.  Bounded at 3 attempts so a real
# (non-tunnel) bug cannot spin forever.
run_suite_retry() {  # $1 = model, rest = suite flags
  local M=$1; shift
  local try
  for try in 1 2 3; do
    if bash scripts/run_results_suite.sh "$M" "$@" >> "/tmp/tpu_suite_${M}.log" 2>&1; then
      return 0
    fi
    echo "[chaser] $M suite attempt $try failed; probing tunnel before retry"
    bash scripts/tpu_probe.sh
  done
  return 1
}

# 1) collect whatever suite the waited-on pid was running (pass model as $2).
if [ -n "$2" ]; then append_and_commit "$2"; fi

# 2) remaining normally-trained families (MODELS env var overrides)
for M in ${MODELS:-pointnet2 pointconv}; do
  echo "[chaser] ==== $M ===="
  CK="checkpoints/exp_MODEL_${M}_DATA_modelnet10_POINTNUM_1024_clean/models/model_best.msgpack"
  if [ ! -f "$CK" ]; then
    python -u -m interpret_quality_tpu.cli.train --model "$M" --synthetic \
      --epochs 15 --best_acc_gate 0 > "/tmp/${M}_train.log" 2>&1 \
    || { echo "[chaser] $M train attempt 1 failed; probing tunnel"; \
         bash scripts/tpu_probe.sh; \
         python -u -m interpret_quality_tpu.cli.train --model "$M" --synthetic \
           --epochs 15 --best_acc_gate 0 >> "/tmp/${M}_train.log" 2>&1; } \
    || { echo "[chaser] $M train FAILED"; continue; }
  fi
  run_suite_retry "$M" --synthetic --samples "$SAMPLES" \
    || { echo "[chaser] $M suite FAILED"; continue; }
  append_and_commit "$M"
done

# 3) adv-GCNN: BIM fine-tune from the gcnn checkpoint, then its suite.
# The default gcnn_adv checkpoint path is model_399 (reference epoch-399
# contract); our short synthetic run saves model_best, so point the suite at it.
GCKPT=checkpoints/exp_MODEL_gcnn_DATA_modelnet10_POINTNUM_1024_clean/models/model_best.msgpack
ACKPT=checkpoints/exp_MODEL_gcnn_adv_DATA_modelnet10_POINTNUM_1024_clean_with_all_rot_da/models/model_best.msgpack
if [ -f "$GCKPT" ]; then
  echo "[chaser] ==== gcnn_adv ===="
  { [ -f "$ACKPT" ] \
    || python -u -m interpret_quality_tpu.cli.train_adv --synthetic --epochs 8 \
         --best_acc_gate 0 --resume_path "$GCKPT" > /tmp/gcnn_adv_train.log 2>&1 \
    || { echo "[chaser] gcnn_adv train attempt 1 failed; probing tunnel"; \
         bash scripts/tpu_probe.sh; \
         python -u -m interpret_quality_tpu.cli.train_adv --synthetic --epochs 8 \
           --best_acc_gate 0 --resume_path "$GCKPT" >> /tmp/gcnn_adv_train.log 2>&1; }; } \
    && run_suite_retry gcnn_adv --synthetic --samples "$SAMPLES" \
         --model_path "$ACKPT" \
    && append_and_commit gcnn_adv
fi
echo "[chaser] ALL DONE"
