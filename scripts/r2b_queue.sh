#!/bin/bash
# Round-2 chip-work queue, take 2: the host rebooted mid-round and wiped the
# (gitignored) checkpoints plus the in-flight queue, so this rebuilds the
# remaining chip work from scratch, serialized so one process owns the TPU:
#   1. pointconv: train (synthetic, 15 ep) -> full results suite -> RESULTS.md
#   2. gcnn: retrain only (its suite already landed in RESULTS.md) — needed
#      as the BIM fine-tune base for gcnn_adv
#   3. gcnn_adv: BIM fine-tune from the gcnn ckpt -> suite -> RESULTS.md
#   4. kNN selection A/B: two_pass (incumbent) vs packed (new variant)
#   5. full-model headline bench refresh (logged; committed interactively)
#
# Usage: scripts/r2b_queue.sh
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

# Tunnel wedges self-recover in ~30 min; every stage takes --resume, so on
# failure block on a fresh-compile probe and rerun (completed work skips).
run_suite_retry() {  # $1 = model, rest = suite flags
  local M=$1; shift
  local try
  for try in 1 2 3; do
    if bash scripts/run_results_suite.sh "$M" "$@" >> "/tmp/tpu_suite_${M}.log" 2>&1; then
      return 0
    fi
    echo "[r2b] $M suite attempt $try failed; probing tunnel before retry"
    bash scripts/tpu_probe.sh
  done
  return 1
}

train_retry() {  # $1 = model
  local M=$1
  local CK="checkpoints/exp_MODEL_${M}_DATA_modelnet10_POINTNUM_1024_clean/models/model_best.msgpack"
  [ -f "$CK" ] && return 0
  python -u -m interpret_quality_tpu.cli.train --model "$M" --synthetic \
    --epochs 15 --best_acc_gate 0 > "/tmp/${M}_train.log" 2>&1 && return 0
  echo "[r2b] $M train attempt 1 failed; probing tunnel"
  bash scripts/tpu_probe.sh
  python -u -m interpret_quality_tpu.cli.train --model "$M" --synthetic \
    --epochs 15 --best_acc_gate 0 >> "/tmp/${M}_train.log" 2>&1
}

echo "[r2b] ==== pointconv ===="
if train_retry pointconv; then
  run_suite_retry pointconv --synthetic --samples "$SAMPLES" \
    && append_and_commit pointconv \
    || echo "[r2b] pointconv suite FAILED"
else
  echo "[r2b] pointconv train FAILED"
fi

echo "[r2b] ==== gcnn (retrain for adv base) ===="
train_retry gcnn || echo "[r2b] gcnn train FAILED"

GCKPT=checkpoints/exp_MODEL_gcnn_DATA_modelnet10_POINTNUM_1024_clean/models/model_best.msgpack
ACKPT=checkpoints/exp_MODEL_gcnn_adv_DATA_modelnet10_POINTNUM_1024_clean_with_all_rot_da/models/model_best.msgpack
if [ -f "$GCKPT" ]; then
  echo "[r2b] ==== gcnn_adv ===="
  { [ -f "$ACKPT" ] \
    || python -u -m interpret_quality_tpu.cli.train_adv --synthetic --epochs 8 \
         --best_acc_gate 0 --resume_path "$GCKPT" > /tmp/gcnn_adv_train.log 2>&1 \
    || { echo "[r2b] gcnn_adv train attempt 1 failed; probing tunnel"; \
         bash scripts/tpu_probe.sh; \
         python -u -m interpret_quality_tpu.cli.train_adv --synthetic --epochs 8 \
           --best_acc_gate 0 --resume_path "$GCKPT" >> /tmp/gcnn_adv_train.log 2>&1; }; } \
    && run_suite_retry gcnn_adv --synthetic --samples "$SAMPLES" \
         --model_path "$ACKPT" \
    && append_and_commit gcnn_adv \
    || echo "[r2b] gcnn_adv FAILED"
fi

echo "[r2b] ==== kNN selection A/B: two_pass vs packed ===="
bash scripts/knn_select_ab.sh /tmp/knn_ab_packed.log two_pass packed

echo "[r2b] ==== full-model headline bench ===="
timeout 2400 python bench.py > /tmp/bench_r02.log 2>&1 \
  || echo "[r2b] bench FAILED"
echo "[r2b] ALL DONE"
