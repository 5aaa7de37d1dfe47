#!/bin/bash
# Round-2 ShapeNet chip queue: run the full results suite on the ShapeNet
# data path (fixture tree from scripts/make_shapenet_fixture.py under
# ./data) so RESULTS.md covers both datasets the reference publishes
# (reference scripts/train_models.sh:12-22, final_result.py --dataset).
# Exercises the native .pts parser + centre/unit-sphere + FPS resample
# loaders end-to-end at production scale.
#
# Usage: scripts/r2_shapenet.sh [WAIT_PID]
cd "$(dirname "$0")/.."
WAIT_PID=${1:-}
SAMPLES=0,3,6
LABEL="TPU v5e-1 (axon), ShapeNet fixture tree (synthetic .pts), trained ckpt"

if [ -n "$WAIT_PID" ]; then
  echo "[shapenet] waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

[ -d data/shapenetcore_partanno_segmentation_benchmark_v0 ] \
  || JAX_PLATFORMS=cpu python scripts/make_shapenet_fixture.py --data_root ./data

run_suite_retry() {  # $1 = model, rest = suite flags
  local M=$1; shift
  local try
  for try in 1 2 3; do
    if bash scripts/run_results_suite.sh "$M" "$@" \
        >> "/tmp/tpu_suite_${M}_shapenet.log" 2>&1; then
      return 0
    fi
    echo "[shapenet] $M suite attempt $try failed; probing tunnel before retry"
    bash scripts/tpu_probe.sh
  done
  return 1
}

for M in ${MODELS:-pointnet dgcnn}; do
  echo "[shapenet] ==== $M ===="
  CK="checkpoints/exp_MODEL_${M}_DATA_shapenet_POINTNUM_1024_clean/models/model_best.msgpack"
  if [ ! -f "$CK" ]; then
    python -u -m interpret_quality_tpu.cli.train --model "$M" --dataset shapenet \
      --epochs 15 --best_acc_gate 0 > "/tmp/${M}_shapenet_train.log" 2>&1 \
    || { echo "[shapenet] $M train attempt 1 failed; probing tunnel"; \
         bash scripts/tpu_probe.sh; \
         python -u -m interpret_quality_tpu.cli.train --model "$M" --dataset shapenet \
           --epochs 15 --best_acc_gate 0 >> "/tmp/${M}_shapenet_train.log" 2>&1; } \
    || { echo "[shapenet] $M train FAILED"; continue; }
  fi
  run_suite_retry "$M" --dataset shapenet --samples "$SAMPLES" \
    || { echo "[shapenet] $M suite FAILED"; continue; }
  python scripts/make_results_md.py --model "$M" --dataset shapenet \
    --samples "$SAMPLES" --label "$LABEL" --append --out RESULTS.md \
    && git add RESULTS.md \
    && git commit -m "RESULTS.md: production-scale $M suite on the ShapeNet data path

No-Verification-Needed: generated results/doc-only append" || true
done
echo "[shapenet] ALL DONE"
