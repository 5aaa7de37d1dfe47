#!/bin/bash
# Round-2 chip-work queue, take 4: rebuild ONLY the artifacts the
# six-family cross-model comparison reads (enums + smoothness — no
# interaction stages; their per-family figures/curves are already
# committed from earlier hosts) for pointnet, dgcnn, gcnn, pointnet2,
# then regenerate the comparison in RESULTS.md.  pointconv + gcnn_adv
# trees come from r2e_queue.sh (full suites).
#
# Run AFTER r2e_queue.sh finishes (one process owns the TPU).
# Usage: scripts/r2c_compare.sh
cd "$(dirname "$0")/.." || exit 1
SAMPLES=0,3,6
LABEL="TPU v5e-1 (axon), synthetic set, trained ckpts; samples 0,3,6; one row per family with a rebuilt artifact tree on this host"

train_retry() {  # $1 = model
  local M=$1
  local CK="checkpoints/exp_MODEL_${M}_DATA_modelnet10_POINTNUM_1024_clean/models/model_best.msgpack"
  [ -f "$CK" ] && return 0
  python -u -m interpret_quality_tpu.cli.train --model "$M" --synthetic \
    --epochs 15 --best_acc_gate 0 > "/tmp/${M}_train.log" 2>&1 && return 0
  echo "[r2c] $M train attempt 1 failed; probing tunnel"
  bash scripts/tpu_probe.sh
  python -u -m interpret_quality_tpu.cli.train --model "$M" --synthetic \
    --epochs 15 --best_acc_gate 0 >> "/tmp/${M}_train.log" 2>&1
}

run_suite_retry() {  # $1 = model, rest = suite flags
  local M=$1; shift
  local try
  for try in 1 2 3; do
    if bash scripts/r2_tables_suite.sh "$M" "$@" >> "/tmp/tpu_suite_${M}.log" 2>&1; then
      return 0
    fi
    echo "[r2c] $M suite attempt $try failed; probing tunnel before retry"
    bash scripts/tpu_probe.sh
  done
  return 1
}

refresh_compare() {  # regenerate the comparison from whatever trees exist now
  python - <<'PYEOF'
import re
md = open("RESULTS.md").read()
parts = re.split(r"\n\n---\n\n", md)
kept = [p for p in parts if not p.startswith("# Cross-model comparison")]
if len(kept) != len(parts):
    open("RESULTS.md", "w").write("\n\n---\n\n".join(kept))
    print("[r2c] dropped previous comparison section")
PYEOF
  python scripts/make_compare_md.py --synthetic --samples "$SAMPLES" \
    --models pointnet,pointnet2,pointconv,dgcnn,gcnn,gcnn_adv \
    --label "$LABEL" --out RESULTS.md \
    && git add RESULTS.md \
    && git commit -m "RESULTS.md: cross-model comparison refresh (families with artifact trees)

No-Verification-Needed: generated results/doc-only append" \
    || echo "[r2c] compare refresh FAILED"
}

for M in pointnet pointnet2 dgcnn gcnn; do
  echo "[r2c] ==== $M ===="
  if train_retry "$M"; then
    { run_suite_retry "$M" --synthetic --samples "$SAMPLES" \
        && refresh_compare; } \
      || echo "[r2c] $M suite FAILED"
  else
    echo "[r2c] $M train FAILED"
  fi
done

echo "[r2c] ==== final cross-model comparison ===="
refresh_compare
echo "[r2c] ALL DONE"
