#!/bin/bash
# Plan on/off sustained enum-stage A/B (round-3 verdict items 3+4): the
# pose-invariant graph plan (models/plans.py) vs per-pose recomputation,
# measured at the STAGE level (run_enum with artifact writes) — the number
# that sets table wall-clock.  48 poses, one cloud, warm second run timed.
# Usage: scripts/r4_ab_plan.sh [out_log]
cd "$(dirname "$0")/.." || exit 1
OUT=${1:-/tmp/r4_ab_plan.log}
: > "$OUT"

run() { echo "== $* ==" >> "$OUT"; env "$@" >> "$OUT" 2>&1 \
        || echo "FAILED $*" >> "$OUT"; }

for P in 1 0; do
  for M in gcnn dgcnn pointnet2 pointconv; do
    run IQTPU_ENUM_PLAN=$P timeout 2400 python bench.py --stage enum \
        --model "$M" --max_poses 48
  done
done

run IQTPU_KNN_SELECT=succ timeout 1500 python bench.py --model dgcnn --steps 8

echo "== plan ab complete ==" >> "$OUT"
