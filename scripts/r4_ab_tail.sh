#!/bin/bash
# Trimmed completion of the round-3 perf A/B (scripts/r3_perf_ab.sh):
# the variant sweep already ran (packed/bf16/succ/hier results in the first
# harness log); this finishes the remaining cells without re-burning chip
# time on the known-catastrophic hier variant:
#   * distance-tile layout nq (qn == the packed part-1 numbers);
#   * plan on/off sustained enum-stage A/B (verdict items 3+4);
#   * one succ/dgcnn repro to capture its failure mode.
# Usage: scripts/r4_ab_tail.sh [out_log]
cd "$(dirname "$0")/.." || exit 1
OUT=${1:-/tmp/r4_ab_tail.log}
: > "$OUT"

run() { echo "== $* ==" >> "$OUT"; env "$@" >> "$OUT" 2>&1 \
        || echo "FAILED $*" >> "$OUT"; }

for M in dgcnn gcnn; do
  run IQTPU_KNN_LAYOUT=nq timeout 1500 python bench.py --model "$M" --steps 8
done

for P in 1 0; do
  for M in dgcnn gcnn pointnet2 pointconv; do
    run IQTPU_ENUM_PLAN=$P timeout 2400 python bench.py --stage enum \
        --model "$M" --max_poses 48
  done
done

run IQTPU_KNN_SELECT=succ timeout 1500 python bench.py --model dgcnn --steps 8

echo "== ab tail complete ==" >> "$OUT"
