#!/bin/bash
# Round-3 perf experiments on the real chip (run when the chip is free —
# one process owns the TPU).  Three A/Bs the round-2 verdict asked to
# MEASURE rather than argue:
#   1. selection-sweep variants at the engine level: packed (default) vs
#      bf16 distance tile vs succ (read-only successor sweep) vs hier
#      (block-hierarchical min) — IQTPU_KNN_SELECT, fresh process each
#      (the knob is read at trace time);
#   2. distance-tile layout: qn (default) vs nq (database on sublanes,
#      min combines whole vregs) — IQTPU_KNN_LAYOUT, packed+succ only;
#   3. pose-invariant plan path at the stage level: IQTPU_ENUM_PLAN=1 vs 0
#      on the sustained enum rate (the number that sets table wall-clock).
# Results land in docs/PERF.md §3.
#
# Usage: scripts/r3_perf_ab.sh [out_log]
cd "$(dirname "$0")/.." || exit 1
OUT=${1:-/tmp/r3_ab.log}
: > "$OUT"

run() { echo "== $* ==" >> "$OUT"; env "$@" >> "$OUT" 2>&1 \
        || echo "FAILED $*" >> "$OUT"; }

# --- 1. sweep variants, engine level (dgcnn re-selects 4x/forward:
#        most sensitive; gcnn/pointconv select once)
for V in packed bf16 succ hier; do
  for M in dgcnn gcnn pointconv; do
    run IQTPU_KNN_SELECT=$V timeout 1500 python bench.py --model "$M" --steps 8
  done
done

# --- 2. layout, engine level
for L in qn nq; do
  for M in dgcnn gcnn; do
    run IQTPU_KNN_LAYOUT=$L timeout 1500 python bench.py --model "$M" --steps 8
  done
done

# --- 3. plan vs per-pose recompute, sustained stage level
for P in 1 0; do
  for M in dgcnn gcnn pointnet2 pointconv; do
    run IQTPU_ENUM_PLAN=$P timeout 2400 python bench.py --stage enum \
        --model "$M" --max_poses 48
  done
done

echo "== ab complete ==" >> "$OUT"
grep -h '"model"' "$OUT"
