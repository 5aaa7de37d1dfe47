#!/bin/bash
# Tables-only results suite: exactly the artifacts the cross-model
# comparison (scripts/make_compare_md.py) reads — sensitivity/correlation
# need the three pose enums, the smoothness sensitivity columns need the
# smoothness enumeration, spatial smoothness reads the trans/rotate trees.
# Skips the interaction stages (gen_pair/logits/scores/plots), which only
# feed the per-family figure curves, not Tables 2-4.
#
# Usage: scripts/r2_tables_suite.sh [model] [extra flags...]
set -e
cd "$(dirname "$0")/.."
MODEL=${1:-pointnet}
shift || true
FLAGS=("$@")

run() { echo "==== $* ===="; python -u -m "interpret_quality_tpu.cli.$@"; }

run save_fps --model "$MODEL" "${FLAGS[@]}"
run shapley_value --model "$MODEL" "${FLAGS[@]}" --resume
for MODE in trans rotate scale; do
  run enum --model "$MODEL" --mode "$MODE" "${FLAGS[@]}" --resume
done
run smoothness_enum --model "$MODEL" "${FLAGS[@]}"
for RMODE in sensitivity correlation smoothness; do
  run result --model "$MODEL" --result_mode "$RMODE" "${FLAGS[@]}"
done
echo "==== tables suite complete ===="
