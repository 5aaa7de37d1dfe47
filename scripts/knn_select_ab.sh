#!/bin/bash
# A/B the Pallas kNN selection sweep (IQTPU_KNN_SELECT=two_pass|argmin|
# packed) on the real chip, at the full-engine level, for the three model
# families whose forwards go through the kNN kernels (dgcnn/gcnn:
# knn_gather_extrema; pointconv: knn_with_density).  The knob is read at
# trace time, so each variant runs in a fresh process.
#
# Usage: scripts/knn_select_ab.sh [out_log] [variants...]
#   (default /tmp/knn_ab.log, all three variants)
cd "$(dirname "$0")/.." || exit 1
OUT=${1:-/tmp/knn_ab.log}
shift || true
VARIANTS=${*:-two_pass argmin packed}
: > "$OUT"
for V in $VARIANTS; do
  for M in dgcnn gcnn pointconv; do
    echo "== select=$V model=$M ==" >> "$OUT"
    IQTPU_KNN_SELECT=$V timeout 900 python bench.py --model "$M" --steps 8 \
      >> "$OUT" 2>&1 || echo "FAILED select=$V model=$M" >> "$OUT"
  done
done
echo "== ab complete ==" >> "$OUT"
grep -h '"model"' "$OUT"
