#!/bin/bash
# Round-2 (session g) post-queue tail, figures-only cut: this host's
# tunnel dispatch latency makes another full ShapeNet suite unaffordable
# in the remaining wall-clock, so:
#   1. single-region interaction aggregates for every family whose artifact
#      tree exists on this host (CPU post-processing of suite artifacts)
#   2. the composite Figure-5 PDF across all families/datasets with
#      artifacts on this host
#   3. commit refreshed figures
#
# Usage: scripts/r2g_tail.sh [WAIT_PID]
cd "$(dirname "$0")/.." || exit 1
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "[r2g] waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

echo "[r2g] ==== interaction aggregates (single-region + normal/adv) ===="
plot_family() {  # $1 model, rest = extra flags
  local M=$1; shift
  python -u -m interpret_quality_tpu.cli.plot_interaction --model "$M" \
    --plot_mode single_region_vs_normal_avg "$@" \
    >> /tmp/r2g_plots.log 2>&1 \
    || echo "[r2g] aggregates for $M $* FAILED (artifacts incomplete?)"
}
SAMPLES=0,3,6
for M in pointnet pointnet2 pointconv dgcnn gcnn gcnn_adv; do
  plot_family "$M" --synthetic --samples "$SAMPLES"
done
echo "[r2g] ==== composite figure ===="
python -u -m interpret_quality_tpu.cli.plot_interaction --plot_mode all \
  >> /tmp/r2g_plots.log 2>&1 || echo "[r2g] composite FAILED"

git add figures figures_show 2>/dev/null
git diff --cached --quiet || git commit -m "figures: interaction curves + composite across all completed families

No-Verification-Needed: generated figure artifacts only"
echo "[r2g] ALL DONE"
