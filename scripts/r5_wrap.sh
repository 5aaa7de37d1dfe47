#!/bin/bash
# End-of-round wrap-up (round 5): stop the queue cleanly WITHOUT pattern
# kills (pid-descent from the recorded queue pid only), condense + commit
# whatever the in-flight family produced, regenerate RESULTS.md sections,
# the cross-model table, the measured wall-clock JSON and the composite
# figure, and leave the chip idle for the driver's bench run.
cd "$(dirname "$0")/.." || exit 1
LABEL30="TPU v5e-1 (axon), hardened synthetic set (morph<=0.45), trained ckpt"
log() { echo "[wrap $(date +%H:%M:%S)] $*"; }

if [ -f /tmp/r5_queue.pid ]; then
  QP=$(cat /tmp/r5_queue.pid)
  # collect the queue pid and all descendants by parent-pid walk
  all=""
  frontier="$QP"
  while [ -n "$(echo $frontier | tr -d ' ')" ]; do
    next=""
    for p in $frontier; do
      next="$next $(ps -o pid= --ppid "$p" 2>/dev/null | tr '\n' ' ')"
    done
    all="$all $frontier"
    frontier="$next"
  done
  log "stopping queue tree:$all"
  kill $all 2>/dev/null
  sleep 3
  kill -9 $all 2>/dev/null
fi
sleep 2
log "queue stopped"

for M in pointnet gcnn gcnn_adv dgcnn pointconv pointnet2; do
  python scripts/collect_evidence.py --model "$M" --synthetic \
    --label "$LABEL30" 2>/dev/null || true
done
python scripts/suite_wallclock.py || true
git add results/ 2>/dev/null
git diff --cached --quiet || git commit -q -m "evidence: end-of-round refresh (committed results JSONs + measured wall-clock)

No-Verification-Needed: generated results-evidence JSON only"

# regenerate every family section that has a current 30-sample tree, plus
# the cross-model table (sections for families without trees are skipped by
# the scripts themselves)
python - <<'PYEOF'
import re
md = open("RESULTS.md").read()
parts = re.split(r"\n\n---\n\n", md)
drop = tuple("# RESULTS — end-to-end run: %s / synthetic" % m
             for m in ("gcnn", "gcnn_adv", "dgcnn", "pointconv", "pointnet2"))
kept = [p for p in parts
        if not p.startswith(drop) and not p.startswith("# Cross-model comparison")]
open("RESULTS.md", "w").write("\n\n---\n\n".join(kept))
PYEOF
for M in gcnn gcnn_adv dgcnn pointconv pointnet2; do
  [ -d "checkpoints/exp_MODEL_${M}_DATA_modelnet10_POINTNUM_1024_REGIONNUM_32_shapley_test" ] \
    && python scripts/make_results_md.py --model "$M" --synthetic \
         --label "$LABEL30" --append --out RESULTS.md || true
done
python scripts/make_compare_md.py --synthetic \
  --models pointnet,pointnet2,pointconv,dgcnn,gcnn,gcnn_adv \
  --label "$LABEL30; 30 samples; families with artifact trees this round" \
  --out RESULTS.md || true
git add RESULTS.md
git diff --cached --quiet || git commit -q -m "RESULTS.md: family sections + cross-model refresh (round-5 close)

No-Verification-Needed: generated results/doc-only append"

# composite figure at whatever width the matrix reached
python -u -m interpret_quality_tpu.cli.plot_interaction --plot_mode all \
  > /tmp/r5_figs_wrap.log 2>&1 || log "composite failed"
git add -f figures figures_show 2>/dev/null
git diff --cached --quiet || git commit -q -m "figures: composite interaction figure (round-5 close)

No-Verification-Needed: generated figure artifacts only"
log "wrap done; chip idle"
