#!/bin/bash
# End-of-round wrap-up: stop the queue cleanly, condense + commit whatever
# the current family produced, regenerate its RESULTS.md section and the
# cross-model table, and leave the chip idle for the driver's bench run.
cd "$(dirname "$0")/.." || exit 1
LABEL30="TPU v5e-1 (axon), hardened synthetic set (morph<=0.45), trained ckpt"
log() { echo "[wrap $(date +%H:%M:%S)] $*"; }

if [ -f /tmp/r4_queue.pid ]; then
  kill "$(cat /tmp/r4_queue.pid)" 2>/dev/null
fi
sleep 1
for p in $(ps ax -o pid,cmd | grep -E "interpret_quality_tpu.cli|r4_queue|tpu_probe" \
           | grep -v grep | awk '{print $1}'); do kill "$p" 2>/dev/null; done
sleep 2
log "queue stopped"

for M in gcnn gcnn_adv; do
  python scripts/collect_evidence.py --model "$M" --synthetic \
    --label "$LABEL30" 2>/dev/null || true
done
git add results/ 2>/dev/null
git diff --cached --quiet || git commit -q -m "evidence: end-of-round refresh (committed results JSONs)

No-Verification-Needed: generated results-evidence JSON only"

python - <<'PYEOF'
import re
md = open("RESULTS.md").read()
parts = re.split(r"\n\n---\n\n", md)
kept = [p for p in parts
        if not p.startswith("# RESULTS — end-to-end run: gcnn / synthetic")
        and not p.startswith("# Cross-model comparison")]
open("RESULTS.md", "w").write("\n\n---\n\n".join(kept))
PYEOF
python scripts/make_results_md.py --model gcnn --synthetic \
  --label "$LABEL30" --append --out RESULTS.md || true
python scripts/make_compare_md.py --synthetic \
  --models pointnet,pointnet2,pointconv,dgcnn,gcnn,gcnn_adv \
  --label "$LABEL30; 30 samples; families with artifact trees this round" \
  --out RESULTS.md || true
git add RESULTS.md
git diff --cached --quiet || git commit -q -m "RESULTS.md: gcnn 30-sample section + cross-model refresh (round-4 close)

No-Verification-Needed: generated results/doc-only append"
log "wrap done; chip idle"
