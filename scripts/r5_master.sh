#!/bin/bash
# Round-5 master queue with STALL WATCHDOG.  The axon tunnel wedged twice
# tonight (23:13 mid-rotate, 00:09 at CLI startup): a wedged client idles at
# ~0.5% CPU forever and the plain queue can't notice.  Every chip stage here
# runs under run_wd: if the stage's stdout log stops growing for STALE_SEC,
# the stage tree is killed (pid descent, no pattern kills), the tunnel is
# re-probed (tpu_probe blocks until a fresh compile succeeds), and the stage
# restarts — all stages resume, so a restart repeats at most one sample.
cd "$(dirname "$0")/.." || exit 1
PHASE=${1:-all}
LABEL30="TPU v5e-1 (axon), hardened synthetic set (morph<=0.45), trained ckpt"
STALE_SEC=${STALE_SEC:-480}

log() { echo "[r5m $(date +%H:%M:%S)] $*"; }

kill_tree() {  # $1 = root pid
  local all="" frontier="$1" next p
  while [ -n "$(echo $frontier | tr -d ' ')" ]; do
    next=""
    for p in $frontier; do
      next="$next $(ps -o pid= --ppid "$p" 2>/dev/null | tr '\n' ' ')"
    done
    all="$all $frontier"
    frontier="$next"
  done
  kill $all 2>/dev/null
  sleep 2
  kill -9 $all 2>/dev/null
}

run_wd() {  # $1 = logfile; rest = command.  Restarts on stall; returns cmd rc.
  local logf=$1; shift
  local attempt rc size0 size1 idle
  for attempt in 1 2 3 4 5; do
    "$@" >> "$logf" 2>&1 &
    local pid=$! stalled=0
    idle=0
    while kill -0 "$pid" 2>/dev/null; do
      size0=$(stat -c %s "$logf" 2>/dev/null || echo 0)
      sleep 30
      size1=$(stat -c %s "$logf" 2>/dev/null || echo 0)
      if [ "$size1" -eq "$size0" ]; then
        idle=$((idle + 30))
      else
        idle=0
      fi
      if [ "$idle" -ge "$STALE_SEC" ]; then
        log "STALL (${idle}s no output) in: $* — killing + reprobing (attempt $attempt)"
        stalled=1
        kill_tree "$pid"
        bash scripts/tpu_probe.sh
        break
      fi
    done
    if [ "$stalled" -eq 1 ]; then
      continue            # tunnel reprobed; retry the stage (it resumes)
    fi
    wait "$pid"; rc=$?
    [ "$rc" -eq 0 ] && return 0
    log "stage exited rc=$rc: $* (attempt $attempt); reprobing"
    bash scripts/tpu_probe.sh
  done
  return 1
}

commit_evidence() {  # $1 = model, $2 = synthetic|shapenet, $3 = note
  local M=$1 DS=$2
  if [ "$DS" = synthetic ]; then
    python scripts/collect_evidence.py --model "$M" --synthetic \
      --label "$LABEL30" >/dev/null 2>&1 || return 0
  else
    python scripts/collect_evidence.py --model "$M" --dataset "$DS" \
      --label "TPU v5e-1 (axon), ShapeNet fixture tree, trained ckpt" \
      >/dev/null 2>&1 || return 0
  fi
  git add results/ >/dev/null 2>&1
  git diff --cached --quiet || git commit -q -m "evidence: $M/$DS ${3:-refresh} (committed results JSON)

No-Verification-Needed: generated results-evidence JSON only"
}

append_family() {
  python - <<PYEOF
import re
md = open("RESULTS.md").read()
parts = re.split(r"\n\n---\n\n", md)
kept = [p for p in parts
        if not p.startswith("# RESULTS — end-to-end run: $1 / synthetic")]
open("RESULTS.md", "w").write("\n\n---\n\n".join(kept))
PYEOF
  python scripts/make_results_md.py --model "$1" --synthetic \
    --label "$LABEL30" --append --out RESULTS.md \
    && git add RESULTS.md \
    && git commit -q -m "RESULTS.md: $1 30-sample suite on TPU (synthetic set)

No-Verification-Needed: generated results/doc-only append" || true
}

refresh_compare() {
  python - <<'PYEOF'
import re
md = open("RESULTS.md").read()
parts = re.split(r"\n\n---\n\n", md)
kept = [p for p in parts if not p.startswith("# Cross-model comparison")]
open("RESULTS.md", "w").write("\n\n---\n\n".join(kept))
PYEOF
  python scripts/make_compare_md.py --synthetic \
    --models pointnet,pointnet2,pointconv,dgcnn,gcnn,gcnn_adv \
    --label "$LABEL30; 30 samples; families with a complete artifact tree" \
    --out RESULTS.md \
    && git add RESULTS.md \
    && git commit -q -m "RESULTS.md: cross-model comparison refresh (30-sample trees)

No-Verification-Needed: generated results/doc-only append" || true
}

CLI="python -u -m interpret_quality_tpu.cli"

# ---------------------------------------------------------------- dgcnn
if [ "$PHASE" = all ] || [ "$PHASE" = dgcnn ]; then
  log "==== dgcnn: rotate resume + scale + smoothness + tables ===="
  run_wd /tmp/r5m_dgcnn.log $CLI.enum --model dgcnn --mode rotate --synthetic --resume \
    && commit_evidence dgcnn synthetic "enum rotate" \
    && run_wd /tmp/r5m_dgcnn.log $CLI.enum --model dgcnn --mode scale --synthetic --resume \
    && commit_evidence dgcnn synthetic "enum scale" \
    && run_wd /tmp/r5m_dgcnn.log $CLI.smoothness_enum --model dgcnn --synthetic --resume \
    && commit_evidence dgcnn synthetic "smoothness" \
    && { for RMODE in sensitivity correlation smoothness; do
           $CLI.result --model dgcnn --result_mode "$RMODE" --synthetic \
             >> /tmp/r5m_dgcnn.log 2>&1 || true
         done
         append_family dgcnn; refresh_compare
         commit_evidence dgcnn synthetic "tables complete"
         log "dgcnn DONE"; } \
    || { log "dgcnn FAILED"; commit_evidence dgcnn synthetic "partial"; }
fi

# ------------------------------------------------- pointnet shapenet inter
if [ "$PHASE" = all ] || [ "$PHASE" = sninter ]; then
  log "==== pointnet ShapeNet interactions ===="
  run_wd /tmp/r5m_sninter.log $CLI.gen_pair --model pointnet --dataset shapenet \
    && run_wd /tmp/r5m_sninter.log $CLI.interaction_logits --model pointnet --dataset shapenet --resume \
    && { $CLI.cal_interactions --model pointnet --dataset shapenet \
           >> /tmp/r5m_sninter.log 2>&1 || true
         $CLI.plot_interaction --model pointnet --dataset shapenet \
           --plot_mode normal_vs_adv >> /tmp/r5m_sninter.log 2>&1 || true
         commit_evidence pointnet shapenet "interactions complete"
         git add -f figures 2>/dev/null
         git diff --cached --quiet || git commit -q -m "figures: pointnet ShapeNet interaction curves

No-Verification-Needed: generated figure artifacts only"
         log "pointnet shapenet interactions DONE"; } \
    || { log "pointnet shapenet interactions FAILED"; \
         commit_evidence pointnet shapenet "partial (interactions failed)"; }
fi

# ---------------------------------------------------------- gcnn inter
if [ "$PHASE" = all ] || [ "$PHASE" = gcnninter ]; then
  NOW_MIN=$((10#$(date +%H) * 60 + 10#$(date +%M)))
  if [ "$NOW_MIN" -lt 140 ] || [ "$NOW_MIN" -gt 300 ]; then
    log "==== gcnn interactions ===="
    run_wd /tmp/r5m_gcnninter.log $CLI.gen_pair --model gcnn --synthetic \
      && run_wd /tmp/r5m_gcnninter.log $CLI.interaction_logits --model gcnn --synthetic --resume \
      && { $CLI.cal_interactions --model gcnn --synthetic \
             >> /tmp/r5m_gcnninter.log 2>&1 || true
           $CLI.plot_interaction --model gcnn --plot_mode normal_vs_adv \
             --synthetic >> /tmp/r5m_gcnninter.log 2>&1 || true
           $CLI.plot_interaction --model gcnn \
             --plot_mode single_region_vs_normal_avg --synthetic \
             >> /tmp/r5m_gcnninter.log 2>&1 || true
           append_family gcnn
           commit_evidence gcnn synthetic "interactions complete"
           git add -f figures 2>/dev/null
           git diff --cached --quiet || git commit -q -m "figures: gcnn interaction curves (30-sample tree)

No-Verification-Needed: generated figure artifacts only"
           log "gcnn interactions DONE"; } \
      || { log "gcnn interactions FAILED"; \
           commit_evidence gcnn synthetic "partial (interactions failed)"; }
  else
    log "gcnn interactions SKIPPED (now=$NOW_MIN min, too close to wrap)"
  fi
fi

# ---------------------------------------------------------- pointconv
if [ "$PHASE" = all ] || [ "$PHASE" = pointconv ]; then
  log "==== pointconv tables (as far as the round allows) ===="
  run_wd /tmp/r5m_pointconv.log $CLI.save_fps --model pointconv --synthetic \
    && run_wd /tmp/r5m_pointconv.log $CLI.shapley_value --model pointconv --synthetic --resume \
    && commit_evidence pointconv synthetic "shapley init" \
    && for MODE in trans rotate scale; do
         run_wd /tmp/r5m_pointconv.log $CLI.enum --model pointconv --mode "$MODE" --synthetic --resume \
           || break
         commit_evidence pointconv synthetic "enum $MODE"
       done
  run_wd /tmp/r5m_pointconv.log $CLI.smoothness_enum --model pointconv --synthetic --resume \
    && commit_evidence pointconv synthetic "smoothness" \
    && { for RMODE in sensitivity correlation smoothness; do
           $CLI.result --model pointconv --result_mode "$RMODE" --synthetic \
             >> /tmp/r5m_pointconv.log 2>&1 || true
         done
         append_family pointconv; refresh_compare
         commit_evidence pointconv synthetic "tables complete"
         log "pointconv DONE"; }
fi
log "MASTER DONE"
