#!/bin/bash
# Round-5 queue, part 2: started when r5_queue.sh finishes dgcnn tables
# (bash must not be edited while running, so the reprioritisation lives in
# a second script).  Revised order vs r5_queue.sh phase C/D: gcnn
# interactions BEFORE pointconv tables — a complete second interaction cell
# (+ its figures + a sustained interaction rate for a slow graph family)
# outranks widening pointconv's inevitable partial row, given ~3h of round
# left at the switch (VERDICT r4 missing #2 vs #1 partial credit).
cd "$(dirname "$0")/.." || exit 1
PHASE=${1:-all}
LABEL30="TPU v5e-1 (axon), hardened synthetic set (morph<=0.45), trained ckpt"

log() { echo "[r5b $(date +%H:%M:%S)] $*"; }

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

run_cli() { python -u -m "interpret_quality_tpu.cli.$@"; }

tables_suite() {
  local M=$1
  log "tables suite $M (30 samples)"
  run_cli save_fps --model "$M" --synthetic || return 1
  run_cli shapley_value --model "$M" --synthetic --resume || return 1
  commit_evidence "$M" synthetic "shapley init"
  for MODE in trans rotate scale; do
    run_cli enum --model "$M" --mode "$MODE" --synthetic --resume || return 1
    commit_evidence "$M" synthetic "enum $MODE"
  done
  run_cli smoothness_enum --model "$M" --synthetic --resume || return 1
  commit_evidence "$M" synthetic "smoothness"
  for RMODE in sensitivity correlation smoothness; do
    run_cli result --model "$M" --result_mode "$RMODE" --synthetic || true
  done
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

No-Verification-Needed: generated results/doc-only append" \
    || log "compare refresh failed"
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

inter_suite() {
  local M=$1; shift
  log "interaction suite $M"
  run_cli gen_pair --model "$M" --synthetic "$@" || return 1
  run_cli interaction_logits --model "$M" --synthetic --resume "$@" || return 1
  run_cli cal_interactions --model "$M" --synthetic "$@" || true
  run_cli plot_interaction --model "$M" --plot_mode normal_vs_adv --synthetic "$@" || true
  run_cli plot_interaction --model "$M" --plot_mode single_region_vs_normal_avg --synthetic "$@" || true
}

do_tables() {
  local M=$1
  tables_suite "$M" > "/tmp/r5_tables_${M}.log" 2>&1 \
    && { log "$M tables done"; append_family "$M"; refresh_compare; \
         commit_evidence "$M" synthetic "tables complete"; } \
    || { log "$M tables FAILED (see /tmp/r5_tables_${M}.log)"; \
         commit_evidence "$M" synthetic "partial (tables failed)"; \
         bash scripts/tpu_probe.sh; return 1; }
}

do_inter() {
  local M=$1
  [ -d "checkpoints/exp_MODEL_${M}_DATA_modelnet10_POINTNUM_1024_REGIONNUM_32_shapley_test" ] || return 1
  inter_suite "$M" > "/tmp/r5_inter_${M}.log" 2>&1 \
    && { log "$M interactions done"; append_family "$M"; \
         commit_evidence "$M" synthetic "interactions complete"; \
         git add -f figures 2>/dev/null; git diff --cached --quiet \
           || git commit -q -m "figures: $M interaction curves (30-sample tree)

No-Verification-Needed: generated figure artifacts only"; } \
    || { log "$M interactions FAILED"; \
         commit_evidence "$M" synthetic "partial (interactions failed)"; \
         bash scripts/tpu_probe.sh; return 1; }
}

do_inter_shapenet() {  # $1 = model : interactions over the ShapeNet fixture tree
  local M=$1
  [ -d "checkpoints/exp_MODEL_${M}_DATA_shapenet_POINTNUM_1024_REGIONNUM_32_shapley_test" ] || return 1
  {
    run_cli gen_pair --model "$M" --dataset shapenet \
      && run_cli interaction_logits --model "$M" --dataset shapenet --resume \
      && run_cli cal_interactions --model "$M" --dataset shapenet \
      && { run_cli plot_interaction --model "$M" --dataset shapenet \
             --plot_mode normal_vs_adv || true; }
  } > "/tmp/r5_inter_${M}_sn.log" 2>&1 \
    && { log "$M shapenet interactions done"; \
         commit_evidence "$M" shapenet "interactions complete"; \
         git add -f figures 2>/dev/null; git diff --cached --quiet \
           || git commit -q -m "figures: $M ShapeNet interaction curves

No-Verification-Needed: generated figure artifacts only"; } \
    || { log "$M shapenet interactions FAILED"; \
         commit_evidence "$M" shapenet "partial (interactions failed)"; }
}

# --------------------------------------------------------------- phases
if [ "$PHASE" = all ] || [ "$PHASE" = inter ]; then
  log "==== phase D'b: pointnet ShapeNet interactions (cheap, 2nd dataset column) ===="
  do_inter_shapenet pointnet
  # gcnn interactions need ~2 h; a partial run yields no interaction cell
  # (cal_interactions needs every ratio's logits).  Only start if the wrap
  # deadline (~04:10) leaves room; otherwise fall through to pointconv,
  # whose per-stage artifacts resume across rounds.
  NOW_MIN=$((10#$(date +%H) * 60 + 10#$(date +%M)))
  if [ "$NOW_MIN" -lt 140 ]; then    # start by 02:20 or not at all
    log "==== phase D': gcnn interactions ===="
    do_inter gcnn
  else
    log "==== phase D' SKIPPED: too little round left for a complete gcnn interaction cell (now=$NOW_MIN min) ===="
  fi
fi

if [ "$PHASE" = all ] || [ "$PHASE" = tables ]; then
  log "==== phase C': pointconv tables (as far as the round allows) ===="
  do_tables pointconv
fi

if [ "$PHASE" = all ] || [ "$PHASE" = tail ]; then
  log "==== phase E': remaining (resumable) ===="
  do_tables pointnet2
  do_tables gcnn_adv
  do_inter dgcnn
  do_inter gcnn_adv
fi

if [ "$PHASE" = all ] || [ "$PHASE" = figs ]; then
  log "==== phase F': composite figure ===="
  run_cli plot_interaction --plot_mode all > /tmp/r5_figs.log 2>&1 || log "composite failed"
  git add -f figures figures_show 2>/dev/null
  git diff --cached --quiet || git commit -q -m "figures: composite interaction figure across completed families

No-Verification-Needed: generated figure artifacts only"
fi
log "ALL DONE"
