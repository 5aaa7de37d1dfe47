#!/bin/bash
# Round-4 chip-work queue: the execution round.  Same deliverable as
# scripts/r3_queue.sh (the complete 6-family results matrix — reference
# final_result.py:216-255) with the two structural fixes the round-3
# verdict demanded:
#   * HOST-RESET-PROOF EVIDENCE: after every stage of every family,
#     scripts/collect_evidence.py condenses the artifact tree into
#     results/<model>_<dataset>.json and commits it.  A dead host can no
#     longer erase a completed run, and the commits double as queue
#     heartbeats during multi-hour families.
#   * ADAPTIVE ORDER: families run cheapest-first at full 30-sample scale
#     (pointnet ~80k fwd/s; gcnn hoists all 4 kNN layers via the pose-
#     invariant plan; dgcnn/pointconv/pointnet2 are the slow tail), so a
#     round boundary cuts the *least* total evidence.
#   * training uses the DEFAULT 0.80 best-checkpoint gate (reference
#     main_cls_seed.py:108) on the re-hardened synthetic task, so the gate
#     is exercised below saturation; a gate-blocked family falls back to
#     an ungated rerun rather than stalling the queue.
#
# Usage: scripts/r4_queue.sh [phase]  (phase in {train,tables,inter,shapenet,figs};
#                                      default: all in order)
cd "$(dirname "$0")/.." || exit 1
PHASE=${1:-all}
LABEL30="TPU v5e-1 (axon), hardened synthetic set (morph<=0.45), trained ckpt"
FAMS_ORDERED="pointnet gcnn gcnn_adv dgcnn pointconv pointnet2"

log() { echo "[r4 $(date +%H:%M:%S)] $*"; }

commit_evidence() {  # $1 = model, $2 = dataset-label for collect (synthetic|shapenet), $3 = note
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

train_one() {  # $1 = model
  local M=$1
  local CK="checkpoints/exp_MODEL_${M}_DATA_modelnet10_POINTNUM_1024_clean/models/model_best.msgpack"
  [ -f "$CK" ] && return 0
  log "train $M (gate 0.80)"
  python -u -m interpret_quality_tpu.cli.train --model "$M" --synthetic \
    --epochs 50 > "/tmp/${M}_train.log" 2>&1
  if [ ! -f "$CK" ]; then
    log "$M never cleared the 0.80 gate in 50 epochs; ungated rerun"
    python -u -m interpret_quality_tpu.cli.train --model "$M" --synthetic \
      --epochs 50 --best_acc_gate 0 >> "/tmp/${M}_train.log" 2>&1
  fi
  [ -f "$CK" ] || { log "$M train retry after probe"; bash scripts/tpu_probe.sh; \
    python -u -m interpret_quality_tpu.cli.train --model "$M" --synthetic \
      --epochs 50 --best_acc_gate 0 >> "/tmp/${M}_train.log" 2>&1; }
}

train_adv() {
  local GCK="checkpoints/exp_MODEL_gcnn_DATA_modelnet10_POINTNUM_1024_clean/models/model_best.msgpack"
  local ACK="checkpoints/exp_MODEL_gcnn_adv_DATA_modelnet10_POINTNUM_1024_clean_with_all_rot_da/models/model_best.msgpack"
  [ -f "$ACK" ] && return 0
  [ -f "$GCK" ] || { log "gcnn ckpt missing for adv fine-tune"; return 1; }
  log "train gcnn_adv (BIM fine-tune)"
  # fine-tune lr: the gcnn recipe multiplies base lr x100 (reference
  # main_cls_adv.py:81, SGD 0.1 cosine over 400 ep); at 16 epochs that
  # collapses the resumed model after one epoch (measured: 0.875 -> 0.25).
  # 1e-4 base -> SGD 0.01 keeps the fine-tune stable.
  python -u -m interpret_quality_tpu.cli.train_adv --synthetic --epochs 16 \
    --lr 1e-4 --best_acc_gate 0 --resume_path "$GCK" > /tmp/gcnn_adv_train.log 2>&1
}

run_cli() { python -u -m "interpret_quality_tpu.cli.$@"; }

tables_suite() {  # $1 = model : fps + shapley init + 3 enums + smoothness + tables
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

append_family() {  # $1 = model : replace the family section with the current tree
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

inter_suite() {  # $1 = model : interactions on the 10 selected clouds
  local M=$1; shift
  log "interaction suite $M"
  run_cli gen_pair --model "$M" --synthetic "$@" || return 1
  run_cli interaction_logits --model "$M" --synthetic --resume "$@" || return 1
  run_cli cal_interactions --model "$M" --synthetic "$@" || true
  run_cli plot_interaction --model "$M" --plot_mode normal_vs_adv --synthetic "$@" || true
  run_cli plot_interaction --model "$M" --plot_mode single_region_vs_normal_avg --synthetic "$@" || true
}

do_tables() {  # $1 = model
  local M=$1
  if [ "$M" = gcnn_adv ]; then
    local CK="checkpoints/exp_MODEL_gcnn_adv_DATA_modelnet10_POINTNUM_1024_clean_with_all_rot_da/models/model_best.msgpack"
    [ -f "$CK" ] || { log "skip gcnn_adv (no ckpt)"; return 1; }
  fi
  tables_suite "$M" > "/tmp/r4_tables_${M}.log" 2>&1 \
    && { log "$M tables done"; append_family "$M"; refresh_compare; \
         commit_evidence "$M" synthetic "tables complete"; } \
    || { log "$M tables FAILED (see /tmp/r4_tables_${M}.log)"; \
         commit_evidence "$M" synthetic "partial (tables failed)"; \
         bash scripts/tpu_probe.sh; return 1; }
}

do_inter() {  # $1 = model
  local M=$1
  [ -d "checkpoints/exp_MODEL_${M}_DATA_modelnet10_POINTNUM_1024_REGIONNUM_32_shapley_test" ] || return 1
  inter_suite "$M" > "/tmp/r4_inter_${M}.log" 2>&1 \
    && { log "$M interactions done"; append_family "$M"; \
         commit_evidence "$M" synthetic "interactions complete"; \
         git add -f figures 2>/dev/null; git diff --cached --quiet \
           || git commit -q -m "figures: $M interaction curves (30-sample tree)

No-Verification-Needed: generated figure artifacts only"; } \
    || { log "$M interactions FAILED"; \
         commit_evidence "$M" synthetic "partial (interactions failed)"; \
         bash scripts/tpu_probe.sh; return 1; }
}

# --------------------------------------------------------------- phases
# r4_queue2: the post-ShapeNet continuation after the 15:26 TPU worker
# crash dropped gcnn's slot — retry gcnn tables first, then the remaining
# round-4 order.  All stages resume.
if [ "$PHASE" = all ] || [ "$PHASE" = tables ]; then
  log "==== phase B2: gcnn tables retry ===="
  do_tables gcnn
fi

if [ "$PHASE" = all ] || [ "$PHASE" = tail ]; then
  log "==== phase D: gcnn_adv tables, then remaining work (resumable) ===="
  do_tables gcnn_adv
  do_tables dgcnn
  do_inter gcnn
  do_inter gcnn_adv
  do_inter dgcnn
  for M in pointconv pointnet2; do do_tables "$M"; done
fi

if [ "$PHASE" = all ] || [ "$PHASE" = figs ]; then
  log "==== phase F: composite figure ===="
  run_cli plot_interaction --plot_mode all > /tmp/r4_figs.log 2>&1 || log "composite failed"
  git add -f figures figures_show 2>/dev/null
  git diff --cached --quiet || git commit -q -m "figures: composite interaction figure across completed families

No-Verification-Needed: generated figure artifacts only"
fi
log "ALL DONE"
