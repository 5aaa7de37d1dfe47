#!/bin/bash
# Round-2 (session f) chip-work queue: this container is another fresh host
# (no checkpoints/, no artifact trees), so rebuild everything the committed
# RESULTS.md still needs, in one TPU-owning pass:
#   1. r2e_queue.sh  — pointconv suite, gcnn train, gcnn_adv fine-tune+suite
#                      (appends the two missing RESULTS.md families)
#   2. r2c_compare.sh — rebuild pointnet/dgcnn/gcnn/pointnet2 artifact trees,
#                      then drop the stale PARTIAL comparison and append the
#                      full six-family cross-model table.
cd "$(dirname "$0")/.." || exit 1
echo "[r2f] starting r2e_queue"
bash scripts/r2e_queue.sh 2>&1 | tee /tmp/r2e.log
echo "[r2f] starting r2c_compare"
bash scripts/r2c_compare.sh 2>&1 | tee /tmp/r2c.log
echo "[r2f] ALL DONE"
