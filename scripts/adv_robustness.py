"""Rotation-robustness evidence for the adv-GCNN checkpoint (VERDICT r4 weak #3).

The reference's adversarial trainer prints clean test accuracy AND a
random-rotation robustness accuracy every epoch (main_cls_adv.py:242-277);
our `fit_adversarial` computes the same numbers but they never made it into
committed evidence.  This script condenses the adv story into one JSON:
clean / balanced / rotation-robust accuracy for the normal gcnn checkpoint
vs. the adv-fine-tuned gcnn_adv checkpoint on the held-out synthetic test
split, with the robustness eval averaged over several rotation draws
(main_cls_adv.py:253-258 semantics via `random_rotation_eval_batch`).

Writes results/gcnn_adv_robustness.json.  Runs on the real chip in ~2 min.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from interpret_quality_tpu.data.datasets import SyntheticClouds
from interpret_quality_tpu.models import build_model, init_model
from interpret_quality_tpu.models.checkpoint import load_checkpoint
from interpret_quality_tpu.train.adversarial import random_rotation_eval_batch
from interpret_quality_tpu.train.trainer import balanced_accuracy, make_eval_step

CKPTS = {
    "gcnn": ("checkpoints/exp_MODEL_gcnn_DATA_modelnet10_POINTNUM_1024_clean"
             "/models/model_best.msgpack"),
    "gcnn_adv": ("checkpoints/exp_MODEL_gcnn_adv_DATA_modelnet10_POINTNUM_1024"
                 "_clean_with_all_rot_da/models/model_best.msgpack"),
}
NUM_CLASSES = 10
NUM_POINTS = 1024
ROT_DRAWS = 8  # robustness eval averaged over this many rotation seeds


def eval_model(variables, eval_step, test_ds, batch_size=16):
    y_true, y_pred = [], []
    for data, labels, valid in test_ds.batches(batch_size, shuffle=False):
        _, preds = eval_step(variables, jnp.asarray(data), jnp.asarray(labels))
        y_true.extend(labels[:valid].tolist())
        y_pred.extend(np.asarray(preds)[:valid].tolist())
    y_true, y_pred = np.array(y_true), np.array(y_pred)
    return (float((y_true == y_pred).mean()),
            float(balanced_accuracy(y_true, y_pred)))


def eval_rot_robustness(variables, eval_step, test_ds, batch_size=16):
    accs = []
    for draw in range(ROT_DRAWS):
        rng = jax.random.PRNGKey(1000 + draw)
        hits, count = 0, 0
        for data, labels, valid in test_ds.batches(batch_size, shuffle=False):
            rng, sub = jax.random.split(rng)
            rot = random_rotation_eval_batch(sub, jnp.asarray(data))
            _, preds = eval_step(variables, rot, jnp.asarray(labels))
            hits += int((np.asarray(preds)[:valid] == labels[:valid]).sum())
            count += valid
        accs.append(hits / count)
    return float(np.mean(accs)), float(np.std(accs))


def main():
    test_ds = SyntheticClouds(num_samples=16, num_points=NUM_POINTS, seed=2)
    model = build_model("gcnn", NUM_CLASSES, 20)
    template = init_model(model, jax.random.PRNGKey(1),
                          num_points=NUM_POINTS)
    eval_step = make_eval_step(model, smoothing=True)

    out = {"test_set": "SyntheticClouds(num_samples=16, seed=2) held-out split",
           "rot_eval": ("random axis-angle rotation, alpha in [-pi/2,pi/2], "
                        "averaged over %d draws (main_cls_adv.py:253-258)"
                        % ROT_DRAWS),
           "models": {}}
    for name, path in CKPTS.items():
        if not os.path.exists(path):
            out["models"][name] = {"error": f"checkpoint missing: {path}"}
            continue
        variables = load_checkpoint("gcnn", path, template)
        acc, bal = eval_model(variables, eval_step, test_ds)
        rot_acc, rot_std = eval_rot_robustness(variables, eval_step, test_ds)
        out["models"][name] = {
            "checkpoint": path,
            "clean_acc": acc,
            "clean_balanced_acc": bal,
            "rot_robust_acc_mean": rot_acc,
            "rot_robust_acc_std": rot_std,
        }
        print(f"{name}: clean {acc:.4f} balanced {bal:.4f} "
              f"rot-robust {rot_acc:.4f} +- {rot_std:.4f}")

    os.makedirs("results", exist_ok=True)
    with open("results/gcnn_adv_robustness.json", "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
    print("wrote results/gcnn_adv_robustness.json")


if __name__ == "__main__":
    main()
