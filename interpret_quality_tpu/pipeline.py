"""Glue: frozen-model loading, engine construction, dataset resolution.

The CLIs call these helpers; tests and benchmarks use them with
``allow_random_init=True`` / ``synthetic=True`` so every stage runs
end-to-end without the original datasets or checkpoints on disk.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .attrib.shapley import ShapleyEngine
from .config import ExperimentConfig
from .data.datasets import SyntheticClouds, get_folder_name_list, make_eval_dataset
from .models import build_model, init_model, make_forward_fn
from .models.checkpoint import load_checkpoint


def load_frozen_model(cfg: ExperimentConfig, allow_random_init: bool = False):
    """Build the model and load its frozen eval-mode variables.

    Accepts native ``.msgpack`` checkpoints or reference ``.t7`` state dicts
    (converted on the fly).  With ``allow_random_init`` a missing checkpoint
    falls back to the deterministic random init — useful for smoke tests and
    throughput benchmarking where logits values don't matter.
    """
    model = build_model(cfg.model, cfg.num_classes, cfg.k)
    template = init_model(model, jax.random.PRNGKey(cfg.seed),
                          num_points=cfg.num_points)
    path = cfg.model_path or cfg.default_model_path()
    if (cfg.model_path is None and not os.path.exists(path)
            and os.path.basename(path) == "model_399.msgpack"):
        # Reference parity: the adv checkpoint is named by its final epoch
        # (final_util.py:52-66 points at model_399).  Our adv trainer is
        # epoch-count agnostic and gates on accuracy, so when the fixed-epoch
        # name is absent fall back to the same run's best checkpoint.  Only
        # the DEFAULT path gets this fallback: an explicit --model_path that
        # doesn't exist should fail loudly, not silently load a different
        # checkpoint (ADVICE r3).
        best = os.path.join(os.path.dirname(path), "model_best.msgpack")
        if os.path.exists(best):
            print(f"[load_frozen_model] {os.path.basename(path)} absent; "
                  f"substituting best checkpoint {best}")
            path = best
    if os.path.exists(path):
        variables = load_checkpoint(cfg.model, path, template)
    elif allow_random_init:
        # Nudge every bias positive (incl. BatchNorm 'bias' params — the
        # shift survives normalisation): with zero-bias random init, narrow
        # ReLU chains (PointConv's 1-channel DensityNet) die with ~50%
        # probability per layer and zero out all logits, making smoke runs
        # degenerate.
        import flax
        flat = flax.traverse_util.flatten_dict(template["params"])
        flat = {k: (v + 0.1 if k[-1] == "bias" else v)
                for k, v in flat.items()}
        variables = dict(template)
        variables["params"] = flax.traverse_util.unflatten_dict(flat)
    else:
        raise FileNotFoundError(
            f"checkpoint {path} not found (pass --allow_random_init to smoke-run)")
    forward = make_forward_fn(model, variables)
    return model, variables, forward


def make_engine(cfg: ExperimentConfig, forward,
                coalition_sharding=None) -> ShapleyEngine:
    return ShapleyEngine(forward, num_regions=cfg.num_regions,
                         softmax_type=cfg.softmax_type,
                         batch_orders=min(cfg.shapley_batch_size,
                                          cfg.num_samples_save),
                         coalition_sharding=coalition_sharding)


def resolve_dataset(cfg: ExperimentConfig, synthetic: bool = False):
    """Return (dataset, folder_name_list) for the 30-sample eval set."""
    if synthetic:
        ds = SyntheticClouds(num_samples=30, num_points=cfg.num_points,
                             num_classes=cfg.num_classes, seed=cfg.seed)
        names = [f"synthetic_{i:02d}" for i in range(len(ds))]
        return ds, names
    ds = make_eval_dataset(cfg.dataset, cfg.data_root, cfg.num_points)
    return ds, get_folder_name_list(cfg.dataset)
