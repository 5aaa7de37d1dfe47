"""Native checkpointing of flax variable pytrees (msgpack), plus the loader
dispatch used by the CLIs: ``.t7`` files go through the torch converter,
``.msgpack`` files load natively.

Replaces the reference's torch.save/torch.load checkpoints
(main_cls_seed.py:202-209, tools/final_util.py:236-262).
"""
from __future__ import annotations

import os
from typing import Any, Dict

import jax
from flax import serialization


def save_variables(path: str, variables: Dict[str, Any]):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(variables))


def load_variables(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def load_checkpoint(model_name: str, path: str,
                    template: Dict[str, Any]) -> Dict[str, Any]:
    """Load a checkpoint in either native (.msgpack) or torch (.t7) format."""
    if path.endswith(".t7") or path.endswith(".pth") or path.endswith(".pt"):
        from .torch_convert import load_t7
        variables = load_t7(model_name, path)
        # validate the structure against the template
        templ_flat = jax.tree_util.tree_leaves_with_path(template)
        conv_flat = jax.tree_util.tree_leaves_with_path(variables)
        templ_paths = {jax.tree_util.keystr(p): l.shape for p, l in templ_flat}
        conv_paths = {jax.tree_util.keystr(p): l.shape for p, l in conv_flat}
        missing = set(templ_paths) - set(conv_paths)
        extra = set(conv_paths) - set(templ_paths)
        if missing or extra:
            raise ValueError(
                f"converted checkpoint mismatch: missing={sorted(missing)[:5]} "
                f"extra={sorted(extra)[:5]}")
        bad = [k for k in templ_paths if templ_paths[k] != conv_paths[k]]
        if bad:
            raise ValueError(f"shape mismatch at {bad[:5]}")
        return variables
    return load_variables(path, template)
