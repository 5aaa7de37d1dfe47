"""Model registry and forward-fn factory.

`make_forward_fn` produces the jittable ``(B, N, 3) -> (B, num_class)``
closure used everywhere downstream (Shapley engine, enum runners,
interaction engine, benchmarks).  It normalises the PointNet tuple return
(reference tools/final_common.py:36-39).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from .dgcnn import DGCNNCls, GCNNCls
from .pointconv import PointConvDensityClsSsg
from .pointnet import PointNetCls
from .pointnet2 import PointNet2ClsMsg

MODEL_REGISTRY = {
    "pointnet": PointNetCls,
    "pointnet2": PointNet2ClsMsg,
    "pointconv": PointConvDensityClsSsg,
    "dgcnn": DGCNNCls,
    "gcnn": GCNNCls,
    "gcnn_adv": GCNNCls,
}


def build_model(name: str, num_classes: int = 10, k: int = 20):
    """Instantiate a model module by reference name."""
    cls = MODEL_REGISTRY[name]
    if name in ("dgcnn", "gcnn", "gcnn_adv"):
        return cls(num_classes=num_classes, k=k)
    return cls(num_classes=num_classes)


def init_model(model, rng: jax.Array, num_points: int = 1024,
               batch: int = 2) -> Dict[str, Any]:
    """Initialise parameters + batch stats with a dummy batch."""
    dummy = jnp.zeros((batch, num_points, 3), jnp.float32)
    variables = model.init({"params": rng}, dummy, train=False)
    return variables


def make_forward_fn(model, variables, train: bool = False) -> Callable:
    """Return logits_fn(x: (B, N, 3)) -> (B, num_class), closed over params."""

    def forward(x):
        out = model.apply(variables, x, train=train)
        if isinstance(out, tuple):       # PointNet returns (logits, trans_feat, crt)
            out = out[0]
        return out

    return forward
