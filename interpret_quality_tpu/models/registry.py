"""Model registry and forward-fn factory.

`make_forward_fn` produces the jittable ``(B, N, 3) -> (B, num_class)``
closure used everywhere downstream (Shapley engine, enum runners,
interaction engine, benchmarks).  It normalises the PointNet tuple return
(reference tools/final_common.py:36-39).
"""
from __future__ import annotations

from typing import Any, Callable, Dict

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
    """Initialise parameters + batch stats with a dummy batch.

    Runs on the host CPU backend: eager flax init issues dozens of small
    ops, and through the TPU tunnel each one costs a compile round trip
    (~50 s total, measured).  The fused Pallas eval paths are disabled for
    the init trace (they cannot run on CPU); parameter structure is
    identical either way.
    """
    from .dgcnn import _DGCNNBase
    fusable = (_DGCNNBase, PointNet2ClsMsg, PointConvDensityClsSsg)
    kwargs = {"fused": False} if isinstance(model, fusable) else {}
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        # inputs must be CPU-committed too: jit follows committed inputs,
        # not default_device
        dummy = jnp.zeros((batch, num_points, 3), jnp.float32, device=cpu)
        rng = jax.device_put(rng, cpu)
        variables = jax.jit(
            lambda d: model.init({"params": rng}, d, train=False, **kwargs)
        )(dummy)
    return variables


class ForwardFn:
    """Logits function ``(B, N, 3) -> (B, num_class)``.

    Callable directly (closure semantics), but also exposes
    ``(apply_fn, variables)`` so the attribution engines can pass the
    parameters as jit *arguments*.  Closing over them bakes the whole
    parameter set into every compiled program as MLIR constants — slow
    lowering (one host fetch per array), multi-MB payloads through the
    tunnel's remote compiler, and bloated cache entries.

    Normalises the PointNet tuple return (reference tools/final_common.py:36-39).
    """

    def __init__(self, model, variables, train: bool = False):
        self.model = model
        self.variables = variables
        self.train = train

    def apply_fn(self, variables, x):
        out = self.model.apply(variables, x, train=self.train)
        if isinstance(out, tuple):   # PointNet returns (logits, trans_feat, crt)
            out = out[0]
        return out

    # -- pose-invariant graph plans (models/plans.py): perturbation
    # enumeration builds the graph once per order chunk from the canonical
    # masked batch and reuses it across all poses.
    def plan_fn(self, x):
        """Pure-geometry plan for a coalition batch, or None (pointnet)."""
        from .common import on_tpu
        from .plans import make_plan_fn
        builder = make_plan_fn(self.model, fused=(not self.train) and on_tpu())
        return None if builder is None else builder(x)

    def apply_plan_fn(self, variables, x, plan):
        if plan is None:
            return self.apply_fn(variables, x)
        out = self.model.apply(variables, x, train=self.train, plan=plan)
        if isinstance(out, tuple):
            out = out[0]
        return out

    def __call__(self, x):
        return self.apply_fn(self.variables, x)


def make_forward_fn(model, variables, train: bool = False) -> Callable:
    """Return a ForwardFn (callable; exposes .apply_fn/.variables)."""
    return ForwardFn(model, variables, train)
