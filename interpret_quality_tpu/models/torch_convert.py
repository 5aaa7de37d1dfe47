"""Convert published PyTorch ``.t7`` state dicts into flax variable pytrees.

The reference links pretrained checkpoints (README.md:68) saved as torch
state dicts, possibly with a DataParallel ``module.`` prefix
(tools/final_util.py:250-262).  This module maps those tensors onto our
channels-last flax parameter trees so the paper tables can be reproduced
without retraining.

Tensor layout conversions:
  * Conv1d/Conv2d (k=1) weight (out, in, 1[, 1]) -> Dense kernel (in, out)
  * Linear weight (out, in)                      -> Dense kernel (in, out)
  * BatchNorm weight/bias/running_mean/running_var
        -> params .../bn {scale, bias} + batch_stats .../bn {mean, var}

Torch is an IO dependency only; no compute runs through it.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


# a rule: (torch_prefix, flax_path_tuple, kind)
#   kind "conv": torch_prefix.weight[.bias] -> <path>/{kernel,bias}
#   kind "bn":   torch_prefix.* -> params <path>/{scale,bias} + stats <path>/{mean,var}
Rule = Tuple[str, Tuple[str, ...], str]


def _stn_rules(tprefix: str, fprefix: Tuple[str, ...]) -> List[Rule]:
    r: List[Rule] = []
    for i in (1, 2, 3):
        r.append((f"{tprefix}.conv{i}", fprefix + (f"conv{i}", "conv"), "conv"))
        r.append((f"{tprefix}.bn{i}", fprefix + (f"conv{i}", "bn"), "bn"))
    r.append((f"{tprefix}.fc1", fprefix + ("fc1", "fc"), "conv"))
    r.append((f"{tprefix}.bn4", fprefix + ("fc1", "bn"), "bn"))
    r.append((f"{tprefix}.fc2", fprefix + ("fc2", "fc"), "conv"))
    r.append((f"{tprefix}.bn5", fprefix + ("fc2", "bn"), "bn"))
    r.append((f"{tprefix}.fc3", fprefix + ("fc3",), "conv"))
    return r


def pointnet_rules() -> List[Rule]:
    r = _stn_rules("feat.stn", ("feat", "stn"))
    r += _stn_rules("feat.fstn", ("feat", "fstn"))
    for i in (1, 2, 3):
        r.append((f"feat.conv{i}", ("feat", f"conv{i}", "conv"), "conv"))
        r.append((f"feat.bn{i}", ("feat", f"conv{i}", "bn"), "bn"))
    r.append(("fc1", ("fc1", "fc"), "conv"))
    r.append(("bn1", ("fc1", "bn"), "bn"))
    r.append(("fc2", ("fc2",), "conv"))
    r.append(("bn2", ("bn2",), "bn"))
    r.append(("fc3", ("fc3",), "conv"))
    return r


def dgcnn_rules() -> List[Rule]:
    r: List[Rule] = []
    for i in (1, 2, 3, 4):
        # EdgeConv stores its parameters flat: kernel + bn_{scale,bias,mean,var}
        r.append((f"conv{i}.0", (f"conv{i}",), "conv"))
        r.append((f"bn{i}", (f"conv{i}",), "bn_flat"))
        # the reference registers each BN twice — as self.bn{i} AND inside
        # the conv{i} Sequential (reference models/dgcnn.py:60-67), so its
        # state dicts carry both key aliases for the same tensor.  Map both:
        # exports must write real values under BOTH names (torch's
        # load_state_dict writes shared tensors once per alias, last wins).
        r.append((f"conv{i}.1", (f"conv{i}",), "bn_flat"))
    r.append(("conv5.0", ("conv5", "conv"), "conv"))
    r.append(("bn5", ("conv5", "bn"), "bn"))
    r.append(("conv5.1", ("conv5", "bn"), "bn"))
    r.append(("linear1", ("linear1",), "conv"))
    r.append(("bn6", ("bn6",), "bn"))
    r.append(("linear2", ("linear2",), "conv"))
    r.append(("bn7", ("bn7",), "bn"))
    r.append(("linear3", ("linear3",), "conv"))
    return r


def pointnet2_rules() -> List[Rule]:
    r: List[Rule] = []
    mlp_list = {
        "sa1": [[32, 32, 64], [64, 64, 128], [64, 96, 128]],
        "sa2": [[64, 64, 128], [128, 128, 256], [128, 128, 256]],
    }
    for sa, branches in mlp_list.items():
        for bi, mlp in enumerate(branches):
            for j in range(len(mlp)):
                r.append((f"{sa}.conv_blocks.{bi}.{j}",
                          (sa, f"branch{bi}", f"layer{j}", "conv"), "conv"))
                r.append((f"{sa}.bn_blocks.{bi}.{j}",
                          (sa, f"branch{bi}", f"layer{j}", "bn"), "bn"))
    for j in range(3):
        r.append((f"sa3.mlp_convs.{j}", ("sa3", "mlp", f"layer{j}", "conv"), "conv"))
        r.append((f"sa3.mlp_bns.{j}", ("sa3", "mlp", f"layer{j}", "bn"), "bn"))
    for name in ("fc1", "fc2", "fc3"):
        r.append((name, (name,), "conv"))
    for name in ("bn1", "bn2"):
        r.append((name, (name,), "bn"))
    return r


def pointconv_rules() -> List[Rule]:
    r: List[Rule] = []
    for sa, nlayers in (("sa1", 3), ("sa2", 3), ("sa3", 3)):
        for j in range(nlayers):
            r.append((f"{sa}.mlp_convs.{j}", (sa, "mlp", f"layer{j}", "conv"), "conv"))
            r.append((f"{sa}.mlp_bns.{j}", (sa, "mlp", f"layer{j}", "bn"), "bn"))
        for j in range(3):  # weightnet 3->8->8->16
            r.append((f"{sa}.weightnet.mlp_convs.{j}",
                      (sa, "weightnet", "mlp", f"layer{j}", "conv"), "conv"))
            r.append((f"{sa}.weightnet.mlp_bns.{j}",
                      (sa, "weightnet", "mlp", f"layer{j}", "bn"), "bn"))
        for j in range(3):  # densitynet 1->16->8->1
            r.append((f"{sa}.densitynet.mlp_convs.{j}",
                      (sa, "densitynet", "mlp", f"layer{j}", "conv"), "conv"))
            r.append((f"{sa}.densitynet.mlp_bns.{j}",
                      (sa, "densitynet", "mlp", f"layer{j}", "bn"), "bn"))
        r.append((f"{sa}.linear", (sa, "linear"), "conv"))
        r.append((f"{sa}.bn_linear", (sa, "bn_linear"), "bn"))
    for name in ("fc1", "fc2", "fc3"):
        r.append((name, (name,), "conv"))
    for name in ("bn1", "bn2"):
        r.append((name, (name,), "bn"))
    return r


RULES = {
    "pointnet": pointnet_rules,
    "pointnet2": pointnet2_rules,
    "pointconv": pointconv_rules,
    "dgcnn": dgcnn_rules,
    "gcnn": dgcnn_rules,
    "gcnn_adv": dgcnn_rules,
}


def _to_np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _strip_module(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v
    return out


def _set(tree: dict, path: Tuple[str, ...], leaf_name: str, value):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf_name] = value


def convert_state_dict(model_name: str, state: Dict) -> Dict:
    """Convert a torch state dict to flax variables {params, batch_stats}."""
    state = _strip_module({k: _to_np(v) for k, v in state.items()})
    params: dict = {}
    stats: dict = {}
    for tprefix, fpath, kind in RULES[model_name]():
        if kind == "conv":
            w = state[f"{tprefix}.weight"]
            if w.ndim == 4:        # conv2d k=1
                kernel = w[:, :, 0, 0].T
            elif w.ndim == 3:      # conv1d k=1
                kernel = w[:, :, 0].T
            else:                  # linear
                kernel = w.T
            _set(params, fpath, "kernel", np.ascontiguousarray(kernel))
            if f"{tprefix}.bias" in state:
                _set(params, fpath, "bias", state[f"{tprefix}.bias"])
        elif kind == "bn":
            _set(params, fpath, "scale", state[f"{tprefix}.weight"])
            _set(params, fpath, "bias", state[f"{tprefix}.bias"])
            _set(stats, fpath, "mean", state[f"{tprefix}.running_mean"])
            _set(stats, fpath, "var", state[f"{tprefix}.running_var"])
        elif kind == "bn_flat":
            _set(params, fpath, "bn_scale", state[f"{tprefix}.weight"])
            _set(params, fpath, "bn_bias", state[f"{tprefix}.bias"])
            _set(stats, fpath, "bn_mean", state[f"{tprefix}.running_mean"])
            _set(stats, fpath, "bn_var", state[f"{tprefix}.running_var"])
        else:
            raise ValueError(kind)
    return {"params": params, "batch_stats": stats}


def load_t7(model_name: str, path: str) -> Dict:
    """Load a reference ``.t7`` checkpoint and convert to flax variables."""
    import torch
    state = torch.load(path, map_location="cpu")
    return convert_state_dict(model_name, state)


def _get(tree: dict, path: Tuple[str, ...], leaf_name: str):
    node = tree
    for p in path:
        node = node[p]
    return node[leaf_name]


def export_state_dict(model_name: str, variables: Dict,
                      template: Dict) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_state_dict`: flax variables back to a
    torch-layout state dict, for running TPU-trained weights through the
    reference tooling (tools/final_util.py:236-262 load semantics).

    Args:
      template: a torch state dict (or {key: array}) of the target module —
        e.g. ``ReferenceModel(args).state_dict()`` — used only for the
        per-tensor layout (Conv2d (O,I,1,1) / Conv1d (O,I,1) / Linear (O,I))
        that the 2-D flax kernels cannot encode.  ``module.`` prefixes in
        the template are reproduced in the output keys.
    """
    tpl_raw = {k: _to_np(v) for k, v in template.items()}
    prefixed = any(k.startswith("module.") for k in tpl_raw)
    tpl = _strip_module(tpl_raw)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: Dict[str, np.ndarray] = {}

    def put(key: str, value: np.ndarray):
        if key not in tpl:
            raise KeyError(f"{key} not in template state dict")
        if tuple(tpl[key].shape) != tuple(value.shape):
            raise ValueError(f"{key}: template shape {tpl[key].shape} != "
                             f"exported {value.shape}")
        out[("module." + key) if prefixed else key] = np.ascontiguousarray(
            value.astype(tpl[key].dtype))

    for tprefix, fpath, kind in RULES[model_name]():
        if kind == "conv":
            kernel = np.asarray(_get(params, fpath, "kernel")).T  # (out, in)
            w = kernel.reshape(tpl[f"{tprefix}.weight"].shape)
            put(f"{tprefix}.weight", w)
            if f"{tprefix}.bias" in tpl:
                put(f"{tprefix}.bias", np.asarray(_get(params, fpath, "bias")))
        elif kind == "bn":
            put(f"{tprefix}.weight", np.asarray(_get(params, fpath, "scale")))
            put(f"{tprefix}.bias", np.asarray(_get(params, fpath, "bias")))
            put(f"{tprefix}.running_mean",
                np.asarray(_get(stats, fpath, "mean")))
            put(f"{tprefix}.running_var",
                np.asarray(_get(stats, fpath, "var")))
        elif kind == "bn_flat":
            put(f"{tprefix}.weight",
                np.asarray(_get(params, fpath, "bn_scale")))
            put(f"{tprefix}.bias", np.asarray(_get(params, fpath, "bn_bias")))
            put(f"{tprefix}.running_mean",
                np.asarray(_get(stats, fpath, "bn_mean")))
            put(f"{tprefix}.running_var",
                np.asarray(_get(stats, fpath, "bn_var")))
        else:
            raise ValueError(kind)
    # The only template keys the flax tree legitimately lacks are BatchNorm
    # num_batches_tracked counters; copy those so torch
    # load_state_dict(strict=True) passes.  Anything else left over means the
    # RULES table missed a layer — copying the template there would silently
    # ship its (e.g. freshly-initialised) weights, so fail loudly instead.
    leftover = [k for k in tpl_raw if k not in out]
    unmapped = [k for k in leftover if not k.endswith("num_batches_tracked")]
    if unmapped:
        raise ValueError(
            f"export rules for {model_name!r} produced no value for template "
            f"keys {unmapped}; extend RULES rather than shipping template "
            "weights")
    for key in leftover:
        out[key] = tpl_raw[key]
    return out


def save_t7(model_name: str, variables: Dict, path: str, template: Dict):
    """Export flax variables as a torch ``.t7`` the reference can load."""
    import torch
    state = {k: torch.from_numpy(v)
             for k, v in export_state_dict(model_name, variables,
                                           template).items()}
    torch.save(state, path)
