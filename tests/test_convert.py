"""Checkpoint-converter tests.

1. Structural round-trip: synthesise a torch-shaped state dict *from* our
   flax template via the conversion rules, convert it back, and assert the
   resulting pytree is identical in structure, shape and value.
2. Numeric oracle: a single Dense+BN layer against torch.nn.functional
   conv1d + batch_norm with shared weights (validates the kernel transpose
   and eval-mode BN semantics end to end).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from interpret_quality_tpu.models import build_model, init_model
from interpret_quality_tpu.models.torch_convert import (RULES,
                                                        convert_state_dict)


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def synth_torch_state(model_name, variables, rng):
    """Build a torch-layout state dict with values derived from the flax
    template (inverse of convert_state_dict)."""
    state = {}
    params, stats = variables["params"], variables["batch_stats"]
    for tprefix, fpath, kind in RULES[model_name]():
        if kind == "conv":
            node = _get(params, fpath)
            kernel = np.asarray(node["kernel"])          # (in, out)
            state[f"{tprefix}.weight"] = rng.randn(
                kernel.shape[1], kernel.shape[0], 1).astype(np.float32)
            if "bias" in node:
                state[f"{tprefix}.bias"] = rng.randn(
                    kernel.shape[1]).astype(np.float32)
        elif kind == "bn_flat":
            node = _get(params, fpath)
            c = np.asarray(node["bn_scale"]).shape[0]
            state[f"{tprefix}.weight"] = rng.rand(c).astype(np.float32) + 0.5
            state[f"{tprefix}.bias"] = rng.randn(c).astype(np.float32)
            state[f"{tprefix}.running_mean"] = rng.randn(c).astype(np.float32)
            state[f"{tprefix}.running_var"] = rng.rand(c).astype(np.float32) + 0.5
        else:
            node = _get(params, fpath)
            c = np.asarray(node["scale"]).shape[0]
            state[f"{tprefix}.weight"] = rng.rand(c).astype(np.float32) + 0.5
            state[f"{tprefix}.bias"] = rng.randn(c).astype(np.float32)
            state[f"{tprefix}.running_mean"] = rng.randn(c).astype(np.float32)
            state[f"{tprefix}.running_var"] = rng.rand(c).astype(np.float32) + 0.5
    return state


@pytest.mark.parametrize("name", ["pointnet", "pointnet2", "pointconv", "dgcnn"])
def test_convert_structure_matches_template(name):
    model = build_model(name, num_classes=10)
    variables = init_model(model, jax.random.PRNGKey(0), num_points=64)
    rng = np.random.RandomState(0)
    state = synth_torch_state(name, variables, rng)
    # DataParallel prefix handling
    state = {("module." + k if i % 2 == 0 else k): v
             for i, (k, v) in enumerate(state.items())}
    converted = convert_state_dict(name, state)

    t_paths = {jax.tree_util.keystr(p): l.shape for p, l in
               jax.tree_util.tree_leaves_with_path(variables)}
    c_paths = {jax.tree_util.keystr(p): l.shape for p, l in
               jax.tree_util.tree_leaves_with_path(converted)}
    assert t_paths == c_paths


def test_convbn_matches_torch_functional():
    """Dense+eval-BN vs torch conv1d+batch_norm with the same weights."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from interpret_quality_tpu.models.common import ConvBN

    rng = np.random.RandomState(1)
    B, N, Cin, Cout = 2, 7, 5, 6
    x = rng.randn(B, N, Cin).astype(np.float32)
    w = rng.randn(Cout, Cin, 1).astype(np.float32)      # torch conv1d weight
    b = rng.randn(Cout).astype(np.float32)
    gamma = rng.rand(Cout).astype(np.float32) + 0.5
    beta = rng.randn(Cout).astype(np.float32)
    mean = rng.randn(Cout).astype(np.float32)
    var = rng.rand(Cout).astype(np.float32) + 0.5

    # torch oracle: (B, C, N) layout
    xt = torch.from_numpy(x).permute(0, 2, 1)
    yt = F.conv1d(xt, torch.from_numpy(w), torch.from_numpy(b))
    yt = F.batch_norm(yt, torch.from_numpy(mean), torch.from_numpy(var),
                      torch.from_numpy(gamma), torch.from_numpy(beta),
                      training=False, eps=1e-5)
    yt = torch.relu(yt).permute(0, 2, 1).numpy()

    layer = ConvBN(Cout)
    variables = {
        "params": {"conv": {"kernel": jnp.array(w[:, :, 0].T),
                            "bias": jnp.array(b)},
                   "bn": {"scale": jnp.array(gamma), "bias": jnp.array(beta)}},
        "batch_stats": {"bn": {"mean": jnp.array(mean), "var": jnp.array(var)}},
    }
    yj = np.asarray(layer.apply(variables, jnp.array(x), train=False))
    np.testing.assert_allclose(yj, yt, rtol=1e-4, atol=1e-5)
