"""Full-model eval-mode logits parity vs the reference PyTorch models.

For every model family the reference torch module (loaded from
/root/reference/models/*.py as a read-only oracle; all tests skip when that
tree is absent) is instantiated at seeded random init, its state dict is
mapped through ``convert_state_dict``, and the flax forward under the
converted weights must reproduce the torch eval-mode logits on shared
clouds (reference tools/final_util.py:236-262 load-and-eval semantics).

Run in fp32 (`jax_default_matmul_precision=highest` + hilo gathers) so the
remaining deltas are neighbour-selection tie flips, not accumulation
precision.  A final test measures the bf16-gather (`parts=1`) deviation on
these *structured* (converted) weights to justify the default gather
precision's error budget.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from interpret_quality_tpu.models.registry import build_model
from interpret_quality_tpu.models.torch_convert import convert_state_dict

REF_MODELS = "/root/reference/models"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_MODELS),
    reason="reference tree not available for parity oracle")

B, N = 2, 1024


def _load_ref_module(name):
    """Import a reference model file under a private name (the reference has
    no models/__init__.py; loading by path avoids any package collision)."""
    spec = importlib.util.spec_from_file_location(
        f"_ref_{name}", os.path.join(REF_MODELS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def _ref_args(model: str) -> types.SimpleNamespace:
    """The argparse surface the reference models read
    (tools/final_util.py:162-204 + main_cls_seed.py defaults)."""
    return types.SimpleNamespace(
        dataset="modelnet10", model=model, k=20, emb_dims=1024, dropout=0.5,
        feature_transform=True)


def _build_torch_model(name: str, seed: int = 0):
    import torch
    torch.manual_seed(seed)
    args = _ref_args(name)
    if name == "pointnet":
        mod = _load_ref_module("pointnet")
        m = mod.PointNetCls(args)
    elif name == "pointnet2":
        mod = _load_ref_module("pointnet2")
        m = mod.PointNet2ClsMsg(args)
    elif name == "pointconv":
        mod = _load_ref_module("pointconv")
        m = mod.PointConvDensityClsSsg(args)
    elif name == "dgcnn":
        mod = _load_ref_module("dgcnn")
        m = mod.DGCNN_cls(args)
    elif name == "gcnn":
        mod = _load_ref_module("dgcnn")
        m = mod.GCNN_cls(args)
    else:
        raise ValueError(name)
    return m.eval()


@pytest.fixture(scope="module")
def clouds():
    """Unit-sphere-normalised clouds shared by both frameworks."""
    rng = np.random.RandomState(42)
    pc = rng.randn(B, N, 3).astype(np.float32)
    pc -= pc.mean(axis=1, keepdims=True)
    pc /= np.sqrt((pc ** 2).sum(-1)).max(axis=1)[:, None, None]
    return pc


@pytest.fixture(scope="module", autouse=True)
def fp32_matmuls():
    prev = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision",
                      prev if prev is not None else "default")


def _torch_logits(tm, pc: np.ndarray) -> np.ndarray:
    import torch
    with torch.no_grad():
        out = tm(torch.from_numpy(pc.transpose(0, 2, 1)))
    if isinstance(out, tuple):
        out = out[0]                  # PointNet returns (logits, trans, pts)
    return out.numpy()


def _flax_logits(name: str, variables, pc: np.ndarray,
                 **apply_kw) -> np.ndarray:
    model = build_model(name, num_classes=10, k=20)
    if name != "pointnet":            # pointnet has no fused path
        apply_kw.setdefault("fused", False)
    out = jax.jit(lambda v, x: model.apply(v, x, train=False, **apply_kw))(
        variables, jnp.asarray(pc))
    if isinstance(out, tuple):
        out = out[0]
    return np.asarray(out)


# Neighbour-selection structure differs per family: pointnet/dgcnn/gcnn are
# selection-free or exact-tie-matched; pointnet2 (ball query) and pointconv
# (kNN + KDE density) can flip boundary neighbours on ~1e-6 distance deltas.
TOLS = {
    "pointnet": dict(rtol=1e-4, atol=1e-4),
    "dgcnn": dict(rtol=1e-4, atol=1e-4),
    "gcnn": dict(rtol=1e-4, atol=1e-4),
    "pointnet2": dict(rtol=1e-3, atol=1e-3),
    "pointconv": dict(rtol=1e-3, atol=1e-3),
}


@pytest.mark.parametrize("name",
                         ["pointnet", "pointnet2", "pointconv", "dgcnn",
                          "gcnn"])
def test_converted_logits_match_torch(name, clouds):
    tm = _build_torch_model(name)
    ref = _torch_logits(tm, clouds)
    variables = convert_state_dict(name, tm.state_dict())
    got = _flax_logits(name, variables, clouds)
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, ref, **TOLS[name])


def test_bf16_gather_error_budget_structured_weights(clouds):
    """The default bf16 (`parts=1`) fused gathers must stay within ~2% of
    the fp32 logits on *converted torch* weights — the structured-weight
    re-validation of the --gather_precision=bf16 error budget (round-1
    verdict: the budget was previously argued only from random init)."""
    from jax.experimental.pallas import tpu as pltpu

    from interpret_quality_tpu.config import set_gather_value_parts

    tm = _build_torch_model("dgcnn")
    variables = convert_state_dict("dgcnn", tm.state_dict())
    pc = clouds[:, :256]
    model = build_model("dgcnn", num_classes=10, k=8)
    ref = jax.jit(lambda v, x: model.apply(v, x, train=False, fused=False))(
        variables, jnp.asarray(pc))
    try:
        set_gather_value_parts(1)
        with pltpu.force_tpu_interpret_mode():
            out = jax.jit(
                lambda v, x: model.apply(v, x, train=False, fused=True))(
                variables, jnp.asarray(pc))
    finally:
        set_gather_value_parts(1)
    scale = float(np.abs(np.asarray(ref)).max())
    dev = float(np.abs(np.asarray(out) - np.asarray(ref)).max())
    assert dev < 0.02 * scale, (dev, scale)


def test_t7_checkpoint_roundtrip(clouds, tmp_path):
    """A torch-saved state dict (.t7, the reference's published-checkpoint
    format — main_cls_seed.py:202-209) loads through load_checkpoint and
    reproduces the torch logits."""
    import torch

    from interpret_quality_tpu.models.checkpoint import load_checkpoint
    from interpret_quality_tpu.models.registry import init_model

    tm = _build_torch_model("dgcnn")
    path = tmp_path / "model_best.t7"
    torch.save({"module." + k: v for k, v in tm.state_dict().items()},
               str(path))
    model = build_model("dgcnn", num_classes=10, k=20)
    template = init_model(model, jax.random.PRNGKey(0), num_points=N)
    variables = load_checkpoint("dgcnn", str(path), template)
    got = _flax_logits("dgcnn", variables, clouds)
    np.testing.assert_allclose(got, _torch_logits(tm, clouds),
                               **TOLS["dgcnn"])


def test_module_prefix_stripped(clouds):
    """DataParallel 'module.'-prefixed checkpoints convert identically
    (reference tools/final_util.py:250-262)."""
    tm = _build_torch_model("pointnet")
    state = {"module." + k: v for k, v in tm.state_dict().items()}
    variables = convert_state_dict("pointnet", state)
    got = _flax_logits("pointnet", variables, clouds)
    np.testing.assert_allclose(got, _torch_logits(tm, clouds),
                               **TOLS["pointnet"])


@pytest.mark.parametrize("name",
                         ["pointnet", "pointnet2", "pointconv", "dgcnn",
                          "gcnn"])
def test_export_roundtrip_bitexact(name):
    """convert_state_dict -> export_state_dict round-trips every tensor
    bit-exactly and loads back with torch strict=True, so TPU-trained
    weights can be run through the reference tooling."""
    import torch

    from interpret_quality_tpu.models.torch_convert import export_state_dict

    tm = _build_torch_model(name, seed=5)
    ref_state = tm.state_dict()
    variables = convert_state_dict(name, ref_state)
    back = export_state_dict(name, variables, ref_state)

    assert set(back) == set(ref_state)
    for k in ref_state:
        np.testing.assert_array_equal(back[k],
                                      ref_state[k].detach().cpu().numpy(),
                                      err_msg=k)
    tm.load_state_dict({k: torch.from_numpy(np.asarray(v))
                        for k, v in back.items()}, strict=True)


def test_export_handles_module_prefix(tmp_path):
    """DataParallel-style 'module.'-prefixed templates export with the
    prefix, and save_t7 writes a loadable torch file."""
    import torch

    from interpret_quality_tpu.models.torch_convert import save_t7

    tm = _build_torch_model("pointnet", seed=6)
    prefixed = {"module." + k: v for k, v in tm.state_dict().items()}
    variables = convert_state_dict("pointnet", prefixed)
    path = str(tmp_path / "exported.t7")
    save_t7("pointnet", variables, path, prefixed)
    loaded = torch.load(path, map_location="cpu")
    assert all(k.startswith("module.") for k in loaded)
    np.testing.assert_array_equal(
        loaded["module.fc3.weight"].numpy(),
        prefixed["module.fc3.weight"].detach().numpy())
