"""Engine-level Shapley parity vs the reference implementation itself.

test_parity_torch.py proves the *models* match under converted weights;
this proves the *attribution algorithm* matches: the reference's own
`shap_sampling_all_regions_batch` (tools/final_common.py:64-103, run
torch-CPU, imported read-only from /root/reference) and our ShapleyEngine
are fed identical weights, cloud, region partition and permutations, and
must produce the same per-region Shapley values, the same saved-logits
rows (reference row layout: order-major, coalition row 0 = full cloud),
and the same sign convention (dv = v(j masked) − v(j−1 masked)).

Skips when the reference tree is absent.  PointNet keeps the oracle cheap
and selection-free (no neighbour ties), so remaining deltas are pure
accumulation precision.
"""
import os
import types

import numpy as np
import pytest

import jax

import conftest

pytestmark = pytest.mark.skipif(
    not conftest.HAS_REFERENCE,
    reason="reference tree not available for parity oracle")
_ref_module = conftest.ref_module

N, R, S, BS = 1024, 32, 4, 2


@pytest.fixture(scope="module", autouse=True)
def fp32_matmuls():
    with conftest.fp32_matmuls_ctx():
        yield


def _ref_engine():
    return _ref_module("tools.final_common")


def test_shapley_values_match_reference_engine():
    import torch

    from test_parity_torch import _build_torch_model

    from interpret_quality_tpu.attrib import ShapleyEngine
    from interpret_quality_tpu.data.datasets import (
        SyntheticClouds, farthest_point_sample_np)
    from interpret_quality_tpu.models import build_model, make_forward_fn
    from interpret_quality_tpu.models.torch_convert import convert_state_dict

    fc = _ref_engine()

    cloud, _ = SyntheticClouds(num_samples=1, num_points=N)[0]
    cloud = np.asarray(cloud, np.float32)
    centers = farthest_point_sample_np(cloud, R)
    region_id = ((cloud[:, None, :] - cloud[centers][None, :, :]) ** 2
                 ).sum(-1).argmin(axis=1).astype(np.int64)
    rng = np.random.RandomState(7)
    orders = np.stack([rng.permutation(R) for _ in range(S)])
    label = 3

    # ---- reference: torch-CPU, its own masking loop + reward ----------
    tm = _build_torch_model("pointnet")
    ref_args = types.SimpleNamespace(
        model="pointnet", num_points=N, num_regions=R,
        shapley_batch_size=BS, num_samples=S, softmax_type="modified")
    with torch.no_grad():
        ref_sv, ref_logits = fc.shap_sampling_all_regions_batch(
            tm, torch.from_numpy(cloud[None]), torch.tensor([label]),
            region_id, orders, ref_args)
    ref_logits = ref_logits.numpy()

    # ---- ours: converted weights, keep-matrix engine -------------------
    variables = convert_state_dict("pointnet", tm.state_dict())
    model = build_model("pointnet", num_classes=10, k=20)
    fwd = make_forward_fn(model, variables)
    engine = ShapleyEngine(fwd, num_regions=R, softmax_type="modified",
                           batch_orders=BS)
    sv, logits = engine.shapley_for_pose(cloud, label, region_id, orders,
                                         return_logits=True)

    assert ref_logits.shape == logits.shape == (S * (R + 1), 10)
    np.testing.assert_allclose(logits, ref_logits, rtol=1e-3, atol=2e-4)
    # Shapley values are means over S of differences of log-odds rewards;
    # same sign convention and same permutation-to-row bookkeeping.
    np.testing.assert_allclose(sv, ref_sv, rtol=1e-3, atol=2e-4)
    # sanity: the estimate is non-degenerate (random-init log-odds move
    # little under masking; ~1e-4..1e-3 is the observed scale)
    assert np.abs(ref_sv).max() > 1e-4



@pytest.mark.parametrize("name,mode_name,n_points", [
    ("pointnet2", "trans", 1024),   # certifies the ~0.0018 trans-sensitivity
                                    # outlier as architecture-real (PointNet++
                                    # groups by relative offsets)
    ("dgcnn", "rotate", 512),
    ("gcnn", "rotate", 512),    # gcnn_adv tables load this architecture
    ("pointconv", "trans", 512),
])
def test_enum_pose_matches_reference_engine(name, mode_name, n_points):
    """One perturbation-enumeration pose, reference vs both our enum paths.

    The reference enum loop disturbs the cloud THEN masks to the disturbed
    cloud's centre (tools/final_common.py:158-165 + final_trans/
    rotate_center_enum_all.py); our engine masks the canonical cloud once
    and transforms the masked batch (enum_all_poses), or additionally
    reuses the canonical graph plan across poses (enum_all_poses_plan).
    Masking commutes with the rigid transform and the graphs are
    pose-invariant, so all three must agree — this pins the graph-model
    enum paths (round-2 verdict: engine parity ran pointnet only, so a
    masking/centering bug specific to pointnet2/dgcnn would not be caught).
    """
    import torch

    from test_parity_torch import _build_torch_model

    from interpret_quality_tpu.attrib import ShapleyEngine
    from interpret_quality_tpu.attrib.perturbations import MODES
    from interpret_quality_tpu.data.datasets import (
        SyntheticClouds, farthest_point_sample_np)
    from interpret_quality_tpu.models import build_model, make_forward_fn
    from interpret_quality_tpu.models.torch_convert import convert_state_dict
    import jax.numpy as jnp

    fc = _ref_engine()
    S_, BS_ = 2, 2
    cloud, _ = SyntheticClouds(num_samples=1, num_points=n_points)[0]
    cloud = np.asarray(cloud, np.float32)
    centers = farthest_point_sample_np(cloud, R)
    region_id = ((cloud[:, None, :] - cloud[centers][None, :, :]) ** 2
                 ).sum(-1).argmin(axis=1).astype(np.int64)
    rng = np.random.RandomState(13)
    orders = np.stack([rng.permutation(R) for _ in range(S_)])
    label = 3
    mode = MODES[mode_name]
    params = (np.array([[0.12, -0.31, 0.2]], np.float32)
              if mode_name == "trans"
              else np.array([[0.4, -0.3, 0.25]], np.float32))

    # ---- reference: transform-then-mask on torch-CPU --------------------
    disturbed = np.asarray(mode.disturb_fn(jnp.asarray(cloud),
                                           jnp.asarray(params[0])),
                           np.float32)
    tm = _build_torch_model(name)
    ref_args = types.SimpleNamespace(
        model=name, num_points=n_points, num_regions=R,
        shapley_batch_size=BS_, num_samples=S_, softmax_type="modified")
    with torch.no_grad():
        ref_sv, ref_logits = fc.shap_sampling_all_regions_batch(
            tm, torch.from_numpy(disturbed[None]), torch.tensor([label]),
            region_id, orders, ref_args)
    ref_logits = ref_logits.numpy()

    # ---- ours: mask-then-transform, per-pose graph and plan reuse -------
    variables = convert_state_dict(name, tm.state_dict())
    model = build_model(name, num_classes=10, k=20)
    fwd = make_forward_fn(model, variables)
    engine = ShapleyEngine(fwd, num_regions=R, softmax_type="modified",
                           batch_orders=BS_)
    disturb_batch = jax.jit(jax.vmap(mode.disturb_fn, in_axes=(None, 0)))
    sv, logits = engine.enum_all_poses(
        disturb_batch, jnp.asarray(cloud), params, label, region_id,
        orders, pose_chunk=1, return_logits=True)
    sv_plan, logits_plan = engine.enum_all_poses_plan(
        mode.disturb_fn, jnp.asarray(cloud), params, label, region_id,
        orders, fwd.plan_fn, fwd.apply_plan_fn, return_logits=True)

    # per-architecture tolerances follow test_parity_torch.TOLS: pointnet2
    # (ball query) and pointconv (kNN + KDE density) can flip boundary
    # neighbours on ~1e-6 distance deltas, so their atol stays at the
    # model-parity 1e-3 instead of the tighter selection-free bound
    # (ADVICE r3).
    tol = (dict(rtol=2e-3, atol=1e-3) if name in ("pointnet2", "pointconv")
           else dict(rtol=2e-3, atol=5e-4))
    assert ref_logits.shape == logits.shape[1:] == (S_ * (R + 1), 10)
    for got_sv, got_logits in ((sv, logits), (sv_plan, logits_plan)):
        np.testing.assert_allclose(got_logits[0], ref_logits, **tol)
        np.testing.assert_allclose(got_sv[0], ref_sv, **tol)


def test_interactions_match_reference_engine():
    """Reference compute_order_interaction_logits + compute_order_interaction
    (final_point_binary_interaction_logits.py:15-70,
    final_cal_interactions.py:14-39) vs our InteractionEngine +
    compute_order_interaction on identical weights/pairs/contexts: the
    quadruple row order [S∪{i,j}, S∪{i}, S∪{j}, S], the centre-masking and
    the I-score must all match."""
    import torch

    from test_parity_torch import _build_torch_model

    from interpret_quality_tpu.attrib.interactions import (
        InteractionEngine, compute_order_interaction)
    from interpret_quality_tpu.data.datasets import (
        SyntheticClouds, farthest_point_sample_np)
    from interpret_quality_tpu.models import build_model, make_forward_fn
    from interpret_quality_tpu.models.torch_convert import convert_state_dict

    ref_logits_mod = _ref_module("final_point_binary_interaction_logits")
    ref_cal_mod = _ref_module("final_cal_interactions")

    cloud, _ = SyntheticClouds(num_samples=1, num_points=N)[0]
    cloud = np.asarray(cloud, np.float32)
    centers = farthest_point_sample_np(cloud, R)
    region_id = ((cloud[:, None, :] - cloud[centers][None, :, :]) ** 2
                 ).sum(-1).argmin(axis=1).astype(np.int64)
    label = 3

    P, C, m = 3, 4, 5
    rng = np.random.RandomState(11)
    pairs = np.stack([rng.choice(R, 2, replace=False) for _ in range(P)])
    contexts = np.stack([
        np.stack([rng.choice([r for r in range(R) if r not in pairs[p]],
                             m, replace=False) for _ in range(C)])
        for p in range(P)])                                 # (P, C, m)

    tm = _build_torch_model("pointnet")
    ref_args = types.SimpleNamespace(
        model="pointnet", num_points=N, num_regions=R,
        interaction_batch_size=3,       # non-divisor: ragged final batch
        softmax_type="modified")
    with torch.no_grad():
        ref_logits = ref_logits_mod.compute_order_interaction_logits(
            tm, torch.from_numpy(cloud[None]), region_id, pairs, contexts,
            ref_args)
        ref_scores = ref_cal_mod.compute_order_interaction(
            ref_logits, torch.tensor([label]), ref_args)
    ref_logits = ref_logits.numpy()

    variables = convert_state_dict("pointnet", tm.state_dict())
    model = build_model("pointnet", num_classes=10, k=20)
    fwd = make_forward_fn(model, variables)
    engine = InteractionEngine(fwd, num_regions=R, batch_contexts=5)
    logits = engine.logits_for_pairs(cloud, region_id, pairs, contexts)

    assert logits.shape == ref_logits.shape == (P, 4 * C, 10)
    np.testing.assert_allclose(logits, ref_logits, rtol=1e-3, atol=2e-4)
    scores = compute_order_interaction(logits, label, "modified")
    assert scores.shape == ref_scores.shape == (P, C)
    np.testing.assert_allclose(scores, ref_scores, rtol=1e-3, atol=2e-4)


def test_norm_factor_matches_reference_definition():
    """norm_factor = v(full) − v(all-masked) (final_shapley_value.py):
    check our norm_factor() against the reference reward on the same
    torch-converted model."""
    import torch

    from test_parity_torch import _build_torch_model

    from interpret_quality_tpu.attrib.shapley import norm_factor
    from interpret_quality_tpu.data.datasets import SyntheticClouds
    from interpret_quality_tpu.models import build_model, make_forward_fn
    from interpret_quality_tpu.models.torch_convert import convert_state_dict

    fc = _ref_engine()

    cloud, _ = SyntheticClouds(num_samples=1, num_points=N)[0]
    cloud = np.asarray(cloud, np.float32)
    label = 3
    tm = _build_torch_model("pointnet")
    args = types.SimpleNamespace(model="pointnet", softmax_type="modified")
    t = torch.from_numpy(cloud[None])
    center = t.mean(dim=1, keepdim=True).expand_as(t)
    with torch.no_grad():
        v_full, _ = fc.cal_reward(tm, t, torch.tensor([label]), args)
        v_empty, _ = fc.cal_reward(tm, center.contiguous(),
                                   torch.tensor([label]), args)
    ref_nf = float(v_full[0] - v_empty[0])

    variables = convert_state_dict("pointnet", tm.state_dict())
    model = build_model("pointnet", num_classes=10, k=20)
    fwd = make_forward_fn(model, variables)
    nf = float(norm_factor(fwd, cloud, label, softmax_type="modified"))
    np.testing.assert_allclose(nf, ref_nf, rtol=1e-3, atol=2e-4)
