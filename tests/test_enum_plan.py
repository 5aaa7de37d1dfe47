"""Pose-invariant graph-plan enumeration: factored == per-pose recompute.

`ShapleyEngine.enum_all_poses_plan` builds each graph model's grouping plan
(models/plans.py) ONCE per order chunk from the canonical masked batch and
reuses it across poses; `enum_all_poses` rebuilds the graph inside every
forward.  Masking commutes with the rigid/scale transforms and the graphs
are pose-invariant (plans.py module docstring), so the two paths must agree
to floating-point noise on tie-free clouds.

Runs the XLA (non-fused) model paths on CPU; the Pallas plan variants share
the same selection semantics (tests/test_pallas_neighbors.py).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from interpret_quality_tpu.attrib import ShapleyEngine
from interpret_quality_tpu.attrib.perturbations import MODES
from interpret_quality_tpu.attrib.shapley import region_id_from_fps
from interpret_quality_tpu.models import build_model, init_model, make_forward_fn
from interpret_quality_tpu.models.plans import plan_modes_for
from interpret_quality_tpu.ops.geometry import farthest_point_sample

import jax

N, R, S, BS = 512, 8, 2, 2
POSES = {
    "trans": np.array([[0.0, 0.0, 0.0], [0.12, -0.31, 0.2]], np.float32),
    "rotate": np.array([[0.4, -0.3, 0.2], [-0.5, 0.1, 0.6]], np.float32),
    "scale": np.array([0.7, 1.6], np.float32),
}


def _setup(name):
    model = build_model(name, num_classes=10, k=8)
    variables = init_model(model, jax.random.PRNGKey(0), num_points=N)
    fwd = make_forward_fn(model, variables)
    rng = np.random.RandomState(3)
    cloud = rng.randn(N, 3).astype(np.float32)
    cloud -= cloud.mean(axis=0)
    cloud /= np.sqrt((cloud ** 2).sum(-1)).max()
    fps = np.asarray(farthest_point_sample(jnp.asarray(cloud[None]), R))[0]
    region_id = np.asarray(region_id_from_fps(jnp.asarray(cloud),
                                              jnp.asarray(fps)))
    orders = np.stack([rng.permutation(R) for _ in range(S)])
    engine = ShapleyEngine(fwd, num_regions=R, softmax_type="modified",
                           batch_orders=BS)
    return fwd, engine, cloud, region_id, orders


@pytest.mark.parametrize("name,mode_name", [
    ("dgcnn", "trans"), ("dgcnn", "scale"),
    ("gcnn", "rotate"), ("gcnn", "scale"),
    ("pointnet2", "rotate"), ("pointnet2", "scale"),
    ("pointconv", "trans"), ("pointconv", "rotate"),
])
def test_plan_enum_matches_per_pose_recompute(name, mode_name):
    assert mode_name in plan_modes_for(name)
    fwd, engine, cloud, region_id, orders = _setup(name)
    mode = MODES[mode_name]
    params = POSES[mode_name]
    disturb_batch = jax.jit(jax.vmap(mode.disturb_fn, in_axes=(None, 0)))

    sv_ref, logits_ref = engine.enum_all_poses(
        disturb_batch, jnp.asarray(cloud), params, 1, region_id, orders,
        pose_chunk=1, return_logits=True)
    sv, logits = engine.enum_all_poses_plan(
        mode.disturb_fn, jnp.asarray(cloud), params, 1, region_id, orders,
        fwd.plan_fn, fwd.apply_plan_fn, return_logits=True)

    assert sv.shape == sv_ref.shape == (params.shape[0], R)
    assert logits.shape == logits_ref.shape
    np.testing.assert_allclose(logits, logits_ref, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(sv, sv_ref, rtol=2e-4, atol=1e-5)


def test_plan_modes_exclude_scale_for_pointconv():
    # KDE density values change under uniform scale (plans.py docstring)
    assert "scale" not in plan_modes_for("pointconv")
    assert plan_modes_for("pointnet") == frozenset()


def test_run_enum_uses_plan_path(tmp_path, monkeypatch):
    """run_enum routes (model, mode) pairs with a valid plan through
    enum_all_poses_plan and others through enum_all_poses."""
    from interpret_quality_tpu.attrib import stages
    from interpret_quality_tpu.config import ExperimentConfig

    calls = {}
    orig_plan = ShapleyEngine.enum_all_poses_plan
    orig_raw = ShapleyEngine.enum_all_poses

    def spy_plan(self, *a, **k):
        calls["plan"] = calls.get("plan", 0) + 1
        return orig_plan(self, *a, **k)

    def spy_raw(self, *a, **k):
        calls["raw"] = calls.get("raw", 0) + 1
        return orig_raw(self, *a, **k)

    monkeypatch.setattr(ShapleyEngine, "enum_all_poses_plan", spy_plan)
    monkeypatch.setattr(ShapleyEngine, "enum_all_poses", spy_raw)

    cfg = ExperimentConfig(model="gcnn", dataset="modelnet10",
                           num_points=256, num_samples_save=4, num_samples=2,
                           shapley_batch_size=2,
                           checkpoints_root=str(tmp_path))
    from interpret_quality_tpu.attrib.stages import run_shapley_init
    import os
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        run_shapley_init(cfg, synthetic=True, allow_random_init=True,
                         sample_indices=[0])
        stages.run_enum(cfg, "trans", synthetic=True,
                        allow_random_init=True, sample_indices=[0],
                        max_poses=2)
        assert calls.get("plan", 0) == 1 and "raw" not in calls
        monkeypatch.setenv("IQTPU_ENUM_PLAN", "0")
        stages.run_enum(cfg, "rotate", synthetic=True,
                        allow_random_init=True, sample_indices=[0],
                        max_poses=2)
        assert calls.get("raw", 0) == 1
    finally:
        os.chdir(cwd)
