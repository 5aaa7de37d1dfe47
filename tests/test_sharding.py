"""Multi-device equivalence: the same coalition batch computed on one device
and sharded over the 8-device CPU mesh must agree."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from interpret_quality_tpu.attrib import ShapleyEngine
from interpret_quality_tpu.parallel import coalition_sharding, make_mesh


def _toy_forward(region_id, R, center):
    region_id = jnp.asarray(region_id)
    center_j = jnp.asarray(center)

    def forward(x):
        away = jnp.any(jnp.abs(x - center_j) > 1e-3, axis=-1).astype(jnp.float32)
        onehot = jax.nn.one_hot(region_id, R)
        frac = (away @ onehot) / jnp.sum(onehot, axis=0)
        score = frac @ jnp.arange(1.0, R + 1.0)
        return jnp.stack([score, 0.3 * score, jnp.zeros_like(score)], axis=-1)
    return forward


def test_sharded_shapley_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    rng = np.random.RandomState(0)
    N, R, S = 96, 8, 8
    data = rng.randn(N, 3).astype(np.float32) + 3.0
    region_id = rng.randint(0, R, N)
    region_id[:R] = np.arange(R)
    center = data.mean(0)
    orders = np.stack([rng.permutation(R) for _ in range(S)])
    fwd = _toy_forward(region_id, R, center)

    single = ShapleyEngine(fwd, R, batch_orders=8)
    sv1 = single.shapley_for_pose(data, 0, region_id, orders)

    mesh = make_mesh(8)
    sharded = ShapleyEngine(fwd, R, batch_orders=8,
                            coalition_sharding=coalition_sharding(mesh))
    sv8 = sharded.shapley_for_pose(data, 0, region_id, orders)
    np.testing.assert_allclose(sv1, sv8, rtol=1e-5, atol=1e-6)


def test_sharded_multi_pose_matches_single_device():
    rng = np.random.RandomState(1)
    N, R, S, P = 64, 8, 4, 4
    data = rng.randn(N, 3).astype(np.float32) + 3.0
    region_id = rng.randint(0, R, N)
    region_id[:R] = np.arange(R)
    fwd = _toy_forward(region_id, R, data.mean(0))
    orders = np.stack([rng.permutation(R) for _ in range(S)])
    poses = np.stack([data + 0.1 * i for i in range(P)])

    single = ShapleyEngine(fwd, R, batch_orders=4)
    sv1, lg1 = single.shapley_for_poses(poses, 0, region_id, orders)

    mesh = make_mesh(8)
    sharded = ShapleyEngine(fwd, R, batch_orders=4,
                            coalition_sharding=coalition_sharding(mesh))
    sv8, lg8 = sharded.shapley_for_poses(poses, 0, region_id, orders)
    np.testing.assert_allclose(sv1, sv8, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(lg1, lg8, rtol=1e-5, atol=1e-6)


def test_sharded_interaction_engine_matches_single_device():
    """InteractionEngine with coalition sharding: identical logits."""
    from interpret_quality_tpu.attrib.interactions import InteractionEngine

    rng = np.random.RandomState(2)
    N, R, P, C = 64, 8, 6, 4
    data = rng.randn(N, 3).astype(np.float32) + 3.0
    region_id = rng.randint(0, R, N)
    region_id[:R] = np.arange(R)
    fwd = _toy_forward(region_id, R, data.mean(0))
    pair_list = np.stack([rng.choice(R, 2, replace=False) for _ in range(P)])
    context_list = np.stack(
        [[rng.choice([r for r in range(R) if r not in pair], 3,
                     replace=False) for _ in range(C)] for pair in pair_list])

    single = InteractionEngine(fwd, R, batch_contexts=4)
    lg1 = single.logits_for_pairs(data, region_id, pair_list, context_list)

    mesh = make_mesh(8)
    sharded = InteractionEngine(fwd, R, batch_contexts=4,
                                coalition_sharding=coalition_sharding(mesh))
    lg8 = sharded.logits_for_pairs(data, region_id, pair_list, context_list)
    np.testing.assert_allclose(lg1, lg8, rtol=1e-5, atol=1e-6)


def test_dryrun_multichip_entrypoint():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
