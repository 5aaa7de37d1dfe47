"""Model-level tests: shapes, eval-mode determinism, batch independence
(critical for attribution correctness: with running-stats BN, each row of a
coalition mega-batch must be independent of the others), and structural
invariants of each architecture.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from interpret_quality_tpu.models import (
    build_model, init_model, make_forward_fn, feature_transform_regularizer,
)

MODELS = ["pointnet", "pointnet2", "pointconv", "dgcnn", "gcnn"]
N = 128  # small clouds keep CPU compile fast; all models are N-agnostic


def _make(name, seed=0):
    model = build_model(name, num_classes=10)
    variables = init_model(model, jax.random.PRNGKey(seed), num_points=N)
    return model, variables


@pytest.mark.parametrize("name", MODELS)
def test_forward_shape_and_determinism(name):
    model, variables = _make(name)
    fwd = make_forward_fn(model, variables)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, N, 3))
    y1 = fwd(x)
    y2 = fwd(x)
    assert y1.shape == (3, 10)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert np.isfinite(np.asarray(y1)).all()


@pytest.mark.parametrize("name", MODELS)
def test_batch_independence(name):
    """Row b of a batch must not depend on the other rows in eval mode."""
    model, variables = _make(name)
    fwd = jax.jit(make_forward_fn(model, variables))
    x = jax.random.normal(jax.random.PRNGKey(2), (4, N, 3))
    full = np.asarray(fwd(x))
    # swap in different companions for row 0
    x2 = jnp.concatenate([x[:1], x[::-1][:3]], axis=0)
    alone = np.asarray(fwd(x2))
    np.testing.assert_allclose(full[0], alone[0], rtol=2e-4, atol=2e-4)


def test_pointnet_returns_tuple():
    model, variables = _make("pointnet")
    x = jax.random.normal(jax.random.PRNGKey(3), (2, N, 3))
    logits, trans_feat, crt = model.apply(variables, x, train=False)
    assert logits.shape == (2, 10)
    assert trans_feat.shape == (2, 64, 64)
    assert crt.shape == (2, 1024)
    # regularizer is 0 for exact orthonormal transforms
    reg = feature_transform_regularizer(jnp.eye(64)[None])
    assert float(reg) < 1e-5


def test_pointnet_permutation_invariance():
    """Global max-pool makes PointNet invariant to point re-ordering."""
    model, variables = _make("pointnet")
    fwd = make_forward_fn(model, variables)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, N, 3))
    perm = jax.random.permutation(jax.random.PRNGKey(5), N)
    y1 = np.asarray(fwd(x))
    y2 = np.asarray(fwd(x[:, perm, :]))
    np.testing.assert_allclose(y1, y2, rtol=1e-4, atol=1e-4)


def test_gcnn_differs_from_dgcnn_structurally():
    """With identical params, GCNN (fixed graph) and DGCNN (dynamic graph)
    agree on layer 1 but diverge overall for generic inputs."""
    dg, dgv = _make("dgcnn", seed=7)
    gc = build_model("gcnn", num_classes=10)
    # share the same parameter pytree (architectures are identical)
    y_dg = np.asarray(make_forward_fn(dg, dgv)(jax.random.normal(
        jax.random.PRNGKey(8), (1, N, 3))))
    y_gc = np.asarray(make_forward_fn(gc, dgv)(jax.random.normal(
        jax.random.PRNGKey(8), (1, N, 3))))
    assert y_dg.shape == y_gc.shape
    assert not np.allclose(y_dg, y_gc)


def test_train_mode_updates_batch_stats():
    model, variables = _make("pointnet")
    x = jax.random.normal(jax.random.PRNGKey(9), (2, N, 3))
    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(10)})
    old = variables["batch_stats"]["feat"]["conv1"]["bn"]["mean"]
    new = mutated["batch_stats"]["feat"]["conv1"]["bn"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))
