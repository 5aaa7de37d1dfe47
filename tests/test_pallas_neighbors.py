"""Fused neighbour-kernel parity vs the XLA geometry ops (CPU interpret mode).

The Pallas kernels must reproduce `jax.lax.top_k` selection semantics exactly
(including lowest-index tie breaks — masked-coalition clouds collapse whole
regions onto the centre point, so exact distance ties are the common case,
not the corner case) and gather values to ~2^-16 relative (bf16 hi/lo pair).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from interpret_quality_tpu.models import build_model, init_model
from interpret_quality_tpu.ops.geometry import index_points, knn
from interpret_quality_tpu.ops.pallas import (gather_extrema,
                                              knn_gather_extrema, knn_pallas)

B, N, C, F, K = 3, 64, 5, 16, 7


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    a = jnp.asarray(rng.randn(B, N, F).astype(np.float32))
    return xs, a


def test_knn_pallas_matches_topk(data):
    xs, _ = data
    idx_ref = np.asarray(knn(xs, K))
    idx_pal = np.asarray(knn_pallas(xs, xs, K, interpret=True))
    np.testing.assert_array_equal(idx_ref, idx_pal)


def test_knn_pallas_tie_semantics():
    # every point duplicated 8x: distance ties everywhere
    rng = np.random.RandomState(1)
    base = rng.randn(B, 8, C).astype(np.float32)
    xs = jnp.asarray(np.concatenate([base] * 8, axis=1))
    idx_ref = np.asarray(knn(xs, K))
    idx_pal = np.asarray(knn_pallas(xs, xs, K, interpret=True))
    np.testing.assert_array_equal(idx_ref, idx_pal)


def test_knn_pallas_separate_query():
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(B, 32, C).astype(np.float32))
    db = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    from interpret_quality_tpu.ops.geometry import knn_point
    idx_ref = np.asarray(knn_point(K, db, q))
    idx_pal = np.asarray(knn_pallas(q, db, K, interpret=True))
    np.testing.assert_array_equal(idx_ref, idx_pal)


def test_knn_gather_extrema_matches_oracle(data):
    xs, a = data
    g = index_points(a, knn(xs, K))                  # (B, N, K, F)
    amax, amin = knn_gather_extrema(xs, a, K, parts=2, interpret=True)
    np.testing.assert_allclose(np.asarray(amax), np.asarray(g.max(axis=2)),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(amin), np.asarray(g.min(axis=2)),
                               atol=5e-5)


def test_gather_extrema_matches_oracle(data):
    xs, a = data
    rng = np.random.RandomState(3)
    idx = jnp.asarray(rng.randint(0, N, (B, N, K)).astype(np.int32))
    g = index_points(a, idx)
    amax, amin = gather_extrema(idx, a, parts=2, interpret=True)
    np.testing.assert_allclose(np.asarray(amax), np.asarray(g.max(axis=2)),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(amin), np.asarray(g.min(axis=2)),
                               atol=5e-5)


def test_gather_extrema_parts1_tolerance(data):
    """parts=1 (single bf16) gathers: exact selection, values to ~2^-9."""
    xs, a = data
    g = index_points(a, knn(xs, K))
    tol = float(jnp.max(jnp.abs(a))) * 2.0 ** -8
    amax, amin = knn_gather_extrema(xs, a, K, parts=1, interpret=True)
    np.testing.assert_allclose(np.asarray(amax), np.asarray(g.max(axis=2)),
                               atol=tol)
    np.testing.assert_allclose(np.asarray(amin), np.asarray(g.min(axis=2)),
                               atol=tol)
    rng = np.random.RandomState(3)
    idx = jnp.asarray(rng.randint(0, N, (B, N, K)).astype(np.int32))
    g = index_points(a, idx)
    amax, amin = gather_extrema(idx, a, parts=1, interpret=True)
    np.testing.assert_allclose(np.asarray(amax), np.asarray(g.max(axis=2)),
                               atol=tol)
    np.testing.assert_allclose(np.asarray(amin), np.asarray(g.min(axis=2)),
                               atol=tol)


@pytest.mark.parametrize("name", ["dgcnn", "gcnn"])
def test_fused_model_path_matches_xla(name):
    """Full DGCNN/GCNN forward: fused Pallas path vs XLA path."""
    from jax.experimental.pallas import tpu as pltpu

    from interpret_quality_tpu.config import set_gather_value_parts

    model = build_model(name, num_classes=10, k=4)
    variables = init_model(model, jax.random.PRNGKey(0), num_points=64)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    apply_ref = jax.jit(
        lambda v, x: model.apply(v, x, train=False, fused=False))
    apply_fused = jax.jit(
        lambda v, x: model.apply(v, x, train=False, fused=True))
    ref = apply_ref(variables, x)
    try:
        set_gather_value_parts(2)                    # hi/lo: ~2^-16 values
        with pltpu.force_tpu_interpret_mode():
            out = apply_fused(variables, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-4)
        set_gather_value_parts(1)                    # default: plain bf16
        with pltpu.force_tpu_interpret_mode():
            out = jax.jit(lambda v, x: model.apply(
                v, x, train=False, fused=True))(variables, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=4e-2, atol=4e-3)
    finally:
        set_gather_value_parts(1)


def test_gather_rows_matches_oracle(data):
    from interpret_quality_tpu.ops.pallas import gather_rows
    _, a = data
    rng = np.random.RandomState(6)
    idx = jnp.asarray(rng.randint(0, N, (B, 24, 5)).astype(np.int32))
    ref = index_points(a, idx)                       # (B, 24, 5, F)
    out = gather_rows(a, idx, parts=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_fused_pointconv_matches_xla():
    """Fused kNN + hoisted-layer gather path vs the XLA path."""
    from jax.experimental.pallas import tpu as pltpu

    from interpret_quality_tpu.config import set_gather_value_parts

    model = build_model("pointconv", num_classes=10)
    variables = init_model(model, jax.random.PRNGKey(0), num_points=256)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32))
    apply_ref = jax.jit(
        lambda v, x: model.apply(v, x, train=False, fused=False))
    apply_fused = jax.jit(
        lambda v, x: model.apply(v, x, train=False, fused=True))
    ref = apply_ref(variables, x)
    try:
        set_gather_value_parts(2)                    # hi/lo: ~2^-16 values
        with pltpu.force_tpu_interpret_mode():
            out = apply_fused(variables, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
        set_gather_value_parts(1)                    # default: plain bf16
        # xyz rides hi/lo planes regardless of `parts`, so the WeightNet
        # offsets stay exact; only the bf16 feature rounding remains
        # (measured max rel 1.6e-3 on bias-nudged random init)
        with pltpu.force_tpu_interpret_mode():
            out = jax.jit(lambda v, x: model.apply(
                v, x, train=False, fused=True))(variables, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=5e-3, atol=5e-3)
    finally:
        set_gather_value_parts(1)


def test_fused_pointnet2_matches_xla():
    """Fused ball-query + grouped-MLP SA path vs the XLA gather path."""
    from jax.experimental.pallas import tpu as pltpu

    from interpret_quality_tpu.config import set_gather_value_parts

    model = build_model("pointnet2", num_classes=10)
    variables = init_model(model, jax.random.PRNGKey(0), num_points=256)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32))
    apply_ref = jax.jit(
        lambda v, x: model.apply(v, x, train=False, fused=False))
    apply_fused = jax.jit(
        lambda v, x: model.apply(v, x, train=False, fused=True))
    ref = apply_ref(variables, x)
    try:
        set_gather_value_parts(2)                    # hi/lo: ~2^-16 values
        with pltpu.force_tpu_interpret_mode():
            out = apply_fused(variables, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-6)
        set_gather_value_parts(1)                    # default: plain bf16
        # the xyz-offset half of layer 1 is gathered exactly in-kernel, so
        # only the hoisted feature planes round (measured max abs 5e-6)
        with pltpu.force_tpu_interpret_mode():
            out = jax.jit(lambda v, x: model.apply(
                v, x, train=False, fused=True))(variables, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=5e-3, atol=1e-4)
    finally:
        set_gather_value_parts(1)
