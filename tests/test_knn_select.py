"""The two selection-sweep implementations must be interchangeable.

``two_pass`` (row min + tie-break min) and ``argmin`` (single variadic
reduce) are both exact with `jax.lax.top_k` tie semantics; they exist only
as a hardware A/B for VPU passes per selected neighbour
(IQTPU_KNN_SELECT, ops/pallas/neighbors.knn_select_impl).  Heavy distance
ties are the production case: masked-coalition clouds collapse whole
regions onto the centre point.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from interpret_quality_tpu.ops.pallas import (knn_gather_extrema, knn_pallas,
                                              knn_with_density)

B, N, C, F, K = 2, 64, 4, 8, 7


@pytest.fixture(scope="module")
def tied_cloud():
    rng = np.random.RandomState(3)
    base = rng.randn(B, 16, C).astype(np.float32)
    return jnp.asarray(np.concatenate([base] * 4, axis=1))   # 4-way ties


def test_knn_pallas_select_impls_agree(tied_cloud):
    xs = tied_cloud
    a = np.asarray(knn_pallas(xs, xs, K, select="two_pass", interpret=True))
    b = np.asarray(knn_pallas(xs, xs, K, select="argmin", interpret=True))
    np.testing.assert_array_equal(a, b)


def test_extrema_select_impls_agree(tied_cloud):
    xs = tied_cloud
    rng = np.random.RandomState(4)
    a = jnp.asarray(rng.randn(B, N, F).astype(np.float32))
    m1 = knn_gather_extrema(xs, a, K, parts=2, select="two_pass",
                            interpret=True)
    m2 = knn_gather_extrema(xs, a, K, parts=2, select="argmin",
                            interpret=True)
    for x, y in zip(m1, m2):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_knn_with_density_select_impls_agree(tied_cloud):
    xs = tied_cloud[..., :3]
    q = xs[:, :32]
    rng = np.random.RandomState(5)
    inv = jnp.asarray(rng.rand(B, N).astype(np.float32))
    r1 = knn_with_density(q, xs, inv, K, select="two_pass", interpret=True)
    r2 = knn_with_density(q, xs, inv, K, select="argmin", interpret=True)
    for x, y in zip(r1, r2):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
