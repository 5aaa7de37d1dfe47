"""The selection-sweep implementations must be interchangeable.

``two_pass`` (row min + tie-break min) and ``argmin`` (single variadic
reduce) are exact with `jax.lax.top_k` tie semantics; ``packed`` embeds the
column index in the low mantissa bits and runs one int32 min-reduce per
neighbour — exact except that distances equal after dropping those bits
(≲2^-13 relative) become lowest-index ties (ops/pallas/neighbors.
knn_select_impl).  The variants exist as a hardware A/B for VPU passes per
selected neighbour (IQTPU_KNN_SELECT).

Heavy distance ties are the production case: masked-coalition clouds
collapse whole regions onto the centre point.  The fixtures are seed-pinned;
for ``packed``, randn-generated non-tie gaps exceed the 2^-13 truncation
unit at these sizes, so agreement with the exact sweeps is deterministic
(exact duplicates tie identically: equal truncated bits -> lowest index).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from interpret_quality_tpu.ops.pallas import (knn_gather_extrema, knn_pallas,
                                              knn_with_density)

B, N, C, F, K = 2, 64, 4, 8, 7

VARIANTS = ["argmin", "packed", "succ", "hier"]


@pytest.fixture(scope="module")
def tied_cloud():
    rng = np.random.RandomState(3)
    base = rng.randn(B, 16, C).astype(np.float32)
    return jnp.asarray(np.concatenate([base] * 4, axis=1))   # 4-way ties


@pytest.mark.parametrize("variant", VARIANTS)
def test_knn_pallas_select_impls_agree(tied_cloud, variant):
    xs = tied_cloud
    a = np.asarray(knn_pallas(xs, xs, K, select="two_pass", interpret=True))
    b = np.asarray(knn_pallas(xs, xs, K, select=variant, interpret=True))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("variant", VARIANTS)
def test_extrema_select_impls_agree(tied_cloud, variant):
    xs = tied_cloud
    rng = np.random.RandomState(4)
    a = jnp.asarray(rng.randn(B, N, F).astype(np.float32))
    m1 = knn_gather_extrema(xs, a, K, parts=2, select="two_pass",
                            interpret=True)
    m2 = knn_gather_extrema(xs, a, K, parts=2, select=variant,
                            interpret=True)
    for x, y in zip(m1, m2):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("variant", VARIANTS)
def test_knn_with_density_select_impls_agree(tied_cloud, variant):
    xs = tied_cloud[..., :3]
    q = xs[:, :32]
    rng = np.random.RandomState(5)
    inv = jnp.asarray(rng.rand(B, N).astype(np.float32))
    r1 = knn_with_density(q, xs, inv, K, select="two_pass", interpret=True)
    r2 = knn_with_density(q, xs, inv, K, select=variant, interpret=True)
    for x, y in zip(r1, r2):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_packed_tie_break_is_lowest_index():
    """Distances that collide only after low-bit truncation break to the
    lowest index under ``packed`` — the documented (and only) deviation."""
    db = np.zeros((1, 8, 1), np.float32)
    # the LARGER of the near-equal pair sits at the LOWER index, so exact
    # ordering would return [2, 3, 1, 0] while packed's truncation merges
    # the pair into a tie and breaks it to the lowest index: [2, 3, 0, 1]
    db[0, :, 0] = [np.nextafter(np.float32(5.0), np.float32(6.0)), 5.0,
                   1.0, 2.0, 7.0, 8.0, 9.0, 10.0]
    q = np.zeros((1, 8, 1), np.float32)
    exact = np.asarray(knn_pallas(jnp.asarray(q), jnp.asarray(db), 4,
                                  select="two_pass", interpret=True))
    np.testing.assert_array_equal(exact[0, 0], [2, 3, 1, 0])
    idx = np.asarray(knn_pallas(jnp.asarray(q), jnp.asarray(db), 4,
                                select="packed", interpret=True))
    np.testing.assert_array_equal(idx[0, 0], [2, 3, 0, 1])


def test_nq_layout_matches_qn(tied_cloud):
    """The transposed (N, Q) extrema kernel must reproduce the (Q, N)
    default exactly (same packed tie class) for both sweep styles."""
    from interpret_quality_tpu.ops.pallas.neighbors import _knn_gather_extrema
    xs = tied_cloud
    rng = np.random.RandomState(6)
    a = jnp.asarray(rng.randn(B, N, F).astype(np.float32))
    ref = _knn_gather_extrema(xs, a, K, block_q=32, parts=2,
                              select="packed", layout="qn", interpret=True)
    for select in ("packed", "succ"):
        got = _knn_gather_extrema(xs, a, K, block_q=32, parts=2,
                                  select=select, layout="nq", interpret=True)
        for x, y in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
