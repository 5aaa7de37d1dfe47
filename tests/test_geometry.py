"""Unit tests for geometry ops against tiny numpy oracles.

Oracle implementations follow the documented semantics of the reference ops
(first-point-fixed FPS, sort-and-clamp ball query) re-derived here by hand.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from interpret_quality_tpu.ops import (
    square_distance, index_points, farthest_point_sample,
    query_ball_point, knn, knn_point, compute_density,
)


def np_sqdist(a, b):
    return ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)


def test_square_distance_matches_numpy():
    rng = np.random.RandomState(0)
    a = rng.randn(2, 17, 3).astype(np.float32)
    b = rng.randn(2, 9, 3).astype(np.float32)
    got = np.asarray(square_distance(jnp.array(a), jnp.array(b)))
    want = np.stack([np_sqdist(a[i], b[i]) for i in range(2)])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_index_points_gathers():
    rng = np.random.RandomState(1)
    pts = rng.randn(2, 10, 3).astype(np.float32)
    idx = rng.randint(0, 10, size=(2, 4, 5))
    got = np.asarray(index_points(jnp.array(pts), jnp.array(idx)))
    for b in range(2):
        np.testing.assert_array_equal(got[b], pts[b][idx[b]])


def np_fps(xyz, npoint):
    """First-point-fixed FPS oracle (semantics of reference pointnet2.py:45-68)."""
    N = xyz.shape[0]
    centroids = np.zeros(npoint, np.int64)
    distance = np.full(N, 1e10)
    farthest = 0
    for i in range(npoint):
        centroids[i] = farthest
        dist = ((xyz - xyz[farthest]) ** 2).sum(-1)
        distance = np.minimum(distance, dist)
        farthest = int(np.argmax(distance))
    return centroids


def test_fps_matches_oracle():
    rng = np.random.RandomState(2)
    xyz = rng.randn(3, 64, 3).astype(np.float32)
    got = np.asarray(farthest_point_sample(jnp.array(xyz), 8))
    for b in range(3):
        np.testing.assert_array_equal(got[b], np_fps(xyz[b], 8))


def test_fps_first_point_is_zero():
    rng = np.random.RandomState(3)
    xyz = rng.randn(2, 32, 3).astype(np.float32)
    idx = np.asarray(farthest_point_sample(jnp.array(xyz), 4))
    assert (idx[:, 0] == 0).all()


def np_ball_query(radius, K, xyz, new_xyz):
    """Sort-and-clamp oracle (semantics of reference pointnet2.py:70-91)."""
    N = xyz.shape[0]
    S = new_xyz.shape[0]
    d = np_sqdist(new_xyz, xyz)
    gi = np.tile(np.arange(N), (S, 1))
    gi[d > radius ** 2] = N
    gi = np.sort(gi, axis=-1)[:, :K]
    first = np.tile(gi[:, :1], (1, K))
    gi[gi == N] = first[gi == N]
    return gi


def test_ball_query_matches_oracle():
    rng = np.random.RandomState(4)
    xyz = rng.rand(2, 40, 3).astype(np.float32)
    new_xyz = xyz[:, :6]
    got = np.asarray(query_ball_point(0.3, 8, jnp.array(xyz), jnp.array(new_xyz)))
    for b in range(2):
        np.testing.assert_array_equal(got[b], np_ball_query(0.3, 8, xyz[b], new_xyz[b]))


def test_ball_query_centre_included():
    # every query centre is a cloud point, so slot 0 is the centre itself
    rng = np.random.RandomState(5)
    xyz = rng.rand(1, 30, 3).astype(np.float32)
    got = np.asarray(query_ball_point(0.2, 4, jnp.array(xyz), jnp.array(xyz[:, :5])))
    np.testing.assert_array_equal(got[0, :, 0], np.arange(5))


def test_knn_smallest_distances():
    rng = np.random.RandomState(6)
    x = rng.randn(2, 25, 3).astype(np.float32)
    k = 5
    idx = np.asarray(knn(jnp.array(x), k))
    for b in range(2):
        d = np_sqdist(x[b], x[b])
        for n in range(25):
            want = set(np.sort(np.argsort(d[n])[:k]))
            assert set(idx[b, n]) == want
    # self is always the nearest neighbour
    assert (idx[:, :, 0] == np.arange(25)).all()


def test_knn_point_matches_sorted_sets():
    rng = np.random.RandomState(7)
    xyz = rng.randn(1, 30, 3).astype(np.float32)
    q = rng.randn(1, 4, 3).astype(np.float32)
    idx = np.asarray(knn_point(6, jnp.array(xyz), jnp.array(q)))
    d = np_sqdist(q[0], xyz[0])
    for s in range(4):
        assert set(idx[0, s]) == set(np.argsort(d[s])[:6])


def test_compute_density():
    rng = np.random.RandomState(8)
    xyz = rng.randn(2, 16, 3).astype(np.float32)
    bw = 0.1
    got = np.asarray(compute_density(jnp.array(xyz), bw))
    for b in range(2):
        d = np_sqdist(xyz[b], xyz[b])
        g = np.exp(-d / (2 * bw * bw)) / (2.5 * bw)
        np.testing.assert_allclose(got[b], g.mean(-1), rtol=1e-4)


def test_rot_angle_axis_oracle_and_grad():
    """Rodrigues rotation: numpy oracle parity, orthogonality, and finite-
    difference gradient check (replaces the reference's 115-line manual VJP,
    tools/final_util.py:287-401)."""
    import jax
    import jax.numpy as jnp

    from interpret_quality_tpu.ops.transforms import rot_angle_axis

    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 3).astype(np.float32)
    angle = rng.uniform(-1, 1, 2).astype(np.float32)
    theta = rng.uniform(0, np.pi, 2).astype(np.float32)
    phi = rng.uniform(0, 2 * np.pi, 2).astype(np.float32)

    out = np.asarray(rot_angle_axis(jnp.asarray(x), jnp.asarray(angle),
                                    jnp.asarray(theta), jnp.asarray(phi)))
    # numpy Rodrigues oracle
    for b in range(2):
        v = np.array([np.sin(theta[b]) * np.cos(phi[b]),
                      np.sin(theta[b]) * np.sin(phi[b]), np.cos(theta[b])])
        K = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
        R = np.eye(3) + np.sin(angle[b]) * K + (1 - np.cos(angle[b])) * K @ K
        np.testing.assert_allclose(out[b], x[b] @ R.T, rtol=1e-5, atol=1e-5)
        # norms preserved
        np.testing.assert_allclose(np.linalg.norm(out[b], axis=1),
                                   np.linalg.norm(x[b], axis=1),
                                   rtol=1e-5, atol=1e-5)

    # finite-difference gradient check on the angle
    def loss(a):
        return jnp.sum(rot_angle_axis(jnp.asarray(x), a, jnp.asarray(theta),
                                      jnp.asarray(phi)) ** 2 * 0.1)

    g = np.asarray(jax.grad(loss)(jnp.asarray(angle)))
    eps = 1e-3
    for b in range(2):
        ap = angle.copy(); ap[b] += eps
        am = angle.copy(); am[b] -= eps
        fd = (float(loss(jnp.asarray(ap))) - float(loss(jnp.asarray(am)))) / (2 * eps)
        np.testing.assert_allclose(g[b], fd, rtol=5e-2, atol=1e-3)


# ---------------------------------------------------------------------------
# Perturbation grids: exact parity with the reference's construction
# ---------------------------------------------------------------------------
def test_trans_grid_matches_reference_construction():
    """6^3 meshgrid in [-0.5, 0.5]^3, rows beyond the L2 ball projected back
    (reference final_trans_center_enum_all.py:24-43)."""
    from interpret_quality_tpu.attrib.perturbations import MODES
    got = np.asarray(MODES["trans"].generate_params())
    t = 0.5
    axes = np.linspace(-t, t, 6)
    X, Y, Z = np.meshgrid(axes, axes, axes, indexing="ij")
    exp = np.stack([X, Y, Z], -1).reshape(-1, 3).astype(np.float32)
    n = np.linalg.norm(exp, axis=1, keepdims=True)
    exp = np.where(n > t, exp / n * t, exp)
    assert got.shape == (216, 3)
    np.testing.assert_allclose(got, exp, atol=1e-6)


def test_rotate_grid_matches_reference_construction():
    """6^3 Euler-angle meshgrid in [-pi/4, pi/4]^3
    (reference final_rotate_center_enum_all.py:41-58)."""
    from interpret_quality_tpu.attrib.perturbations import MODES
    got = np.asarray(MODES["rotate"].generate_params())
    t = np.pi / 4
    axes = np.linspace(-t, t, 6)
    X, Y, Z = np.meshgrid(axes, axes, axes, indexing="ij")
    exp = np.stack([X, Y, Z], -1).reshape(-1, 3).astype(np.float32)
    assert got.shape == (216, 3)
    np.testing.assert_allclose(got, exp, atol=1e-6)


def test_scale_grid_matches_reference_construction():
    """30 uniform scales in [0.5, 2.0]
    (reference final_scale_center_enum_all.py:25-31)."""
    from interpret_quality_tpu.attrib.perturbations import MODES
    got = np.asarray(MODES["scale"].generate_params())
    exp = np.linspace(0.5, 2.0, 30).astype(np.float32)
    np.testing.assert_allclose(got.reshape(-1), exp, atol=1e-6)


def test_rotate_xyz_matches_reference_composition():
    """R = Rx @ Ry @ Rz applied as x @ R.T
    (reference final_rotate_center_enum_all.py:15-38)."""
    from interpret_quality_tpu.ops.transforms import rotate_xyz
    rng = np.random.RandomState(0)
    x = rng.randn(1, 50, 3).astype(np.float32)
    ang = np.array([0.3, -0.7, 1.1], np.float32)
    cx, cy, cz = np.cos(ang)
    sx, sy, sz = np.sin(ang)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    exp = x @ (Rx @ Ry @ Rz).T.astype(np.float32)
    got = np.asarray(rotate_xyz(jnp.asarray(x), jnp.asarray(ang)))
    np.testing.assert_allclose(got, exp, atol=1e-5)
