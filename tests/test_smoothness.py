"""Smoothness-optimiser tests against host numpy PCA oracles."""
import jax.numpy as jnp
import numpy as np

from interpret_quality_tpu.attrib.smoothness import (
    principal_orientations, region_smoothness_np, smoothness_step,
    update_region)


def _line_cloud(rng, n=40, noise=0.01):
    """Points along a line: high linearity."""
    t = rng.rand(n, 1)
    return (t * np.array([[1.0, 0.2, -0.1]])
            + noise * rng.randn(n, 3)).astype(np.float32)


def test_principal_orientations_orthonormal_and_ordered():
    rng = np.random.RandomState(0)
    pts = rng.randn(50, 3).astype(np.float32) * np.array([3.0, 1.0, 0.2])
    o1, o2, o3 = principal_orientations(pts)
    for o in (o1, o2, o3):
        assert abs(np.linalg.norm(o) - 1) < 1e-5
    v = [np.var(pts @ o, ddof=1) for o in (o1, o2, o3)]
    assert v[0] >= v[1] >= v[2]
    # dominant direction ~ x
    assert abs(o1[0]) > 0.9


def test_region_smoothness_values():
    rng = np.random.RandomState(1)
    line = _line_cloud(rng)
    lin = region_smoothness_np(line, "linearity")
    sca = region_smoothness_np(line, "scattering")
    assert lin > 0.9 and sca < 0.1
    ball = rng.randn(60, 3).astype(np.float32)
    assert region_smoothness_np(ball, "scattering") > 0.3


def test_smoothness_step_moves_objective():
    rng = np.random.RandomState(2)
    N = 64
    cloud = rng.randn(N, 3).astype(np.float32)
    mask = np.zeros(N, np.float32)
    mask[:24] = 1.0
    pts = cloud[:24]
    o1, o2, o3 = principal_orientations(pts)
    v = np.array([np.var(pts @ o, ddof=1) for o in (o1, o2, o3)])
    bounds = np.stack([v + 10.0, v - 10.0])     # bounds inactive
    s0 = region_smoothness_np(pts, "linearity")
    data = jnp.asarray(cloud)
    for _ in range(20):
        data, s, count, oob = smoothness_step(
            data, jnp.asarray(cloud), jnp.asarray(mask),
            jnp.asarray(np.stack([o1, o2, o3])), jnp.asarray(bounds),
            "linearity", "inc")
    assert not bool(oob)
    # masked points moved, unmasked untouched
    out = np.asarray(data)
    assert np.abs(out[24:] - cloud[24:]).max() == 0
    assert float(s) > s0 - 1e-6


def test_update_region_respects_distance_bound():
    rng = np.random.RandomState(3)
    N = 48
    cloud = rng.randn(N, 3).astype(np.float32)
    mask = np.zeros(N, np.float32)
    mask[:20] = 1.0
    pts = cloud[:20]
    o1, o2, o3 = principal_orientations(pts)
    v = np.array([np.var(pts @ o, ddof=1) for o in (o1, o2, o3)])
    bounds = np.stack([v + 10.0, v - 10.0])
    s0 = region_smoothness_np(pts, "scattering")
    new, s, if_update = update_region(
        cloud, cloud, mask, np.stack([o1, o2, o3]), bounds, s0,
        "scattering", "inc")
    disp = np.linalg.norm(new - cloud, axis=1)
    assert disp.max() <= 0.03 + 1e-5
    assert disp[20:].max() == 0.0


def test_batched_epoch_matches_sequential():
    """One fused device epoch == the reference's sequential per-region loop
    (region objectives/updates have disjoint support)."""
    import jax.numpy as jnp
    from interpret_quality_tpu.attrib.smoothness import (
        ENUM_STEP, VAR_THRESHOLD, principal_orientations,
        region_smoothness_np, smoothness_epoch_all_regions, update_region)

    rng = np.random.RandomState(0)
    N, R = 96, 4
    data = rng.randn(N, 3).astype(np.float32) * 0.2
    region_id = np.repeat(np.arange(R), N // R)
    orig = data.copy()

    masks, orients, bounds, smooth_prev = [], [], [], []
    for r in range(R):
        m = region_id == r
        pts = orig[m]
        o1, o2, o3 = principal_orientations(pts)
        v = np.array([np.var(pts @ o, ddof=1) for o in (o1, o2, o3)])
        masks.append(m.astype(np.float32))
        orients.append(np.stack([o1, o2, o3]).astype(np.float32))
        bounds.append(np.stack([v + VAR_THRESHOLD,
                                v - VAR_THRESHOLD]).astype(np.float32))
        smooth_prev.append(region_smoothness_np(pts, "linearity"))

    # sequential reference path
    seq_data = data.copy()
    seq_smooth, seq_active = [], []
    for r in range(R):
        seq_data, s, keep = update_region(
            seq_data, orig, masks[r], orients[r], bounds[r],
            smooth_prev[r], "linearity", "inc")
        seq_smooth.append(s)
        seq_active.append(keep)

    # batched path
    sm = jnp.asarray(np.array(smooth_prev), jnp.float32)
    out_data, out_smooth, out_active = smoothness_epoch_all_regions(
        jnp.asarray(data), jnp.asarray(orig), jnp.asarray(np.stack(masks)),
        jnp.asarray(np.stack(orients)), jnp.asarray(np.stack(bounds)),
        sm, jnp.ones((R,), bool), sm + ENUM_STEP, "linearity", "inc")

    np.testing.assert_allclose(np.asarray(out_data), seq_data,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_smooth), np.array(seq_smooth),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_active),
                                  np.array(seq_active))


def test_degenerate_regions_do_not_nan():
    """Single-point regions (possible at toy scales) must neither crash the
    host PCA (eigh on a NaN covariance) nor poison the batched epoch loop."""
    from interpret_quality_tpu.attrib.smoothness import (
        ENUM_STEP, VAR_THRESHOLD, smoothness_epoch_all_regions)

    one = np.array([[0.3, -0.1, 0.2]], np.float32)
    o1, o2, o3 = principal_orientations(one)
    assert np.allclose(np.stack([o1, o2, o3]), np.eye(3))
    assert region_smoothness_np(one, "linearity") == 0.0
    assert region_smoothness_np(one, "scattering") == 0.0

    # batched epoch: region 0 real, region 1 a single point (inactive)
    rng = np.random.RandomState(3)
    pts = rng.randn(33, 3).astype(np.float32) * 0.2
    region_id = np.zeros(33, np.int64)
    region_id[-1] = 1
    orig = pts.copy()
    masks, orients, bounds, smooth_prev, usable = [], [], [], [], []
    for r in range(2):
        m = region_id == r
        p = orig[m]
        o = np.stack(principal_orientations(p))
        v = (np.array([np.var(p @ oo, ddof=1) for oo in o])
             if p.shape[0] >= 2 else np.zeros(3))
        masks.append(m.astype(np.float32))
        orients.append(o.astype(np.float32))
        bounds.append(np.stack([v + VAR_THRESHOLD,
                                v - VAR_THRESHOLD]).astype(np.float32))
        smooth_prev.append(region_smoothness_np(p, "linearity"))
        usable.append(p.shape[0] >= 2)

    sm = jnp.asarray(np.array(smooth_prev), jnp.float32)
    out_data, out_smooth, out_active = smoothness_epoch_all_regions(
        jnp.asarray(pts), jnp.asarray(orig), jnp.asarray(np.stack(masks)),
        jnp.asarray(np.stack(orients)), jnp.asarray(np.stack(bounds)),
        sm, jnp.asarray(np.array(usable)), sm + ENUM_STEP,
        "linearity", "inc")
    assert np.all(np.isfinite(np.asarray(out_data)))
    assert np.all(np.isfinite(np.asarray(out_smooth)))
    # the degenerate region never moves and stays inactive
    np.testing.assert_array_equal(np.asarray(out_data)[-1], orig[-1])
    assert not bool(np.asarray(out_active)[1])
