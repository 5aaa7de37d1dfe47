"""Smoothness (linearity / planarity / scattering) enumeration.

Reference: final_smoothness_center_enum_all.py — per region, constrained
gradient ascent/descent on the region's points to increase/decrease a
PCA-shape statistic, with variance bounds (±0.003 on each principal
orientation), a per-point displacement bound (0.03), and three stop
conditions; after each enumeration epoch the full cloud's Shapley values
are recomputed.

TPU mapping: the inner objective+step+clip is one jitted function over the
*full* cloud with a static region mask (static shapes, no ragged tensors);
`jax.grad` differentiates the variance objective (replacing torch autograd);
the variance-bound "detach" is a `where(in_bound, var, stop_gradient(var))`.
The data-dependent while/stop logic stays on the host (SURVEY.md §3.5).
"""
from __future__ import annotations

import functools
import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from ..pipeline import load_frozen_model, make_engine, resolve_dataset
from ..utils.io import IOStream, mkdir, save_npy, save_torch_tensor
from ..utils.profiling import StageTimer
from ..utils.rng import set_random

STEP = 1e-3
ENUM_STEP = 0.05
EPOCH = 50
VAR_THRESHOLD = 0.003
DIST_THRESHOLD = 0.03
STOP_RATIO = 0.5
MAX_ITERATION = 100

SMOOTH_MODES = ("linearity", "planarity", "scattering")


# ---------------------------------------------------------------------------
# PCA helpers (host, 3x3 eigendecompositions)
# ---------------------------------------------------------------------------
def principal_orientations(points: np.ndarray) -> Tuple[np.ndarray, ...]:
    """(o1, o2, o3) eigenvectors of the unbiased covariance, by descending
    eigenvalue (reference :22-45).

    Degenerate regions (fewer than 2 points — possible only at toy scales,
    never at the reference's 1024/32 geometry) fall back to the canonical
    axes instead of feeding a NaN covariance to eigh.
    """
    if points.shape[0] < 2:
        return (np.array([1.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.0]),
                np.array([0.0, 0.0, 1.0]))
    centred = points - points.mean(axis=0)
    cov = centred.T @ centred / (points.shape[0] - 1)
    if not np.all(np.isfinite(cov)):
        return (np.array([1.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.0]),
                np.array([0.0, 0.0, 1.0]))
    _, vecs = np.linalg.eigh(cov)            # ascending eigenvalues
    return vecs[:, 2].copy(), vecs[:, 1].copy(), vecs[:, 0].copy()


def _masked_var(proj: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Unbiased variance of proj over masked entries."""
    s = jnp.sum(mask)
    mean = jnp.sum(proj * mask) / jnp.maximum(s, 1.0)
    # max(s-1, 1) is the identity for every real region (>= 2 points)
    return jnp.sum(mask * (proj - mean) ** 2) / jnp.maximum(s - 1.0, 1.0)


def _smoothness_value(v1, v2, v3, mode: str):
    vs = jnp.sort(jnp.stack([v1, v2, v3]))
    s_min, s_mid, s_max = vs[0], vs[1], vs[2]
    s_max = jnp.where(s_max > 0, s_max, 1.0)
    if mode == "linearity":
        return (s_max - s_mid) / s_max
    if mode == "planarity":
        return (s_mid - s_min) / s_max
    return s_min / s_max                     # scattering


def region_smoothness_np(points: np.ndarray, mode: str) -> float:
    """Host oracle for tests and the original-value computation."""
    if points.shape[0] < 2:
        return 0.0
    o1, o2, o3 = principal_orientations(points)
    v = np.array([np.var(points @ o, ddof=1) for o in (o1, o2, o3)])
    v = np.sort(v)
    if not np.isfinite(v[2]) or v[2] <= 0.0:
        return 0.0
    if mode == "linearity":
        return float((v[2] - v[1]) / v[2])
    if mode == "planarity":
        return float((v[1] - v[0]) / v[2])
    return float(v[0] / v[2])


# ---------------------------------------------------------------------------
# jitted update step
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("mode", "objective"))
def smoothness_step(data: jnp.ndarray, orig: jnp.ndarray, mask: jnp.ndarray,
                    orientations: jnp.ndarray, bounds: jnp.ndarray,
                    mode: str, objective: str):
    """One constrained gradient step on the masked region of the cloud.

    Args:
      data: (N, 3) current cloud; orig: (N, 3) original cloud.
      mask: (N,) float 1.0 on the region's points.
      orientations: (3, 3) rows o1, o2, o3.
      bounds: (2, 3) rows [ub, lb] of the variance bounds per orientation.
    Returns:
      (new_data, smoothness, clip_count, all_out_of_bound).
    """

    def vars_of(x):
        proj = x @ orientations.T            # (N, 3)
        return jnp.stack([_masked_var(proj[:, i], mask) for i in range(3)])

    def objective_fn(x):
        v = vars_of(x)
        in_bound = (v <= bounds[0]) & (v >= bounds[1])
        v_b = jnp.where(in_bound, v, jax.lax.stop_gradient(v))
        return _smoothness_value(v_b[0], v_b[1], v_b[2], mode), (v, in_bound)

    (smooth, (v, in_bound)), grad = jax.value_and_grad(
        objective_fn, has_aux=True)(data)
    grad = grad * mask[:, None]
    norm = jnp.linalg.norm(grad)
    all_oob = ~jnp.any(in_bound)
    delta = jnp.where(norm > 0, STEP * grad / jnp.maximum(norm, 1e-30), 1e-8)
    new = data + delta if objective == "inc" else data - delta
    new = jnp.where(mask[:, None] > 0, new, data)

    # Per-point displacement clip onto the 0.03-sphere around the original.
    # Deliberate divergence: the reference's apply_distance_bound
    # (final_smoothness_center_enum_all.py:101-121) writes through a
    # temporary view's .data, which never mutates the base tensor — its
    # projection is a no-op and the bound acts only via the exceed-count
    # stop condition (pinned by tests/test_parity_transforms.py).  We apply
    # the documented projection for real.
    diff = new - orig
    dist = jnp.linalg.norm(diff, axis=1)
    over = (dist > DIST_THRESHOLD) & (mask > 0)
    clipped = orig + DIST_THRESHOLD * diff / jnp.maximum(dist, 1e-30)[:, None]
    new = jnp.where(over[:, None], clipped, new)
    count = jnp.sum(over)
    return new, smooth, count, all_oob


# ---------------------------------------------------------------------------
# batched epoch step: all regions march in one device-side while_loop
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("mode", "objective"))
def smoothness_epoch_all_regions(data, orig, masks, orientations, bounds,
                                 smooth_prev, active, targets,
                                 mode: str, objective: str):
    """One enumeration epoch for ALL regions at once.

    The reference updates regions sequentially (:313-331), but each region's
    objective and update have support only on its own points, so the region
    trajectories are independent and one fused while_loop reproduces the
    sequential results exactly.  Replaces up to R x MAX_ITERATION host round
    trips per epoch with a single device call — through the TPU tunnel each
    round trip costs milliseconds.

    Args:
      data, orig: (N, 3); masks: (R, N) float; orientations: (R, 3, 3);
      bounds: (R, 2, 3); smooth_prev: (R,); active: (R,) bool;
      targets: (R,) this epoch's target smoothness per region.
    Returns:
      (new_data, smooth (R,), keep_updating (R,) bool).
    """
    R = masks.shape[0]
    num_pts = jnp.sum(masks, axis=1)                       # (R,)
    sign = 1.0 if objective == "inc" else -1.0

    def not_reached(s):
        return s < targets if objective == "inc" else s > targets

    def smooth_and_grad(x, chase):
        def obj(x):
            proj = jnp.einsum("nc,rdc->rnd", x, orientations)   # (R, N, 3)
            m = masks[:, :, None]
            s = num_pts[:, None]
            mean = jnp.sum(proj * m, axis=1, keepdims=True) / jnp.maximum(
                s[:, None], 1.0)
            # max(s-1, 1) is the identity for every real region (>= 2 points)
            # and keeps single-point toy regions NaN-free (they are inactive).
            v = jnp.sum(m * (proj - mean) ** 2, axis=1) / jnp.maximum(
                s - 1.0, 1.0)                              # (R, 3)
            in_bound = (v <= bounds[:, 0]) & (v >= bounds[:, 1])
            v_b = jnp.where(in_bound, v, jax.lax.stop_gradient(v))
            vs = jnp.sort(v_b, axis=1)                     # (R, 3) ascending
            s_max = jnp.where(vs[:, 2] > 0, vs[:, 2], 1.0)
            if mode == "linearity":
                sm = (vs[:, 2] - vs[:, 1]) / s_max
            elif mode == "planarity":
                sm = (vs[:, 1] - vs[:, 0]) / s_max
            else:
                sm = vs[:, 0] / s_max
            # gradients only for regions still chasing this iteration
            sm_g = jnp.where(chase, sm, jax.lax.stop_gradient(sm))
            return jnp.sum(sm_g), (sm, in_bound)

        (_, (sm, in_bound)), grad = jax.value_and_grad(obj, has_aux=True)(x)
        return sm, in_bound, grad                          # (R,), (R,3), (N,3)

    def body(state):
        x, smooth, act, iters, _ = state
        chase = act & not_reached(smooth)
        sm, in_bound, grad = smooth_and_grad(x, chase)
        # per-region normalised step on each region's own points
        gnorm_r = jnp.sqrt(jnp.sum(
            (grad[None] * masks[:, :, None]) ** 2, axis=(1, 2)))   # (R,)
        point_norm = masks.T @ gnorm_r                     # (N,) own region's
        point_chase = masks.T @ chase.astype(jnp.float32)  # (N,) 1 if chasing
        delta = jnp.where(point_norm[:, None] > 0,
                          STEP * grad / jnp.maximum(point_norm, 1e-30)[:, None],
                          1e-8)
        new = x + sign * delta * point_chase[:, None]
        # per-point displacement clip onto the 0.03 ball around the original
        diff = new - orig
        dist = jnp.linalg.norm(diff, axis=1)
        over = (dist > DIST_THRESHOLD) & (point_chase > 0)
        clipped = orig + DIST_THRESHOLD * diff / jnp.maximum(
            dist, 1e-30)[:, None]
        new = jnp.where(over[:, None], clipped, new)
        counts = masks @ over.astype(jnp.float32)          # (R,)
        # stop conditions (reference :169-181), latched per region
        all_oob = ~jnp.any(in_bound, axis=1)
        stop = (counts / num_pts > STOP_RATIO) | all_oob | (iters + 1
                                                            > MAX_ITERATION)
        new_act = act & ~(chase & stop)
        new_iters = iters + chase.astype(jnp.int32)
        new_smooth = jnp.where(chase, sm, smooth)
        return new, new_smooth, new_act, new_iters, chase & stop

    def cond(state):
        _, smooth, act, _, _ = state
        return jnp.any(act & not_reached(smooth))

    init = (data, smooth_prev, active, jnp.zeros((R,), jnp.int32),
            jnp.zeros((R,), bool))
    x, smooth, act, _, _ = jax.lax.while_loop(cond, body, init)
    return x, smooth, act


def update_region(data_copy: np.ndarray, orig: np.ndarray, mask: np.ndarray,
                  orientations: np.ndarray, bounds: np.ndarray,
                  smoothness_prev: float, mode: str, objective: str,
                  io: Optional[IOStream] = None):
    """March a region's smoothness one ENUM_STEP further; returns
    (data_copy, smoothness, keep_updating)."""
    target = (smoothness_prev + ENUM_STEP if objective == "inc"
              else smoothness_prev - ENUM_STEP)
    num_total = int(mask.sum())
    smoothness = smoothness_prev
    if_update = True
    iteration = 0
    data_j = jnp.asarray(data_copy)
    orig_j = jnp.asarray(orig)
    mask_j = jnp.asarray(mask, jnp.float32)
    ori_j = jnp.asarray(orientations)
    bounds_j = jnp.asarray(bounds)

    def not_reached(s):
        return s < target if objective == "inc" else s > target

    while not_reached(smoothness):
        data_j, smooth, count, all_oob = smoothness_step(
            data_j, orig_j, mask_j, ori_j, bounds_j, mode, objective)
        smoothness = float(smooth)
        iteration += 1
        stop = (float(count) / num_total > STOP_RATIO or bool(all_oob)
                or iteration > MAX_ITERATION)
        if stop:
            if_update = False
            break
    if io is not None:
        io.cprint("curr smoothness: %.8f" % smoothness)
    return np.asarray(data_j), smoothness, if_update


def test_all_region(engine, data: np.ndarray, lbl: int, orders: np.ndarray,
                    region_id: np.ndarray, mode_folder: str,
                    cfg: ExperimentConfig, mode: str, objective: str,
                    max_epochs: int = EPOCH):
    """Enumerate smoothness for all regions; recompute Shapley per epoch
    (reference final_smoothness_center_enum_all.py:281-350)."""
    assert objective in ("inc", "dec")
    t0 = time.time()
    result_path = mode_folder + f"allregion_{objective}/"
    mkdir(result_path)
    # "w": a rerun recomputes this cell whole, and appending would leave a
    # stale StageTimer line that gets averaged (ADVICE r4)
    io = IOStream(result_path + "log.txt", "w")
    io.cprint(str(cfg))

    data_copy = np.array(data, np.float32)
    orig = np.array(data, np.float32)
    R = cfg.num_regions

    orig_sv = engine.shapley_for_pose(data, lbl, region_id, orders)
    io.cprint("origin shapley of this region: %s" % str(orig_sv))
    save_npy(result_path + "orig_shapley_value.npy", orig_sv)

    masks, orients, bounds, smooth_prev, usable = [], [], [], [], []
    for r in range(R):
        m = (region_id == r)
        pts = orig[m]
        o1, o2, o3 = principal_orientations(pts)
        if pts.shape[0] >= 2:
            v = np.array([np.var(pts @ o, ddof=1) for o in (o1, o2, o3)])
        else:
            v = np.zeros(3)
        masks.append(m.astype(np.float32))
        orients.append(np.stack([o1, o2, o3]))
        bounds.append(np.stack([v + VAR_THRESHOLD, v - VAR_THRESHOLD]))
        smooth_prev.append(region_smoothness_np(pts, mode))
        usable.append(pts.shape[0] >= 2 and np.all(np.isfinite(v)))

    data_j = jnp.asarray(data_copy)
    orig_j = jnp.asarray(orig)
    masks_j = jnp.asarray(np.stack(masks))
    orients_j = jnp.asarray(np.stack(orients), jnp.float32)
    bounds_j = jnp.asarray(np.stack(bounds), jnp.float32)
    smooth_j = jnp.asarray(np.array(smooth_prev), jnp.float32)
    active_j = jnp.asarray(np.array(usable, dtype=bool))

    smoothness_list, data_list, sv_list, logits_list = [], [], [], []
    # items = masked forwards inside the timed region (one Shapley recompute
    # per epoch), so the JSON line lands in the same RESULTS.md throughput
    # table as the enum/interaction stages
    # (scripts/make_results_md.py parse_stage_timers)
    with StageTimer(f"smoothness:{mode}:{objective}",
                    printer=io.cprint) as timer:
        for epoch in range(max_epochs):
            io.cprint("\n************ epoch %d ***********" % epoch)
            step = ENUM_STEP if objective == "inc" else -ENUM_STEP
            targets = jnp.where(active_j, smooth_j + step, smooth_j)
            data_j, smooth_j, active_j = smoothness_epoch_all_regions(
                data_j, orig_j, masks_j, orients_j, bounds_j, smooth_j,
                active_j, targets, mode, objective)
            smooth_np = np.asarray(smooth_j)
            smoothness_list.append(smooth_np.tolist())
            data_copy = np.asarray(data_j)
            data_list.append(data_copy[None].copy())
            io.cprint("curr smoothness: %s" % str(smooth_np))

            sv, logits = engine.shapley_for_pose(
                data_copy, lbl, region_id, orders, return_logits=True)
            sv_list.append(sv)
            logits_list.append(logits)
            io.cprint("region shapley value: %s" % str(sv))
            if not bool(np.asarray(active_j).any()):
                break
        timer.items = len(sv_list) * orders.shape[0] * (R + 1)

    save_npy(result_path + "region_shapley_value.npy", np.array(sv_list))
    save_torch_tensor(result_path + "all_logits.pt", np.stack(logits_list))
    save_npy(result_path + f"{mode}.npy", np.array(smoothness_list))
    save_npy(result_path + "data_smoothness.npy", np.array(data_list))
    io.cprint("time: %f" % (time.time() - t0))
    io.close()


def run_smoothness(cfg: ExperimentConfig, modes=SMOOTH_MODES,
                   synthetic: bool = False, allow_random_init: bool = False,
                   sample_indices: Optional[list] = None,
                   max_epochs: Optional[int] = None,
                   coalition_sharding=None, resume: bool = False):
    """Full smoothness suite: {linearity, planarity, scattering} x {inc, dec}.

    ``resume`` skips (sample, mode, objective) cells whose final artifact
    already exists, so an interrupted multi-hour suite restarts at the
    first incomplete cell.  ``coalition_sharding`` shards each per-epoch
    Shapley recompute over the mesh, like the enum stage."""
    epochs = EPOCH if max_epochs is None else max_epochs
    set_random(cfg.seed)
    dataset, names = resolve_dataset(cfg, synthetic)
    _, _, forward = load_frozen_model(cfg, allow_random_init)
    engine = make_engine(cfg, forward, coalition_sharding)

    indices = sample_indices if sample_indices is not None else range(len(dataset))
    for pc_index in indices:
        data, lbl = dataset[pc_index]
        base_folder = cfg.exp_folder + f"{names[pc_index]}/"
        region_id = np.load(base_folder + "region_id.npy")
        orders = np.load(base_folder + "all_orders.npy")[:cfg.num_samples]
        for mode in modes:
            mode_folder = base_folder + f"{mode}_all/"
            mkdir(mode_folder)
            for objective in ("inc", "dec"):
                done_marker = (mode_folder + f"allregion_{objective}/"
                               + "region_shapley_value.npy")
                if resume and os.path.exists(done_marker):
                    print(f"[smoothness:{mode}:{objective}] "
                          f"{names[pc_index]}: artifacts exist, skipping")
                    continue
                test_all_region(engine, data, lbl, orders, region_id,
                                mode_folder, cfg, mode, objective,
                                max_epochs=epochs)
