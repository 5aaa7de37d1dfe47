"""Region-Shapley estimation engine.

The reference's hot loop runs 1000 host-synced iterations of a batch-33
forward per cloud (final_shapley_value.py:138-151) and, in enumeration mode,
a Python masking double-loop per batch (tools/final_common.py:46-61,86-96).
Here each device step masks + forwards a whole chunk of permutations at once
and scatter-adds the marginals on device; the host sees one transfer per
pose.  The coalition axis — the (orders x rows) mega-batch — is the natural
sharding axis over a TPU mesh.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .coalitions import (keep_matrix_from_orders, marginals_by_region,
                         masked_coalitions)
from .reward import reward_from_logits


@jax.jit
def region_id_from_fps(data: jnp.ndarray, fps_index: jnp.ndarray) -> jnp.ndarray:
    """Assign each point to its nearest FPS centre.

    Reference: final_shapley_value.py:20-35.

    Args:
      data: (N, 3) cloud.
      fps_index: (R,) indices of region centres within `data`.
    Returns:
      (N,) int32 region ids.
    """
    centers = data[fps_index]                                # (R, 3)
    d2 = (jnp.sum(data * data, -1, keepdims=True)
          - 2.0 * data @ centers.T
          + jnp.sum(centers * centers, -1)[None, :])         # (N, R)
    return jnp.argmin(d2, axis=-1).astype(jnp.int32)


def generate_all_orders(num_samples_save: int, num_regions: int,
                        rng: Optional[np.random.RandomState] = None,
                        antithetic: bool = False) -> np.ndarray:
    """Random permutations, host-side numpy (reference final_shapley_value.py:59-72).

    Uses the global numpy RNG when `rng` is None so that seeding via
    utils.rng.set_random reproduces the reference's sampling stream.

    With ``antithetic=True`` (an opt-in estimator improvement over the
    reference, which always samples i.i.d.), permutations come in
    (π, reverse(π)) pairs: a region early in π is late in its mirror, so the
    two single-permutation marginal estimates are negatively correlated for
    games with monotone positional effects and their pair-average has lower
    variance than two i.i.d. draws at identical forward cost.  Every
    permutation remains uniformly distributed, so the estimator stays
    unbiased and all downstream artifacts/consumers are unchanged; snapshot
    counts (100, 200, ...) are even, so saved prefixes hold whole pairs.
    """
    r = rng if rng is not None else np.random
    if antithetic:
        num_pairs = (num_samples_save + 1) // 2
        orders = []
        for _ in range(num_pairs):
            pi = r.permutation(np.arange(num_regions))
            orders.append(pi.reshape(1, -1))
            orders.append(pi[::-1].reshape(1, -1))
        return np.concatenate(orders, axis=0)[:num_samples_save]
    orders = [r.permutation(np.arange(num_regions)).reshape(1, -1)
              for _ in range(num_samples_save)]
    return np.concatenate(orders, axis=0)


def _params_to_default_device(variables):
    """Move host-resident parameters to the default device once.

    init_model builds variables on the CPU backend (fast eager init); if
    they stayed host-committed, every jitted step would re-transfer the
    whole parameter set through the TPU tunnel.  Arrays already living on
    the default device (e.g. mesh-sharded in the multichip dry run) are
    left untouched so shardings survive.
    """
    leaves = jax.tree_util.tree_leaves(variables)
    if not leaves or not hasattr(leaves[0], "devices"):
        return variables
    default = jax.devices()[0]
    if default in leaves[0].devices():
        return variables
    return jax.device_put(variables, default)


class ShapleyEngine:
    """Batched masked-coalition Shapley estimator for one frozen model.

    Args:
      forward_fn: jittable ``(B, N, 3) -> (B, num_class)`` logits function
        (already closed over parameters).
      num_regions: R.
      softmax_type: reward type ("modified" | "normal").
      batch_orders: permutations per device step (effective forward batch is
        ``batch_orders * (R+1)``).
      coalition_sharding: optional ``jax.sharding.NamedSharding`` for the
        coalition axis of the masked mega-batch; when given, a sharding
        constraint is inserted so pjit splits the forward across the mesh.
    """

    def __init__(self, forward_fn: Callable, num_regions: int,
                 softmax_type: str = "modified", batch_orders: int = 100,
                 coalition_sharding=None):
        self.forward_fn = forward_fn
        self.num_regions = num_regions
        self.softmax_type = softmax_type
        self.batch_orders = batch_orders
        self.coalition_sharding = coalition_sharding
        # Pass parameters as jit arguments when the forward exposes them
        # (ForwardFn); closing over them would bake every array into the
        # compiled program as an MLIR constant.
        apply_fn = getattr(forward_fn, "apply_fn", None)
        if apply_fn is not None:
            self._apply = apply_fn
            self._variables = _params_to_default_device(forward_fn.variables)
        else:
            self._apply = lambda _vars, x: forward_fn(x)
            self._variables = None
        self._step = jax.jit(self._step_impl)
        self._step_poses = jax.jit(self._step_poses_impl)
        self._scan_orders = jax.jit(self._scan_orders_impl)
        self._keep_cache = {}
        self._scan_cache = {}
        self._enum_scan_jits = {}

    def _keep_for(self, chunk: np.ndarray):
        """Device (keep matrix, orders) for an order chunk, cached across
        poses/clouds (enumeration reuses the same permutations for every
        pose; re-uploading costs a tunnel round trip each)."""
        key = chunk.tobytes()
        cached = self._keep_cache.get(key)
        if cached is None:
            cached = (jnp.asarray(keep_matrix_from_orders(chunk)),
                      jnp.asarray(chunk))
            if len(self._keep_cache) > 64:
                self._keep_cache.clear()
            self._keep_cache[key] = cached
        return cached

    # ---------------------------------------------------------------- step
    def _step_impl(self, variables, data, keep, orders, region_id, label):
        """One device step over a chunk of permutations.

        Returns (region_sv_sum (R,), dv_by_region (O, R), logits (O*(R+1), C)).
        """
        center = jnp.mean(data, axis=0)
        masked = masked_coalitions(data, center, keep, region_id)
        if self.coalition_sharding is not None:
            masked = jax.lax.with_sharding_constraint(
                masked, self.coalition_sharding)
        logits = self._apply(variables, masked)
        v = reward_from_logits(logits, label, self.softmax_type)
        v = v.reshape(keep.shape[0], self.num_regions + 1)
        dv = v[:, 1:] - v[:, :-1]                             # (O, R)
        dv_by_region = marginals_by_region(dv, orders)        # (O, R)
        return jnp.sum(dv_by_region, axis=0), dv_by_region, logits

    def _scan_orders_impl(self, variables, data, keep_steps, orders_steps,
                          region_id, label):
        """All order chunks of one cloud in a single device call.

        Each fresh keep-matrix upload through the TPU tunnel blocks the host
        ~0.2 s; the per-chunk loop in `shapley_for_pose` pays that once per
        chunk (Shapley init: 10 chunks x 30 clouds).  One upload + one scan
        keeps the stage compute-bound.

        Args:
          keep_steps: (T, O, R+1, R); orders_steps: (T, O, R).
        Returns:
          (sv_sum (R,), dv_by_region (T, O, R), logits (T, O*(R+1), C)).
        """
        def body(acc, xs):
            keep, orders = xs
            sv, dv, logits = self._step_impl(variables, data, keep, orders,
                                             region_id, label)
            return acc + sv, (dv, logits)

        acc0 = jnp.zeros((self.num_regions,), jnp.float32)
        return jax.lax.scan(body, acc0, (keep_steps, orders_steps))

    def _step_poses_impl(self, variables, data_batch, keep, orders, region_id,
                         label):
        """One device step over (pose_chunk, order_chunk).

        Args:
          data_batch: (P, N, 3) disturbed clouds.
        Returns:
          (region_sv_sum (P, R), logits (P, O*(R+1), C)).
        """
        P = data_batch.shape[0]
        O = keep.shape[0]
        centers = jnp.mean(data_batch, axis=1)
        masked = jax.vmap(masked_coalitions, in_axes=(0, 0, None, None))(
            data_batch, centers, keep, region_id)         # (P, O*(R+1), N, 3)
        flat = masked.reshape(P * O * (self.num_regions + 1),
                              data_batch.shape[1], 3)
        if self.coalition_sharding is not None:
            flat = jax.lax.with_sharding_constraint(flat, self.coalition_sharding)
        logits = self._apply(variables, flat)
        v = reward_from_logits(logits, label, self.softmax_type)
        v = v.reshape(P, O, self.num_regions + 1)
        dv = v[:, :, 1:] - v[:, :, :-1]                   # (P, O, R)
        dv_by_region = marginals_by_region(dv, orders)    # (P, O, R)
        sv = jnp.sum(dv_by_region, axis=1)                # (P, R)
        return sv, logits.reshape(P, O * (self.num_regions + 1), -1)

    def _enum_scan_for(self, disturb_batch: Callable, return_logits: bool):
        """Jitted whole-grid enumeration program for one disturb function.

        Through a high-latency device link every executable launch is a
        blocking RPC; the reference-shaped per-pose host loop costs ~4 round
        trips per pose (measured ~2.4 s/pose on a slow tunnel vs ~1 s of
        compute).  Scanning the full pose grid inside ONE jit makes the
        stage a single dispatch regardless of grid size."""
        key = (disturb_batch, return_logits)
        fn = self._enum_scan_jits.get(key)
        if fn is not None:
            return fn
        if len(self._enum_scan_jits) > 16:
            # disturb_batch is keyed by object identity: a caller that
            # rebuilds the callable per invocation (run_enum builds it once
            # per stage) would otherwise grow this dict and recompile
            # unboundedly.  Bounded like _keep_cache/_scan_cache.
            self._enum_scan_jits.clear()

        def impl(variables, data, params_steps, keep_steps, orders_steps,
                 region_id, label):
            S = orders_steps.shape[0] * orders_steps.shape[1]
            Pc = params_steps.shape[1]

            def pose_body(carry, params_chunk):
                data_batch = disturb_batch(data, params_chunk)  # (Pc, N, 3)

                def order_body(acc, xs):
                    keep, orders = xs
                    sv, logits = self._step_poses_impl(
                        variables, data_batch, keep, orders, region_id, label)
                    return acc + sv, (logits if return_logits else None)

                sv_sum, logits_chunks = jax.lax.scan(
                    order_body,
                    jnp.zeros((Pc, self.num_regions), jnp.float32),
                    (keep_steps, orders_steps))
                if return_logits:
                    # (T, Pc, O*(R+1), C) -> reference row layout per pose
                    logits = jnp.swapaxes(logits_chunks, 0, 1).reshape(
                        Pc, S * (self.num_regions + 1), -1)
                else:
                    logits = jnp.zeros((), jnp.float32)
                return carry, (sv_sum / S, logits)

            _, (sv, logits) = jax.lax.scan(pose_body, 0, params_steps)
            return sv, logits           # (Tp, Pc, R), (Tp, Pc, S*(R+1), C)

        fn = jax.jit(impl)
        self._enum_scan_jits[key] = fn
        return fn

    def _enum_scan_plan_for(self, disturb_fn: Callable, plan_fn: Callable,
                            apply_plan: Callable, return_logits: bool):
        """Jitted whole-grid enumeration with pose-invariant graph reuse.

        Every pose is a rigid/uniform-scale transform of the SAME masked
        coalition batch (masking commutes with the transform), and the
        models' graph construction — FPS, kNN, ball membership, KDE density
        — depends only on pairwise distances (models/plans.py).  So the scan
        runs order chunks OUTSIDE and poses INSIDE: per chunk it masks once,
        builds the graph plan once, then sweeps all poses paying only the
        transform + the graph-free forward.  The selection sweeps —
        the dominant per-forward cost of every graph family (docs/PERF.md
        §3) — leave the pose loop entirely.
        """
        key = (disturb_fn, plan_fn, apply_plan, return_logits)
        fn = self._enum_scan_jits.get(key)
        if fn is not None:
            return fn
        if len(self._enum_scan_jits) > 16:
            self._enum_scan_jits.clear()

        def impl(variables, data, all_params, keep_steps, orders_steps,
                 region_id, label):
            T, O = orders_steps.shape[0], orders_steps.shape[1]
            S = T * O
            R = self.num_regions
            center = jnp.mean(data, axis=0)

            def order_body(carry, xs):
                keep, orders = xs                       # (O, R+1, R), (O, R)
                masked = masked_coalitions(data, center, keep, region_id)
                if self.coalition_sharding is not None:
                    masked = jax.lax.with_sharding_constraint(
                        masked, self.coalition_sharding)
                plan = plan_fn(masked)                  # once per order chunk

                def pose_body(c2, params_one):
                    xp = jax.vmap(disturb_fn, in_axes=(0, None))(
                        masked, params_one)             # (O*(R+1), N, 3)
                    logits = apply_plan(variables, xp, plan)
                    v = reward_from_logits(logits, label, self.softmax_type)
                    dv = v.reshape(O, R + 1)
                    dv = dv[:, 1:] - dv[:, :-1]         # (O, R)
                    sv = jnp.sum(marginals_by_region(dv, orders), axis=0)
                    return c2, (sv, logits if return_logits else None)

                _, (sv_p, logits_p) = jax.lax.scan(pose_body, 0, all_params)
                return carry, (sv_p, logits_p)          # (P, R), (P, O*33, C)

            _, (sv, logits) = jax.lax.scan(order_body, 0,
                                           (keep_steps, orders_steps))
            sv = jnp.sum(sv, axis=0) / S                # (P, R)
            if return_logits:
                # (T, P, O*(R+1), C) -> reference row layout per pose
                logits = jnp.swapaxes(logits, 0, 1).reshape(
                    all_params.shape[0], S * (R + 1), -1)
            else:
                logits = jnp.zeros((), jnp.float32)
            return sv, logits

        fn = jax.jit(impl)
        self._enum_scan_jits[key] = fn
        return fn

    def enum_all_poses_plan(self, disturb_fn: Callable, data, all_params,
                            label, region_id, orders, plan_fn: Callable,
                            apply_plan: Callable, return_logits: bool = True):
        """`enum_all_poses` with pose-invariant graph reuse (see
        _enum_scan_plan_for).  ``disturb_fn`` is the single-cloud transform
        ``((N, 3), params) -> (N, 3)``; ``plan_fn``/``apply_plan`` come from
        the model's ForwardFn.  Returns the same (sv (P, R) float64 numpy,
        logits (P, S*(R+1), C) numpy or None) contract."""
        orders = np.asarray(orders)
        S = orders.shape[0]
        bs = min(self.batch_orders, S)
        if S % bs != 0:
            raise ValueError(f"order count {S} not a multiple of {bs}")
        T = S // bs
        scan_key = orders.tobytes()
        cached = self._scan_cache.get(scan_key)
        if cached is None:
            keep_steps = np.stack([keep_matrix_from_orders(orders[s:s + bs])
                                   for s in range(0, S, bs)])
            cached = (jnp.asarray(keep_steps),
                      jnp.asarray(orders.reshape(T, bs, -1)))
            if len(self._scan_cache) > 8:
                self._scan_cache.clear()
            self._scan_cache[scan_key] = cached
        keep_dev, orders_dev = cached

        fn = self._enum_scan_plan_for(disturb_fn, plan_fn, apply_plan,
                                      return_logits)
        sv, logits = fn(self._variables, jnp.asarray(data),
                        jnp.asarray(np.asarray(all_params)), keep_dev,
                        orders_dev, jnp.asarray(region_id),
                        jnp.asarray(label))
        sv.copy_to_host_async()
        if return_logits:
            logits.copy_to_host_async()
        sv = np.asarray(sv, dtype=np.float64)
        return sv, (np.asarray(logits) if return_logits else None)

    def enum_all_poses(self, disturb_batch: Callable, data, all_params,
                       label, region_id, orders, pose_chunk: int,
                       return_logits: bool = True):
        """Shapley values at every pose of a perturbation grid, in ONE
        device dispatch (see _enum_scan_for).

        Args:
          disturb_batch: jittable ``((N,3), (Pc, ...)) -> (Pc, N, 3)``.
          all_params: (P, ...) pose-parameter grid; a ragged tail is padded
            with the last pose and sliced off after the fetch.
          orders: (S, R) permutations; S must be a multiple of the order
            chunk (``min(batch_orders, S)``) — callers fall back to
            shapley_for_poses otherwise.
        Returns:
          (region_shap_value (P, R) float64 numpy,
           logits (P, S*(R+1), C) numpy or None).
        """
        orders = np.asarray(orders)
        S = orders.shape[0]
        bs = min(self.batch_orders, S)
        if S % bs != 0:
            raise ValueError(f"order count {S} not a multiple of {bs}")
        T = S // bs
        scan_key = orders.tobytes()
        cached = self._scan_cache.get(scan_key)
        if cached is None:
            keep_steps = np.stack([keep_matrix_from_orders(orders[s:s + bs])
                                   for s in range(0, S, bs)])
            cached = (jnp.asarray(keep_steps),
                      jnp.asarray(orders.reshape(T, bs, -1)))
            if len(self._scan_cache) > 8:
                self._scan_cache.clear()
            self._scan_cache[scan_key] = cached
        keep_dev, orders_dev = cached

        all_params = np.asarray(all_params)
        P = all_params.shape[0]
        Tp = -(-P // pose_chunk)
        pad = Tp * pose_chunk - P
        if pad:
            all_params = np.concatenate(
                [all_params, np.repeat(all_params[-1:], pad, axis=0)], axis=0)
        params_steps = jnp.asarray(all_params.reshape(
            (Tp, pose_chunk) + all_params.shape[1:]))

        fn = self._enum_scan_for(disturb_batch, return_logits)
        sv, logits = fn(self._variables, jnp.asarray(data), params_steps,
                        keep_dev, orders_dev, jnp.asarray(region_id),
                        jnp.asarray(label))
        sv.copy_to_host_async()
        if return_logits:
            logits.copy_to_host_async()
        sv = np.asarray(sv, dtype=np.float64).reshape(
            Tp * pose_chunk, self.num_regions)[:P]
        if not return_logits:
            return sv, None
        logits = np.asarray(logits)
        return sv, logits.reshape((Tp * pose_chunk,) + logits.shape[2:])[:P]

    # ------------------------------------------------------------- public
    def shapley_for_poses(self, data_batch, label, region_id, orders,
                          return_logits: bool = True,
                          return_device: bool = False):
        """Shapley values for a batch of disturbed poses of one cloud.

        Args:
          data_batch: (P, N, 3).
          orders: (S, R) permutations (shared across poses).
          return_device: return device arrays without any host transfer —
            callers batch many pose chunks and fetch once (each blocking
            fetch costs a full tunnel round trip).
        Returns:
          region_shap_value (P, R) (float64 numpy, or f32 device array with
          ``return_device``), and optionally raw logits (P, S*(R+1), C) in
          the reference row layout.
        """
        orders = np.asarray(orders)
        S = orders.shape[0]
        bs = min(self.batch_orders, S)
        data_batch = jnp.asarray(data_batch)
        region_id = jnp.asarray(region_id)
        label = jnp.asarray(label)

        sv_sum = None
        logits_chunks = []
        for start in range(0, S, bs):
            chunk = orders[start:start + bs]   # ragged tail compiles once
            keep, chunk_dev = self._keep_for(chunk)
            sv, logits = self._step_poses(
                self._variables, data_batch, keep, chunk_dev,
                region_id, label)
            sv_sum = sv if sv_sum is None else sv_sum + sv
            if return_logits:
                logits_chunks.append(logits)

        if return_device:
            sv_dev = sv_sum / S
            if return_logits:
                return sv_dev, (logits_chunks[0] if len(logits_chunks) == 1
                                else jnp.concatenate(logits_chunks, axis=1))
            return sv_dev

        for c in logits_chunks:                 # overlap the transfers
            c.copy_to_host_async()
        region_shap_value = np.asarray(sv_sum, dtype=np.float64) / S
        if return_logits:
            return region_shap_value, np.concatenate(
                [np.asarray(c) for c in logits_chunks], axis=1)
        return region_shap_value

    def shapley_for_pose(self, data, label, region_id, orders,
                         return_logits: bool = False,
                         return_per_order: bool = False):
        """Shapley values of all regions for one (possibly disturbed) cloud.

        Args:
          data: (N, 3) array.
          label: scalar int.
          region_id: (N,) int.
          orders: (S, R) permutations to average over.
        Returns:
          region_shap_value (R,) float64 numpy — mean marginal per region —
          plus optional raw logits (S*(R+1), C) and per-order contributions
          (S, R), both in the reference's row layout.
        """
        orders = np.asarray(orders)
        S = orders.shape[0]
        bs = min(self.batch_orders, S)
        data = jnp.asarray(data)
        region_id = jnp.asarray(region_id)
        label = jnp.asarray(label)

        T = S // bs
        scan_key = orders.tobytes()
        if T > 1 and S % bs == 0 and (
                scan_key in self._scan_cache or not any(
                    orders[s:s + bs].tobytes() in self._keep_cache
                    for s in range(0, S, bs))):
            # multi-chunk, nothing chunk-cached (Shapley init: fresh
            # 1000-order sets per cloud): one keep upload + one scan dispatch
            # instead of one blocking upload per chunk.  The device inputs
            # are cached on the full order set so repeated calls with the
            # same permutations (smoothness: one Shapley pass per epoch)
            # skip both the host keep build and the tunnel upload.
            cached = self._scan_cache.get(scan_key)
            if cached is None:
                keep_steps = np.stack(
                    [keep_matrix_from_orders(orders[s:s + bs])
                     for s in range(0, S, bs)])              # (T, O, R+1, R)
                cached = (jnp.asarray(keep_steps),
                          jnp.asarray(orders.reshape(T, bs, -1)))
                if len(self._scan_cache) > 8:
                    self._scan_cache.clear()
                self._scan_cache[scan_key] = cached
            keep_dev, orders_dev = cached
            sv_sum, (dv_all, logits_all) = self._scan_orders(
                self._variables, data, keep_dev, orders_dev,
                region_id, label)
            for c in (dv_all, logits_all):
                c.copy_to_host_async()
            region_shap_value = np.asarray(sv_sum, dtype=np.float64) / S
            out = [region_shap_value]
            if return_logits:
                out.append(np.asarray(logits_all).reshape(
                    S * (self.num_regions + 1), -1))
            if return_per_order:
                out.append(np.asarray(dv_all).reshape(S, self.num_regions))
            return tuple(out) if len(out) > 1 else out[0]

        sv_sum = None
        logits_chunks = []
        per_order_chunks = []
        for start in range(0, S, bs):
            chunk = orders[start:start + bs]   # ragged tail compiles once
            keep, chunk_dev = self._keep_for(chunk)
            sv, dv_by_region, logits = self._step(
                self._variables, data, keep, chunk_dev, region_id, label)
            sv_sum = sv if sv_sum is None else sv_sum + sv
            if return_logits:
                logits_chunks.append(logits)
            if return_per_order:
                per_order_chunks.append(dv_by_region)

        for c in logits_chunks + per_order_chunks:   # overlap the transfers
            c.copy_to_host_async()
        region_shap_value = np.asarray(sv_sum, dtype=np.float64) / S
        out = [region_shap_value]
        if return_logits:
            out.append(np.concatenate([np.asarray(c) for c in logits_chunks], 0))
        if return_per_order:
            out.append(np.concatenate([np.asarray(c) for c in per_order_chunks], 0))
        return tuple(out) if len(out) > 1 else out[0]


_NORM_JITS: dict = {}


def norm_factor(forward_fn: Callable, data: jnp.ndarray, label,
                softmax_type: str = "modified") -> float:
    """v(N) - v(empty): reward of the full cloud minus the all-centre cloud.

    Reference: final_shapley_value.py:39-56.  Jitted and cached per
    (forward_fn, softmax_type): every eager op costs a device round trip
    through the TPU tunnel, so the whole computation is one compiled call.
    """
    apply_fn = getattr(forward_fn, "apply_fn", None)
    variables = getattr(forward_fn, "variables", None)
    if apply_fn is None:
        apply_fn = lambda _vars, x: forward_fn(x)   # noqa: E731
    if len(_NORM_JITS) > 24:    # bound the cache: each model pins a device
        _NORM_JITS.clear()      # copy of its params via the "vars" entry
    cached = _NORM_JITS.get(("vars", id(forward_fn)))
    if variables is not None:
        if cached is None:
            cached = _params_to_default_device(variables)
            _NORM_JITS[("vars", id(forward_fn))] = cached
        variables = cached
    impl = _NORM_JITS.get((id(forward_fn), softmax_type))
    if impl is None:
        def _impl(variables, data, label):
            center = jnp.mean(data, axis=0)
            empty = jnp.broadcast_to(center, data.shape)
            batch = jnp.stack([data, empty])                # (2, N, 3)
            v = reward_from_logits(apply_fn(variables, batch), label,
                                   softmax_type)
            return v[0] - v[1]

        impl = jax.jit(_impl)
        _NORM_JITS[(id(forward_fn), softmax_type)] = impl
        # keep the closure alive so id() keys stay unique
        _NORM_JITS[("ref", id(forward_fn), softmax_type)] = forward_fn
    return float(impl(variables, jnp.asarray(data), jnp.asarray(label)))
