"""Multi-order pairwise interaction pipeline.

Three stages, replacing the reference CLI chain
(final_gen_pair.py -> final_point_binary_interaction_logits.py ->
final_cal_interactions.py):

  1. `run_gen_pair`     — sample region pairs + contexts (host numpy with the
     reference's seeding), find the adversarial pose among the enumeration
     grid, save predicted labels.
  2. `run_interaction_logits` — for every (pair, context) build the 4-row
     masked batch [S∪{i,j}, S∪{i}, S∪{j}, S] via boolean region masks and
     push it through one jitted forward; contexts are batched per device step.
  3. `run_cal_interactions` — pure post-processing:
     I = v(S∪{i,j}) + v(S) − v(S∪{i}) − v(S∪{j}).

Artifact schema matches the reference (interaction_seed<k>/...,
ratio<r>_context_list.npy, ratio<r>_all_logits.pt,
ratio<r>_{gt,pred}_interaction.npy).
"""
from __future__ import annotations

import itertools
import os
import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import comb

from ..config import (BALL_QUERY_COEF, ExperimentConfig,
                      MODELNET_INTER_SELECTED_SAMPLE,
                      SHAPENET_INTER_SELECTED_SAMPLE)
from ..pipeline import load_frozen_model, resolve_dataset
from ..utils.io import IOStream, mkdir, save_npy, save_torch_tensor
from ..utils.profiling import StageTimer
from ..utils.region_geom import region_ball_neighbors
from ..utils.rng import cal_rank, set_random
from .coalitions import masked_interaction_batch
from .perturbations import MODES
from .reward import reward_from_logits, reward_from_logits_np

RATIOS = [0., 0.04, 0.07, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.]
NUM_PAIRS_RANDOM = 300
NUM_SAVE_CONTEXT_MAX = 100


def selected_sample_indices(dataset: str) -> List[int]:
    return (MODELNET_INTER_SELECTED_SAMPLE if dataset == "modelnet10"
            else SHAPENET_INTER_SELECTED_SAMPLE)


def gen_pair_random(num_regions: int, num_pairs: int) -> np.ndarray:
    """Random (i, j) pairs, i < j (reference final_gen_pair.py:288-300)."""
    all_pairs = np.array([[i, j] for i in range(num_regions)
                          for j in range(num_regions) if j > i])
    # At the reference scale (R=32, 300 of 496 pairs) this never clamps;
    # reduced-R smoke configs have fewer than num_pairs candidates.  The
    # reference would raise here (np.random.choice replace=False); warn so
    # reduced-R runs are distinguishable from full runs in the log
    # (ADVICE r3).
    if num_pairs > all_pairs.shape[0]:
        print(f"[gen_pair] WARNING: only {all_pairs.shape[0]} distinct "
              f"pairs exist at this region count; clamping num_pairs from "
              f"{num_pairs}")
    num_pairs = min(num_pairs, all_pairs.shape[0])
    idx = np.random.choice(all_pairs.shape[0], size=num_pairs, replace=False)
    return all_pairs[idx]


def gen_context(region_pair_list: np.ndarray, save_path: str,
                num_regions: int, ratios: Sequence[float] = tuple(RATIOS),
                num_save_context_max: int = NUM_SAVE_CONTEXT_MAX):
    """Contexts S ⊆ N∖{i,j} of size m = ⌊(R-2)·ratio⌋ per pair
    (reference final_gen_pair.py:18-43)."""
    for ratio in ratios:
        context_list = []
        m = int((num_regions - 2) * ratio)
        for pair in region_pair_list:
            all_s = [r for r in range(num_regions) if r not in (pair[0], pair[1])]
            if comb(len(all_s), m) > num_save_context_max:
                ctx = [np.random.choice(all_s, m, replace=False)
                       for _ in range(num_save_context_max)]
            else:
                ctx = list(itertools.combinations(all_s, m))
            context_list.append(ctx)
        context_list = np.array(context_list)     # (num_pairs, num_context, m)
        save_npy(save_path + "ratio%d_context_list.npy" % int(ratio * 100),
                 context_list)


def gen_pair_single_region(region: int, neighbor_idx: np.ndarray,
                           num_regions: int) -> np.ndarray:
    pairs = [[region, n] for n in np.arange(num_regions)[neighbor_idx[region]]
             if n != region]
    return np.array(pairs)


# ---------------------------------------------------------------------------
# stage 1: pair / context / adv-pose generation
# ---------------------------------------------------------------------------
def run_gen_pair(cfg: ExperimentConfig, mode_name: str = "rotate",
                 synthetic: bool = False, allow_random_init: bool = False,
                 ratios: Sequence[float] = tuple(RATIOS),
                 num_pairs_random: int = NUM_PAIRS_RANDOM,
                 num_save_context_max: int = NUM_SAVE_CONTEXT_MAX,
                 sample_indices: Optional[list] = None):
    set_random(cfg.seed)
    mode = MODES[mode_name]
    dataset, names = resolve_dataset(cfg, synthetic)
    _, _, forward = load_frozen_model(cfg, allow_random_init)
    # params as jit args (constant-embedding is slow through the tunnel)
    from .shapley import _params_to_default_device
    _apply_jit = jax.jit(forward.apply_fn)
    _vars_dev = _params_to_default_device(forward.variables)
    fwd = lambda x: _apply_jit(_vars_dev, x)              # noqa: E731
    disturb_batch = jax.jit(jax.vmap(mode.disturb_fn, in_axes=(None, 0)))
    disturb_one = jax.jit(mode.disturb_fn)

    # default = ALL eval samples, matching reference final_gen_pair.py:106
    # (only the logits/scoring stages narrow to the selected ~10); pass
    # sample_indices to restrict when the extra adv-pose searches are waste
    indices = sample_indices if sample_indices is not None else range(len(dataset))
    for pc_idx in indices:
        data, lbl = dataset[pc_idx]
        name = names[pc_idx]
        base_folder = cfg.exp_folder + f"{name}/"
        mode_folder = base_folder + f"{mode_name}_all/"
        inter_folder = base_folder + f"interaction_seed{cfg.seed}/"
        single_region_folder = inter_folder + f"{mode_name}_adv_single_region/"
        mkdir(inter_folder + "normal/")
        mkdir(inter_folder + f"{mode_name}_adv/")
        mkdir(single_region_folder)

        # ---- random pairs (shared by normal and adv pose)
        region_pair_list = gen_pair_random(cfg.num_regions, num_pairs_random)
        save_npy(inter_folder + "region_pair_list.npy", region_pair_list)

        # ---- adversarial pose: argmin reward over the enumeration grid
        #      (reference final_gen_pair.py:221-286)
        params_file = {"trans": "trans_vector.npy",
                       "scale": "scale.npy"}.get(mode_name, "angle_tuple.npy")
        all_params = np.load(mode_folder + params_file)
        all_disturb = disturb_batch(jnp.asarray(data), jnp.asarray(all_params))
        logits = fwd(all_disturb)                                 # (P, C)
        pred = np.asarray(jnp.argmax(logits, axis=1))
        num_miscls = int((pred != lbl).sum())
        print(f"[gen_pair] {name}: {num_miscls} poses misclassified")
        v = np.asarray(reward_from_logits(logits, jnp.asarray(lbl),
                                          cfg.softmax_type))
        pose_idx = int(np.argmin(v))
        save_npy(inter_folder + f"{mode_name}_adv/pose_idx.npy", pose_idx)
        save_npy(inter_folder + f"{mode_name}_adv/transform_params.npy",
                 all_params[pose_idx])

        # ---- single-region pairs: most perturbation-sensitive region and
        #      its ball-query neighbours (reference final_gen_pair.py:145-218)
        region_id = np.load(base_folder + "region_id.npy")
        region_shapley_values = np.load(mode_folder + "region_shapley_value.npy")
        max_pose_idx = np.argmax(region_shapley_values, axis=0)
        min_pose_idx = np.argmin(region_shapley_values, axis=0)
        range_per_region = (region_shapley_values.max(0)
                            - region_shapley_values.min(0))
        range_rank = cfg.num_regions - cal_rank(range_per_region)

        neighbor_idx = region_ball_neighbors(data, region_id,
                                             cfg.num_regions,
                                             BALL_QUERY_COEF)

        for region in range(cfg.num_regions):
            region_folder = (single_region_folder
                             + "range_rank%02d_region%02d/" % (range_rank[region],
                                                               region))
            mkdir(region_folder + "normal/")
            mkdir(region_folder + "max_pose/")
            mkdir(region_folder + "min_pose/")
            save_npy(region_folder + "max_pose/transform_params.npy",
                     all_params[max_pose_idx[region]])
            save_npy(region_folder + "max_pose/pose_idx.npy",
                     max_pose_idx[region])
            save_npy(region_folder + "min_pose/transform_params.npy",
                     all_params[min_pose_idx[region]])
            save_npy(region_folder + "min_pose/pose_idx.npy",
                     min_pose_idx[region])
            pair_list = gen_pair_single_region(region, neighbor_idx,
                                               cfg.num_regions)
            save_npy(region_folder + "region_pair_list.npy", pair_list)

        # ---- contexts for random pairs and single-region pairs
        gen_context(region_pair_list, inter_folder, cfg.num_regions, ratios,
                    num_save_context_max)
        for rf in sorted(os.listdir(single_region_folder)):
            region_folder = single_region_folder + rf + "/"
            if not os.path.isdir(region_folder):
                continue
            pair_list = np.load(region_folder + "region_pair_list.npy")
            if len(pair_list) == 0:
                continue
            gen_context(pair_list, region_folder, cfg.num_regions, ratios,
                        num_save_context_max)

        # ---- predicted labels at the adv / max / min poses.  Dispatch all
        # ~65 single-pose forwards first, fetch once: each blocking fetch
        # costs a tunnel round trip.
        pred_jobs = []

        def queue_pred(save_path):
            params = np.load(save_path + "transform_params.npy").astype(np.float32)
            dd = disturb_one(jnp.asarray(data), jnp.asarray(params))
            lg = fwd(dd[None]) if dd.ndim == 2 else fwd(dd)
            pred_jobs.append((save_path, jnp.argmax(lg, axis=1)))

        queue_pred(inter_folder + f"{mode_name}_adv/")
        for rf in sorted(os.listdir(single_region_folder)):
            region_folder = single_region_folder + rf + "/"
            if not os.path.isdir(region_folder):
                continue
            queue_pred(region_folder + "max_pose/")
            queue_pred(region_folder + "min_pose/")
        for _, pa in pred_jobs:
            pa.copy_to_host_async()
        for save_path, pa in pred_jobs:
            p = int(np.asarray(pa)[0])
            with open(save_path + "pred_labels.txt", "w") as f:
                f.write("lbl: %d\npred_lbl: %d\n" % (lbl, p))
            save_npy(save_path + "pred_labels.npy", np.array([lbl, p]))


# ---------------------------------------------------------------------------
# stage 2: interaction logits
# ---------------------------------------------------------------------------
class InteractionEngine:
    """Batched 4-row masked forwards for (pair, context) grids.

    All (pair, context) quadruples of a ratio are flattened into one work
    list, chunked into fixed-shape steps, and executed by a single
    `lax.scan` device call per ratio (reference
    final_point_binary_interaction_logits.py:15-70 loops pairs with one
    host-synced forward per context batch).  One keep-mask upload, one
    dispatch, and one logits fetch per ratio — host round trips through
    the TPU tunnel cost ~0.2 s each and otherwise dominate the stage.
    """

    # scan-length buckets (~1.3x spacing): each distinct length compiles
    # once (disk-cached); padding waste stays below ~25%.
    _T_BUCKETS = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 80, 96, 128,
                  160, 192, 256)

    @classmethod
    def _scan_length(cls, T: int) -> int:
        """Padded scan length for T worklist chunks: the next table bucket,
        or (past the table) a continued 1.25x progression — never a 2x
        jump, so padding waste stays below ~25% (the scan length is a step
        count, not a lane dimension: no alignment needed)."""
        T_pad = next((b for b in cls._T_BUCKETS if b >= T), None)
        if T_pad is None:
            T_pad = cls._T_BUCKETS[-1]
            while T_pad < T:
                T_pad = -(-T_pad * 5 // 4)
        return T_pad

    def __init__(self, forward_fn, num_regions: int, batch_contexts: int = 100,
                 coalition_sharding=None):
        self.forward_fn = forward_fn
        self.num_regions = num_regions
        self.batch_contexts = batch_contexts
        self.coalition_sharding = coalition_sharding
        from .shapley import _params_to_default_device
        apply_fn = getattr(forward_fn, "apply_fn", None)
        if apply_fn is not None:    # params as jit args, not baked constants
            self._apply = apply_fn
            self._variables = _params_to_default_device(forward_fn.variables)
        else:
            self._apply = lambda _vars, x: forward_fn(x)
            self._variables = None
        self._step = jax.jit(self._step_impl)
        self._scan = jax.jit(self._scan_impl)

    def _step_impl(self, variables, data, keep_rows, region_id):
        """keep_rows: (M, 4, R) region-level keep masks."""
        center = jnp.mean(data, axis=0)
        masked = masked_interaction_batch(data, center, keep_rows, region_id)
        if self.coalition_sharding is not None:
            masked = jax.lax.with_sharding_constraint(
                masked, self.coalition_sharding)
        return self._apply(variables, masked)            # (M*4, num_class)

    def _scan_impl(self, variables, data, keep_steps, region_id):
        """All chunks of one ratio in a single device call.

        Fresh host->device uploads through the TPU tunnel block the host for
        a full round trip (~0.2 s) each; the per-chunk `_step` loop paid that
        price per chunk and ran the engine at ~7k fwd/s while the enum path
        (one cached upload, 26k-row steps) sustains ~105k.  One upload + one
        `lax.scan` dispatch + one fetch makes the stage compute-bound again.

        Args:
          keep_steps: (T, bs, 4, R) bool; zero-padded tail rows are dropped
            by the caller.
        Returns:
          (T, bs*4, num_class) logits.
        """
        def body(_, keep):
            return None, self._step_impl(variables, data, keep, region_id)

        _, logits = jax.lax.scan(body, None, keep_steps)
        return logits

    def _keep_rows_np(self, region_pair_list, context_list) -> np.ndarray:
        """(P*C, 4, R) bool keep masks for every (pair, context), in the
        reference row order [S∪{i,j}, S∪{i}, S∪{j}, S]."""
        P, C = context_list.shape[0], context_list.shape[1]
        R = self.num_regions
        ctx_keep = np.zeros((P, C, R), bool)
        if context_list.shape[2] > 0:
            p_idx = np.repeat(np.arange(P), C * context_list.shape[2])
            c_idx = np.tile(np.repeat(np.arange(C), context_list.shape[2]), P)
            ctx_keep[p_idx, c_idx,
                     np.asarray(context_list, np.int64).ravel()] = True
        oi = np.zeros((P, 1, R), bool)
        oj = np.zeros((P, 1, R), bool)
        oi[np.arange(P), 0, np.asarray(region_pair_list)[:, 0]] = True
        oj[np.arange(P), 0, np.asarray(region_pair_list)[:, 1]] = True
        rows = np.stack([ctx_keep | oi | oj, ctx_keep | oi,
                         ctx_keep | oj, ctx_keep], axis=2)   # (P, C, 4, R)
        return rows.reshape(P * C, 4, R)

    def logits_for_pairs(self, data, region_id, region_pair_list,
                         context_list) -> np.ndarray:
        """(num_pairs, 4*num_context, num_class) logits.

        context_list: (num_pairs, num_context, m) region indices.
        """
        data = jnp.asarray(data)
        region_id_j = jnp.asarray(region_id)
        num_pairs, num_context = context_list.shape[0], context_list.shape[1]
        keep_all = self._keep_rows_np(region_pair_list, context_list)
        M = keep_all.shape[0]
        bs = self.batch_contexts
        T = -(-M // bs)
        T_pad = self._scan_length(T)
        pad = T_pad * bs - M
        if pad:             # all-False rows forward the all-centre cloud;
            keep_all = np.concatenate(      # their logits are sliced off
                [keep_all, np.zeros((pad, 4, self.num_regions), bool)])
        keep_steps = jnp.asarray(
            keep_all.reshape(T_pad, bs, 4, self.num_regions))  # ONE upload
        logits = self._scan(self._variables, data, keep_steps, region_id_j)
        flat = np.asarray(logits).reshape(T_pad * bs, 4, -1)[:M]
        return flat.reshape(num_pairs, 4 * num_context, -1)


def run_interaction_logits(cfg: ExperimentConfig, mode_name: str = "rotate",
                           synthetic: bool = False,
                           allow_random_init: bool = False,
                           ratios: Sequence[float] = tuple(RATIOS),
                           coalition_sharding=None,
                           sample_indices: Optional[list] = None,
                           gen_pair_seed: Optional[int] = None,
                           resume: bool = False):
    """Save ratio<r>_all_logits.pt for normal pose, adv pose, and the
    rank-1 single region at normal pose (reference
    final_point_binary_interaction_logits.py:83-136).

    ``gen_pair_seed`` selects which interaction_seed<k>/ artifact tree to
    read/write (the seed gen_pair ran with — reference
    final_point_binary_interaction_logits.py:110,148) without touching this
    run's own randomness; default = cfg.seed."""
    set_random(cfg.seed)
    folder_seed = cfg.seed if gen_pair_seed is None else gen_pair_seed
    mode = MODES[mode_name]
    dataset, names = resolve_dataset(cfg, synthetic)
    _, _, forward = load_frozen_model(cfg, allow_random_init)
    engine = InteractionEngine(forward, cfg.num_regions,
                               batch_contexts=cfg.interaction_batch_size,
                               coalition_sharding=coalition_sharding)
    disturb_one = jax.jit(mode.disturb_fn)

    indices = (sample_indices if sample_indices is not None
               else selected_sample_indices(cfg.dataset))
    for pc_idx in indices:
        data, lbl = dataset[pc_idx]
        name = names[pc_idx]
        base_folder = cfg.exp_folder + f"{name}/"
        inter_folder = base_folder + f"interaction_seed{folder_seed}/"
        single_region_folder = inter_folder + f"{mode_name}_adv_single_region/"
        region_id = np.load(base_folder + "region_id.npy")

        io = IOStream(inter_folder + "log.txt")
        try:
            _interaction_logits_one(engine, io, data, region_id, name,
                                    inter_folder, single_region_folder,
                                    mode_name, ratios, resume, disturb_one)
        finally:
            io.close()


def _interaction_logits_one(engine, io, data, region_id, name,
                            inter_folder, single_region_folder, mode_name,
                            ratios, resume, disturb_one):
    def save_all_orders(cloud, save_path):
        pair_list = np.load(save_path + "../region_pair_list.npy")
        if pair_list.size == 0:   # region with no ball-query neighbours
            io.cprint(f"  {save_path}: no pairs, skipping")
            return 0
        rows = 0
        for ratio in ratios:
            t0 = time.time()
            out_path = save_path + "ratio%d_all_logits.pt" % int(ratio * 100)
            if resume and os.path.exists(out_path):
                io.cprint(f"  ratio {ratio:.2f}: exists, skipping (--resume)")
                continue
            ctx = np.load(save_path
                          + "../ratio%d_context_list.npy" % int(ratio * 100))
            logits = engine.logits_for_pairs(cloud, region_id, pair_list, ctx)
            save_torch_tensor(out_path, logits)
            rows += logits.shape[0] * logits.shape[1]
            io.cprint(f"  ratio {ratio:.2f}: {logits.shape} "
                      f"in {time.time() - t0:.2f}s")
        return rows

    io.cprint(f"[interaction_logits] ======= sample {name} =======")
    # one timer over all three pose states; items = masked forwards, so
    # the JSON line lands in the same RESULTS.md throughput table as the
    # enum stages (scripts/make_results_md.py parse_stage_timers)
    with StageTimer(f"interaction:{name}", printer=io.cprint) as timer:
        forwards = save_all_orders(data, inter_folder + "normal/")

        params = np.load(inter_folder
                         + f"{mode_name}_adv/transform_params.npy"
                         ).astype(np.float32)
        data_disturb = np.asarray(disturb_one(jnp.asarray(data),
                                              jnp.asarray(params)))
        forwards += save_all_orders(data_disturb,
                                    inter_folder + f"{mode_name}_adv/")

        for rf in sorted(os.listdir(single_region_folder)):
            region_folder = single_region_folder + rf + "/"
            if not os.path.isdir(region_folder):
                continue
            range_rank = int(rf[10:12])
            if range_rank != 1:
                continue
            forwards += save_all_orders(data, region_folder + "normal/")
        # a fully-resumed rerun computes nothing: leave items unset so the
        # appended StageTimer line carries no items_per_sec — a 0.0 rate
        # would be averaged into the committed interaction rate by
        # parse_stage_timers (same failure class as the ADVICE-r4 stale-line
        # bug; this log appends because resume is per-(pose, ratio))
        timer.items = forwards or None


# ---------------------------------------------------------------------------
# stage 3: interaction scores (pure post-processing)
# ---------------------------------------------------------------------------
def compute_order_interaction(all_logits: np.ndarray, label: int,
                              softmax_type: str = "modified") -> np.ndarray:
    """I = v(S∪{i,j}) + v(S) − v(S∪{i}) − v(S∪{j}) per (pair, context).

    Args:
      all_logits: (num_pairs, 4*num_context, num_class).
    Returns:
      (num_pairs, num_context).
    """
    num_pairs, rows, _ = all_logits.shape
    num_context = rows // 4
    # numpy path: logits scoring is pure post-processing and must not
    # initialise a device backend (cal_interactions runs host-side)
    v = reward_from_logits_np(np.asarray(all_logits).reshape(
        num_pairs * rows, -1), label, softmax_type)
    v = v.reshape(num_pairs, num_context, 4)
    return v[:, :, 0] + v[:, :, 3] - v[:, :, 1] - v[:, :, 2]


def run_cal_interactions(cfg: ExperimentConfig, mode_name: str = "rotate",
                         synthetic: bool = False,
                         output_type: str = "pred",
                         ratios: Sequence[float] = tuple(RATIOS),
                         sample_indices: Optional[list] = None,
                         gen_pair_seed: Optional[int] = None):
    """Score saved logits into ratio<r>_{gt,pred}_interaction.npy
    (reference final_cal_interactions.py:40-100).

    ``gen_pair_seed`` selects the interaction_seed<k>/ artifact tree
    (reference final_cal_interactions.py:71,112); default = cfg.seed."""
    folder_seed = cfg.seed if gen_pair_seed is None else gen_pair_seed
    dataset, names = resolve_dataset(cfg, synthetic)
    indices = (sample_indices if sample_indices is not None
               else selected_sample_indices(cfg.dataset))

    def cal_all_orders(label, save_path):
        from ..utils.io import load_torch_tensor
        for ratio in ratios:
            path = save_path + "ratio%d_all_logits.pt" % int(ratio * 100)
            if not os.path.exists(path):
                # regions with no ball-query neighbours have no pairs and the
                # logits stage skipped them (mirrors its "no pairs" skip)
                print(f"  {path}: missing (no pairs), skipping")
                continue
            logits = load_torch_tensor(path)
            inter = compute_order_interaction(logits, label, cfg.softmax_type)
            save_npy(save_path + "ratio%d_%s_interaction.npy"
                     % (int(ratio * 100), output_type), inter)

    for pc_idx in indices:
        _, lbl = dataset[pc_idx]
        name = names[pc_idx]
        inter_folder = (cfg.exp_folder + f"{name}/"
                        + f"interaction_seed{folder_seed}/")
        single_region_folder = inter_folder + f"{mode_name}_adv_single_region/"

        print(f"[cal_interactions] ======= sample {name} =======")
        cal_all_orders(lbl, inter_folder + "normal/")

        pred_class = int(np.load(inter_folder
                                 + f"{mode_name}_adv/pred_labels.npy")[1])
        adv_label = lbl if output_type == "gt" else pred_class
        cal_all_orders(adv_label, inter_folder + f"{mode_name}_adv/")

        for rf in sorted(os.listdir(single_region_folder)):
            region_folder = single_region_folder + rf + "/"
            if not os.path.isdir(region_folder):
                continue
            if int(rf[10:12]) != 1:
                continue
            cal_all_orders(lbl, region_folder + "normal/")
