"""Pose-invariant graph plans: factor graph construction out of pose loops.

Every perturbation-enumeration pose is a rigid (or uniform-scale) transform
of the SAME masked coalition batch: masking commutes with the transform
(mask(T(x)) == T(mask(x)) because the cloud centre is equivariant), and
FPS selection, kNN graphs, ball-query membership and KDE density depend
only on pairwise distances — invariant under translation/rotation and
order-preserved under uniform positive scale.  The enumeration engine
(attrib/shapley.ShapleyEngine.enum_all_poses_plan) therefore computes the
graph ONCE per order chunk from the canonical (undisturbed) masked batch
and reuses it for all 216 poses, eliminating the selection sweeps — the
dominant cost of every graph model (docs/PERF.md §3) — from the pose loop.

What each family's plan carries (and which enum modes may reuse it):

  * dgcnn      — layer-1 input-space kNN indices (layers 2-4 re-select in
                 feature space, which is NOT pose-invariant).  trans/rotate/
                 scale (kNN ordering is scale-invariant).
  * gcnn       — the single input-space kNN graph shared by all four edge
                 convs (reference models/dgcnn.py:161-194).  trans/rotate/scale.
  * pointnet2  — FPS indices of both set-abstraction levels (reference
                 pointnet2.py:45-68); ball-query membership depends on the
                 absolute radius, so it stays in the per-pose kernel — valid
                 there for trans/rotate AND scale because the kernel reruns
                 it on the transformed coordinates.  trans/rotate/scale.
  * pointconv  — per level: FPS indices, kNN indices, gathered inverse KDE
                 densities + per-group max (reference pointconv.py:103-114,
                 199-209), plus the group-all level's inverse density.
                 Density VALUES change under scale, so trans/rotate only.
  * pointnet   — no plan (no graph construction; the STN is pose-dependent
                 dense math).

Deviation from per-pose recomputation is confined to distance TIES at
floating-point noise (~1e-7 relative): rotated coordinates round slightly
differently, so a tie that thin may pick the other neighbour — far below
the Shapley estimator's 100-order sampling std, and the same tolerance
class the default `packed` kNN selection already accepts (~2^-13,
docs/PERF.md §3).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from ..ops.geometry import (compute_density, farthest_point_sample,
                            index_points, knn, knn_point)
from ..ops.pallas import fps_pallas, knn_pallas
from ..ops.pallas.groups import knn_with_density

# (npoint, nsample, bandwidth) per PointConv SA level — mirrors
# PointConvDensityClsSsg (models/pointconv.py) / reference pointconv.py:394-424.
_POINTCONV_LEVELS = ((512, 32, 0.1), (128, 64, 0.2))
_POINTCONV_BW3 = 0.4
# npoint per PointNet++ MSG level — mirrors PointNet2ClsMsg / reference
# pointnet2.py:244-276.
_POINTNET2_NPOINTS = (512, 128)


def dgcnn_plan(x: jnp.ndarray, k: int, fused: bool):
    """Input-space kNN graph: (B, N, k) int32."""
    return knn_pallas(x, x, k) if fused else knn(x, k)


def pointnet2_plan(x: jnp.ndarray, fused: bool):
    """FPS indices per SA level: ((B, 512), (B, 128)) int32."""
    fps = ((lambda xyz, s: fps_pallas(xyz, s, block_b=16)) if fused
           else farthest_point_sample)
    f1 = fps(x, _POINTNET2_NPOINTS[0])
    x1 = index_points(x, f1)
    f2 = fps(x1, _POINTNET2_NPOINTS[1])
    return (f1, f2)


def pointconv_plan(x: jnp.ndarray, fused: bool):
    """Per level (fps_idx, knn idx, gathered inverse densities, group max),
    plus the group-all level's inverse density (B, 128)."""
    levels = []
    xyz = x
    for npoint, nsample, bandwidth in _POINTCONV_LEVELS:
        inv_density = 1.0 / compute_density(xyz, bandwidth)      # (B, N)
        if fused:
            fps_idx = fps_pallas(xyz, npoint, block_b=16)
            new_xyz = index_points(xyz, fps_idx)
            idx, den, dmax = knn_with_density(new_xyz, xyz, inv_density,
                                              nsample)
        else:
            fps_idx = farthest_point_sample(xyz, npoint)
            new_xyz = index_points(xyz, fps_idx)
            idx = knn_point(nsample, xyz, new_xyz)
            den = index_points(inv_density[..., None], idx)[..., 0]
            dmax = jnp.max(den, axis=2, keepdims=True)           # (B, S, 1)
        levels.append((fps_idx, idx, den, dmax))
        xyz = new_xyz
    inv_den3 = 1.0 / compute_density(xyz, _POINTCONV_BW3)        # (B, 128)
    return (tuple(levels), inv_den3)


# enum modes whose transform preserves each family's plan exactly (up to
# fp-noise ties) — see module docstring.
PLAN_MODES = {
    "dgcnn": frozenset({"trans", "rotate", "scale"}),
    "gcnn": frozenset({"trans", "rotate", "scale"}),
    "gcnn_adv": frozenset({"trans", "rotate", "scale"}),
    "pointnet2": frozenset({"trans", "rotate", "scale"}),
    "pointconv": frozenset({"trans", "rotate"}),
}


def make_plan_fn(model, fused: bool) -> Optional[Callable]:
    """Pure-geometry plan builder ``(B, N, 3) -> plan pytree`` for a model
    instance, or None for families without one."""
    from .dgcnn import _DGCNNBase
    from .pointconv import PointConvDensityClsSsg
    from .pointnet2 import PointNet2ClsMsg
    if isinstance(model, _DGCNNBase):
        k = model.k
        return lambda x: dgcnn_plan(x, k, fused)
    if isinstance(model, PointNet2ClsMsg):
        return lambda x: pointnet2_plan(x, fused)
    if isinstance(model, PointConvDensityClsSsg):
        return lambda x: pointconv_plan(x, fused)
    return None


def plan_modes_for(model_name: str) -> frozenset:
    return PLAN_MODES.get(model_name, frozenset())
