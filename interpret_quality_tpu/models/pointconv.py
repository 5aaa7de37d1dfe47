"""PointConv (density-weighted) SSG classifier.

Parity with reference models/pointconv.py:199-424:

  * Gaussian-KDE inverse point density, per-group normalised by the group
    max (pointconv.py:376-377).
  * DensityNet 1->16->8->1 where *every* layer is conv+BN+ReLU — the
    reference's sigmoid branch is dead code (`if i == len(self.mlp_convs)`
    inside a loop bounded by len-1, pointconv.py:226-234) and is reproduced
    as always-ReLU here for behavioural parity.
  * WeightNet 3->8->8->16 conv+BN+ReLU.
  * Set abstraction: per-point MLP on [xyz offsets, features], scaled by the
    density net, contracted against the learned weights with a batched
    matmul (B,S,C,K)@(B,S,K,16) -> flattened (C-major) -> Linear + BN1d + ReLU.
  * group-all stage centres the cloud at its mean (pointconv.py:148-170),
    unlike PointNet++'s uncentred group-all.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.geometry import (compute_density, farthest_point_sample,
                            index_points, knn_point)
from ..config import gather_value_parts
from ..ops.pallas import fps_pallas, fused_pointconv_sa, knn_with_density
from .common import BN_EPS, BN_MOMENTUM, MLPStack, on_tpu


class DensityNet(nn.Module):
    hidden: Sequence[int] = (16, 8)

    @nn.compact
    def __call__(self, scale=None, train: bool = False, fold: bool = False):
        # scale: (B, S, K, 1); fold=True returns the eval-mode layers as
        # BatchNorm-folded affines for the fused Pallas path
        feats = list(self.hidden) + [1]
        m = MLPStack(feats, name="mlp")
        if fold:
            return m(fold=True, c_in=1)
        return m(scale, train=train)


class WeightNet(nn.Module):
    out_channel: int = 16
    hidden: Sequence[int] = (8, 8)

    @nn.compact
    def __call__(self, xyz=None, train: bool = False, fold: bool = False):
        # xyz: (B, S, K, 3) localized coordinates
        feats = list(self.hidden) + [self.out_channel]
        m = MLPStack(feats, name="mlp")
        if fold:
            return m(fold=True, c_in=3)
        return m(xyz, train=train)


class PointConvDensitySA(nn.Module):
    npoint: Optional[int]
    nsample: Optional[int]
    mlp: Sequence[int]
    bandwidth: float
    group_all: bool = False

    @nn.compact
    def __call__(self, xyz, points, train: bool = False, fused: bool = False,
                 plan=None):
        """
        Args:
          xyz: (B, N, 3); points: (B, N, D) or None.
          fused: use the Pallas kNN + one-hot-matmul gather path with the
            first MLP layer hoisted above the gather (eval only).
          plan: precomputed pose-invariant geometry
            (models.plans.pointconv_plan): (fps_idx, idx, den, dmax) for an
            SA level, or the inverse density (B, N) for the group-all level.
        Returns:
          new_xyz (B, S, 3), new_points (B, S, mlp[-1]).
        """
        B, N, _ = xyz.shape
        mlp = MLPStack(self.mlp, name="mlp")

        if self.group_all:
            inv_density = (plan if plan is not None
                           else 1.0 / compute_density(xyz, self.bandwidth))
            S = 1
            new_xyz = jnp.mean(xyz, axis=1, keepdims=True)        # (B, 1, 3)
            grouped_xyz = xyz[:, None, :, :] - new_xyz[:, :, None, :]
            grouped = grouped_xyz
            if points is not None:
                grouped = jnp.concatenate(
                    [grouped_xyz, points[:, None, :, :]], axis=-1)
            grouped_density = inv_density[:, None, :, None]       # (B, 1, N, 1)
            h = mlp(grouped, train=train)                         # (B, 1, N, C)
        elif fused:
            S = self.npoint
            K = self.nsample
            D = 0 if points is None else points.shape[-1]
            if plan is not None:
                fps_idx, idx, den, dmax = plan
            else:
                inv_density = 1.0 / compute_density(xyz, self.bandwidth)
                fps_idx = fps_pallas(xyz, S, block_b=16)
            new_xyz = index_points(xyz, fps_idx)                  # (B, S, 3)
            if plan is None:
                idx, den, dmax = knn_with_density(new_xyz, xyz,
                                                  inv_density, K)
            # hoist MLP layer 1 above the gather (BN folded; input order is
            # [xyz offsets, features] — reference pointconv.py:137)
            folded = mlp(fold=True, c_in=D + 3)
            (A1, b1) = folded[0]
            (A2, b2) = folded[1]
            (A3, b3) = folded[2]
            src = (xyz if points is None
                   else jnp.concatenate([xyz, points], -1))
            u = src @ A1 + b1                                     # (B, N, C1)
            csw = new_xyz @ A1[:3]                                # (B, S, C1)
            dnet = DensityNet(name="densitynet")(fold=True)
            wnet = WeightNet(16, name="weightnet")(fold=True)
            out = fused_pointconv_sa(
                idx, den, dmax, new_xyz, u, xyz, csw, A2, b2, A3, b3,
                dnet, wnet, k=K, parts=gather_value_parts())      # (B,S,C3*16)
            out = nn.Dense(self.mlp[-1], name="linear")(out)
            out = nn.BatchNorm(use_running_average=not train,
                               momentum=BN_MOMENTUM, epsilon=BN_EPS,
                               name="bn_linear")(out)
            return new_xyz, nn.relu(out)
        else:
            S = self.npoint
            if plan is not None:
                fps_idx, idx, den, _ = plan
                grouped_density = den[..., None]                  # (B, S, K, 1)
            else:
                inv_density = 1.0 / compute_density(xyz, self.bandwidth)
                fps_idx = farthest_point_sample(xyz, S)
            new_xyz = index_points(xyz, fps_idx)                  # (B, S, 3)
            if plan is None:
                idx = knn_point(self.nsample, xyz, new_xyz)       # (B, S, K)
                grouped_density = index_points(
                    inv_density[..., None], idx)                  # (B, S, K, 1)
            grouped_xyz = index_points(xyz, idx) - new_xyz[:, :, None, :]
            grouped = grouped_xyz
            if points is not None:
                grouped_points = index_points(points, idx)
                # reference order: [xyz offsets, features] (pointconv.py:137)
                grouped = jnp.concatenate([grouped_xyz, grouped_points], -1)
            h = mlp(grouped, train=train)                         # (B, S, K, C)

        inv_max = jnp.max(grouped_density, axis=2, keepdims=True)
        density_scale = DensityNet(name="densitynet")(
            grouped_density / inv_max, train=train)               # (B, S, K, 1)
        h = h * density_scale

        weights = WeightNet(16, name="weightnet")(
            grouped_xyz, train=train)                             # (B, S, K, 16)
        # (B,S,C,K) @ (B,S,K,16) -> (B,S,C,16), flattened C-major to match the
        # reference's view(B, npoint, -1) for checkpoint compatibility
        out = jnp.einsum("bskc,bskw->bscw", h, weights,
                         preferred_element_type=h.dtype)
        out = out.reshape(out.shape[0], out.shape[1], -1)          # (B, S, C*16)
        out = nn.Dense(self.mlp[-1], name="linear")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                           epsilon=BN_EPS, name="bn_linear")(out)
        out = nn.relu(out)
        return new_xyz, out


class PointConvDensityClsSsg(nn.Module):
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False, fused=None, plan=None):
        # fused=None auto-selects the Pallas kNN/gather path on TPU eval
        # (not differentiable).  plan: models.plans.pointconv_plan output —
        # ((level plans), group-all inverse density).
        if fused is None:
            fused = (not train) and on_tpu()
        levels, invden3 = plan if plan is not None else ((None, None), None)
        l1_xyz, l1_points = PointConvDensitySA(
            512, 32, [64, 64, 128], 0.1, group_all=False,
            name="sa1")(x, None, train=train, fused=fused, plan=levels[0])
        l2_xyz, l2_points = PointConvDensitySA(
            128, 64, [128, 128, 256], 0.2, group_all=False,
            name="sa2")(l1_xyz, l1_points, train=train, fused=fused,
                        plan=levels[1])
        _, l3_points = PointConvDensitySA(
            None, None, [256, 512, 1024], 0.4, group_all=True,
            name="sa3")(l2_xyz, l2_points, train=train, fused=fused,
                        plan=invden3)

        h = l3_points[:, 0, :] if l3_points.ndim == 3 else l3_points
        h = nn.Dense(512, name="fc1")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Dropout(0.7, deterministic=not train, name="drop1")(h)
        h = nn.Dense(256, name="fc2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, name="bn2")(h)
        h = nn.relu(h)
        h = nn.Dropout(0.7, deterministic=not train, name="drop2")(h)
        return nn.Dense(self.num_classes, name="fc3")(h)
