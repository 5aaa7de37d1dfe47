"""PointNet++ (MSG) classifier.

Parity with reference models/pointnet2.py:93-276: FPS with first point
fixed at index 0, sort-and-clamp ball-query grouping, multi-scale grouping
set-abstraction layers (features concatenated as [grouped_points,
grouped_xyz_offset]), a group-all stage whose grouped xyz is *uncentred*
(pointnet2.py:119-136), and an FC head with dropout 0.4.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.geometry import (farthest_point_sample, index_points,
                            query_ball_point)
from ..config import gather_value_parts
from ..ops.pallas import fps_pallas, fused_ball_mlp3
from .common import MLPStack, on_tpu


class SetAbstractionMsg(nn.Module):
    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]

    @nn.compact
    def __call__(self, xyz, points, train: bool = False, fused: bool = False,
                 fps_idx=None):
        """
        Args:
          xyz: (B, N, 3) coordinates.
          points: (B, N, D) features or None.
          fused: use the Pallas fused ball-query + grouped-MLP kernel
            (eval only; the grouped (B, S, K, C) tensor never exists).
          fps_idx: precomputed FPS indices (B, S) (models.plans.pointnet2_plan)
            — pose-invariant, reused across enumeration poses; ball-query
            membership stays per-pose (in-kernel) because it depends on the
            absolute radius.
        Returns:
          new_xyz (B, S, 3), new_points (B, S, sum of last mlp dims).
        """
        S = self.npoint
        if fps_idx is None:
            fps_idx = (fps_pallas(xyz, S, block_b=16) if fused
                       else farthest_point_sample(xyz, S))
        new_xyz = index_points(xyz, fps_idx)                     # (B, S, 3)

        outs = []
        for i, radius in enumerate(self.radius_list):
            K = self.nsample_list[i]
            mlp = MLPStack(self.mlp_list[i], name=f"branch{i}")
            if fused:
                assert len(self.mlp_list[i]) == 3
                D = 0 if points is None else points.shape[-1]
                (A1, b1), (A2, b2), (A3, b3) = mlp(fold=True, c_in=D + 3)
                # reference input order [features, xyz offsets]
                # (pointnet2.py:226): A1 rows [0:D] features, [D:] xyz.
                # Features hoist above the gather; the xyz-offset part of
                # layer 1 is computed in-kernel from exact f32 coordinates.
                uf = None if points is None else points @ A1[:D]
                outs.append(fused_ball_mlp3(new_xyz, xyz, uf, b1, A1[D:],
                                            A2, b2, A3, b3,
                                            radius=radius, k=K,
                                            parts=gather_value_parts()))
                continue
            group_idx = query_ball_point(radius, K, xyz, new_xyz)
            grouped_xyz = index_points(xyz, group_idx)           # (B, S, K, 3)
            grouped_xyz = grouped_xyz - new_xyz[:, :, None, :]
            if points is not None:
                grouped_points = index_points(points, group_idx)
                # reference order: [features, xyz offsets] (pointnet2.py:226)
                grouped = jnp.concatenate([grouped_points, grouped_xyz], -1)
            else:
                grouped = grouped_xyz
            h = mlp(grouped, train=train)
            outs.append(jnp.max(h, axis=2))                      # (B, S, C_i)
        return new_xyz, jnp.concatenate(outs, axis=-1)


class SetAbstractionAll(nn.Module):
    """Group-all set abstraction (reference pointnet2.py:119-136,166-178)."""
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz, points, train: bool = False):
        # grouped xyz is the raw coordinates (uncentred) in the reference
        grouped = xyz[:, None, :, :]                             # (B, 1, N, 3)
        if points is not None:
            grouped = jnp.concatenate([grouped, points[:, None, :, :]], -1)
        h = MLPStack(self.mlp, name="mlp")(grouped, train=train)
        return jnp.max(h, axis=2)[:, 0, :]                       # (B, C_out)


class PointNet2ClsMsg(nn.Module):
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False, fused=None, plan=None):
        # x: (B, N, 3).  fused=None auto-selects the Pallas fused
        # set-abstraction kernels on TPU eval (not differentiable).
        # plan: (fps_idx_sa1, fps_idx_sa2) from models.plans.pointnet2_plan.
        if fused is None:
            fused = (not train) and on_tpu()
        f1, f2 = plan if plan is not None else (None, None)
        l1_xyz, l1_points = SetAbstractionMsg(
            512, [0.1, 0.2, 0.4], [16, 32, 128],
            [[32, 32, 64], [64, 64, 128], [64, 96, 128]],
            name="sa1")(x, None, train=train, fused=fused, fps_idx=f1)
        l2_xyz, l2_points = SetAbstractionMsg(
            128, [0.2, 0.4, 0.8], [32, 64, 128],
            [[64, 64, 128], [128, 128, 256], [128, 128, 256]],
            name="sa2")(l1_xyz, l1_points, train=train, fused=fused,
                        fps_idx=f2)
        feat = SetAbstractionAll([256, 512, 1024],
                                 name="sa3")(l2_xyz, l2_points, train=train)

        h = nn.Dense(512, name="fc1")(feat)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Dropout(0.4, deterministic=not train, name="drop1")(h)
        h = nn.Dense(256, name="fc2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(h)
        h = nn.relu(h)
        h = nn.Dropout(0.4, deterministic=not train, name="drop2")(h)
        return nn.Dense(self.num_classes, name="fc3")(h)
