"""DGCNN and GCNN classifiers.

DGCNN recomputes the kNN graph in *feature space* before every edge-conv
(reference models/dgcnn.py:51-120); GCNN reuses the *input-space* kNN graph
for all four layers (dgcnn.py:123-194) — structurally identical otherwise.

Edge features are ``[x_j - x_i, x_i]`` over each point's k neighbours
(dgcnn.py:21-47).  The gather + edge construction + 1x1 conv + max-over-k
here is expressed so XLA fuses the elementwise work into the conv matmul;
the (B, N, k, 2C) tensor is the model family's peak activation and drives
the per-model coalition batch size.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.geometry import knn
from .common import BN_EPS, BN_MOMENTUM, ConvBN, leaky_relu02


def graph_feature(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Edge features [x_j - x_i, x_i] for given neighbour indices.

    Args:
      x: (B, N, C)
      idx: (B, N, k) neighbour indices.
    Returns:
      (B, N, k, 2C).
    """
    neigh = jax.vmap(lambda f, i: f[i])(x, idx)          # (B, N, k, C)
    centre = jnp.broadcast_to(x[:, :, None, :], neigh.shape)
    return jnp.concatenate([neigh - centre, centre], axis=-1)


class EdgeConv(nn.Module):
    """Edge convolution: graph feature -> 1x1 conv (no bias) + BN + LeakyReLU
    -> max over neighbours."""
    features: int

    @nn.compact
    def __call__(self, x, idx, train: bool = False):
        e = graph_feature(x, idx)                        # (B, N, k, 2C)
        e = ConvBN(self.features, use_bias=False, act=leaky_relu02,
                   name="conv")(e, train=train)
        return jnp.max(e, axis=2)                        # (B, N, features)


class _DGCNNBase(nn.Module):
    num_classes: int = 10
    k: int = 20
    dynamic_graph: bool = True   # True: DGCNN, False: GCNN (fixed input-space graph)

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, N, 3)
        fix_idx = knn(x, self.k)
        x1 = EdgeConv(64, name="conv1")(x, fix_idx, train=train)
        idx2 = knn(x1, self.k) if self.dynamic_graph else fix_idx
        x2 = EdgeConv(64, name="conv2")(x1, idx2, train=train)
        idx3 = knn(x2, self.k) if self.dynamic_graph else fix_idx
        x3 = EdgeConv(128, name="conv3")(x2, idx3, train=train)
        idx4 = knn(x3, self.k) if self.dynamic_graph else fix_idx
        x4 = EdgeConv(256, name="conv4")(x3, idx4, train=train)

        x = jnp.concatenate([x1, x2, x3, x4], axis=-1)   # (B, N, 512)
        x = ConvBN(1024, use_bias=False, act=leaky_relu02,
                   name="conv5")(x, train=train)          # (B, N, 1024)
        xmax = jnp.max(x, axis=1)
        xavg = jnp.mean(x, axis=1)
        x = jnp.concatenate([xmax, xavg], axis=-1)       # (B, 2048)

        x = nn.Dense(512, use_bias=False, name="linear1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, name="bn6")(x)
        x = leaky_relu02(x)
        x = nn.Dropout(0.5, deterministic=not train, name="dp1")(x)
        x = nn.Dense(256, name="linear2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, name="bn7")(x)
        x = leaky_relu02(x)
        x = nn.Dropout(0.5, deterministic=not train, name="dp2")(x)
        return nn.Dense(self.num_classes, name="linear3")(x)


class DGCNNCls(_DGCNNBase):
    dynamic_graph: bool = True


class GCNNCls(_DGCNNBase):
    dynamic_graph: bool = False
