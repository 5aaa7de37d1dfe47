"""PointNet classifier with input and feature spatial-transformer networks.

Architecture parity with reference models/pointnet.py:11-115 (STN 3x3 and
64x64 transforms, three shared-MLP stages, global max pool, FC head,
dropout 0.3 applied *before* the second head BN as in the reference).
Layout is (B, N, C) channels-last.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .common import BN_EPS, BN_MOMENTUM, ConvBN, DenseBN


class STNkd(nn.Module):
    """Spatial transformer predicting a (k, k) matrix (identity-anchored)."""
    k: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, N, k)
        h = ConvBN(64, name="conv1")(x, train=train)
        h = ConvBN(128, name="conv2")(h, train=train)
        h = ConvBN(1024, name="conv3")(h, train=train)
        h = jnp.max(h, axis=1)                              # (B, 1024)
        h = DenseBN(512, name="fc1")(h, train=train)
        h = DenseBN(256, name="fc2")(h, train=train)
        h = nn.Dense(self.k * self.k, name="fc3")(h)
        iden = jnp.eye(self.k, dtype=h.dtype).reshape(-1)
        h = h + iden
        return h.reshape(-1, self.k, self.k)


class PointNetFeat(nn.Module):
    feature_transform: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, N, 3)
        trans = STNkd(k=3, name="stn")(x, train=train)
        x = jnp.matmul(x, trans)                            # (B, N, 3)
        x = ConvBN(64, name="conv1")(x, train=train)

        if self.feature_transform:
            trans_feat = STNkd(k=64, name="fstn")(x, train=train)
            x = jnp.matmul(x, trans_feat)
        else:
            trans_feat = None

        x = ConvBN(128, name="conv2")(x, train=train)
        x = ConvBN(1024, act=None, name="conv3")(x, train=train)
        crt_points = jnp.argmax(x, axis=1)                  # (B, 1024)
        x = jnp.max(x, axis=1)                              # (B, 1024)
        return x, trans, trans_feat, crt_points


class PointNetCls(nn.Module):
    num_classes: int = 10
    feature_transform: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x, trans, trans_feat, crt_points = PointNetFeat(
            feature_transform=self.feature_transform, name="feat")(x, train=train)
        x = DenseBN(512, name="fc1")(x, train=train)
        # reference order: relu(bn2(dropout(fc2(x)))) — pointnet.py:112
        x = nn.Dense(256, name="fc2")(x)
        x = nn.Dropout(0.3, deterministic=not train, name="dropout")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, name="bn2")(x)
        x = nn.relu(x)
        x = nn.Dense(self.num_classes, name="fc3")(x)
        return x, trans_feat, crt_points


def feature_transform_regularizer(trans: jnp.ndarray) -> jnp.ndarray:
    """||I - T T^t||_F mean over batch (reference pointnet.py:119-126)."""
    d = trans.shape[-1]
    eye = jnp.eye(d, dtype=trans.dtype)
    diff = jnp.matmul(trans, jnp.swapaxes(trans, -1, -2)) - eye
    return jnp.mean(jnp.linalg.norm(diff, axis=(-2, -1)))
