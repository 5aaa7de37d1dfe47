"""Shared building blocks for the point-cloud classifiers.

All models use the channels-last ``(B, N, C)`` layout; a torch ``Conv1d/2d``
with kernel size 1 is a Dense over the channel axis, which XLA lowers to a
single MXU matmul over the flattened point axis.

BatchNorm matches torch semantics: eps 1e-5, running-stats momentum 0.1
(flax momentum 0.9), normalising over every axis but channels.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

BN_MOMENTUM = 0.9     # flax momentum = 1 - torch momentum (0.1)
BN_EPS = 1e-5


def leaky_relu02(x):
    return nn.leaky_relu(x, negative_slope=0.2)


def on_tpu() -> bool:
    """True when the default backend is a TPU (incl. the axon tunnel)."""
    import jax
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


class ConvBN(nn.Module):
    """Dense (1x1 conv) + BatchNorm + activation over the channel axis."""
    features: int
    use_bias: bool = True
    act: Optional[Callable] = nn.relu

    @nn.compact
    def __call__(self, x, train: bool = False, skip_act: bool = False):
        x = nn.Dense(self.features, use_bias=self.use_bias, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, name="bn")(x)
        if self.act is not None and not skip_act:
            x = self.act(x)
        return x


class MLPStack(nn.Module):
    """A stack of ConvBN layers (a per-point MLP).

    ``fold=True`` returns the eval-mode layers as explicit affine maps
    [(A_i, b_i)] with BatchNorm folded in (y = act(x @ A + b)), extracted by
    probing each layer with [0; I] — parameter names and shapes are
    identical to the normal path, so checkpoints are oblivious.  Used by the
    fused Pallas set-abstraction path.
    """
    features: Sequence[int]
    use_bias: bool = True
    act: Optional[Callable] = nn.relu

    @nn.compact
    def __call__(self, x=None, train: bool = False, fold: bool = False,
                 c_in: Optional[int] = None):
        if fold:
            assert c_in is not None
            folded = []
            c = c_in
            for i, f in enumerate(self.features):
                layer = ConvBN(f, use_bias=self.use_bias, act=self.act,
                               name=f"layer{i}")
                probe = jnp.concatenate(
                    [jnp.zeros((1, c), jnp.float32),
                     jnp.eye(c, dtype=jnp.float32)], axis=0)
                out = layer(probe, train=False, skip_act=True)   # (c+1, f)
                b = out[0]
                folded.append((out[1:] - b, b))
                c = f
            return folded
        for i, f in enumerate(self.features):
            x = ConvBN(f, use_bias=self.use_bias, act=self.act,
                       name=f"layer{i}")(x, train=train)
        return x


class DenseBN(nn.Module):
    """Dense + BatchNorm1d + activation for (B, C) feature vectors."""
    features: int
    use_bias: bool = True
    act: Optional[Callable] = nn.relu

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.features, use_bias=self.use_bias, name="fc")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, name="bn")(x)
        if self.act is not None:
            x = self.act(x)
        return x
