"""Classification losses (reference tools/final_util.py:71-88)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _weighted_mean(per_sample: jnp.ndarray, weights) -> jnp.ndarray:
    """Mean over rows; with `weights` (e.g. a padded-tail validity mask),
    a weighted mean so duplicate pad rows carry no gradient."""
    if weights is None:
        return jnp.mean(per_sample)
    w = weights.astype(per_sample.dtype)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


def smooth_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                         eps: float = 0.2, weights=None) -> jnp.ndarray:
    """Label-smoothing CE: one-hot*(1-eps) + (1-onehot)*eps/(C-1)."""
    n_class = logits.shape[-1]
    one_hot = jax.nn.one_hot(labels, n_class)
    one_hot = one_hot * (1 - eps) + (1 - one_hot) * eps / (n_class - 1)
    log_prb = jax.nn.log_softmax(logits, axis=-1)
    return _weighted_mean(-jnp.sum(one_hot * log_prb, axis=-1), weights)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  weights=None) -> jnp.ndarray:
    log_prb = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(log_prb, labels[:, None], axis=-1)[:, 0]
    return _weighted_mean(-picked, weights)


def cal_loss(logits: jnp.ndarray, labels: jnp.ndarray,
             smoothing: bool = True, weights=None) -> jnp.ndarray:
    return (smooth_cross_entropy(logits, labels, weights=weights) if smoothing
            else cross_entropy(logits, labels, weights=weights))
