"""Classification losses (reference tools/final_util.py:71-88)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                         eps: float = 0.2) -> jnp.ndarray:
    """Label-smoothing CE: one-hot*(1-eps) + (1-onehot)*eps/(C-1)."""
    n_class = logits.shape[-1]
    one_hot = jax.nn.one_hot(labels, n_class)
    one_hot = one_hot * (1 - eps) + (1 - one_hot) * eps / (n_class - 1)
    log_prb = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(one_hot * log_prb, axis=-1))


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    log_prb = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(log_prb, labels[:, None], axis=-1)[:, 0]
    return -jnp.mean(picked)


def cal_loss(logits: jnp.ndarray, labels: jnp.ndarray,
             smoothing: bool = True) -> jnp.ndarray:
    return (smooth_cross_entropy(logits, labels) if smoothing
            else cross_entropy(logits, labels))
