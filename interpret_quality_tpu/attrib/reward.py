"""Reward (value function) for Shapley / interaction estimation.

Reference semantics (tools/final_common.py:11-24):

  * "normal":   v = log_softmax(logits)[label]
  * "modified": v = logits[label] - logsumexp(logits[others])
                (= log p/(1-p), the log-odds of the labelled class)
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import logsumexp


def reward_from_logits(logits: jnp.ndarray, label: jnp.ndarray,
                       softmax_type: str = "modified") -> jnp.ndarray:
    """Score a batch of logits w.r.t. one label.

    Args:
      logits: (B', num_class)
      label: scalar int array — the class whose reward is evaluated.
      softmax_type: "normal" | "modified".
    Returns:
      (B',) rewards.
    """
    num_class = logits.shape[-1]
    label = jnp.asarray(label).reshape(())
    picked = jnp.take_along_axis(
        logits, jnp.broadcast_to(label, (logits.shape[0], 1)), axis=1)[:, 0]
    if softmax_type == "normal":
        return picked - logsumexp(logits, axis=-1)
    elif softmax_type == "modified":
        # mask out the labelled class with -inf before the logsumexp
        others = jnp.where(
            jnp.arange(num_class) == label, -jnp.inf, logits)
        return picked - logsumexp(others, axis=-1)
    raise ValueError(f"unknown softmax_type {softmax_type!r}")


def reward_from_logits_np(logits, label: int,
                          softmax_type: str = "modified"):
    """Numpy twin of reward_from_logits for host-side post-processing
    stages (e.g. scoring saved logits), so they never initialise a device
    backend."""
    import numpy as np
    from scipy.special import logsumexp as np_logsumexp

    logits = np.asarray(logits, dtype=np.float64)
    picked = logits[:, int(label)]
    if softmax_type == "normal":
        return picked - np_logsumexp(logits, axis=-1)
    elif softmax_type == "modified":
        others = np.delete(logits, int(label), axis=1)
        return picked - np_logsumexp(others, axis=-1)
    raise ValueError(f"unknown softmax_type {softmax_type!r}")


# alias matching the reference name
get_reward = reward_from_logits
