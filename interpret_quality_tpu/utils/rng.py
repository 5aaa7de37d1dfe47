"""Host-side RNG discipline.

Permutation / pair / context sampling stays host-side numpy with the
reference's seeding scheme (tools/final_util.py:113-120) so that artifacts
are comparable run-to-run and stages stay restartable.  Device RNG (dropout
during training) uses jax PRNG keys and is independent of this.
"""
from __future__ import annotations

import os
import random

import numpy as np


def set_random(seed: int):
    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)


def cal_rank(values: np.ndarray) -> np.ndarray:
    """Rank of each value (0 = smallest); reference tools/final_util.py:103-106."""
    sort_idx = np.argsort(values)
    return np.argsort(sort_idx)
