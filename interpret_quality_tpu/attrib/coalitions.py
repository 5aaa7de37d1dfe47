"""Coalition masking as tensor algebra.

The reference builds masked coalitions with a Python double loop that writes
into an expanded tensor (tools/final_common.py:46-61, final_shapley_value.py:74-88).
Here the same masks are a boolean *keep matrix* derived from the permutations
once, then applied to any (possibly disturbed) cloud with a single gather +
`where` — fully jittable, vmappable over the coalition axis and shardable
over a device mesh.

Row semantics (matching the reference exactly): for permutation ``order``,
row ``r`` of its (R+1)-row block keeps regions ``order[0..r-1]`` and collapses
regions ``order[r..R-1]`` to the cloud centre, so

    v[r] = v({order[0], ..., order[r-1]})        r = 0 .. R
    dv[r] = v[r+1] - v[r]  is the marginal contribution of region order[r].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def keep_matrix_from_orders(orders: np.ndarray) -> np.ndarray:
    """Boolean keep matrix from permutations.

    Args:
      orders: (O, R) int array; each row a permutation of 0..R-1.
    Returns:
      keep: (O, R+1, R) bool; keep[o, r, j] == True iff region j is kept
      (not masked) in row r of order o, i.e. iff j's position in order o is
      strictly less than r.
    """
    orders = np.asarray(orders)
    O, R = orders.shape
    pos = np.argsort(orders, axis=1)                       # pos[o, j] = rank of region j
    rows = np.arange(R + 1)[None, :, None]                 # (1, R+1, 1)
    return pos[:, None, :] < rows                          # (O, R+1, R)


def masked_coalitions(data: jnp.ndarray, center: jnp.ndarray,
                      keep: jnp.ndarray, region_id: jnp.ndarray) -> jnp.ndarray:
    """Build the masked-coalition mega-batch for one cloud.

    Args:
      data: (N, 3) the (possibly disturbed) cloud.
      center: (3,) the cloud centre (mean of `data`).
      keep: (O, R+1, R) bool keep matrix.
      region_id: (N,) int region assignment of each point.
    Returns:
      (O * (R+1), N, 3) masked clouds, flattened in (order, row) order —
      identical row layout to the reference's logits artifacts.
    """
    O, Rp1, _ = keep.shape
    N = data.shape[0]
    point_keep = keep[:, :, region_id]                     # (O, R+1, N)
    masked = jnp.where(point_keep[..., None], data, center)
    return masked.reshape(O * Rp1, N, 3)


def interaction_masks(context_keep: jnp.ndarray, region_i: jnp.ndarray,
                      region_j: jnp.ndarray) -> jnp.ndarray:
    """Region-level keep masks for the 4-row interaction pattern.

    Row layout per context (reference
    final_point_binary_interaction_logits.py:44-56):
      row 0: S ∪ {i, j}
      row 1: S ∪ {i}
      row 2: S ∪ {j}
      row 3: S

    Args:
      context_keep: (C, R) bool; True for regions in context S.
      region_i, region_j: scalar int region indices.
    Returns:
      (C, 4, R) bool keep masks.
    """
    C, R = context_keep.shape
    onehot_i = jnp.arange(R) == region_i                   # (R,)
    onehot_j = jnp.arange(R) == region_j
    s = context_keep[:, None, :]                           # (C, 1, R)
    rows = jnp.stack([
        onehot_i | onehot_j,
        jnp.broadcast_to(onehot_i, (R,)),
        jnp.broadcast_to(onehot_j, (R,)),
        jnp.zeros((R,), bool),
    ])                                                     # (4, R)
    return s | rows[None, :, :]                            # (C, 4, R)


def masked_interaction_batch(data: jnp.ndarray, center: jnp.ndarray,
                             keep_rows: jnp.ndarray,
                             region_id: jnp.ndarray) -> jnp.ndarray:
    """Apply (C, 4, R) keep masks to one cloud.

    Returns:
      (C * 4, N, 3) masked clouds in the reference's row order
      [S∪{i,j}, S∪{i}, S∪{j}, S] per context.
    """
    C = keep_rows.shape[0]
    N = data.shape[0]
    point_keep = keep_rows[:, :, region_id]                # (C, 4, N)
    masked = jnp.where(point_keep[..., None], data, center)
    return masked.reshape(C * 4, N, 3)


def marginals_by_region(dv: jnp.ndarray, orders: jnp.ndarray) -> jnp.ndarray:
    """Reorder per-position marginals into per-region columns.

    Args:
      dv: (..., O, R) marginal contributions; dv[..., o, r] belongs to
        region orders[o, r].
      orders: (O, R) permutations.
    Returns:
      (..., O, R) with column j holding region j's marginal.
    """
    pos = jnp.argsort(orders, axis=1)          # (O, R): rank of region j
    return jnp.take_along_axis(dv, jnp.broadcast_to(pos, dv.shape), axis=-1)


def scatter_marginals(dv: jnp.ndarray, orders: jnp.ndarray) -> jnp.ndarray:
    """Accumulate per-row marginals into per-region Shapley sums.

    Args:
      dv: (O, R) marginal contributions; dv[o, r] belongs to region
        orders[o, r].
      orders: (O, R) permutations.
    Returns:
      (R,) summed (not averaged) contributions per region.
    """
    return jnp.sum(marginals_by_region(dv, orders), axis=0)
