"""Point-cloud geometry primitives as pure jittable functions.

All functions use the channels-last ``(B, N, 3)`` layout natural to XLA
(the reference's ``(B, 3, N)`` permutes are a torch Conv1d artifact).

Semantics intentionally reproduce the reference ops so that region
partitions and groupings match:

  * FPS fixes the first point at index 0 for reproducibility
    (reference models/pointnet2.py:58-59, final_save_fps.py:21-22).
  * Ball query uses the sort-and-clamp convention: indices outside the
    radius are set to N, sorted, the first K taken, and out-of-ball slots
    replaced by the first in-ball index (reference models/pointnet2.py:70-91).
  * kNN takes the K smallest squared distances (reference models/dgcnn.py:12-18,
    models/pointconv.py:103-114).

The distance matrix is computed as ``|x|^2 + |y|^2 - 2 x.yT`` — a single
matmul that XLA tiles onto the MXU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared Euclidean distance.

    Args:
      src: (..., N, C)
      dst: (..., M, C)
    Returns:
      (..., N, M) squared distances.
    """
    inner = jnp.matmul(src, jnp.swapaxes(dst, -1, -2),
                       preferred_element_type=src.dtype)
    s2 = jnp.sum(src * src, axis=-1, keepdims=True)          # (..., N, 1)
    d2 = jnp.sum(dst * dst, axis=-1, keepdims=True)          # (..., M, 1)
    return s2 - 2.0 * inner + jnp.swapaxes(d2, -1, -2)


def pairwise_sqdist_self(x: jnp.ndarray) -> jnp.ndarray:
    """Self pairwise squared distance, (..., N, C) -> (..., N, N)."""
    return square_distance(x, x)


def index_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather points by index along the point axis.

    Args:
      points: (B, N, C)
      idx: (B, ...) integer indices into the N axis
    Returns:
      (B, ..., C) gathered points.
    """
    return jax.vmap(lambda p, i: p[i])(points, idx)


@functools.partial(jax.jit, static_argnames="npoint")
def farthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Farthest-point sampling with the first point fixed at index 0.

    Args:
      xyz: (B, N, 3)
      npoint: number of samples.
    Returns:
      (B, npoint) int32 indices.
    """
    B, N, _ = xyz.shape

    def one(pts):
        def body(i, carry):
            centroids, distance, farthest = carry
            centroids = centroids.at[i].set(farthest)
            centroid = pts[farthest]                      # (3,)
            dist = jnp.sum((pts - centroid) ** 2, axis=-1)  # (N,)
            distance = jnp.minimum(distance, dist)
            farthest = jnp.argmax(distance).astype(jnp.int32)
            return centroids, distance, farthest

        init = (jnp.zeros((npoint,), jnp.int32),
                jnp.full((N,), 1e10, xyz.dtype),
                jnp.int32(0))
        centroids, _, _ = jax.lax.fori_loop(0, npoint, body, init)
        return centroids

    return jax.vmap(one)(xyz)


def query_ball_point(radius: float, nsample: int,
                     xyz: jnp.ndarray, new_xyz: jnp.ndarray) -> jnp.ndarray:
    """Ball query with sort-and-clamp semantics.

    Args:
      radius: ball radius.
      nsample: max points per ball (K).
      xyz: (B, N, 3) all points.
      new_xyz: (B, S, 3) query centres.
    Returns:
      (B, S, nsample) int32 indices; slots beyond the ball filled with the
      first in-ball index (or index 0 when the ball is empty, matching the
      reference's fill-with-first-column behaviour).
    """
    B, N, _ = xyz.shape
    sqrdists = square_distance(new_xyz, xyz)                      # (B, S, N)
    arange = jnp.arange(N, dtype=jnp.int32)
    group_idx = jnp.where(sqrdists > radius ** 2, N, arange)      # (B, S, N)
    group_idx = jnp.sort(group_idx, axis=-1)[..., :nsample]       # (B, S, K)
    group_first = group_idx[..., :1]                              # (B, S, 1)
    # Empty ball (even the first slot is N): fill with index 0 as documented.
    # The reference would gather row N out-of-bounds in that case, which never
    # occurs in practice because every centre is itself a point of the cloud;
    # the fused Pallas path yields zero features for such slots instead.
    group_first = jnp.where(group_first == N, 0, group_first)
    group_idx = jnp.where(group_idx == N, group_first, group_idx)
    return group_idx.astype(jnp.int32)


def knn(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """k nearest neighbours of each point within its own cloud.

    Args:
      x: (B, N, C) features/coordinates.
      k: neighbourhood size.
    Returns:
      (B, N, k) int32 indices of the k smallest distances (self included).
    """
    neg_dist = -pairwise_sqdist_self(x)
    _, idx = jax.lax.top_k(neg_dist, k)
    return idx.astype(jnp.int32)


def knn_point(nsample: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray) -> jnp.ndarray:
    """k nearest neighbours of query points among all points.

    Args:
      nsample: K.
      xyz: (B, N, 3) all points.
      new_xyz: (B, S, 3) query points.
    Returns:
      (B, S, nsample) int32 indices.
    """
    neg_dist = -square_distance(new_xyz, xyz)
    _, idx = jax.lax.top_k(neg_dist, nsample)
    return idx.astype(jnp.int32)


def compute_density(xyz: jnp.ndarray, bandwidth: float) -> jnp.ndarray:
    """Gaussian-KDE point density (reference models/pointconv.py:199-209).

    Args:
      xyz: (B, N, 3)
    Returns:
      (B, N) densities.
    """
    sqrdists = pairwise_sqdist_self(xyz)
    g = jnp.exp(-sqrdists / (2.0 * bandwidth * bandwidth)) / (2.5 * bandwidth)
    return jnp.mean(g, axis=-1)
