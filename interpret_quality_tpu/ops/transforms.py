"""Rigid-body / scale transforms of point clouds, autodiff-friendly.

The reference implements the axis-angle rotation with a 115-line hand-written
backward (tools/final_util.py:287-401); here the rotation matrix is built
from jnp primitives and `jax.grad` provides the VJP for free.
"""
from __future__ import annotations

import jax.numpy as jnp


def translate_pc(data: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Translate; data (..., N, 3), trans (3,) or broadcastable."""
    return data + trans


def scale_pc(data: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Uniform scale; data (..., N, 3), scale scalar."""
    return data * scale


def rotation_matrix_xyz(angle_tuple: jnp.ndarray) -> jnp.ndarray:
    """R = Rx @ Ry @ Rz from Euler angles (theta_x, theta_y, theta_z).

    Matches reference final_rotate_center_enum_all.py:15-38.
    """
    tx, ty, tz = angle_tuple[0], angle_tuple[1], angle_tuple[2]
    cx, cy, cz = jnp.cos(tx), jnp.cos(ty), jnp.cos(tz)
    sx, sy, sz = jnp.sin(tx), jnp.sin(ty), jnp.sin(tz)
    one = jnp.ones_like(cx)
    zero = jnp.zeros_like(cx)
    rx = jnp.stack([one, zero, zero,
                    zero, cx, -sx,
                    zero, sx, cx]).reshape(3, 3)
    ry = jnp.stack([cy, zero, sy,
                    zero, one, zero,
                    -sy, zero, cy]).reshape(3, 3)
    rz = jnp.stack([cz, -sz, zero,
                    sz, cz, zero,
                    zero, zero, one]).reshape(3, 3)
    return rx @ ry @ rz


def rotate_xyz(x: jnp.ndarray, angle_tuple: jnp.ndarray) -> jnp.ndarray:
    """Rotate a cloud by Euler angles: x @ R^T  (= (R x^T)^T).

    Args:
      x: (..., N, 3)
      angle_tuple: (3,)
    """
    rot = rotation_matrix_xyz(angle_tuple)
    return jnp.matmul(x, rot.T, preferred_element_type=x.dtype)


def rot_angle_axis(x: jnp.ndarray, angle: jnp.ndarray, theta: jnp.ndarray,
                   phi: jnp.ndarray) -> jnp.ndarray:
    """Rotate by `angle` around the axis given by spherical angles (theta, phi).

    axis v = (sin t cos p, sin t sin p, cos t); Rodrigues rotation matrix.
    Fully differentiable in all four arguments (replaces the manual VJP of
    reference tools/final_util.py:287-401).

    Args:
      x: (B, N, 3)
      angle, theta, phi: (B,)
    Returns:
      (B, N, 3) rotated clouds.
    """
    ca = jnp.cos(angle)
    sa = jnp.sin(angle)
    ax = jnp.sin(theta) * jnp.cos(phi)
    ay = jnp.sin(theta) * jnp.sin(phi)
    az = jnp.cos(theta)
    one_m_ca = 1.0 - ca
    row0 = jnp.stack([ca + ax * ax * one_m_ca,
                      ax * ay * one_m_ca - az * sa,
                      ax * az * one_m_ca + ay * sa], axis=-1)
    row1 = jnp.stack([ax * ay * one_m_ca + az * sa,
                      ca + ay * ay * one_m_ca,
                      ay * az * one_m_ca - ax * sa], axis=-1)
    row2 = jnp.stack([ax * az * one_m_ca - ay * sa,
                      ay * az * one_m_ca + ax * sa,
                      ca + az * az * one_m_ca], axis=-1)
    rot = jnp.stack([row0, row1, row2], axis=-2)         # (B, 3, 3)
    return jnp.einsum("bij,bnj->bni", rot, x)
