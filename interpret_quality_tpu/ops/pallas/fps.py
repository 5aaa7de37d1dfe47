"""Pallas TPU kernel for farthest-point sampling.

FPS is inherently sequential (each selected point depends on the running
min-distance field), so the lever is locality + lane parallelism, not
reordering: this kernel keeps each cloud's coordinate planes and distance
field in VMEM for the whole loop and processes `block_b` clouds per program
so every VPU op works on a full (block_b, N) tile.  The XLA `fori_loop`
formulation costs ~150 ms at coalition batch 330 (npoint=512, measured in
scripts/tpu_micro.py); this kernel replaces per-iteration HBM round trips
with VMEM-resident updates.

Semantics match ops.geometry.farthest_point_sample exactly: first point
fixed at index 0 (reference models/pointnet2.py:58-59), argmax ties broken
towards the lower index, f32 distance arithmetic.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(xyz_ref, out_ref, dist_ref, idx_ref, *, npoint: int, n: int):
    """xyz_ref: (Bb, 3, N) VMEM; out_ref: (Bb, npoint) int32 VMEM;
    dist_ref: (Bb, N) f32 scratch; idx_ref: (Bb, npoint) int32 scratch."""
    bb = xyz_ref.shape[0]
    xr = xyz_ref[:, 0, :]                                  # (Bb, N)
    yr = xyz_ref[:, 1, :]
    zr = xyz_ref[:, 2, :]
    dist_ref[:] = jnp.full((bb, n), 1e10, jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (bb, n), 1)
    col_np = jax.lax.broadcasted_iota(jnp.int32, (bb, npoint), 1)

    def body(i, farthest):
        # record the current selection at output column i (value-level
        # masked update: dynamic_update_slice does not lower on TPU)
        idx_ref[:] = jnp.where(col_np == i, farthest, idx_ref[:])
        sel = col == farthest                              # (Bb, N)
        cx = jnp.sum(jnp.where(sel, xr, 0.0), axis=1, keepdims=True)
        cy = jnp.sum(jnp.where(sel, yr, 0.0), axis=1, keepdims=True)
        cz = jnp.sum(jnp.where(sel, zr, 0.0), axis=1, keepdims=True)
        d = (xr - cx) ** 2 + (yr - cy) ** 2 + (zr - cz) ** 2
        new_dist = jnp.minimum(dist_ref[:], d)
        dist_ref[:] = new_dist
        return jnp.argmax(new_dist, axis=1,
                          keepdims=True).astype(jnp.int32)  # (Bb, 1)

    init = jnp.zeros((bb, 1), jnp.int32)                   # first point = 0
    jax.lax.fori_loop(0, npoint, body, init)
    out_ref[:] = idx_ref[:]


@functools.partial(jax.jit,
                   static_argnames=("npoint", "block_b", "interpret"))
def fps_pallas(xyz: jnp.ndarray, npoint: int, block_b: int = 8,
               interpret: bool = False) -> jnp.ndarray:
    """Farthest-point sampling via a Pallas kernel.

    Args:
      xyz: (B, N, 3) float32.
      npoint: number of samples.
      block_b: clouds per program (VPU sublane tile height).
    Returns:
      (B, npoint) int32 indices.
    """
    B, N, _ = xyz.shape
    bb = min(block_b, B)
    pad = (-B) % bb
    xyz_t = jnp.swapaxes(xyz, 1, 2).astype(jnp.float32)    # (B, 3, N)
    if pad:
        xyz_t = jnp.concatenate(
            [xyz_t, jnp.zeros((pad, 3, N), jnp.float32)], axis=0)

    kernel = functools.partial(_fps_kernel, npoint=npoint, n=N)
    out = pl.pallas_call(
        kernel,
        grid=((B + pad) // bb,),
        in_specs=[pl.BlockSpec((bb, 3, N), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bb, npoint), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B + pad, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bb, N), jnp.float32),
                        pltpu.VMEM((bb, npoint), jnp.int32)],
        interpret=interpret,
    )(xyz_t)
    return out[:B]
