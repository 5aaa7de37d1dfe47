"""Fused ball-query + grouped-MLP + max Pallas TPU kernel (PointNet++ SA).

A PointNet++ MSG set-abstraction branch is: ball-query K neighbours of each
FPS centre, gather their features, run a 3-layer per-edge MLP, max over the
K slots (reference models/pointnet2.py:180-240).  In XLA at coalition batch
330 the sort-based ball query costs ~99 ms per branch and the grouped
gathers dominate the rest.  This kernel fuses the whole branch:

  * the (Sq, N) distance tile is computed on the MXU and stays in VMEM;
  * ball-query selection uses a *rank* formulation: rank = in_ball @ T with
    T upper-triangular ones (exact — 0/1 values in bf16), so the j-th slot's
    one-hot is `in_ball & (rank == j+1)`, with the reference's
    fill-with-first semantics `(nball <= j) & (rank == 1)`
    (reference models/pointnet2.py:84-91) — no per-slot reductions;
  * the first MLP layer is hoisted above the gather: its BatchNorm-folded
    affine is applied to every *source* point once outside the kernel
    (u = [feats, xyz] @ A1 + b1), so the gather is a one-hot matmul of
    already-transformed rows (bf16 hi/lo pair, ~2^-16 exact) and the centre
    offset enters as a per-query subtraction (-c_s @ A1_xyz);
  * MLP layers 2 and 3 and the running max stay in VMEM per slot.

The (B, S, K, C) grouped tensor never exists in HBM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import gather_value_parts
from .neighbors import (_dist_tile, _select_min, _select_prep, _split_parts,
                        knn_select_impl)

_BIG = 1e30


def _ball_mlp3_kernel(newxyz_ref, xyzt_ref, xyzn_ref, ufhl_ref,
                      b1_ref, a1x_ref,
                      a2_ref, b2_ref, a3_ref, b3_ref, out_ref,
                      *, k: int, radius2: float, parts: int, has_uf: bool):
    dist = _dist_tile(newxyz_ref[0], xyzt_ref[0])          # (Sq, N) f32
    sq, n = dist.shape
    in_ball = dist <= radius2
    ib = in_ball.astype(jnp.bfloat16)

    # rank[i, j] = #in-ball points with index <= j  (exact: 0/1 in bf16)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    tri = (row <= col).astype(jnp.bfloat16)                # (N, N)
    rank = jnp.dot(ib, tri, preferred_element_type=jnp.float32)
    nball = jnp.max(rank, axis=1, keepdims=True)           # (Sq, 1)
    sel_rank = jnp.where(in_ball, rank, -1.0)              # (Sq, N)
    fill_oh = (sel_rank == 1.0).astype(jnp.bfloat16)       # first in-ball

    xyzn = xyzn_ref[0]                                     # (N, 4) f32
    ufhl = ufhl_ref[0]                                     # (N, parts*C1) bf16
    b1, a1x = b1_ref[:], a1x_ref[:]                        # (1,C1), (4,C1)
    c1 = b1.shape[-1]
    a2, b2 = a2_ref[:], b2_ref[:]
    a3, b3 = a3_ref[:], b3_ref[:]
    c3 = a3.shape[-1]

    # Slots are processed in groups of `gsz`: the G stacked one-hots feed ONE
    # (G*Sq, N) gather matmul and batched (G*Sq, C) MLP matmuls — per-slot
    # matmuls like (Sq, C1) @ (C1, C2) with C <= 128 waste most of the MXU
    # tile, so batching slots is a large win at K in {64, 128}.
    gsz = min(8, k)
    nxyz4 = jnp.pad(newxyz_ref[0], ((0, 0), (0, 1)))       # (Sq, 4)
    nxyz_g = jnp.tile(nxyz4, (gsz, 1))                     # (G*Sq, 4)

    def group(i, acc):
        j0 = (i * gsz).astype(jnp.float32)
        # slot index per group lane, clamped to k-1 (duplicates of the last
        # slot beyond k or of the fill slot beyond nball cannot change the
        # max — reference fill-with-first, pointnet2.py:84-91)
        js = jnp.minimum(
            j0 + jax.lax.broadcasted_iota(
                jnp.int32, (gsz, 1, 1), 0).astype(jnp.float32),
            float(k - 1))
        oh = (sel_rank[None] == js + 1.0)                  # (G, Sq, N) bool
        ohb = jnp.where(nball[None] > js, oh.astype(jnp.bfloat16),
                        fill_oh[None]).reshape(gsz * sq, n)
        # layer 1 = (xyz_j - new_xyz_s) @ A1[xyz rows] + feats_j @ A1[feat
        # rows] + b1.  The xyz offset is gathered EXACTLY — f32 one-hot
        # matmul against the f32 coordinates already resident for the
        # distance tile — so no bf16 plane ever touches the cancellation-
        # prone local offsets (cf. the pointconv kernel's hi/lo xyz planes).
        gxyz = jax.lax.dot_general(
            ohb.astype(jnp.float32), xyzn, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (G*Sq, 4)
        pre = jnp.dot(gxyz - nxyz_g, a1x,
                      preferred_element_type=jnp.float32) + b1
        if has_uf:
            ghl = jnp.dot(ohb, ufhl, preferred_element_type=jnp.float32)
            pre = pre + (ghl if parts == 1
                         else ghl[:, :c1] + ghl[:, c1:])   # hi (+ lo)
        h = jnp.maximum(pre, 0.0)                          # layer 1 (folded)
        h = jnp.maximum(
            jnp.dot(h, a2, preferred_element_type=jnp.float32) + b2, 0.0)
        h = jnp.maximum(
            jnp.dot(h, a3, preferred_element_type=jnp.float32) + b3, 0.0)
        return jnp.maximum(acc, jnp.max(h.reshape(gsz, sq, c3), axis=0))

    # Slots at or beyond a row's in-ball count reproduce slot 0 exactly
    # (fill-with-first), so they cannot change the running max: loop only to
    # the tile's largest in-ball count.
    jmax = jnp.clip(jnp.max(nball), 1.0, float(k)).astype(jnp.int32)
    ngroups = (jmax + gsz - 1) // gsz
    acc = jnp.full((sq, c3), -_BIG, jnp.float32)
    out_ref[0] = jax.lax.fori_loop(0, ngroups, group, acc)


def _gather_rows_kernel(idx_ref, vhl_ref, out_ref, *, k: int, fp: int,
                        parts: int):
    bq = idx_ref.shape[1]
    n = vhl_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, n), 1)
    vhl = vhl_ref[0]                                       # (N, parts*Fp) bf16
    for j in range(k):
        sel = idx_ref[0, :, j:j + 1]                       # (bq, 1)
        oh = (col == sel).astype(jnp.bfloat16)
        ghl = jnp.dot(oh, vhl, preferred_element_type=jnp.float32)
        g = ghl if parts == 1 else ghl[:, :fp] + ghl[:, fp:]
        out_ref[0, :, j * fp:(j + 1) * fp] = g


def gather_rows(values: jnp.ndarray, idx: jnp.ndarray, block_q: int = 128,
                parts: int = None, interpret: bool = False) -> jnp.ndarray:
    """Grouped row gather via one-hot matmuls: out[b,s,j] = values[b,idx[b,s,j]].

    XLA's row gather runs on the scalar unit (~120 ms for 10M rows at
    coalition batch); this kernel rides the MXU instead, with the values as
    bf16 planes — parts=2 a hi/lo pair (~2^-16 exact), parts=1 plain bf16
    (~2^-9); None (default) follows `config.gather_value_parts()`, the
    `--gather_precision` CLI knob.  The feature axis is padded to the
    128-lane boundary so every VMEM write is aligned.

    Args:
      values: (B, N, F) float32; idx: (B, S, K) int32.
    Returns:
      (B, S, K, F) float32.
    """
    if parts is None:
        parts = gather_value_parts()
    return _gather_rows(values, idx, block_q=block_q, parts=parts,
                        interpret=interpret)


@functools.partial(jax.jit, static_argnames=("block_q", "parts", "interpret"))
def _gather_rows(values, idx, block_q, parts, interpret):
    B, N, F = values.shape
    S, K = idx.shape[1], idx.shape[2]
    fp = -(-F // 128) * 128
    if fp != F:
        values = jnp.concatenate(
            [values, jnp.zeros((B, N, fp - F), values.dtype)], axis=-1)
    bq = min(block_q, S)
    # halve the query block while the double-buffered output block would
    # push the kernel past the 16 MB VMEM budget
    while bq > 8 and bq * K * fp * 4 > 4 * 1024 * 1024:
        bq //= 2
    while S % bq:       # grid needs a divisor of S; step down to the
        bq -= 1         # nearest one (halving can skip past them)
    assert S % bq == 0, (S, bq)
    vhl = _split_parts(values.astype(jnp.float32), parts)  # (B, N, parts*Fp)

    kernel = functools.partial(_gather_rows_kernel, k=K, fp=fp, parts=parts)
    out = pl.pallas_call(
        kernel,
        grid=(B, S // bq),
        in_specs=[
            pl.BlockSpec((1, bq, K), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, parts * fp), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, K * fp), lambda b, q: (b, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, K * fp), jnp.float32),
        interpret=interpret,
    )(idx, vhl)
    return out.reshape(B, S, K, fp)[..., :F]


def fused_ball_mlp3(new_xyz: jnp.ndarray, xyz: jnp.ndarray,
                    uf: "jnp.ndarray | None", b1: jnp.ndarray,
                    a1x: jnp.ndarray, a2: jnp.ndarray, b2: jnp.ndarray,
                    a3: jnp.ndarray, b3: jnp.ndarray, *, radius: float,
                    k: int, block_q: int = 128, parts: int = None,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused SA branch: max over ball-grouped 3-layer MLP outputs.

    Layer 1 is split: the feature part (``uf = feats @ A1[feat rows]``) is
    hoisted above the gather and carried in bf16 planes, while the
    cancellation-prone xyz-offset part ``(xyz_j - new_xyz_s) @ A1[xyz
    rows]`` is computed in-kernel from an EXACT f32 coordinate gather.

    Args:
      new_xyz: (B, S, 3) query centres (FPS points).
      xyz: (B, N, 3) source coordinates.
      uf: (B, N, C1) hoisted feature pre-activations, or None when the
         branch has no input features (PointNet++ SA1).
      b1: (C1,) folded layer-1 bias.
      a1x: (3, C1) layer-1 weight rows for the xyz offsets.
      a2/b2: (C1, C2), (C2) folded layer-2 weight/bias.
      a3/b3: (C2, C3), (C3) folded layer-3 weight/bias.
      radius, k: ball-query radius and slot count.
      parts: feature-plane precision; None follows
          `config.gather_value_parts()` (see `gather_rows`).
    Returns:
      (B, S, C3) float32 = max over the K ball slots of
      relu(relu(relu(layer1) @ a2 + b2) @ a3 + b3).
    """
    if parts is None:
        parts = gather_value_parts()
    B, N = xyz.shape[0], xyz.shape[1]
    has_uf = uf is not None
    if not has_uf:      # 1-lane dummy plane keeps the pallas_call uniform
        uf = jnp.zeros((B, N, 1), jnp.float32)
    return _fused_ball_mlp3(new_xyz, xyz, uf, b1, a1x, a2, b2, a3, b3,
                            radius=radius, k=k, block_q=block_q,
                            parts=parts, has_uf=has_uf, interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("k", "radius", "block_q", "parts",
                                    "has_uf", "interpret"))
def _fused_ball_mlp3(new_xyz, xyz, uf, b1, a1x, a2, b2, a3, b3, *, radius, k,
                     block_q, parts, has_uf, interpret):
    B, S, _ = new_xyz.shape
    N = xyz.shape[1]
    C3 = a3.shape[-1]
    bq = min(block_q, S)
    assert S % bq == 0, (S, bq)
    xyz = xyz.astype(jnp.float32)
    xyz_t = jnp.swapaxes(xyz, 1, 2)
    xyz_n = jnp.concatenate(
        [xyz, jnp.zeros((B, N, 1), jnp.float32)], axis=-1)  # (B, N, 4)
    ufhl = _split_parts(uf.astype(jnp.float32), parts)  # (B, N, parts*Cu)
    a1x4 = jnp.pad(a1x.astype(jnp.float32), ((0, 1), (0, 0)))  # (4, C1)

    kernel = functools.partial(_ball_mlp3_kernel, k=k,
                               radius2=float(radius) ** 2, parts=parts,
                               has_uf=has_uf)
    C1, C2 = a2.shape[0], a2.shape[1]
    cu = ufhl.shape[-1]
    out = pl.pallas_call(
        kernel,
        grid=(B, S // bq),
        in_specs=[
            pl.BlockSpec((1, bq, 3), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, N), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 4), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, cu), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C1), lambda b, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, C1), lambda b, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C1, C2), lambda b, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C2), lambda b, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C2, C3), lambda b, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C3), lambda b, q: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, C3), lambda b, q: (b, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, C3), jnp.float32),
        interpret=interpret,
    )(new_xyz.astype(jnp.float32), xyz_t, xyz_n, ufhl,
      b1.reshape(1, -1).astype(jnp.float32), a1x4,
      a2.astype(jnp.float32),
      b2.reshape(1, -1).astype(jnp.float32), a3.astype(jnp.float32),
      b3.reshape(1, -1).astype(jnp.float32))
    return out


# ---------------------------------------------------------------------------
# Fused PointConv set abstraction (reference models/pointconv.py:324-391)
# ---------------------------------------------------------------------------
def _knn_den_kernel(xq_ref, xdbt_ref, invden_ref, oidx_ref, oden_ref,
                    odmax_ref, *, k: int, select: str):
    """Exact kNN selection that also extracts each neighbour's inverse
    density and the per-query max (the group normaliser,
    reference pointconv.py:376-377)."""
    dist = _dist_tile(xq_ref[0], xdbt_ref[0])
    q, n = dist.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (q, n), 1)
    dist = _select_prep(dist, col, select)
    invden = invden_ref[0]                                 # (1, N)
    dmax = jnp.full((q, 1), -_BIG, jnp.float32)
    for j in range(k):
        sel, onehot, dist = _select_min(dist, col, select)
        dj = jnp.max(jnp.where(onehot, invden, -_BIG), axis=1, keepdims=True)
        dmax = jnp.maximum(dmax, dj)
        oidx_ref[0, :, j] = sel[:, 0]
        oden_ref[0, :, j] = dj[:, 0]
    odmax_ref[0] = dmax


def knn_with_density(query, database, inv_density, k: int,
                     block_q: int = 128, select: str = None,
                     interpret: bool = False):
    """kNN indices + gathered inverse densities + per-query density max.

    Args:
      query: (B, S, 3); database: (B, N, 3); inv_density: (B, N).
    Returns:
      idx (B, S, k) int32, den (B, S, k) f32, dmax (B, S, 1) f32.
    """
    if select is None:
        select = knn_select_impl()
    return _knn_with_density(query, database, inv_density, k,
                             block_q=block_q, select=select,
                             interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("k", "block_q", "select", "interpret"))
def _knn_with_density(query, database, inv_density, k, block_q, select,
                      interpret):
    B, S, C = query.shape
    N = database.shape[1]
    bq = min(block_q, S)
    assert S % bq == 0, (S, bq)
    db_t = jnp.swapaxes(database.astype(jnp.float32), 1, 2)
    kernel = functools.partial(_knn_den_kernel, k=k, select=select)
    idx, den, dmax = pl.pallas_call(
        kernel,
        grid=(B, S // bq),
        in_specs=[
            pl.BlockSpec((1, bq, C), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, N), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, k), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, k), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, k), jnp.int32),
            jax.ShapeDtypeStruct((B, S, k), jnp.float32),
            jax.ShapeDtypeStruct((B, S, 1), jnp.float32),
        ),
        interpret=interpret,
    )(query.astype(jnp.float32), db_t,
      inv_density.astype(jnp.float32)[:, None, :])
    return idx, den, dmax


def _pconv_kernel(idx_ref, ds_ref, nxyz_ref, vhl_ref, csw_ref,
                  a2_ref, b2_ref, a3_ref, b3_ref,
                  w1_ref, f1_ref, w2_ref, f2_ref, w3_ref, f3_ref,
                  out_ref, *, gsz: int, c1: int, parts: int):
    """Grouped-slot PointConv SA: gather -> folded MLP2/3 -> DensityNet
    scale -> WeightNet -> per-query contraction over slots, in VMEM.

    The slot-group index is the innermost *grid* dimension; the output block
    is revisited across groups and accumulated in place (one (Q, C3)
    accumulator per weight lane — a (Q, C3, 16) layout would put 16 in the
    lane dimension and waste 7/8 of every vector register).
    out[q, w, c] = sum_j h3s[j, q, c] * wt[j, q, w].
    """
    q = idx_ref.shape[2]
    n = vhl_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (q, n), 1)
    vhl = vhl_ref[0]                                       # (N, parts*C1 + 8)
    csw = csw_ref[0]                                       # (Q, C1)
    nxyz = nxyz_ref[0]                                     # (Q, 3)
    a2, b2, a3, b3 = a2_ref[:], b2_ref[:], a3_ref[:], b3_ref[:]
    w1, f1, w2, f2, w3, f3 = (w1_ref[:], f1_ref[:], w2_ref[:], f2_ref[:],
                              w3_ref[:], f3_ref[:])
    c3 = a3.shape[-1]
    wo = w3.shape[-1]                                      # 16

    @pl.when(pl.program_id(2) == 0)
    def _init():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    ohs = [(col == idx_ref[0, 0, :, jj:jj + 1]).astype(jnp.bfloat16)
           for jj in range(gsz)]
    oh = jnp.concatenate(ohs, axis=0)                      # (gsz*Q, N)
    ghl = jnp.dot(oh, vhl, preferred_element_type=jnp.float32)
    gu = (ghl[:, :c1] if parts == 1
          else ghl[:, :c1] + ghl[:, c1:2 * c1])            # (gsz*Q, C1)
    # xyz columns ride a hi/lo pair REGARDLESS of the feature `parts` knob:
    # the local offset gxyz is a small difference of O(1) coordinates, so a
    # single-bf16 gather's 2^-9 rounding is catastrophically cancelled into
    # percent-level error on the WeightNet input (advisor r1).  The 8 extra
    # lanes cost ~6% of the gather matmul at C1=64.
    off = parts * c1
    gx = ghl[:, off:off + 3] + ghl[:, off + 4:off + 7]     # hi + lo
    gxyz = gx - jnp.tile(nxyz, (gsz, 1))                   # (gsz*Q, 3)

    h = jnp.maximum(gu - jnp.tile(csw, (gsz, 1)), 0.0)     # layer 1 folded
    h = jnp.maximum(jnp.dot(h, a2, preferred_element_type=jnp.float32)
                    + b2, 0.0)
    h = jnp.maximum(jnp.dot(h, a3, preferred_element_type=jnp.float32)
                    + b3, 0.0)                             # (gsz*Q, C3)

    wt = jnp.maximum(jnp.dot(gxyz, w1,
                             preferred_element_type=jnp.float32) + f1, 0.0)
    wt = jnp.maximum(jnp.dot(wt, w2, preferred_element_type=jnp.float32)
                     + f2, 0.0)
    wt = jnp.maximum(jnp.dot(wt, w3, preferred_element_type=jnp.float32)
                     + f3, 0.0)                            # (gsz*Q, 16)

    h = h.reshape(gsz, q, c3)
    wt = wt.reshape(gsz, q, wo)
    for gg in range(gsz):
        hs = h[gg] * ds_ref[0, 0, :, gg:gg + 1]             # (Q, C3)
        for w in range(wo):
            out_ref[0, w] += hs * wt[gg, :, w:w + 1]


@functools.partial(jax.jit,
                   static_argnames=("k", "block_q", "parts", "interpret"))
def _fused_pointconv_sa(idx, den, dmax, new_xyz, u, xyz, csw,
                        a2, b2, a3, b3, dnet, wnet, *, k: int,
                        block_q: int, parts: int, interpret: bool):
    B, S, _ = new_xyz.shape
    N = xyz.shape[1]
    C1 = u.shape[-1]
    C3 = a3.shape[-1]
    WO = wnet[2][0].shape[-1]
    bq = min(block_q, S)
    assert S % bq == 0, (S, bq)
    # Feature columns honour the `parts` precision knob; xyz columns are
    # always hi/lo (4 hi + 4 lo lanes incl. padding) — see _pconv_kernel.
    xyz4 = jnp.concatenate(
        [xyz, jnp.zeros((B, N, 1), jnp.float32)], axis=-1)     # lane pad
    vhl = jnp.concatenate(
        [_split_parts(u.astype(jnp.float32), parts),
         _split_parts(xyz4.astype(jnp.float32), 2)], axis=-1)
    (d1, e1), (d2, e2), (d3, e3) = dnet
    (w1, f1), (w2, f2), (w3, f3) = wnet
    # DensityNet runs outside the kernel: (B, S, K) scalars through three
    # tiny affines is trivial for XLA, but per-slot degenerate matmuls
    # inside the kernel dominate its runtime
    dsc = (den / dmax)[..., None]                          # (B, S, K, 1)
    dsc = jnp.maximum(dsc * d1[0] + e1, 0.0)
    dsc = jnp.maximum(dsc @ d2 + e2, 0.0)
    dsc = jnp.maximum(dsc @ d3 + e3, 0.0)                  # (B, S, K, 1)
    ds = dsc[..., 0]

    gsz = 8 if k % 8 == 0 else (4 if k % 4 == 0 else 1)
    kernel = functools.partial(_pconv_kernel, gsz=gsz, c1=C1, parts=parts)
    width = parts * C1 + 8
    row = lambda t: t.reshape(1, -1).astype(jnp.float32)
    mat = lambda t: t.astype(jnp.float32)
    full = lambda shape: pl.BlockSpec(shape, lambda b, q, g: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B, S // bq, k // gsz),
        in_specs=[
            pl.BlockSpec((1, 1, bq, gsz), lambda b, q, g: (b, g, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, gsz), lambda b, q, g: (b, g, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 3), lambda b, q, g: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, width), lambda b, q, g: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, C1), lambda b, q, g: (b, q, 0),
                         memory_space=pltpu.VMEM),
            full(a2.shape), full((1, b2.shape[-1])),
            full(a3.shape), full((1, b3.shape[-1])),
            full(w1.shape), full((1, f1.shape[-1])),
            full(w2.shape), full((1, f2.shape[-1])),
            full(w3.shape), full((1, f3.shape[-1])),
        ],
        out_specs=pl.BlockSpec((1, WO, bq, C3), lambda b, q, g: (b, 0, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, WO, S, C3), jnp.float32),
        interpret=interpret,
    )(jnp.transpose(idx.reshape(B, S, k // gsz, gsz), (0, 2, 1, 3)),
      jnp.transpose(ds.reshape(B, S, k // gsz, gsz), (0, 2, 1, 3)),
      new_xyz.astype(jnp.float32), vhl,
      csw.astype(jnp.float32),
      mat(a2), row(b2), mat(a3), row(b3),
      mat(w1), row(f1), mat(w2), row(f2), mat(w3), row(f3))
    # (B, WO, S, C3) -> C-major flatten (B, S, C3*WO) matching the
    # reference's einsum("bskc,bskw->bscw").reshape (pointconv.py:383-386)
    return jnp.transpose(out, (0, 2, 3, 1)).reshape(B, S, C3 * WO)


def fused_pointconv_sa(idx, den, dmax, new_xyz, u, xyz, csw,
                       a2, b2, a3, b3, dnet, wnet, *, k: int,
                       block_q: int = 128, parts: int = None,
                       interpret: bool = False):
    """Fused PointConv grouped compute (after `knn_with_density`).

    Args:
      idx/den/dmax: from knn_with_density.
      new_xyz: (B, S, 3); u: (B, N, C1) hoisted layer-1 pre-activations;
      xyz: (B, N, 3); csw: (B, S, C1) per-centre layer-1 offset.
      a2/b2/a3/b3: folded MLP layers 2-3.
      dnet / wnet: lists of 3 folded (A, b) affines for DensityNet (1->16->
        8->1) and WeightNet (3->8->8->16).
      parts: feature-plane precision; None follows
          `config.gather_value_parts()`.  xyz planes are always hi/lo.
    Returns:
      (B, S, C3*16) f32 — the reference's C-major flattened
      einsum("bskc,bskw->bscw") (pointconv.py:383-386).
    """
    if parts is None:
        parts = gather_value_parts()
    return _fused_pointconv_sa(idx, den, dmax, new_xyz, u, xyz, csw,
                               a2, b2, a3, b3, dnet, wnet, k=k,
                               block_q=block_q, parts=parts,
                               interpret=interpret)
