"""Fused kNN + neighbour-gather Pallas TPU kernels.

The edge-conv family's eval-path hot loop is: build a kNN graph (pairwise
distances + top-k) and take per-point extrema of value rows over the
neighbours.  On TPU, XLA's `top_k` over (B, 1024, 1024) costs ~130 ms at
coalition batch 330 and the 20-step row gather another ~120 ms per layer
(measured, scripts/tpu_micro.py) — together >95% of DGCNN/GCNN inference.

This kernel never materialises the (B, N, N) distance matrix in HBM and
never performs an XLA gather:

  * the distance tile (Q, N) is computed on the MXU and lives in VMEM;
  * k-selection is an iterative (min, mask) sweep in VMEM — by default the
    ``packed`` variant (index in the low mantissa bits, one i32 min-reduce
    per neighbour; ties within ~2^-13 relative break to the lowest index),
    with ``IQTPU_KNN_SELECT=two_pass`` giving bit-exact `jax.lax.top_k`
    tie semantics (lowest index first) — see `knn_select_impl`;
  * the row gather is a one-hot (Q, N) @ (N, F) matmul — it rides the MXU
    instead of the scalar gather unit;
  * values are carried as a bf16 hi/lo pair, so the gathered rows are exact
    to ~2^-16 relative (one-hot matmuls touch exactly one row).

Replaces the reference's `knn` + `get_graph_feature` pipeline
(reference models/dgcnn.py:12-47) on the TPU compute path.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import gather_value_parts

_BIG = 1e30   # python float: jnp scalars would be captured consts in kernels


def knn_select_impl() -> str:
    """Selection-sweep implementation for the iterative exact top-k.

    ``two_pass``: row min, then a tie-break min over masked column indices
    (two VPU reduction passes per iteration).  ``argmin``: a single variadic
    (value, index) reduction — `jnp.argmin`'s lowest-index tie semantics are
    exactly `jax.lax.top_k`'s, and Mosaic lowers arg-reductions (the FPS
    kernel already relies on `jnp.argmax`).  Both are exact; they differ
    only in VPU passes per selected neighbour.

    ``packed``: steal the low ceil(log2 N) mantissa bits of the (nonnegative)
    f32 distance for the column index and run ONE plain int32 min-reduce per
    neighbour — value and index come back together, and the tie break is
    lowest-index by construction.  f32 ordering of nonnegative floats equals
    the ordering of their i32 bit patterns, so the only deviation from exact
    top-k is that distances equal after dropping those low bits (≲2^-13
    relative at N=1024) become index-broken ties.  Cheapest sweep per
    neighbour; approximate in that razor-thin-margin sense only.

    Switch with ``IQTPU_KNN_SELECT=two_pass|argmin|packed`` (read at trace
    time) to A/B on hardware.  ``packed`` is the default — the on-chip A/B
    (docs/PERF.md §3) measured it fastest for every kNN-consuming family
    (dgcnn +17%, gcnn +5%, pointconv +5% engine throughput over two_pass);
    set ``two_pass`` for bit-exact `jax.lax.top_k` tie semantics.
    """
    return os.environ.get("IQTPU_KNN_SELECT", "packed")


def _split_hilo(a: jnp.ndarray):
    """f32 -> (hi, lo) bf16 pair with hi + lo ≈ a to ~16 mantissa bits."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _split_parts(a: jnp.ndarray, parts: int) -> jnp.ndarray:
    """f32 -> (..., parts*F) bf16 planes; summing the planes recovers ``a``
    to ~8 mantissa bits (parts=1) or ~16 (parts=2)."""
    if parts == 1:
        return a.astype(jnp.bfloat16)
    hi, lo = _split_hilo(a)
    return jnp.concatenate([hi, lo], axis=-1)


def _dist_tile(xq, xdb_t):
    """Squared-distance tile: xq (Q, C) f32, xdb_t (C, N) f32 -> (Q, N)."""
    inner = jax.lax.dot_general(
        xq, xdb_t, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    q2 = jnp.sum(xq * xq, axis=1, keepdims=True)          # (Q, 1)
    d2 = jnp.sum(xdb_t * xdb_t, axis=0, keepdims=True)    # (1, N)
    return q2 - 2.0 * inner + d2


_I32_MAX = 2**31 - 1


def _pack_bits(dist):
    """Nonnegative f32 distances -> int32 bit patterns (i32 ordering of the
    patterns equals the f32 ordering of the values)."""
    return jax.lax.bitcast_convert_type(jnp.maximum(dist, 0.0), jnp.int32)


def _select_prep(dist, col, select: str):
    """Distance tile -> the sweep's loop state.  Kernels must thread the
    state only through `_select_min` afterwards.

    packed/succ/hier embed the column index in the low mantissa bits
    (`knn_select_impl`); succ additionally carries the previous minimum
    (successor formulation — the tile is never mutated); hier additionally
    carries per-128-lane-block minima; bf16 sweeps a bfloat16 copy of the
    tile (ties within ~2^-8 relative break to the lowest index)."""
    if select == "bf16":
        return dist.astype(jnp.bfloat16)
    if select in ("packed", "succ", "hier"):
        n = dist.shape[1]
        low_mask = (1 << (n - 1).bit_length()) - 1
        bits = (_pack_bits(dist) & ~low_mask) | col
        if select == "succ":
            return (bits, jnp.full((dist.shape[0], 1), -1, jnp.int32))
        if select == "hier":
            q = dist.shape[0]
            nb = max(n // 128, 1)
            blockmin = jnp.min(bits.reshape(q, nb, n // nb), axis=2)
            return (bits, blockmin)
        return bits
    return dist


def _select_min(state, col, select: str = "two_pass"):
    """One arg-min sweep step with lowest-index tie break (exact for
    two_pass/argmin; see `knn_select_impl` for packed's tie widening, which
    succ/hier share and bf16 coarsens to ~2^-8).

    Returns (sel (Q, 1) int32, onehot (Q, N) bool, updated state).
    """
    n = col.shape[1]
    low_mask = (1 << (n - 1).bit_length()) - 1
    # NB: the packed-family one-hots compare the loop-INVARIANT column iota
    # against the extracted index (packed values embed a unique column, so
    # this equals comparing the tile to the min value).  Comparing the tile
    # itself (`state == selv`) adds a second full-tile consumer per unrolled
    # step and overflows scoped VMEM at C=128 (measured: +6 MB over the
    # 16 MB limit at dgcnn conv4).
    if select == "packed":
        sel = jnp.min(state, axis=1, keepdims=True) & low_mask
        onehot = col == sel
        return sel, onehot, jnp.where(onehot, _I32_MAX, state)
    if select == "succ":
        # successor sweep: m_i = min{d : d > m_{i-1}} over the DISTINCT
        # packed values — one read-only traversal, no tile mutation/writes.
        bits, prev = state
        cand = jnp.where(bits > prev, bits, _I32_MAX)
        selv = jnp.min(cand, axis=1, keepdims=True)
        onehot = col == (selv & low_mask)
        return selv & low_mask, onehot, (bits, selv)
    if select == "hier":
        # block-hierarchical min (round-2 verdict experiment): extract from
        # per-block minima, then refresh them.  Rows extract from different
        # blocks, so the vectorised refresh degenerates to a full-tile pass
        # — measured to document the floor (docs/PERF.md §3).
        bits, blockmin = state
        selv = jnp.min(blockmin, axis=1, keepdims=True)
        onehot = col == (selv & low_mask)
        bits = jnp.where(onehot, _I32_MAX, bits)
        q = bits.shape[0]
        nb = max(n // 128, 1)
        blockmin = jnp.min(bits.reshape(q, nb, n // nb), axis=2)
        return selv & low_mask, onehot, (bits, blockmin)
    if select == "bf16":
        rowmin = jnp.min(state, axis=1, keepdims=True)
        sel = jnp.min(jnp.where(state == rowmin, col, n), axis=1,
                      keepdims=True)
        onehot = col == sel
        return sel, onehot, jnp.where(onehot, jnp.bfloat16(_BIG), state)
    if select == "argmin":
        sel = jnp.argmin(state, axis=1, keepdims=True).astype(jnp.int32)
    else:
        rowmin = jnp.min(state, axis=1, keepdims=True)
        sel = jnp.min(jnp.where(state == rowmin, col, n), axis=1,
                      keepdims=True)
    onehot = col == sel
    return sel, onehot, jnp.where(onehot, _BIG, state)


def _extrema_kernel(xq_ref, xdbt_ref, ahl_ref, omax_ref, omin_ref, *, k: int,
                    parts: int, select: str):
    dist = _dist_tile(xq_ref[0], xdbt_ref[0])
    q, n = dist.shape
    f = ahl_ref.shape[-1] // parts
    col = jax.lax.broadcasted_iota(jnp.int32, (q, n), 1)
    dist = _select_prep(dist, col, select)
    ahl = ahl_ref[0]                                       # (N, parts*F) bf16

    amax = jnp.full((q, f), -_BIG, jnp.float32)
    amin = jnp.full((q, f), _BIG, jnp.float32)
    for _ in range(k):
        _, onehot, dist = _select_min(dist, col, select)
        oh = onehot.astype(jnp.bfloat16)
        ghl = jnp.dot(oh, ahl, preferred_element_type=jnp.float32)
        g = ghl if parts == 1 else ghl[:, :f] + ghl[:, f:]   # hi (+ lo)
        amax = jnp.maximum(amax, g)
        amin = jnp.minimum(amin, g)
    omax_ref[0] = amax
    omin_ref[0] = amin


def knn_layout_impl() -> str:
    """Distance-tile orientation for the fused kNN extrema sweep.

    ``qn`` (default): queries on sublanes, database on lanes — the
    per-neighbour min reduces across lanes (log2(128) shuffle steps per
    vreg).  ``nq``: database on sublanes, queries on lanes — the reduction
    combines whole vregs down the sublane axis (cheaper per element), the
    gather matmul contracts dim 0 of both operands, and the selected-lane
    masking is unchanged.  A/B knob: IQTPU_KNN_LAYOUT (read at trace time);
    measured results in docs/PERF.md §3.
    """
    return os.environ.get("IQTPU_KNN_LAYOUT", "qn")


def _select_prep_nq(dist, row, select: str):
    """(N, Q)-layout sweep state: packed index in low mantissa bits; succ
    carries the previous minimum instead of mutating the tile."""
    n = dist.shape[0]
    low_mask = (1 << (n - 1).bit_length()) - 1
    bits = (_pack_bits(dist) & ~low_mask) | row
    if select == "succ":
        return (bits, jnp.full((1, dist.shape[1]), -1, jnp.int32))
    return bits


def _select_min_nq(state, row, select: str):
    n = row.shape[0]
    low_mask = (1 << (n - 1).bit_length()) - 1
    if select == "succ":
        bits, prev = state
        cand = jnp.where(bits > prev, bits, _I32_MAX)
        selv = jnp.min(cand, axis=0, keepdims=True)        # (1, Q)
        onehot = row == (selv & low_mask)
        return selv & low_mask, onehot, (bits, selv)
    sel = jnp.min(state, axis=0, keepdims=True) & low_mask
    onehot = row == sel
    return sel, onehot, jnp.where(onehot, _I32_MAX, state)


def _extrema_kernel_nq(xdb_ref, xqt_ref, ahl_ref, omax_ref, omin_ref, *,
                       k: int, parts: int, select: str):
    """(N, Q)-layout twin of `_extrema_kernel` (see `knn_layout_impl`)."""
    xdb = xdb_ref[0]                                       # (N, C) f32
    xqt = xqt_ref[0]                                       # (C, Q) f32
    inner = jax.lax.dot_general(
        xdb, xqt, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)                # (N, Q)
    d2 = jnp.sum(xdb * xdb, axis=1, keepdims=True)         # (N, 1)
    q2 = jnp.sum(xqt * xqt, axis=0, keepdims=True)         # (1, Q)
    dist = d2 - 2.0 * inner + q2
    n, q = dist.shape
    f = ahl_ref.shape[-1] // parts
    row = jax.lax.broadcasted_iota(jnp.int32, (n, q), 0)
    state = _select_prep_nq(dist, row, select)
    ahl = ahl_ref[0]                                       # (N, parts*F) bf16

    amax = jnp.full((q, f), -_BIG, jnp.float32)
    amin = jnp.full((q, f), _BIG, jnp.float32)
    for _ in range(k):
        _, onehot, state = _select_min_nq(state, row, select)
        oh = onehot.astype(jnp.bfloat16)                   # (N, Q)
        ghl = jax.lax.dot_general(
            oh, ahl, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (Q, parts*F)
        g = ghl if parts == 1 else ghl[:, :f] + ghl[:, f:]
        amax = jnp.maximum(amax, g)
        amin = jnp.minimum(amin, g)
    omax_ref[0] = amax
    omin_ref[0] = amin


def knn_gather_extrema(xs: jnp.ndarray, a: jnp.ndarray, k: int,
                       block_q: int = 512, parts: int = None,
                       select: str = None, interpret: bool = False):
    """Per-point extrema of value rows over the k nearest neighbours.

    Args:
      xs: (B, N, C) float32 — features defining the kNN graph (self included,
          exact `jax.lax.top_k` tie semantics).
      a:  (B, N, F) float32 — value rows to gather.
      k:  neighbourhood size.
      parts: bf16 planes carrying the values — 2 (hi/lo, ~2^-16 relative
          exact) or 1 (plain bf16, ~2^-9, halves the gather matmuls).
          None (default) follows `config.gather_value_parts()`, the
          `--gather_precision` CLI knob.
    Returns:
      (amax, amin): (B, N, F) float32 each;
      amax[b, i] = max over j in kNN(i) of a[b, j] (elementwise), etc.
    """
    if parts is None:
        parts = gather_value_parts()
    if select is None:
        select = knn_select_impl()
    layout = knn_layout_impl()
    return _knn_gather_extrema(xs, a, k, block_q=block_q, parts=parts,
                               select=select, layout=layout,
                               interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("k", "block_q", "parts", "select",
                                    "layout", "interpret"))
def _knn_gather_extrema(xs, a, k, block_q, parts, select, layout="qn",
                        interpret=False):
    B, N, C = xs.shape
    F = a.shape[-1]
    bq = min(block_q, N)
    assert N % bq == 0, (N, bq)
    xs = xs.astype(jnp.float32)
    xs_t = jnp.swapaxes(xs, 1, 2)                          # (B, C, N)
    ahl = _split_parts(a.astype(jnp.float32), parts)       # (B, N, parts*F)

    out_shape = jax.ShapeDtypeStruct((B, N, F), jnp.float32)
    out_specs = (
        pl.BlockSpec((1, bq, F), lambda b, q: (b, q, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bq, F), lambda b, q: (b, q, 0),
                     memory_space=pltpu.VMEM),
    )
    if layout == "nq":
        if select not in ("packed", "succ"):
            select = "packed"       # nq implements the packed-order sweeps
        kernel = functools.partial(_extrema_kernel_nq, k=k, parts=parts,
                                   select=select)
        omax, omin = pl.pallas_call(
            kernel,
            grid=(B, N // bq),
            in_specs=[
                pl.BlockSpec((1, N, C), lambda b, q: (b, 0, 0),
                             memory_space=pltpu.VMEM),     # database rows
                pl.BlockSpec((1, C, bq), lambda b, q: (b, 0, q),
                             memory_space=pltpu.VMEM),     # query block^T
                pl.BlockSpec((1, N, parts * F), lambda b, q: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=(out_shape, out_shape),
            interpret=interpret,
        )(xs, xs_t, ahl)
        return omax, omin

    kernel = functools.partial(_extrema_kernel, k=k, parts=parts,
                               select=select)
    omax, omin = pl.pallas_call(
        kernel,
        grid=(B, N // bq),
        in_specs=[
            pl.BlockSpec((1, bq, C), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, N), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, parts * F), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(xs, xs_t, ahl)
    return omax, omin


def _idx_extrema_kernel(idx_ref, ahl_ref, omax_ref, omin_ref, *, k: int,
                        parts: int):
    q = idx_ref.shape[1]
    n = ahl_ref.shape[1]
    f = ahl_ref.shape[-1] // parts
    col = jax.lax.broadcasted_iota(jnp.int32, (q, n), 1)
    ahl = ahl_ref[0]
    amax = jnp.full((q, f), -_BIG, jnp.float32)
    amin = jnp.full((q, f), _BIG, jnp.float32)
    for j in range(k):
        sel = idx_ref[0, :, j:j + 1]                       # (Q, 1) int32
        oh = (col == sel).astype(jnp.bfloat16)
        ghl = jnp.dot(oh, ahl, preferred_element_type=jnp.float32)
        g = ghl if parts == 1 else ghl[:, :f] + ghl[:, f:]   # hi (+ lo)
        amax = jnp.maximum(amax, g)
        amin = jnp.minimum(amin, g)
    omax_ref[0] = amax
    omin_ref[0] = amin


def gather_extrema(idx: jnp.ndarray, a: jnp.ndarray,
                   block_q: int = 512, parts: int = None,
                   interpret: bool = False):
    """Per-point extrema of value rows over precomputed neighbour indices.

    The fixed-graph (GCNN) companion of `knn_gather_extrema`: the kNN graph
    is computed once from the input coordinates and reused by every layer
    (reference models/dgcnn.py:161-194), so only the gather is fused here.

    Args:
      idx: (B, N, k) int32 neighbour indices.
      a:   (B, N, F) float32 value rows.
      parts: value-plane precision; None follows
          `config.gather_value_parts()` (see `knn_gather_extrema`).
    Returns:
      (amax, amin): (B, N, F) float32.
    """
    if parts is None:
        parts = gather_value_parts()
    return _gather_extrema(idx, a, block_q=block_q, parts=parts,
                           interpret=interpret)


@functools.partial(jax.jit, static_argnames=("block_q", "parts", "interpret"))
def _gather_extrema(idx, a, block_q, parts, interpret):
    B, N, k = idx.shape
    F = a.shape[-1]
    bq = min(block_q, N)
    assert N % bq == 0, (N, bq)
    ahl = _split_parts(a.astype(jnp.float32), parts)

    kernel = functools.partial(_idx_extrema_kernel, k=k, parts=parts)
    out_shape = jax.ShapeDtypeStruct((B, N, F), jnp.float32)
    omax, omin = pl.pallas_call(
        kernel,
        grid=(B, N // bq),
        in_specs=[
            pl.BlockSpec((1, bq, k), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, parts * F), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, F), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, F), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(idx, ahl)
    return omax, omin


def _knn_kernel(xq_ref, xdbt_ref, oidx_ref, *, k: int, select: str):
    dist = _dist_tile(xq_ref[0], xdbt_ref[0])
    q, n = dist.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (q, n), 1)
    dist = _select_prep(dist, col, select)
    for j in range(k):
        sel, _, dist = _select_min(dist, col, select)
        oidx_ref[0, :, j] = sel[:, 0]


def knn_pallas(query: jnp.ndarray, database: jnp.ndarray, k: int,
               block_q: int = 256, select: str = None,
               interpret: bool = False) -> jnp.ndarray:
    """Exact k-nearest-neighbour indices (fused distance + selection).

    Args:
      query: (B, S, C); database: (B, N, C).
    Returns:
      (B, S, k) int32 — indices into the database, `jax.lax.top_k`
      tie semantics (lowest index first).
    """
    if select is None:
        select = knn_select_impl()
    return _knn_pallas(query, database, k, block_q=block_q, select=select,
                       interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("k", "block_q", "select", "interpret"))
def _knn_pallas(query, database, k, block_q, select, interpret):
    B, S, C = query.shape
    N = database.shape[1]
    bq = min(block_q, S)
    assert S % bq == 0, (S, bq)
    db_t = jnp.swapaxes(database.astype(jnp.float32), 1, 2)

    kernel = functools.partial(_knn_kernel, k=k, select=select)
    idx = pl.pallas_call(
        kernel,
        grid=(B, S // bq),
        in_specs=[
            pl.BlockSpec((1, bq, C), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, N), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, k), lambda b, q: (b, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, k), jnp.int32),
        interpret=interpret,
    )(query.astype(jnp.float32), db_t)
    return idx
