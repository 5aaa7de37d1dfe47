"""Interaction-pipeline tests.

Analytic ground truth: for a value function additive over regions,
I(i,j) = v(S∪{i,j}) + v(S) − v(S∪{i}) − v(S∪{j}) = 0 for every context;
adding an explicit pairwise term w_ij makes I(i,j) = w_ij exactly.
"""
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from interpret_quality_tpu.attrib.interactions import (
    InteractionEngine, compute_order_interaction, gen_context,
    gen_pair_random)
from interpret_quality_tpu.utils.rng import set_random


def _pairwise_forward(region_id, R, center, w_pair, pair):
    """logits[0] = sum_j w_j f_j + w_pair * f_i * f_j (linear reward via the
    2-logit construction)."""
    region_id = jnp.asarray(region_id)
    center_j = jnp.asarray(center)
    weights = jnp.arange(1.0, R + 1.0) / R
    i, j = pair

    def forward(x):
        away = jnp.any(jnp.abs(x - center_j) > 1e-3, axis=-1).astype(jnp.float32)
        onehot = jax.nn.one_hot(region_id, R)
        frac = (away @ onehot) / jnp.sum(onehot, axis=0)   # (B, R)
        score = frac @ weights + w_pair * frac[:, i] * frac[:, j]
        return jnp.stack([score, jnp.zeros_like(score)], axis=-1)
    return forward


def _setup(seed=0, N=80, R=8):
    rng = np.random.RandomState(seed)
    data = rng.randn(N, 3).astype(np.float32) + 4.0
    region_id = rng.randint(0, R, N)
    region_id[:R] = np.arange(R)
    return data, region_id, data.mean(0)


def test_interaction_zero_for_additive_and_wij_for_pairwise():
    R = 8
    data, region_id, center = _setup()
    pair = (2, 5)
    w_pair = 0.7
    fwd = _pairwise_forward(region_id, R, center, w_pair, pair)
    engine = InteractionEngine(fwd, R, batch_contexts=4)

    pair_list = np.array([[2, 5], [0, 1]])
    # contexts of size 2 from the remaining regions
    ctx = np.array([
        [[0, 1], [3, 4], [6, 7], [1, 4], [3, 7]],
        [[2, 3], [4, 5], [6, 7], [2, 6], [5, 7]],
    ])
    logits = engine.logits_for_pairs(data, region_id, pair_list, ctx)
    assert logits.shape == (2, 20, 2)
    inter = compute_order_interaction(logits, 0, "modified")
    # pair (2,5): interaction = w_pair for every context
    np.testing.assert_allclose(inter[0], w_pair, atol=1e-4)
    # pair (0,1): no pairwise term (and contexts exclude {2,5} jointly except
    # row [2,6],[5,7]... both i=2,j=5 never jointly present) -> 0
    np.testing.assert_allclose(inter[1], 0.0, atol=1e-4)


def test_interaction_batch_padding_last_chunk():
    """num_context not divisible by batch_contexts exercises the pad path."""
    R = 8
    data, region_id, center = _setup(seed=1)
    fwd = _pairwise_forward(region_id, R, center, 0.5, (0, 3))
    engine = InteractionEngine(fwd, R, batch_contexts=4)
    pair_list = np.array([[0, 3]])
    ctx = np.array([[[1, 2], [4, 5], [6, 7], [2, 4], [5, 6], [1, 7], [2, 7]]])
    logits = engine.logits_for_pairs(data, region_id, pair_list, ctx)
    assert logits.shape == (1, 28, 2)
    inter = compute_order_interaction(logits, 0, "modified")
    np.testing.assert_allclose(inter[0], 0.5, atol=1e-4)


def test_gen_context_shapes_and_bounds():
    set_random(0)
    R = 32
    pairs = gen_pair_random(R, 10)
    assert pairs.shape == (10, 2)
    assert (pairs[:, 0] < pairs[:, 1]).all()
    import tempfile, os
    d = tempfile.mkdtemp() + "/"
    gen_context(pairs, d, R, ratios=[0.0, 0.1, 1.0], num_save_context_max=7)
    c0 = np.load(d + "ratio0_context_list.npy")
    c10 = np.load(d + "ratio10_context_list.npy")
    c100 = np.load(d + "ratio100_context_list.npy")
    assert c0.shape[2] == 0
    assert c10.shape == (10, 7, 3)        # m = floor(30*0.1) = 3
    assert c100.shape == (10, 1, 30)      # only one full context
    # contexts never contain the pair itself
    for p in range(10):
        for ctx in c10[p]:
            assert pairs[p, 0] not in ctx and pairs[p, 1] not in ctx


def test_multi_chunk_scan_matches_single_step():
    """M spanning several scan steps (with bucket padding) must reproduce
    the single-step result bit-for-bit after the padded rows are dropped."""
    R = 8
    rng = np.random.RandomState(5)
    region_id = np.repeat(np.arange(R), 8)
    data = rng.randn(R * 8, 3).astype(np.float32)
    center = data.mean(axis=0)
    fwd = _pairwise_forward(region_id, R, center, 0.7, (1, 4))
    pairs = np.array([[i, j] for i in range(R) for j in range(i + 1, R)])[:5]
    ctx = np.stack([np.stack([rng.choice(
        [r for r in range(R) if r not in p], 2, replace=False)
        for _ in range(7)]) for p in pairs])               # (5, 7, 2)

    small = InteractionEngine(fwd, R, batch_contexts=4)    # T=9 -> bucket 12
    big = InteractionEngine(fwd, R, batch_contexts=64)     # T=1
    lg1 = small.logits_for_pairs(data, region_id, pairs, ctx)
    lg2 = big.logits_for_pairs(data, region_id, pairs, ctx)
    np.testing.assert_allclose(lg1, lg2, rtol=1e-5, atol=1e-6)


def test_scan_length_bucket_progression():
    """Padded scan lengths: exact table hits below 256, and a continued
    ~1.3x progression past the table — never a 2x jump, waste < 25%."""
    for T in [1, 2, 3, 5, 100, 256]:
        T_pad = InteractionEngine._scan_length(T)
        assert T_pad >= T and T_pad in InteractionEngine._T_BUCKETS
    for T in [257, 300, 321, 500, 1000, 5000]:
        T_pad = InteractionEngine._scan_length(T)
        assert T_pad >= T
        assert T_pad / T <= 1.25 + 1e-9, (T, T_pad)
    # progression is monotone and ~1.25x-spaced (no doubling; ceil can
    # push one step to 1.2512x)
    lengths = sorted({InteractionEngine._scan_length(T)
                      for T in range(257, 2000)})
    for a, b in zip(lengths, lengths[1:]):
        assert b / a <= 1.26, (a, b)


def test_engine_keep_rows_match_interaction_masks():
    """The engine's batched numpy mask builder and the canonical
    coalitions.interaction_masks must agree on the 4-row layout
    [S∪{i,j}, S∪{i}, S∪{j}, S] for every pair and context."""
    from interpret_quality_tpu.attrib.coalitions import interaction_masks

    R = 12
    rng = np.random.RandomState(11)
    pairs = np.array([[0, 5], [3, 7], [10, 2]])
    ctx = np.stack([np.stack([rng.choice(
        [r for r in range(R) if r not in p], 4, replace=False)
        for _ in range(6)]) for p in pairs])                  # (3, 6, 4)

    eng = InteractionEngine.__new__(InteractionEngine)        # mask-only use
    eng.num_regions = R
    rows = eng._keep_rows_np(pairs, ctx).reshape(3, 6, 4, R)

    for p, (i, j) in enumerate(pairs):
        ck = np.zeros((6, R), bool)
        for c in range(6):
            ck[c, ctx[p, c]] = True
        oracle = np.asarray(interaction_masks(
            jnp.asarray(ck), jnp.asarray(i), jnp.asarray(j)))
        np.testing.assert_array_equal(rows[p], oracle)
