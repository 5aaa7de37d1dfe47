"""Microbenchmarks of the graph-model hot ops on the real TPU chip.

The axon tunnel's block_until_ready does not synchronise, so every timed
function returns a scalar that we fetch to host (4-byte transfer) to force
completion.  Prints one JSON line per (op, variant).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(name, fn, iters=5):
    import numpy as np
    try:
        float(np.asarray(fn()))          # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            out = float(np.asarray(fn()))
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({"op": name, "ms": round(dt * 1e3, 2)}), flush=True)
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {e}", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=330)
    p.add_argument("--n", type=int, default=1024)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--ops", default="all")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from interpret_quality_tpu.ops.geometry import (farthest_point_sample,
                                                    knn,
                                                    pairwise_sqdist_self,
                                                    query_ball_point)

    B, N, k = args.batch, args.n, args.k
    rng = np.random.RandomState(0)
    want = lambda s: args.ops == "all" or s in args.ops.split(",")

    if want("knn"):
        for C in (3, 64, 128):
            x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
            sq = jax.jit(lambda t: pairwise_sqdist_self(t).sum())
            kn = jax.jit(lambda t: knn(t, k).sum())
            tk = jax.jit(lambda t: jax.lax.top_k(-t, k)[1].sum())
            ak = jax.jit(lambda t: jax.lax.approx_max_k(-t, k)[1].sum())
            bench(f"sqdist_C{C}", lambda: sq(x), iters=3)
            bench(f"knn_C{C}", lambda: kn(x), iters=3)
            d = pairwise_sqdist_self(x)
            bench(f"topk_only_C{C}", lambda: tk(d), iters=3)
            bench(f"approx_topk_C{C}", lambda: ak(d), iters=3)

    if want("gather"):
        for F in (64, 256):
            a = jnp.asarray(rng.randn(B, N, F).astype(np.float32))
            idx = jnp.asarray(rng.randint(0, N, (B, N, k)).astype(np.int32))

            def loop_gather_max(a, idx):
                amax = jnp.full_like(a, -jnp.inf)
                for j in range(k):
                    g = jax.vmap(lambda t, i: t[i])(a, idx[..., j])
                    amax = jnp.maximum(amax, g)
                return amax.sum()

            def flat_gather_max(a, idx):
                g = jax.vmap(lambda t, i: t[i])(a, idx.reshape(idx.shape[0], -1))
                return g.reshape(a.shape[0], a.shape[1], k, -1).max(axis=2).sum()

            def onehot_sum(a, idx):
                # scatter-style: one-hot (B, N*k, N) @ a -- FLOP heavy, skip
                return None

            lg = jax.jit(loop_gather_max)
            fg = jax.jit(flat_gather_max)
            bench(f"gathermax_loop_F{F}", lambda: lg(a, idx), iters=3)
            bench(f"gathermax_flat_F{F}", lambda: fg(a, idx), iters=3)

    if want("fps"):
        x = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        f1 = jax.jit(lambda t: farthest_point_sample(t, 512).sum())
        bench("fps_xla_512", lambda: f1(x), iters=3)
        x4 = jnp.asarray(rng.randn(30, N, 3).astype(np.float32))
        bench("fps_xla_b30", lambda: f1(x4), iters=3)

    if want("ball"):
        x = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        newx = x[:, :512]
        bq = jax.jit(lambda a, b: query_ball_point(0.2, 32, a, b).sum())
        bench("ballquery_512x32", lambda: bq(x, newx), iters=3)


if __name__ == "__main__":
    main()
