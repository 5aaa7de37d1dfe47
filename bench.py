"""Benchmark: masked-coalition forwards/sec — the pipeline's headline metric
(BASELINE.md north star).

One "forward" = one masked 1024-point cloud through the frozen classifier.
The Shapley enumeration workload is 21.4M such forwards per model/dataset/mode
(SURVEY.md §6), so throughput here directly sets the sensitivity-table
wall-clock.

Measures the full engine step — coalition mask construction (keep-matrix
gather + where), forward, reward, on-device marginal scatter — not just the
raw matmuls.

vs_baseline: the reference publishes no throughput numbers
(BASELINE.json "published": {}).  The denominator below is a derived
estimate of the reference pipeline on its own hardware: PointNet at batch
33*50 on one 24 GB TITAN-RTX-class GPU, ~0.9 GFLOP/forward at ~30% fp32
utilisation ≈ 5000 masked forwards/sec, which also absorbs the reference's
per-batch host-sync and Python masking-loop overheads (final_common.py:46-61).

Usage: python bench.py [--model pointnet] [--orders 100] [--steps 8]
Prints ONE JSON line.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

REFERENCE_FWDS_PER_SEC = 5000.0   # derived TITAN-RTX estimate, see docstring


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="pointnet",
                   choices=["pointnet", "pointnet2", "pointconv",
                            "dgcnn", "gcnn", "gcnn_adv"])
    p.add_argument("--orders", type=int, default=None,
                   help="orders per device step (default: per-model config)")
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--num_points", type=int, default=1024)
    p.add_argument("--warmup", type=int, default=2)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from interpret_quality_tpu.attrib import ShapleyEngine
    from interpret_quality_tpu.config import shapley_batch_size
    from interpret_quality_tpu.models import (build_model, init_model,
                                              make_forward_fn)

    R = 32
    orders_per_step = args.orders or shapley_batch_size(args.model)
    model = build_model(args.model, num_classes=10)
    variables = init_model(model, jax.random.PRNGKey(0),
                           num_points=args.num_points)
    fwd = make_forward_fn(model, variables)
    engine = ShapleyEngine(fwd, num_regions=R, softmax_type="modified",
                           batch_orders=orders_per_step)

    # a realistic unit-sphere surface cloud with FPS regions (ball-query
    # occupancy and graph structure match production, unlike a random blob)
    from interpret_quality_tpu.data.datasets import (SyntheticClouds,
                                                     farthest_point_sample_np)
    cloud, _ = SyntheticClouds(num_samples=1,
                               num_points=args.num_points)[0]
    centers = farthest_point_sample_np(cloud, R)
    d2 = ((cloud[:, None, :] - cloud[centers][None, :, :]) ** 2).sum(-1)
    region_id = d2.argmin(axis=1)

    def run_orders(n, seed):
        r = np.random.RandomState(seed)
        orders = np.stack([r.permutation(R) for _ in range(n)])
        return engine.shapley_for_pose(cloud, 1, region_id, orders)

    # warmup / compile
    for w in range(args.warmup):
        run_orders(orders_per_step, w)

    t0 = time.perf_counter()
    for s in range(args.steps):
        run_orders(orders_per_step, 100 + s)
    dt = time.perf_counter() - t0

    forwards = args.steps * orders_per_step * (R + 1)
    fps = forwards / dt
    print(json.dumps({
        "metric": "masked_coalition_forwards_per_sec",
        "value": round(fps, 1),
        "unit": "forwards/s",
        "vs_baseline": round(fps / REFERENCE_FWDS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
