"""TPU smoke + profiling pass: compile every model at its coalition batch,
time the Shapley engine step, compare XLA vs Pallas FPS, and report
forwards/sec per model.  Run on the real chip (default platform).

Usage: python scripts/tpu_smoke.py [--models pointnet,dgcnn,...] [--orders N]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--models", default="pointnet,dgcnn,gcnn,pointnet2,pointconv")
    p.add_argument("--orders", type=int, default=0, help="0 = per-model config")
    p.add_argument("--num_points", type=int, default=1024)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--skip_fps", action="store_true")
    p.add_argument("--matmul_precision", default="default")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.matmul_precision != "default":
        jax.config.update("jax_default_matmul_precision", args.matmul_precision)

    print("devices:", jax.devices())
    from interpret_quality_tpu.attrib import ShapleyEngine
    from interpret_quality_tpu.config import shapley_batch_size
    from interpret_quality_tpu.models import (build_model, init_model,
                                              make_forward_fn)

    R = 32
    rng = np.random.RandomState(0)
    cloud = rng.randn(args.num_points, 3).astype(np.float32)
    region_id = rng.randint(0, R, args.num_points)
    region_id[:R] = np.arange(R)

    # ---- FPS: XLA vs Pallas --------------------------------------------
    if not args.skip_fps:
        from interpret_quality_tpu.ops.geometry import farthest_point_sample
        from interpret_quality_tpu.ops.pallas import fps_pallas
        B = 64
        xyz = jnp.asarray(rng.randn(B, args.num_points, 3).astype(np.float32))
        for name, fn in [("fps_xla", lambda: farthest_point_sample(xyz, 512)),
                         ("fps_pallas", lambda: fps_pallas(xyz, 512))]:
            try:
                out = jax.block_until_ready(fn())   # compile
                t0 = time.perf_counter()
                for _ in range(3):
                    out = jax.block_until_ready(fn())
                dt = (time.perf_counter() - t0) / 3
                print(json.dumps({"op": name, "batch": B, "npoint": 512,
                                  "seconds": round(dt, 4)}))
            except Exception as e:
                print(f"{name} FAILED: {type(e).__name__}: {e}")
        # agreement check on TPU
        try:
            a = np.asarray(farthest_point_sample(xyz[:4], 64))
            b = np.asarray(fps_pallas(xyz[:4], 64))
            print("fps agreement:", (a == b).mean())
        except Exception as e:
            print("fps agreement check failed:", e)

    # ---- per-model coalition throughput --------------------------------
    for model_name in args.models.split(","):
        orders = args.orders or shapley_batch_size(model_name)
        try:
            model = build_model(model_name, num_classes=10)
            variables = init_model(model, jax.random.PRNGKey(0),
                                   num_points=args.num_points)
            fwd = make_forward_fn(model, variables)
            engine = ShapleyEngine(fwd, num_regions=R,
                                   softmax_type="modified",
                                   batch_orders=orders)

            def run(seed):
                r = np.random.RandomState(seed)
                o = np.stack([r.permutation(R) for _ in range(orders)])
                return engine.shapley_for_pose(cloud, 1, region_id, o)

            t0 = time.perf_counter()
            run(0)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for s in range(args.steps):
                run(s + 1)
            dt = time.perf_counter() - t0
            fps = args.steps * orders * (R + 1) / dt
            print(json.dumps({
                "model": model_name, "orders_per_step": orders,
                "batch_clouds": orders * (R + 1),
                "compile_seconds": round(compile_s, 2),
                "forwards_per_sec": round(fps, 1)}))
        except Exception as e:
            print(f"{model_name} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
