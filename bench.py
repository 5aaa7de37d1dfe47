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
(BASELINE.json "published": {}).  The per-model denominators are *derived
proxies* for the reference pipeline on its own hardware: XLA cost-analysis
FLOPs of the unfused forward (matching the torch math) divided into a
TITAN-RTX-class envelope of 16.3 TFLOP/s fp32 at 30% utilisation, which also
absorbs the reference's per-batch host syncs and Python masking loops
(final_common.py:46-61).  They are estimates, not measurements.

Usage: python bench.py [--model all] [--orders N] [--steps 8]
Prints ONE JSON line: the headline aggregate (geometric mean across models)
with a per_model breakdown.
"""
from __future__ import annotations

import os
import sys

# XLA:CPU prints a benign cpu_aot_loader "machine feature +prefer-no-gather"
# E-line (~2 KB each) for every compile-cache hit; left on, it floods stderr
# and buries the one JSON result line this script exists to print.  The TSL
# log level is latched when jax first loads — which the site hook does at
# interpreter startup, before this file runs — so setting the env var here is
# too late; re-exec once with it in the startup environment.
if os.environ.get("_IQ_BENCH_REEXEC") != "1":
    os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"
    os.environ["_IQ_BENCH_REEXEC"] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)

import argparse
import json
import time

ALL_MODELS = ["pointnet", "pointnet2", "pointconv", "dgcnn", "gcnn"]

# GFLOP per masked-coalition forward, from XLA cost analysis of the unfused
# forward at N=1024 (scripts/model_flops.py re-derives).  Conservative for
# dgcnn/gcnn: even our unfused path hoists the edge-conv matmul above the
# gather (~k-fold FLOP cut vs the torch edge conv), so the derived reference
# throughput is *over*stated and vs_baseline *under*stated there.
GFLOP_PER_FORWARD = {
    "pointnet": 0.900,
    "pointnet2": 8.096,
    "pointconv": 2.480,
    "dgcnn": 1.963,
    "gcnn": 1.331,
    "gcnn_adv": 1.331,
}
_TITAN_EFF_FLOPS = 16.3e12 * 0.30       # TITAN RTX fp32 peak x assumed util


def reference_fwds_per_sec(model: str, num_points: int = 1024):
    """Derived TITAN-RTX proxy rate; only defined for the N=1024 FLOP table
    (non-default --num_points changes the workload non-linearly per model,
    so no like-for-like ratio exists)."""
    if num_points != 1024:
        return None
    return _TITAN_EFF_FLOPS / (GFLOP_PER_FORWARD[model] * 1e9)


def bench_model(name: str, orders: int | None, steps: int, warmup: int,
                num_points: int) -> dict:
    import jax
    import numpy as np

    from interpret_quality_tpu.attrib import ShapleyEngine
    from interpret_quality_tpu.config import shapley_batch_size
    from interpret_quality_tpu.data.datasets import (SyntheticClouds,
                                                     farthest_point_sample_np)
    from interpret_quality_tpu.models import (build_model, init_model,
                                              make_forward_fn)

    R = 32
    orders_per_step = orders or shapley_batch_size(name)
    model = build_model(name, num_classes=10)
    variables = init_model(model, jax.random.PRNGKey(0),
                           num_points=num_points)
    fwd = make_forward_fn(model, variables)
    engine = ShapleyEngine(fwd, num_regions=R, softmax_type="modified",
                           batch_orders=orders_per_step)

    # a realistic unit-sphere surface cloud with FPS regions (ball-query
    # occupancy and graph structure match production, unlike a random blob)
    cloud, _ = SyntheticClouds(num_samples=1, num_points=num_points)[0]
    centers = farthest_point_sample_np(cloud, R)
    d2 = ((cloud[:, None, :] - cloud[centers][None, :, :]) ** 2).sum(-1)
    region_id = d2.argmin(axis=1)

    def run_orders(n, seed):
        r = np.random.RandomState(seed)
        perms = np.stack([r.permutation(R) for _ in range(n)])
        return engine.shapley_for_pose(cloud, 1, region_id, perms)

    for w in range(warmup):
        run_orders(orders_per_step, w)

    t0 = time.perf_counter()
    for s in range(steps):
        run_orders(orders_per_step, 100 + s)
    dt = time.perf_counter() - t0

    forwards = steps * orders_per_step * (R + 1)
    fps = forwards / dt
    ref = reference_fwds_per_sec(name, num_points)
    return {
        "model": name,
        "forwards_per_sec": round(fps, 1),
        "orders_per_step": orders_per_step,
        "vs_baseline": round(fps / ref, 3) if ref else None,
    }


def bench_enum_stage(name: str, num_points: int, max_poses: int) -> dict:
    """Sustained full-pipeline rate: the actual run_enum stage (pose
    batching, artifact writes, async transfers) on one synthetic cloud."""
    import tempfile
    import time as _time

    from interpret_quality_tpu.attrib.stages import (run_enum,
                                                     run_shapley_init)
    from interpret_quality_tpu.config import ExperimentConfig

    with tempfile.TemporaryDirectory() as tmp:
        import os
        cwd = os.getcwd()
        os.chdir(tmp)          # fps index path is cwd-relative
        try:
            cfg = ExperimentConfig(model=name, num_points=num_points,
                                   checkpoints_root=tmp + "/ckpt")
            run_shapley_init(cfg, synthetic=True, allow_random_init=True,
                             sample_indices=[0])
            # warmup: compile the pose-step + orig-sv programs outside the
            # timed window so cold-cache runs stay comparable to warm ones
            run_enum(cfg, "trans", synthetic=True, allow_random_init=True,
                     sample_indices=[0], max_poses=max_poses)
            t0 = _time.perf_counter()
            run_enum(cfg, "trans", synthetic=True, allow_random_init=True,
                     sample_indices=[0], max_poses=max_poses)
            dt = _time.perf_counter() - t0
        finally:
            os.chdir(cwd)
    forwards = max_poses * cfg.num_samples * (cfg.num_regions + 1)
    ref = reference_fwds_per_sec(name, num_points)
    return {"model": name, "stage": "enum_trans",
            "poses": max_poses,
            "sustained_forwards_per_sec": round(forwards / dt, 1),
            "vs_baseline": round(forwards / dt / ref, 3) if ref else None}


# Derived reference workload per model/dataset (BASELINE.md):
# shapley init 30x1000x33; trans+rotate enum 2 x 30x216x100x33; scale enum
# 30x30x100x33; interactions ~10 clouds x 3 pose states x 300 pairs x 13
# ratios x <=100 contexts x 4 rows.
W_INIT = 30 * 1000 * 33
W_ENUM = 2 * 30 * 216 * 100 * 33 + 30 * 30 * 100 * 33
W_INTER = 10 * 3 * 300 * 13 * 100 * 4


def stage_rates_from_logs(model: str, checkpoints_root: str = "./checkpoints",
                          dataset: str = "modelnet10") -> dict:
    """Sustained production-stage rates: mean items_per_sec of the StageTimer
    JSON lines in the model's artifact tree (the logs run_enum /
    run_interaction_logits / run_smoothness write during real 30-sample
    suites).  These are the rates that set table wall-clock — engine steps
    alone overstate models whose stages pay per-pose or per-ratio overheads.
    """
    import glob as _glob
    root = (f"{checkpoints_root}/exp_MODEL_{model}_DATA_{dataset}_"
            f"POINTNUM_1024_REGIONNUM_32_shapley_test")
    rates: dict = {}
    for log in _glob.glob(f"{root}/*/*/log.txt") + _glob.glob(
            f"{root}/*/*/*/log.txt"):
        for line in open(log):
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if "items_per_sec" in rec and "stage" in rec:
                key = rec["stage"].split(":")[0]
                rates.setdefault(key, []).append(rec["items_per_sec"])
    import numpy as np
    if rates:
        return {k: float(np.mean(v)) for k, v in sorted(rates.items())}
    # Host-reset fallback: the live artifact tree is gitignored and may not
    # exist at driver-bench time; the chip queue commits each family's
    # sustained rates into results/<model>_*.json (scripts/collect_evidence
    # .py), so committed evidence keeps the suite projection on a
    # stage-log basis across machines.  Candidates are filtered on the
    # evidence's own model/dataset fields — the filename prefix alone matched
    # gcnn_adv_*.json for model 'gcnn' and let a newer adv file shadow gcnn's
    # committed rates (ADVICE r4) — and merged per stage keeping the newest
    # value per stage, so e.g. a newer ShapeNet file can't drop a modelnet
    # interaction rate recorded earlier.
    newest_gen: dict = {}
    merged: dict = {}
    for path in sorted(_glob.glob(f"results/{model}_*.json")):
        try:
            ev = json.load(open(path))
        except ValueError:
            continue
        if ev.get("model") != model or ev.get("dataset") != dataset:
            continue
        gen = ev.get("generated_unix", 0)
        for k, v in (ev.get("stage_rates_by_stage") or {}).items():
            if gen >= newest_gen.get(k, -1):
                newest_gen[k] = gen
                merged[k] = float(v)
    return merged


def suite_projection(engine_fps: float, rates: dict, model: str,
                     enum_source: str | None = None) -> dict:
    """Projected full-suite wall-clock (hours) for one model/dataset from
    measured rates, vs the same workload at the derived TITAN proxy rate.

    basis records where the dominant (enum) rate came from:
      stage_logs          enum + interaction both from production StageTimer
                          logs / committed evidence
      stage_logs_partial  enum measured, interaction falls back to engine rate
      enum_probe          enum measured by a live short run_enum probe
                          (no logs or evidence existed for this family)
      engine_rate_fallback nothing sustained was available
    """
    enum_r = rates.get("enum") or engine_fps
    inter_r = rates.get("interaction") or engine_fps
    init_r = rates.get("shapley_init") or rates.get("shapley") or engine_fps
    ours_h = (W_INIT / init_r + W_ENUM / enum_r + W_INTER / inter_r) / 3600
    ref = reference_fwds_per_sec(model)
    ref_h = (W_INIT + W_ENUM + W_INTER) / ref / 3600 if ref else None
    if enum_source == "enum_probe":
        basis = "enum_probe"
    elif "enum" in rates and "interaction" in rates:
        basis = "stage_logs"
    elif "enum" in rates:
        basis = "stage_logs_partial"
    else:
        basis = "engine_rate_fallback"
    return {
        "projected_suite_hours": round(ours_h, 2),
        "ref_proxy_suite_hours": round(ref_h, 2) if ref_h else None,
        "suite_speedup_vs_ref": round(ref_h / ours_h, 3) if ref_h else None,
        "basis": basis,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="all",
                   choices=["all"] + ALL_MODELS + ["gcnn_adv"])
    p.add_argument("--orders", type=int, default=None,
                   help="orders per device step (default: per-model config)")
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--num_points", type=int, default=1024)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--stage", default=None, choices=["enum"],
                   help="measure the sustained run_enum pipeline rate "
                        "(incl. artifact writes) instead of engine steps")
    p.add_argument("--max_poses", type=int, default=48,
                   help="poses for --stage enum")
    p.add_argument("--checkpoints_root", default="./checkpoints")
    p.add_argument("--no_probe", action="store_true",
                   help="skip the live run_enum probe for families with no "
                        "stage logs and no committed evidence (the probe "
                        "keeps sustained rates measured instead of falling "
                        "back to engine-rate guesses)")
    args = p.parse_args()

    if args.stage == "enum":
        names = ALL_MODELS if args.model == "all" else [args.model]
        for name in names:
            print(json.dumps(bench_enum_stage(name, args.num_points,
                                              args.max_poses)))
        return

    names = ALL_MODELS if args.model == "all" else [args.model]
    results = []
    for name in names:
        r = bench_model(name, args.orders, args.steps, args.warmup,
                        args.num_points)
        print(f"# {json.dumps(r)}", flush=True)
        results.append(r)

    import numpy as np
    geo = float(np.exp(np.mean(
        [np.log(r["forwards_per_sec"]) for r in results])))
    vs = [r["vs_baseline"] for r in results if r["vs_baseline"]]
    geo_vs = (float(np.exp(np.mean([np.log(v) for v in vs])))
              if vs else None)

    per_model = {}
    speedups = []
    for r in results:
        rates = stage_rates_from_logs(r["model"], args.checkpoints_root)
        enum_source = "stage_logs" if "enum" in rates else None
        if "enum" not in rates and not args.no_probe:
            # VERDICT r4 weak #2: never let the headline regress to engine
            # rates — measure a short sustained run_enum instead (one cloud,
            # 48 poses, ~2-4 min incl. compile on the slowest family).
            try:
                probe = bench_enum_stage(r["model"], args.num_points,
                                         args.max_poses)
                rates["enum"] = probe["sustained_forwards_per_sec"]
                enum_source = "enum_probe"
                print(f"# enum_probe {json.dumps(probe)}", flush=True)
            except Exception as e:          # noqa: BLE001 — bench must
                print(f"# enum_probe failed for {r['model']}: {e}",
                      flush=True)           # always print its JSON line
        proj = suite_projection(r["forwards_per_sec"], rates, r["model"],
                                enum_source)
        per_model[r["model"]] = {
            "engine_forwards_per_sec": r["forwards_per_sec"],
            "vs_baseline": r["vs_baseline"],
            "sustained_enum_forwards_per_sec": round(rates["enum"], 1)
                if "enum" in rates else None,
            "sustained_interaction_forwards_per_sec":
                round(rates["interaction"], 1)
                if "interaction" in rates else None,
            "sustained_smoothness_forwards_per_sec":
                round(rates["smoothness"], 1)
                if "smoothness" in rates else None,
            **proj,
        }
        if proj["suite_speedup_vs_ref"]:
            speedups.append(proj["suite_speedup_vs_ref"])
    suite_geo = (float(np.exp(np.mean([np.log(s) for s in speedups])))
                 if speedups else None)
    bases = {m: d["basis"] for m, d in per_model.items()}
    measured = {"stage_logs", "stage_logs_partial", "enum_probe"}
    basis = ("stage_logs" if all(b == "stage_logs" for b in bases.values())
             else "measured_mixed" if all(b in measured
                                          for b in bases.values())
             else "mixed" if any(b in measured for b in bases.values())
             else "engine_rate_fallback")
    # Per-model detail and provenance ride on #-prefixed lines (like the
    # per-model progress lines above); the headline stays ONE short JSON
    # line the driver can always capture and parse (BENCH_r03 lesson:
    # a multi-KB line came back "parsed": null).
    print(f"# {json.dumps({'per_model': per_model})}", flush=True)

    # measured (not projected) suite wall-clock, when the committed
    # StageTimer summary exists (scripts/suite_wallclock.py, VERDICT r4 #7)
    measured_speedups = {}
    try:
        wc = json.load(open("results/suite_wallclock.json"))
        for m, fam in wc.get("families", {}).items():
            measured_speedups[m] = fam["measured_speedup_vs_ref_proxy"]
        print(f"# measured_wallclock {json.dumps(wc['families'])}",
              flush=True)
    except (OSError, ValueError, KeyError):
        pass
    print("# baseline_note: vs_baseline divides engine rate by a derived "
          "TITAN-RTX proxy (16.3 TFLOP/s fp32 x 30% util / XLA-counted "
          "FLOPs per forward; the reference publishes no measured "
          "throughput). sustained_* rates come from production StageTimer "
          "logs in ./checkpoints, or committed results/<model>_*.json "
          "evidence when the live tree is absent; projected_suite_hours "
          "applies them to the BASELINE.md derived workload (init 0.99M + "
          "enum 45.7M + interactions 46.8M forwards per model/dataset).",
          flush=True)
    print(json.dumps({
        "metric": "masked_coalition_forwards_per_sec_geomean",
        "value": round(geo, 1),
        "unit": "forwards/s",
        "vs_baseline": round(geo_vs, 3) if geo_vs else None,
        "suite_speedup_vs_ref_geomean": round(suite_geo, 3)
            if suite_geo else None,
        "suite_basis": basis,
        # pointnet is the one family whose COMPLETE suite (incl.
        # interactions) has a measured wall-clock in every round so far;
        # report it as the stable measured headline alongside the geomeans
        "measured_suite_speedup_pointnet":
            measured_speedups.get("pointnet"),
    }))


if __name__ == "__main__":
    main()
