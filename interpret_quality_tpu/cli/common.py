"""Shared CLI argument surface, mirroring the reference flags
(e.g. final_shapley_value.py:178-188) plus TPU-specific knobs."""
from __future__ import annotations

import argparse

from ..config import ExperimentConfig, MODEL_NAMES


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--model", type=str, default="pointnet", choices=MODEL_NAMES)
    p.add_argument("--dataset", type=str, default="modelnet10",
                   choices=["modelnet10", "shapenet"])
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--softmax_type", type=str, default="modified",
                   choices=["normal", "modified"])
    p.add_argument("--model_path", type=str, default=None,
                   help="checkpoint (.msgpack or reference .t7)")
    p.add_argument("--data_root", type=str, default="./data")
    p.add_argument("--checkpoints_root", type=str, default="./checkpoints")
    p.add_argument("--shapley_batch_size", type=int, default=None)
    p.add_argument("--interaction_batch_size", type=int, default=None)
    p.add_argument("--num_points", type=int, default=None,
                   help="points per cloud (default: config NUM_POINTS=1024)")
    p.add_argument("--num_regions", type=int, default=None,
                   help="FPS regions per cloud (default: config "
                        "NUM_REGIONS=32; reference final_result.py:221)")
    p.add_argument("--num_samples_save", type=int, default=None,
                   help="permutations saved by shapley init (default 1000)")
    p.add_argument("--num_samples", type=int, default=None,
                   help="permutations used per pose (default 100)")
    # TPU-native extras
    p.add_argument("--synthetic", action="store_true",
                   help="run on the deterministic synthetic eval set")
    p.add_argument("--allow_random_init", action="store_true",
                   help="fall back to random-init params when no checkpoint")
    p.add_argument("--samples", type=str, default=None,
                   help="comma-separated eval-sample indices to process")
    p.add_argument("--mesh_devices", type=int, default=0,
                   help="shard the coalition axis over this many devices "
                        "(0 = single device)")
    p.add_argument("--resume", action="store_true",
                   help="skip samples whose stage artifacts already exist")
    p.add_argument("--matmul_precision", type=str, default="default",
                   choices=["default", "high", "highest"],
                   help="TPU matmul precision. 'default' (bf16, f32 accum) "
                        "perturbs Shapley estimates by ~0.3x the estimator's "
                        "own 500-order sampling noise (measured) at ~3.5x "
                        "pipeline speed; 'highest' reproduces the "
                        "reference's fp32 numerics")
    p.add_argument("--gather_precision", type=str, default="bf16",
                   choices=["bf16", "hilo"],
                   help="value precision of the fused Pallas neighbour "
                        "gathers (graph models): 'bf16' (~2^-9 relative, "
                        "~half the gather cost) or 'hilo' (~2^-16; pass "
                        "this when comparing artifacts against the "
                        "reference's fp32 numerics, with "
                        "--matmul_precision=highest)")
    p.add_argument("--trace_dir", type=str, default=None,
                   help="write a jax.profiler (xprof) trace of the device "
                        "work to this directory")
    return p


def config_from_args(args) -> ExperimentConfig:
    mm = getattr(args, "matmul_precision", "default")
    if mm != "default":
        import jax
        jax.config.update("jax_default_matmul_precision", mm)
    else:
        import jax
        # reset unconditionally: process-global, must not leak from a
        # previous config_from_args call in the same process
        if jax.config.jax_default_matmul_precision is not None:
            jax.config.update("jax_default_matmul_precision", "default")
    # set unconditionally: the value is process-global and must not leak
    # from a previous config_from_args call in the same process
    from ..config import set_gather_value_parts
    set_gather_value_parts(
        2 if getattr(args, "gather_precision", "bf16") == "hilo" else 1)
    extra = {k: v for k, v in (
        ("num_points", getattr(args, "num_points", None)),
        ("num_regions", getattr(args, "num_regions", None)),
        ("num_samples_save", getattr(args, "num_samples_save", None)),
        ("num_samples", getattr(args, "num_samples", None)),
    ) if v is not None}
    return ExperimentConfig(
        model=args.model, dataset=args.dataset, seed=args.seed,
        softmax_type=args.softmax_type, model_path=args.model_path,
        data_root=args.data_root, checkpoints_root=args.checkpoints_root,
        shapley_batch_size=args.shapley_batch_size,
        interaction_batch_size=args.interaction_batch_size, **extra)


def sample_indices_from_args(args):
    if args.samples is None:
        return None
    return [int(s) for s in args.samples.split(",") if s != ""]


def sharding_from_args(args):
    if not args.mesh_devices:
        return None
    from ..parallel import coalition_sharding, make_mesh
    mesh = make_mesh(args.mesh_devices)
    return coalition_sharding(mesh)
