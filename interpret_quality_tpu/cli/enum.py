"""CLI: perturbation enumeration (trans / rotate / scale).

Replaces reference final_{trans,rotate,scale}_center_enum_all.py — one entry
point with --mode instead of three near-identical drivers.
"""
from .common import (base_parser, config_from_args, sample_indices_from_args,
                     sharding_from_args)


def main(default_mode: str = "trans"):
    p = base_parser("Perturbation enumeration")
    p.add_argument("--mode", type=str, default=default_mode,
                   choices=["trans", "rotate", "scale"])
    p.add_argument("--pose_chunk", type=int, default=None,
                   help="poses batched per device step (default: the tuned "
                        "per-model enum_pose_chunk from config.py)")
    p.add_argument("--no_logits", action="store_true",
                   help="skip saving all_logits.pt")
    p.add_argument("--max_poses", type=int, default=None,
                   help="truncate the pose grid (smoke runs; default: the "
                        "full reference grid, 216 trans/rotate, 30 scale)")
    args = p.parse_args()
    cfg = config_from_args(args)
    from ..attrib.stages import run_enum
    run_enum(cfg, args.mode, synthetic=args.synthetic,
             allow_random_init=args.allow_random_init,
             pose_chunk=args.pose_chunk,
             coalition_sharding=sharding_from_args(args),
             save_logits=not args.no_logits,
             sample_indices=sample_indices_from_args(args),
             resume=args.resume, trace_dir=args.trace_dir,
             max_poses=args.max_poses)


if __name__ == "__main__":
    main()
