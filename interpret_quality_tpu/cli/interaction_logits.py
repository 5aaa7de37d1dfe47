"""CLI: interaction logits over (pair, context) grids.

Replaces reference final_point_binary_interaction_logits.py.
"""
from .common import (base_parser, config_from_args, sample_indices_from_args,
                     sharding_from_args)


def main():
    p = base_parser("Interaction logits")
    p.add_argument("--mode", type=str, default="rotate",
                   choices=["trans", "rotate"])
    p.add_argument("--gen_pair_seed", type=int, default=None)
    args = p.parse_args()
    cfg = config_from_args(args)
    if args.gen_pair_seed is not None:
        cfg.seed = args.gen_pair_seed
    from ..attrib.interactions import run_interaction_logits
    run_interaction_logits(cfg, mode_name=args.mode, synthetic=args.synthetic,
                           allow_random_init=args.allow_random_init,
                           coalition_sharding=sharding_from_args(args),
                           sample_indices=sample_indices_from_args(args))


if __name__ == "__main__":
    main()
