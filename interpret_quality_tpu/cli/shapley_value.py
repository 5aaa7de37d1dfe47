"""CLI: Shapley initialisation — region ids, permutations, norm factors and
the 1000-sample Shapley estimates with convergence snapshots.

Replaces reference final_shapley_value.py.
"""
from .common import (base_parser, config_from_args, sample_indices_from_args,
                     sharding_from_args)


def main():
    p = base_parser("Shapley value initialisation")
    p.add_argument("--antithetic", action="store_true",
                   help="sample saved permutations in (pi, reverse pi) "
                        "pairs — lower-variance estimates at identical "
                        "forward cost (off = reference i.i.d. stream)")
    args = p.parse_args()
    cfg = config_from_args(args)
    from ..attrib.stages import run_shapley_init
    run_shapley_init(cfg, synthetic=args.synthetic,
                     allow_random_init=args.allow_random_init,
                     coalition_sharding=sharding_from_args(args),
                     sample_indices=sample_indices_from_args(args),
                     resume=args.resume, trace_dir=args.trace_dir,
                     antithetic=args.antithetic)


if __name__ == "__main__":
    main()
