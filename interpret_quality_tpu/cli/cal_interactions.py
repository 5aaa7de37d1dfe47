"""CLI: interaction scores from saved logits (pure post-processing).

Replaces reference final_cal_interactions.py.
"""
from .common import base_parser, config_from_args, sample_indices_from_args


def main():
    p = base_parser("Interaction scores")
    p.add_argument("--mode", type=str, default="rotate",
                   choices=["trans", "rotate"])
    p.add_argument("--output_type", type=str, default="pred",
                   choices=["gt", "pred"])
    args = p.parse_args()
    cfg = config_from_args(args)
    from ..attrib.interactions import run_cal_interactions
    run_cal_interactions(cfg, mode_name=args.mode, synthetic=args.synthetic,
                         output_type=args.output_type,
                         sample_indices=sample_indices_from_args(args))


if __name__ == "__main__":
    main()
