"""CLI: save FPS region-centre indices for the 30 eval clouds.

Replaces reference final_save_fps.py; writes
fps_<dataset>_<points>_<regions>_index_final30.npy.
"""
from .common import base_parser, config_from_args


def main():
    args = base_parser("Save FPS index").parse_args()
    cfg = config_from_args(args)
    from ..attrib.stages import save_fps
    from ..utils.rng import set_random
    set_random(cfg.seed)
    fps = save_fps(cfg, synthetic=args.synthetic)
    print(fps)


if __name__ == "__main__":
    main()
