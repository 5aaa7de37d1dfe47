"""CLI: standard classifier training.

Replaces reference main_cls_seed.py.
"""
from .common import base_parser, config_from_args


def main():
    p = base_parser("Train a point-cloud classifier")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--test_batch_size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--drop_point", action="store_true")
    p.add_argument("--train_rot_y_perturbation", action="store_true")
    p.add_argument("--train_rot_all_perturbation", action="store_true")
    p.add_argument("--train_samples", type=int, default=512,
                   help="synthetic-set size (only with --synthetic)")
    p.add_argument("--test_samples", type=int, default=128,
                   help="synthetic eval-set size (only with --synthetic)")
    p.add_argument("--best_acc_gate", type=float, default=0.80,
                   help="min test acc before model_best is written "
                        "(reference main_cls_seed.py:108); 0 = always save")
    args = p.parse_args()
    cfg = config_from_args(args)

    import jax

    from ..data.datasets import (ModelNetTrain, ShapeNetTrain, SyntheticClouds)
    from ..models import build_model, init_model
    from ..train.trainer import fit
    from ..utils.io import IOStream, mkdir
    from ..utils.rng import set_random

    set_random(cfg.seed)
    if args.synthetic:
        train_ds = SyntheticClouds(num_samples=args.train_samples,
                                   num_points=cfg.num_points,
                                   seed=cfg.seed, train=True,
                                   drop_point=args.drop_point,
                                   rot_y=args.train_rot_y_perturbation,
                                   rot_all=args.train_rot_all_perturbation)
        test_ds = SyntheticClouds(num_samples=args.test_samples,
                                  num_points=cfg.num_points,
                                  seed=cfg.seed + 1)
    elif cfg.dataset == "modelnet10":
        kw = dict(data_root=cfg.data_root, num_points=cfg.num_points,
                  drop_point=args.drop_point,
                  rot_y=args.train_rot_y_perturbation,
                  rot_all=args.train_rot_all_perturbation)
        train_ds = ModelNetTrain(partition="train", **kw)
        test_ds = ModelNetTrain(partition="test", **kw)
    else:
        kw = dict(data_root=cfg.data_root, num_points=cfg.num_points,
                  drop_point=args.drop_point,
                  rot_y=args.train_rot_y_perturbation,
                  rot_all=args.train_rot_all_perturbation)
        train_ds = ShapeNetTrain(split="train", **kw)
        test_ds = ShapeNetTrain(split="test", **kw)

    suffix = ""
    if args.train_rot_y_perturbation:
        suffix = "_with_y_rot_da"
    elif args.train_rot_all_perturbation:
        suffix = "_with_all_rot_da"
    exp_name = "exp_MODEL_%s_DATA_%s_POINTNUM_%d_clean%s" % (
        cfg.model, cfg.dataset, cfg.num_points, suffix)
    exp_dir = f"{cfg.checkpoints_root}/{exp_name}"
    mkdir(exp_dir)
    # source provenance next to the checkpoints (reference
    # main_cls_seed.py:30-33 .backup copies)
    from .. import config as _config
    from ..data import datasets as _datasets
    from ..models import registry as _registry
    from ..train import trainer as _trainer
    from ..utils.io import snapshot_sources
    snapshot_sources(exp_dir, [_trainer, _registry, _datasets, _config])
    io = IOStream(exp_dir + "/run.log")
    io.cprint(str(args))

    model = build_model(cfg.model, cfg.num_classes, cfg.k)
    variables = init_model(model, jax.random.PRNGKey(cfg.seed),
                           num_points=cfg.num_points)
    fit(model, variables, cfg.model, train_ds, test_ds,
        batch_size=args.batch_size, test_batch_size=args.test_batch_size,
        epochs=args.epochs, exp_dir=exp_dir, io=io, seed=cfg.seed,
        best_acc_gate=args.best_acc_gate, base_lr=args.lr)


if __name__ == "__main__":
    main()
