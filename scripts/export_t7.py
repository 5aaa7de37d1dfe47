"""Export a native msgpack checkpoint as a reference-loadable torch .t7.

The torch state-dict layout (Conv2d/Conv1d/Linear kernel shapes, key
prefixes) is taken from a template: either an existing torch checkpoint
(--template x.t7) or, when the reference tree is available (--ref_root),
a freshly constructed reference module.

Usage:
    python scripts/export_t7.py --model gcnn \
        --ckpt checkpoints/exp_.../models/model_best.msgpack \
        --out gcnn_export.t7 [--template ref.t7 | --ref_root /root/reference]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def template_from_reference(model_name: str, ref_root: str,
                            num_classes: int = 10):
    """State-dict layout from the reference torch modules.

    The reference head width is keyed off the dataset name (models/dgcnn.py:
    57-58: 40 for 'modelnet40', else 10), so only 10- and 40-class layouts
    exist; other head sizes must come from --template.
    """
    import importlib.util
    import types

    dataset_by_classes = {10: "modelnet10", 40: "modelnet40"}
    if num_classes not in dataset_by_classes:
        raise SystemExit(
            f"--num_classes {num_classes} has no reference layout (the "
            "reference supports 10 or 40 classes); pass --template instead")

    ref_models = os.path.join(ref_root, "models")
    file_by_model = {"pointnet": "pointnet", "pointnet2": "pointnet2",
                     "pointconv": "pointconv", "dgcnn": "dgcnn",
                     "gcnn": "dgcnn", "gcnn_adv": "dgcnn"}
    cls_by_model = {"pointnet": "PointNetCls", "pointnet2": "PointNet2ClsMsg",
                    "pointconv": "PointConvDensityClsSsg",
                    "dgcnn": "DGCNN_cls", "gcnn": "GCNN_cls",
                    "gcnn_adv": "GCNN_cls"}
    spec = importlib.util.spec_from_file_location(
        "_ref_tpl", os.path.join(ref_models,
                                 file_by_model[model_name] + ".py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    args = types.SimpleNamespace(dataset=dataset_by_classes[num_classes],
                                 model=model_name,
                                 k=20, emb_dims=1024, dropout=0.5,
                                 feature_transform=True)
    return getattr(mod, cls_by_model[model_name])(args).state_dict()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--ckpt", required=True, help=".msgpack checkpoint")
    p.add_argument("--out", required=True, help="output .t7 path")
    p.add_argument("--template", default=None,
                   help="torch checkpoint supplying the state-dict layout")
    p.add_argument("--ref_root", default="/root/reference",
                   help="reference repo for layout when --template is absent")
    p.add_argument("--num_classes", type=int, default=10)
    args = p.parse_args()

    import jax

    # pure host-side IO: never touch the TPU backend (this image's site hook
    # ignores JAX_PLATFORMS env vars; the config must be set after import)
    jax.config.update("jax_platforms", "cpu")

    from interpret_quality_tpu.models import build_model, init_model
    from interpret_quality_tpu.models.checkpoint import load_variables
    from interpret_quality_tpu.models.torch_convert import save_t7

    base = "gcnn" if args.model == "gcnn_adv" else args.model
    model = build_model(base, num_classes=args.num_classes)
    template_vars = init_model(model, jax.random.PRNGKey(0), num_points=64)
    variables = load_variables(args.ckpt, template_vars)

    if args.template:
        import torch
        template = torch.load(args.template, map_location="cpu")
    elif os.path.isdir(os.path.join(args.ref_root, "models")):
        template = template_from_reference(args.model, args.ref_root,
                                           num_classes=args.num_classes)
    else:
        raise SystemExit("pass --template (a torch checkpoint) or point "
                         "--ref_root at the reference repo")

    save_t7(base, variables, args.out, template)
    print(f"exported {args.ckpt} -> {args.out} "
          f"({len(template)} tensors, reference-loadable)")


if __name__ == "__main__":
    main()
