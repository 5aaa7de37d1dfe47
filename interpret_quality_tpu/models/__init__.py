from .registry import build_model, MODEL_REGISTRY, init_model, make_forward_fn
from .pointnet import PointNetCls, feature_transform_regularizer
from .dgcnn import DGCNNCls, GCNNCls
from .pointnet2 import PointNet2ClsMsg
from .pointconv import PointConvDensityClsSsg

__all__ = [
    "build_model", "MODEL_REGISTRY", "init_model", "make_forward_fn",
    "PointNetCls", "feature_transform_regularizer",
    "DGCNNCls", "GCNNCls", "PointNet2ClsMsg", "PointConvDensityClsSsg",
]
