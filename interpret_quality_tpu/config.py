"""Global constants, per-model batch knobs and experiment configuration.

Mirrors the knob *names* and artifact-folder naming contract of the reference
(`/root/reference/config.py:2-17`, `tools/final_util.py:15-68`,
`final_shapley_value.py:194-195`) so that downstream consumers
(results aggregation, plotting) are drop-in compatible, while the *values*
of the batch knobs are re-tuned for TPU HBM instead of 24 GB GPUs.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

# ---------------------------------------------------------------------------
# Constants (reference: tools/final_util.py:15-27)
# ---------------------------------------------------------------------------
NUM_POINTS = 1024          # points per cloud
NUM_REGIONS = 32           # FPS regions per cloud
NUM_SAMPLES_SAVE = 1000    # permutations saved at Shapley init
NUM_SAMPLES = 100          # permutations used per pose in enumeration
K_FOR_DGCNN = 20           # kNN neighbourhood size for DGCNN/GCNN
BALL_QUERY_COEF = 0.25     # region-neighbourhood ball radius coefficient

# samples used for Shapley evaluation
DATA_MODELNET_SHAPLEY_TEST = "modelnet10_train_final30.txt"
DATA_SHAPENET_SHAPLEY_TEST = "shapenet_train_selected.json"

# samples selected for interaction analysis (reference: final_util.py:26-27)
MODELNET_INTER_SELECTED_SAMPLE = [0, 3, 6, 9, 12, 15, 18, 21, 24, 27]
SHAPENET_INTER_SELECTED_SAMPLE = [0, 3, 6, 9, 12, 15, 19, 21, 24, 27]

# ShapeNet-Part 10-class subset (reference: final_util.py:30-49)
SHAPENET_CLASS = [
    "Bag", "Cap", "Earphone", "Knife", "Laptop",
    "Motorbike", "Mug", "Pistol", "Rocket", "Skateboard",
]
SHAPENET_ID2CAT = {
    "02691156": "Airplane",
    "02773838": "Bag",
    "02954340": "Cap",
    "02958343": "Car",
    "03001627": "Chair",
    "03261776": "Earphone",
    "03467517": "Guitar",
    "03624134": "Knife",
    "03636649": "Lamp",
    "03642806": "Laptop",
    "03790512": "Motorbike",
    "03797390": "Mug",
    "03948459": "Pistol",
    "04099429": "Rocket",
    "04225987": "Skateboard",
    "04379243": "Table",
}
SHAPENET_CAT2ID = {v: k for k, v in SHAPENET_ID2CAT.items()}

MODEL_NAMES = ["pointnet", "pointnet2", "pointconv", "dgcnn", "gcnn", "gcnn_adv"]
DATASET_NAMES = ["modelnet10", "shapenet"]

# ---------------------------------------------------------------------------
# Batch-size knobs.
#
# "shapley_batch_size" is the number of permutation orders evaluated per
# compiled device step: the effective forward batch is (num_regions+1)*bs
# point clouds of 1024 points.  "interaction_batch_size" is the number of
# contexts per device step: effective batch 4*bs.
#
# Reference values (config.py:3-16) were sized for a 24 GB GPU; TPU v5e has
# 16 GB HBM but the fused masking construction materialises far less than the
# reference's 33x expand+clone, so the defaults below are larger.  They stay
# overridable per-run.
# ---------------------------------------------------------------------------
CONFIG = {
    "shapley_batch_size": {
        "pointnet2": 50,  # fused SA kernels; divides the 100-order chunks
        "pointnet": 100,
        "dgcnn": 50,      # fused Pallas edge-conv: VMEM use is batch-invariant;
        "gcnn": 50,       # 50 divides the 100-order enum chunks and is fastest
        "pointconv": 50,
    },
    "interaction_batch_size": {
        # 4*bs-row forwards; pairs are batched together.  Graph models lose
        # 13-29% throughput below ~800 rows (measured), so contexts per step
        # are sized to keep the coalition batch near the Shapley-step size.
        "pointnet2": 200,
        "pointnet": 400,
        "dgcnn": 200,
        "gcnn": 200,
        "pointconv": 400,
    },
    # poses batched per device step in perturbation enumeration; the
    # effective forward batch is pose_chunk * shapley_batch_size * (R+1)
    "enum_pose_chunk": {
        "pointnet2": 1,
        "pointnet": 8,
        "dgcnn": 1,
        "gcnn": 1,
        "pointconv": 1,
    },
}


# bf16 planes carrying gathered neighbour values in the fused Pallas graph
# kernels: 1 = plain bf16 (~2^-9 relative on gathered activations — far below
# the Shapley estimator's 100-order sampling std, and ~half the gather-matmul
# cost), 2 = hi/lo pair (~2^-16).  CLI knob: --gather_precision {bf16,hilo}.
_GATHER_VALUE_PARTS = 1


def set_gather_value_parts(parts: int) -> None:
    assert parts in (1, 2), parts
    global _GATHER_VALUE_PARTS
    _GATHER_VALUE_PARTS = parts


def gather_value_parts() -> int:
    return _GATHER_VALUE_PARTS


def enum_pose_chunk(model: str) -> int:
    key = "gcnn" if model == "gcnn_adv" else model
    return CONFIG["enum_pose_chunk"][key]


def shapley_batch_size(model: str) -> int:
    key = "gcnn" if model == "gcnn_adv" else model
    return CONFIG["shapley_batch_size"][key]


def interaction_batch_size(model: str) -> int:
    key = "gcnn" if model == "gcnn_adv" else model
    return CONFIG["interaction_batch_size"][key]


def num_classes_for(dataset: str) -> int:
    # reference: models/pointnet.py:95-98 — 40 for modelnet40, else 10
    return 40 if dataset == "modelnet40" else 10


# ---------------------------------------------------------------------------
# Experiment configuration
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class ExperimentConfig:
    """One attribution experiment = (model, dataset) plus sampling knobs.

    Field names follow the reference argparse surface so CLI flags carry over
    (e.g. final_shapley_value.py:178-188).
    """

    model: str = "pointnet"
    dataset: str = "modelnet10"
    seed: int = 1
    softmax_type: str = "modified"        # "normal" | "modified"
    num_points: int = NUM_POINTS
    num_regions: int = NUM_REGIONS
    num_samples_save: int = NUM_SAMPLES_SAVE
    num_samples: int = NUM_SAMPLES
    k: int = K_FOR_DGCNN
    shapley_batch_size: Optional[int] = None
    interaction_batch_size: Optional[int] = None
    checkpoints_root: str = "./checkpoints"
    data_root: str = "./data"
    model_path: Optional[str] = None      # override checkpoint path
    dtype: str = "float32"                # compute dtype of the forward

    def __post_init__(self):
        if self.model not in MODEL_NAMES:
            raise ValueError(f"unknown model {self.model!r}")
        if self.dataset not in DATASET_NAMES + ["modelnet40"]:
            raise ValueError(f"unknown dataset {self.dataset!r}")
        if self.shapley_batch_size is None:
            self.shapley_batch_size = shapley_batch_size(self.model)
        if self.interaction_batch_size is None:
            self.interaction_batch_size = interaction_batch_size(self.model)

    # -- artifact naming contract (reference: final_shapley_value.py:194-195)
    @property
    def exp_folder(self) -> str:
        return "%s/exp_MODEL_%s_DATA_%s_POINTNUM_%d_REGIONNUM_%d_shapley_test/" % (
            self.checkpoints_root, self.model, self.dataset,
            self.num_points, self.num_regions)

    @property
    def train_exp_name(self) -> str:
        # reference: main_cls_seed.py:247
        return "exp_MODEL_%s_DATA_%s_POINTNUM_%d_clean" % (
            self.model, self.dataset, self.num_points)

    @property
    def num_classes(self) -> int:
        return num_classes_for(self.dataset)

    def default_model_path(self) -> str:
        """Checkpoint path per (model, dataset) (reference: final_util.py:52-66)."""
        if self.model == "gcnn_adv":
            name = ("exp_MODEL_gcnn_adv_DATA_%s_POINTNUM_%d_clean_with_all_rot_da"
                    % (self.dataset, self.num_points))
            fname = "model_399"
        else:
            name = self.train_exp_name
            fname = "model_best"
        return f"{self.checkpoints_root}/{name}/models/{fname}.msgpack"

    def fps_index_path(self) -> str:
        # reference: final_save_fps.py:54
        return "fps_%s_%d_%d_index_final30.npy" % (
            self.dataset, self.num_points, self.num_regions)
