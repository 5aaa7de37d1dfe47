"""Perturbation-mode definitions for the enumeration experiments.

Pose grids match the reference drivers:
  * translation: 6^3 grid in [-0.5, 0.5]^3 clipped to the L2 ball of 0.5
    (final_trans_center_enum_all.py:24-43)
  * rotation: 6^3 Euler grid in [-pi/4, pi/4]^3
    (final_rotate_center_enum_all.py:41-58)
  * scale: 30 uniform scales in [0.5, 2.0]
    (final_scale_center_enum_all.py:25-31)
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..ops.transforms import rotate_xyz, scale_pc, translate_pc
from ..utils.io import save_npy

TRANS_DIST_THRESHOLD = 0.5
NUM_GRID_ENUM_TRANS = 6
ANGLE_THRESHOLD = math.pi / 4
NUM_GRID_ENUM_ROTATE = 6
SCALE_UPPER = 2.0
SCALE_LOWER = 0.5
NUM_GRID_ENUM_SCALE = 30


@dataclasses.dataclass
class PerturbationMode:
    name: str
    generate_params: Callable[[], np.ndarray]
    disturb_fn: Callable          # jittable (data (..., N, 3), param) -> same
    save_info: Callable           # (all_params, folder) -> None


def generate_trans_vector() -> np.ndarray:
    g = np.linspace(-TRANS_DIST_THRESHOLD, TRANS_DIST_THRESHOLD,
                    NUM_GRID_ENUM_TRANS)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    vecs = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=-1).astype(np.float32)
    norms = np.linalg.norm(vecs, axis=-1, keepdims=True)
    clip = norms > TRANS_DIST_THRESHOLD
    vecs = np.where(clip, vecs / np.maximum(norms, 1e-12) * TRANS_DIST_THRESHOLD,
                    vecs)
    return vecs.astype(np.float32)                       # (216, 3)


def generate_rotate_angle() -> np.ndarray:
    g = np.linspace(-ANGLE_THRESHOLD, ANGLE_THRESHOLD, NUM_GRID_ENUM_ROTATE)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    return np.stack([X.ravel(), Y.ravel(), Z.ravel()],
                    axis=-1).astype(np.float32)          # (216, 3)


def generate_scale() -> np.ndarray:
    return np.linspace(SCALE_LOWER, SCALE_UPPER,
                       NUM_GRID_ENUM_SCALE).astype(np.float32)   # (30,)


def _save_trans(all_params, folder):
    save_npy(folder + "trans_vector.npy", all_params)
    save_npy(folder + "trans_distance.npy",
             np.linalg.norm(all_params, axis=1))


def _save_rotate(all_params, folder):
    save_npy(folder + "angle_tuple.npy", all_params)


def _save_scale(all_params, folder):
    save_npy(folder + "scale.npy", all_params)


MODES = {
    "trans": PerturbationMode("trans", generate_trans_vector, translate_pc,
                              _save_trans),
    "rotate": PerturbationMode("rotate", generate_rotate_angle, rotate_xyz,
                               _save_rotate),
    "scale": PerturbationMode("scale", generate_scale, scale_pc, _save_scale),
}
