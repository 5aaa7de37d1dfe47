from .geometry import (
    square_distance,
    index_points,
    farthest_point_sample,
    query_ball_point,
    knn,
    knn_point,
    compute_density,
    pairwise_sqdist_self,
)
from .transforms import (
    translate_pc,
    scale_pc,
    rotate_xyz,
    rotation_matrix_xyz,
    rot_angle_axis,
)

__all__ = [
    "square_distance", "index_points", "farthest_point_sample",
    "query_ball_point", "knn", "knn_point", "compute_density",
    "pairwise_sqdist_self",
    "translate_pc", "scale_pc", "rotate_xyz", "rotation_matrix_xyz",
    "rot_angle_axis",
]
