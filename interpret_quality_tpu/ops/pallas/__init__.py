from .fps import fps_pallas
from .groups import (fused_ball_mlp3, fused_pointconv_sa, gather_rows,
                     knn_with_density)
from .neighbors import gather_extrema, knn_gather_extrema, knn_pallas

__all__ = ["fps_pallas", "fused_ball_mlp3", "fused_pointconv_sa",
           "gather_extrema", "gather_rows", "knn_gather_extrema",
           "knn_pallas", "knn_with_density"]
