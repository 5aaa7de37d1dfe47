from .fps import fps_pallas
from .neighbors import gather_extrema, knn_gather_extrema, knn_pallas

__all__ = ["fps_pallas", "gather_extrema", "knn_gather_extrema", "knn_pallas"]
