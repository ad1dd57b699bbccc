from .distance import sq_distances, find_winners, topk_winners
from .neighborhood import grid_distance_matrix, neighborhood_weights

__all__ = [
    "sq_distances",
    "find_winners",
    "topk_winners",
    "grid_distance_matrix",
    "neighborhood_weights",
]
