from .stats import (
    calc_mean_std,
    adaptive_instance_normalization,
    mean_variance_norm,
    groupwise_adain,
)
from .wct import matrix_sqrt, matrix_inv_sqrt, whiten_and_color
from .affinity import cal_dist, cal_affinity_map, cal_affinity_matrix

__all__ = [
    "calc_mean_std",
    "adaptive_instance_normalization",
    "mean_variance_norm",
    "groupwise_adain",
    "matrix_sqrt",
    "matrix_inv_sqrt",
    "whiten_and_color",
    "cal_dist",
    "cal_affinity_map",
    "cal_affinity_matrix",
]
