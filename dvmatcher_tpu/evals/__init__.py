from dvmatcher_tpu.evals.geodesic_error import (
    calculate_geodesic_error,
    pair_geodesic_error,
    evaluate_feature_dir,
    off_diagonal_mean,
    load_vts,
)

__all__ = [
    "calculate_geodesic_error",
    "pair_geodesic_error",
    "evaluate_feature_dir",
    "off_diagonal_mean",
    "load_vts",
]
