from dvmatcher_tpu.data.off_io import read_off, write_off_points
from dvmatcher_tpu.data.geodesics import (
    knn_graph_geodesics,
    mesh_geodesics,
)
from dvmatcher_tpu.data.dataset import (
    ShapeRecord,
    PairDataset,
    device_dist_cache,
    preprocess_split,
    load_split,
)

__all__ = [
    "read_off",
    "write_off_points",
    "knn_graph_geodesics",
    "mesh_geodesics",
    "ShapeRecord",
    "PairDataset",
    "device_dist_cache",
    "preprocess_split",
    "load_split",
]
