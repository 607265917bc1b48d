from dvmatcher_tpu.deform.graph import (
    DeformGraph,
    build_graph,
    build_graph_batch,
    skin,
    skin_batch,
)

__all__ = ["DeformGraph", "build_graph", "build_graph_batch", "skin", "skin_batch"]
