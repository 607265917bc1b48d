from dvmatcher_tpu.losses.graph_deform import (
    LossConfig,
    graph_deform_loss,
    dist_profile_loss,
)

__all__ = ["LossConfig", "graph_deform_loss", "dist_profile_loss"]
