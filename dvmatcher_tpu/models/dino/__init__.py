from dvmatcher_tpu.models.dino.vit import DinoV2ViT
from dvmatcher_tpu.models.dino.jbu import JBUStack
from dvmatcher_tpu.models.dino.lift import FeatureLifter

__all__ = ["DinoV2ViT", "JBUStack", "FeatureLifter"]
