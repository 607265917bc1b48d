from dvmatcher_tpu.utils.config import load_config

__all__ = ["load_config"]
