from dvmatcher_tpu.train.state import TrainState, create_train_state
from dvmatcher_tpu.train.loop import make_train_step, make_eval_step, forward_features

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "forward_features",
]
