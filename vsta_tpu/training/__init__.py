from .state import TrainState, create_state, make_train_step, make_eval_step
from .optim import build_optimizer, lr_schedule
from .metrics import DetectionMetrics, greedy_match
from .checkpoint import CheckpointManager
from .loop import run_training

__all__ = [
    "TrainState",
    "create_state",
    "make_train_step",
    "make_eval_step",
    "build_optimizer",
    "lr_schedule",
    "DetectionMetrics",
    "greedy_match",
    "CheckpointManager",
    "run_training",
]
