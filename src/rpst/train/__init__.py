from .step import TrainState, create_train_state, make_train_step
from .checkpoint import save_checkpoint, restore_checkpoint, latest_step
from .metrics import MetricWriter

__all__ = ["TrainState", "create_train_state", "make_train_step",
           "save_checkpoint", "restore_checkpoint", "latest_step",
           "MetricWriter"]
