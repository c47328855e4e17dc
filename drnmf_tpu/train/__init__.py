from .losses import masked_mse_signal_approx, snmf_pretrain_loss
from .loop import (TrainConfig, TrainingDeadline, train_model,
                   make_optimizer, make_train_step, make_epoch_chunk,
                   evaluate)
from .history import LossHistory
from .checkpoint import (save_checkpoint, load_checkpoint,
                         save_checkpoint_orbax, load_checkpoint_orbax)
from .snmf_recipe import train_snmf

__all__ = [
    "masked_mse_signal_approx",
    "snmf_pretrain_loss",
    "TrainConfig",
    "TrainingDeadline",
    "train_model",
    "make_optimizer",
    "make_train_step",
    "make_epoch_chunk",
    "evaluate",
    "LossHistory",
    "save_checkpoint",
    "load_checkpoint",
    "save_checkpoint_orbax",
    "load_checkpoint_orbax",
    "train_snmf",
]
