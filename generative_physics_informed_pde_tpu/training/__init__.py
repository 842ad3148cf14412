"""SVI training loop, schedules, metrics and checkpointing."""

from .trainer import (Trainer, TrainerParameters, TrainState, CreateTrainer,
                      CreateTrainerFromPermutation,
                      CreateDataSetsFromPermutation, DEFAULT_CONFIG,
                      TrainingDivergedError)
from .schedules import (make_schedule, multistep_lr, step_lr, constant_lr,
                        PlateauController)
from .metrics import MetricsWriter
from .checkpoint import (save_train_state, restore_train_state,
                         save_encoder_decoder, restore_encoder_decoder)

__all__ = [
    "Trainer", "TrainerParameters", "TrainState", "CreateTrainer",
    "CreateTrainerFromPermutation", "CreateDataSetsFromPermutation",
    "DEFAULT_CONFIG", "TrainingDivergedError", "make_schedule",
    "multistep_lr", "step_lr",
    "constant_lr", "PlateauController", "MetricsWriter",
    "save_train_state", "restore_train_state", "save_encoder_decoder",
    "restore_encoder_decoder",
]
