from .checkpoint import CheckpointManager
from .trainer import (
    TrainConfig,
    init_train_state,
    make_optimizer,
    make_train_step,
    make_train_step_2d,
    make_train_step_from_loss,
    reference_lr_schedule,
)
from .evaluate import prediction_mae_1d, sampling_eval_1d
