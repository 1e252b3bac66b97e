from . import diffusion, schedules
from .schedules import DiffusionSchedule, make_schedule, snr_loss_weight, min_snr_loss_weight
from .diffusion import (
    ModelPrediction,
    Posterior,
    ddim_times,
    diffusion_loss,
    extract,
    model_prediction_from_output,
    predict_noise_from_start,
    predict_start_from_noise,
    predict_start_from_v,
    predict_v,
    q_posterior,
    q_sample,
    rollout_loss_weight,
)
