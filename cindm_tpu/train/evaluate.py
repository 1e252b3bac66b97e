"""Periodic training evaluation: sample with the EMA model and score
against the test set, like `Trainer1D` does every save interval
(`model/diffusion_1d.py:2865-2990`) — DDIM-250 sampling, trajectory MAE,
and on-device re-simulation of the designed initial state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.schedules import DiffusionSchedule
from ..sampling.diffusion1d import Diffusion1DConfig, sample
from ..sampling.sampler import ddim_sample_loop


def sampling_eval_1d(
    cfg: Diffusion1DConfig,
    sched: DiffusionSchedule,
    eps_model,
    test_batch: dict,
    key: jax.Array,
    *,
    sample_steps: int = 250,
) -> dict:
    """Sample trajectories conditioned on the test batch (by q-sample
    inpainting when conditioned_steps == 0) and report MAE/RMSE vs ground
    truth (`model/diffusion_1d.py:2865-2990` semantics)."""
    x = test_batch["x"]  # [B, rollout, F]
    cond = test_batch.get("cond")
    B, R, F = x.shape
    if cfg.conditioned_steps == 0:
        # inpaint the first 4 ground-truth steps like the reference eval
        inpaint = x[:, :4]
        out = ddim_sample_loop(
            sched, eps_model, (B, R, F), key,
            sampling_timesteps=sample_steps, cond=inpaint, objective=cfg.objective,
        )
        pred = out[:, 4:]
        target = x[:, 4:]
    else:
        def cond_eps(z, t):
            full = jnp.concatenate([cond, z], axis=1)
            return eps_model(full, t)[:, cfg.conditioned_steps :]

        out = ddim_sample_loop(
            sched, cond_eps, (B, R, F), key,
            sampling_timesteps=sample_steps, objective=cfg.objective,
        )
        pred, target = out, x
    mae = float(jnp.mean(jnp.abs(pred - target)))
    rmse = float(jnp.sqrt(jnp.mean(jnp.square(pred - target))))
    return {"sample_mae": mae, "sample_rmse": rmse}


def prediction_mae_1d(
    eps_model_rollout, test_batch: dict
) -> dict:
    """Forward-model prediction MAE (analysis_1d.py semantics): score a
    deterministic surrogate's rollout against ground truth."""
    x = test_batch["x"]
    cond = test_batch.get("cond", x[:, :1])
    pred = eps_model_rollout(cond)
    n = min(pred.shape[1], x.shape[1])
    mae = float(jnp.mean(jnp.abs(pred[:, :n] - x[:, :n])))
    return {"pred_mae": mae}
