"""Diffusion beta schedules and precomputed buffer pytrees.

TPU-native re-design of the DDPM buffer machinery of the reference
(`model/diffusion_1d.py:846-910`, `model/diffusion_2d.py:497-531,567-674`):
all derived quantities are computed once in float64 on host (numpy) and
stored as float32 jnp arrays inside an immutable ``DiffusionSchedule``
pytree, so a jitted sampler/train-step just gathers from them.

Reference semantics preserved:
- linear:  betas in [scale*1e-4, scale*2e-2], scale = 1000/T
  (`model/diffusion_1d.py:464-468`)
- cosine:  Nichol & Dhariwal, s = 0.008, clipped to [0, 0.999]
  (`model/diffusion_1d.py:470-480`)
- sigmoid: (2D only) start=-3, end=3, tau=1 (`model/diffusion_2d.py:519-531`)
- posterior / SNR buffers exactly as registered in
  `model/diffusion_1d.py:873-910`.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

BetaScheduleName = Literal["linear", "cosine", "sigmoid"]


def linear_beta_schedule(timesteps: int) -> np.ndarray:
    scale = 1000.0 / timesteps
    return np.linspace(scale * 1e-4, scale * 2e-2, timesteps, dtype=np.float64)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1.0 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0.0, 0.999)


def sigmoid_beta_schedule(
    timesteps: int, start: float = -3.0, end: float = 3.0, tau: float = 1.0
) -> np.ndarray:
    t = np.linspace(0, timesteps, timesteps + 1, dtype=np.float64) / timesteps
    v_start = 1.0 / (1.0 + np.exp(-start / tau))
    v_end = 1.0 / (1.0 + np.exp(-end / tau))
    alphas_cumprod = (-1.0 / (1.0 + np.exp(-((t * (end - start) + start) / tau))) + v_end) / (
        v_end - v_start
    )
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1.0 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0.0, 0.999)


_SCHEDULES = {
    "linear": linear_beta_schedule,
    "cosine": cosine_beta_schedule,
    "sigmoid": sigmoid_beta_schedule,
}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Immutable pytree of all DDPM buffers, each of shape [T] float32."""

    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    log_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    snr: jax.Array
    # recurrence ("time-travel") relaxation coefficients, p_sample
    # `model/diffusion_1d.py:1181-1182`
    sqrt_alpha_ratio: jax.Array          # sqrt(acp / acp_prev)
    sqrt_one_minus_alpha_ratio: jax.Array  # sqrt(1 - acp / acp_prev)
    # universal-backward Δx0 coefficient, `model/diffusion_1d.py:1103`
    backward_delta_coef: jax.Array
    # guidance step size η_t = β_t / sqrt(acp_prev), `model/diffusion_1d.py:1073`
    guidance_eta: jax.Array

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def make_schedule(
    timesteps: int = 1000,
    beta_schedule: BetaScheduleName = "cosine",
    dtype: jnp.dtype = jnp.float32,
) -> DiffusionSchedule:
    betas = _SCHEDULES[beta_schedule](timesteps)
    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.concatenate([[1.0], acp[:-1]])

    posterior_variance = betas * (1.0 - acp_prev) / (1.0 - acp)
    snr = acp / (1.0 - acp)

    f = lambda a: jnp.asarray(a, dtype=dtype)
    return DiffusionSchedule(
        betas=f(betas),
        alphas_cumprod=f(acp),
        alphas_cumprod_prev=f(acp_prev),
        sqrt_alphas_cumprod=f(np.sqrt(acp)),
        sqrt_one_minus_alphas_cumprod=f(np.sqrt(1.0 - acp)),
        log_one_minus_alphas_cumprod=f(np.log(1.0 - acp)),
        sqrt_recip_alphas_cumprod=f(np.sqrt(1.0 / acp)),
        sqrt_recipm1_alphas_cumprod=f(np.sqrt(1.0 / acp - 1.0)),
        posterior_variance=f(posterior_variance),
        posterior_log_variance_clipped=f(np.log(np.clip(posterior_variance, 1e-20, None))),
        posterior_mean_coef1=f(betas * np.sqrt(acp_prev) / (1.0 - acp)),
        posterior_mean_coef2=f((1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)),
        snr=f(snr),
        sqrt_alpha_ratio=f(np.sqrt(acp / acp_prev)),
        sqrt_one_minus_alpha_ratio=f(np.sqrt(1.0 - acp / acp_prev)),
        backward_delta_coef=f(
            np.sqrt(acp) * betas / (np.sqrt(1.0 - betas) * (1.0 - acp))
        ),
        guidance_eta=f(betas / np.sqrt(acp_prev)),
    )


def snr_loss_weight(
    schedule: DiffusionSchedule,
    objective: Literal["pred_noise", "pred_x0", "pred_v"] = "pred_noise",
) -> jax.Array:
    """Per-timestep SNR loss weights (`model/diffusion_1d.py:901-910`)."""
    snr = schedule.snr
    if objective == "pred_noise":
        return jnp.ones_like(snr)
    if objective == "pred_x0":
        return snr
    if objective == "pred_v":
        return snr / (snr + 1.0)
    raise ValueError(f"unknown objective {objective}")


def min_snr_loss_weight(
    schedule: DiffusionSchedule,
    objective: Literal["pred_noise", "pred_x0", "pred_v"] = "pred_noise",
    gamma: float = 5.0,
) -> jax.Array:
    """Min-SNR-γ weighting option of the 2D stack (`model/diffusion_2d.py:663-674`)."""
    snr = schedule.snr
    clipped = jnp.minimum(snr, gamma)
    if objective == "pred_noise":
        return clipped / snr
    if objective == "pred_x0":
        return clipped
    if objective == "pred_v":
        return clipped / (snr + 1.0)
    raise ValueError(f"unknown objective {objective}")
