"""Pure-function DDPM math over trajectory tensors.

TPU-native re-design of `GaussianDiffusion1D` (`model/diffusion_1d.py:801-2501`)
and the shared parts of `GaussianDiffusion` 2D (`model/diffusion_2d.py:551-1050`):
instead of a stateful nn.Module with registered buffers, everything here is a
pure function of a ``DiffusionSchedule`` pytree + arrays, so it composes with
``jit`` / ``vmap`` / ``grad`` / ``scan`` and shards trivially over a device mesh.

``t`` arguments are integer arrays of shape [B] (one timestep per batch row);
buffer gathers broadcast against trailing dims like the reference's
``extract`` (`model/diffusion_1d.py:454-462`).
"""

from __future__ import annotations

from typing import Literal, NamedTuple

import jax
import jax.numpy as jnp

from .schedules import DiffusionSchedule

Objective = Literal["pred_noise", "pred_x0", "pred_v"]


def extract(buf: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather buf[t] ([B]) and reshape to [B, 1, ..., 1] with `ndim` dims total."""
    out = buf[t]
    return out.reshape(out.shape[0], *((1,) * (ndim - 1)))


def q_sample(
    sched: DiffusionSchedule, x_start: jax.Array, t: jax.Array, noise: jax.Array
) -> jax.Array:
    """Forward process q(x_t | x_0) (`model/diffusion_1d.py:2399-2406`)."""
    nd = x_start.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
        + extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def predict_start_from_noise(
    sched: DiffusionSchedule, x_t: jax.Array, t: jax.Array, noise: jax.Array
) -> jax.Array:
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - extract(sched.sqrt_recipm1_alphas_cumprod, t, nd) * noise
    )


def predict_noise_from_start(
    sched: DiffusionSchedule, x_t: jax.Array, t: jax.Array, x0: jax.Array
) -> jax.Array:
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t - x0
    ) / extract(sched.sqrt_recipm1_alphas_cumprod, t, nd)


def predict_v(
    sched: DiffusionSchedule, x_start: jax.Array, t: jax.Array, noise: jax.Array
) -> jax.Array:
    nd = x_start.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * noise
        - extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * x_start
    )


def predict_start_from_v(
    sched: DiffusionSchedule, x_t: jax.Array, t: jax.Array, v: jax.Array
) -> jax.Array:
    nd = x_t.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * x_t
        - extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * v
    )


class Posterior(NamedTuple):
    mean: jax.Array
    variance: jax.Array
    log_variance_clipped: jax.Array


def q_posterior(
    sched: DiffusionSchedule, x_start: jax.Array, x_t: jax.Array, t: jax.Array
) -> Posterior:
    """q(x_{t-1} | x_t, x_0) (`model/diffusion_1d.py:938-949`)."""
    nd = x_t.ndim
    mean = (
        extract(sched.posterior_mean_coef1, t, nd) * x_start
        + extract(sched.posterior_mean_coef2, t, nd) * x_t
    )
    return Posterior(
        mean=mean,
        variance=extract(sched.posterior_variance, t, nd),
        log_variance_clipped=extract(sched.posterior_log_variance_clipped, t, nd),
    )


class ModelPrediction(NamedTuple):
    pred_noise: jax.Array
    pred_x_start: jax.Array


def model_prediction_from_output(
    sched: DiffusionSchedule,
    model_output: jax.Array,
    x: jax.Array,
    t: jax.Array,
    objective: Objective = "pred_noise",
    clip_x_start: bool = False,
    rederive_pred_noise: bool = False,
) -> ModelPrediction:
    """Convert raw denoiser output to (ε̂, x̂0) (`model/diffusion_1d.py:1008-1031`)."""
    clip = (lambda v: jnp.clip(v, -1.0, 1.0)) if clip_x_start else (lambda v: v)
    if objective == "pred_noise":
        pred_noise = model_output
        x_start = clip(predict_start_from_noise(sched, x, t, pred_noise))
        if clip_x_start and rederive_pred_noise:
            pred_noise = predict_noise_from_start(sched, x, t, x_start)
    elif objective == "pred_x0":
        x_start = clip(model_output)
        pred_noise = predict_noise_from_start(sched, x, t, x_start)
    elif objective == "pred_v":
        x_start = clip(predict_start_from_v(sched, x, t, model_output))
        pred_noise = predict_noise_from_start(sched, x, t, x_start)
    else:
        raise ValueError(f"unknown objective {objective}")
    return ModelPrediction(pred_noise, x_start)


def rollout_loss_weight(
    conditioned_steps: int,
    rollout_steps: int,
    feature_size: int,
    discount: float = 0.95,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Per-rollout-step discounted loss weight [T, F].

    Reference computes weight_steps[i] = discount**(i+1) for the rollout
    portion and ones for the conditioned steps
    (`model/diffusion_1d.py:2419-2436`); we build [T, F] once at trace time
    and let broadcasting add the batch axis.
    """
    w_roll = discount ** jnp.arange(1, rollout_steps + 1, dtype=dtype)
    w = jnp.concatenate([jnp.ones(conditioned_steps, dtype=dtype), w_roll])
    return jnp.broadcast_to(w[:, None], (conditioned_steps + rollout_steps, feature_size))


def diffusion_loss(
    sched: DiffusionSchedule,
    model_output: jax.Array,
    x_start: jax.Array,
    noise: jax.Array,
    t: jax.Array,
    *,
    objective: Objective = "pred_noise",
    loss_type: Literal["l1", "l2"] = "l1",
    loss_weight: jax.Array | None = None,
) -> jax.Array:
    """Weighted denoising loss (`model/diffusion_1d.py:2473-2494`).

    ``model_output`` and the target cover the full (cond + rollout) horizon;
    the caller zeroes the conditioned-steps part of ``noise`` (the reference
    concatenates zeros for the cond target, `model/diffusion_1d.py:2449-2476`).
    """
    if objective == "pred_noise":
        target = noise
    elif objective == "pred_x0":
        target = x_start
    elif objective == "pred_v":
        target = predict_v(sched, x_start, t, noise)
    else:
        raise ValueError(f"unknown objective {objective}")

    if loss_type == "l1":
        loss = jnp.abs(model_output - target)
    elif loss_type == "l2":
        loss = jnp.square(model_output - target)
    else:
        raise ValueError(f"invalid loss type {loss_type}")

    if loss_weight is not None:
        loss = loss * loss_weight
    return jnp.mean(loss)


def ddim_times(num_timesteps: int, sampling_timesteps: int) -> tuple[jax.Array, jax.Array]:
    """DDIM time pairs (t, t_next), t descending (`model/diffusion_1d.py:1741-1743`)."""
    import numpy as np

    times = np.linspace(-1, num_timesteps - 1, sampling_timesteps + 1).astype(np.int32)
    times = times[::-1]
    return jnp.asarray(times[:-1]), jnp.asarray(times[1:])
