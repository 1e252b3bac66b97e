"""Design optimizers over forward surrogates: CEM and backprop-GD.

TPU-native re-design of the reference baseline design loops
(`inference/inverse_design_1d_baseline.py:208-351` CEM_1d, `:520-700`
backprop): the Python optimization loops become `lax.scan`s, the N-sample
CEM population is one batched surrogate forward, and clamps follow the
reference bounds (pos ∈ [0.1, 0.9], v ∈ [-0.5, 0.5], `:577-580`).

The surrogate is abstracted as rollout_fn(cond) -> pred so the same loops
drive UNet-forward, GNS, FNO, or LE-PDE models.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from ..core.schedules import linear_beta_schedule

RolloutFn = Callable[[jax.Array], jax.Array]  # cond -> predicted trajectory
DesignFn = Callable[[jax.Array], jax.Array]  # trajectory -> scalar objective


def clamp_nbody_cond(cond: jax.Array) -> jax.Array:
    """Clamp normalized (x, y) ∈ [0.1, 0.9], (vx, vy) ∈ [-0.5, 0.5] for each
    body (`inverse_design_1d_baseline.py:577-580`). cond [..., n_bodies*4]."""
    shape = cond.shape
    c = cond.reshape(*shape[:-1], shape[-1] // 4, 4)
    pos = jnp.clip(c[..., :2], 0.1, 0.9)
    vel = jnp.clip(c[..., 2:], -0.5, 0.5)
    return jnp.concatenate([pos, vel], axis=-1).reshape(shape)


@dataclasses.dataclass(frozen=True)
class CEMConfig:
    """Mirrors the reference flags (`inverse_design_1d_baseline.py:87-104`)."""

    n_samples: int = 1000  # N
    n_elites: int = 100  # Ne
    n_iterations: int = 100
    init_std: float = 1.0


def cem_design(
    cfg: CEMConfig,
    rollout_fn: RolloutFn,
    design_fn: DesignFn,
    cond_shape: tuple,
    key: jax.Array,
    clamp_fn: Callable = clamp_nbody_cond,
    init_mean: jax.Array | None = None,
):
    """Cross-entropy method (`CEM_1d`, `inverse_design_1d_baseline.py:208-351`).

    Per iteration: draw N candidates ~ N(mean, std), clamp, score a batched
    rollout per candidate, refit (mean, std) to the Ne best. ``init_mean``
    seeds the search from a dataset sample (the 2D reference clones dataset
    states into the optimization variables, `inverse_design_GD_discrete_fno.py:310`).

    Returns (best_cond [*cond_shape], best_obj scalar).
    """
    k0, k1 = jax.random.split(key)
    mean = clamp_fn(jax.random.normal(k0, cond_shape)) if init_mean is None else init_mean
    std = jnp.full(cond_shape, cfg.init_std)

    def iteration(carry, key):
        mean, std = carry
        eps = jax.random.normal(key, (cfg.n_samples, *cond_shape))
        cands = clamp_fn(mean[None] + std[None] * eps)  # [N, ...]
        preds = jax.vmap(rollout_fn)(cands)
        scores = jax.vmap(design_fn)(preds)  # [N]
        _, elite_idx = jax.lax.top_k(-scores, cfg.n_elites)
        elites = cands[elite_idx]
        new_mean = jnp.mean(elites, axis=0)
        new_std = jnp.std(elites, axis=0) + 1e-6
        return (new_mean, new_std), jnp.min(scores)

    keys = jax.random.split(k1, cfg.n_iterations)
    (mean, std), best_objs = jax.lax.scan(iteration, (mean, std), keys)
    best = clamp_fn(mean)
    return best, design_fn(rollout_fn(best))


@dataclasses.dataclass(frozen=True)
class BackpropConfig:
    n_iterations: int = 1000
    coef_max_noise: float = 0.0  # annealed exploration noise scale
    lr: float = 1.0  # reference uses raw gradient steps (no optimizer)


def backprop_design(
    cfg: BackpropConfig,
    rollout_fn: RolloutFn,
    design_fn: DesignFn,
    cond0: jax.Array,
    key: jax.Array,
    clamp_fn: Callable = clamp_nbody_cond,
):
    """Gradient-descent design (`inverse_design_1d_baseline.py:520-700`):
    cond ← clamp(cond − ∇_cond design_fn(rollout(cond)) + annealed noise),
    with the noise schedule linear_beta_schedule·coef_max_noise (`:674`)."""
    noise_sched = jnp.asarray(
        linear_beta_schedule(cfg.n_iterations) * cfg.coef_max_noise, cond0.dtype
    )

    def objective(cond):
        return design_fn(rollout_fn(cond))

    def iteration(carry, inp):
        cond = carry
        key, coef = inp
        g = jax.grad(objective)(cond)
        noise = jax.random.normal(key, cond.shape, cond.dtype)
        cond = clamp_fn(cond - cfg.lr * g + coef * noise)
        return cond, objective(cond)

    keys = jax.random.split(key, cfg.n_iterations)
    cond, objs = jax.lax.scan(iteration, clamp_fn(cond0), (keys, noise_sched))
    return cond, objs
