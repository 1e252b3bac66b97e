"""Design objectives & evaluation functions for n-body inverse design.

Re-implements the objective builders of
`inference/inverse_design_diffusion_1d.py:211-258` as pure jnp functions:
the design objective is the (coef-scaled) mean-over-last-steps distance of
every body's final position to a target point, optionally plus a
time-consistency penalty.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _body_positions(pos: jax.Array) -> jax.Array:
    """[..., steps, n_bodies*4] -> [..., steps, n_bodies, 2] (x, y only)."""
    *lead, T, F = pos.shape
    n_bodies = F // 4
    return pos.reshape(*lead, T, n_bodies, 4)[..., :2]


def get_design_fn(
    pos_target: jax.Array,
    last_n_step: int,
    gamma: float = 2.0,
    coef: float = 100.0,
    time_consistency_coef: float = 0.0,
    design_fn_mode: str = "L2",
    norm_factor: float = 1.0,
) -> Callable[[jax.Array], jax.Array]:
    """Point-attraction objective (`inverse_design_diffusion_1d.py:211-229`).

    ``norm_factor`` rescales the whole objective (both the point-attraction
    and time-consistency terms). In composed multi-body sampling each body's
    state receives gradient from every overlapping pair window, so the
    effective per-body guidance magnitude grows with n_bodies (measured ~4×
    from n=2 to n=8, RESULTS.md round-3); passing ``2 / n_bodies`` normalizes
    the composed gradient back to the 2-body tuning the paper coefficients
    were chosen for.

    ``coef`` and ``time_consistency_coef`` may each be a scalar or a
    per-sample ``[B]`` array. Because the objective is a sum of independent
    per-sample terms, per-sample coefficients make ``jax.grad`` of ONE
    batched objective identical to running separate batches with scalar
    coefficients — a coefficient sweep folds into the batch axis and
    compiles once (benchmarks/run_sweep8.py).
    """
    assert pos_target.ndim == 1
    tcc_static_zero = isinstance(time_consistency_coef, (int, float)) and (
        time_consistency_coef == 0.0
    )

    def point_objective(pos: jax.Array) -> jax.Array:
        p = _body_positions(pos)[..., -last_n_step:, :, :]  # [B, last, n, 2]
        d = jnp.abs(p - pos_target) ** gamma
        if design_fn_mode == "L2":
            per = jnp.sum(d, axis=-1) ** (1.0 / gamma)  # [B, last, n]
        elif design_fn_mode == "L2square":
            per = jnp.sum(d, axis=-1)
        else:
            raise ValueError(design_fn_mode)
        # mean over steps, sum over bodies -> per-sample [B], then
        # coef-weighted sum over B (scalar coef == the original reduction)
        per_sample = jnp.sum(jnp.mean(per, axis=-2), axis=-1)
        loss_total = jnp.sum(per_sample * coef)
        if not tcc_static_zero:
            xy = _body_positions(pos)
            dv = xy[:, 1:] - xy[:, :-1]
            cons = jnp.mean(jnp.sum(jnp.square(dv), axis=(-1, -2)), axis=-1)  # [B]
            loss_total = loss_total + jnp.sum(cons * time_consistency_coef)
        return loss_total * norm_factor

    return point_objective


def get_eval_fn(
    pos_target: jax.Array, last_n_step: int, gamma: float = 2.0
) -> Callable[[jax.Array], jax.Array]:
    """Mean final-distance metric (`inverse_design_diffusion_1d.py:231-238`)."""
    assert pos_target.ndim == 1

    def eval_fn(pos: jax.Array) -> jax.Array:
        p = _body_positions(pos)[..., -last_n_step:, :, :]
        per = jnp.sum(jnp.abs(p - pos_target) ** gamma, axis=-1) ** (1.0 / gamma)
        return jnp.mean(per)

    return eval_fn


def get_eval_fn_per_sample(
    pos_target: jax.Array, last_n_step: int = 1, gamma: float = 2.0
) -> Callable[[jax.Array], jax.Array]:
    """Per-sample losses [B] (`inverse_design_diffusion_1d.py:251-258`)."""
    assert pos_target.ndim == 1

    def eval_fn(pos: jax.Array) -> jax.Array:
        p = _body_positions(pos)[..., -last_n_step:, :, :]
        per = jnp.sum(jnp.abs(p - pos_target) ** gamma, axis=-1) ** (1.0 / gamma)  # [B, last, n]
        return jnp.mean(per.reshape(per.shape[0], -1), axis=-1)

    return eval_fn


def confidence_interval_95(values: jax.Array) -> jax.Array:
    """1.96·σ/√N half-width (`utils.py:1215-1239`)."""
    n = values.shape[0]
    return 1.96 * jnp.std(values) / jnp.sqrt(n)
