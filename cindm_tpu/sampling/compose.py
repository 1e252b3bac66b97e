"""Compositional ε-model: multi-body × multi-window denoising as ONE batched forward.

TPU-native re-design of the reference's inside-composition
(`model/diffusion_1d.py:959-999` in ``model_predictions``): the reference
loops in Python over (n_composed+1) overlapping time windows × all C(n,2)
body pairs, calling the 2-body denoiser once per (window, pair) — 840k
sequential forwards per batch for the flagship 8-body config
(SURVEY.md §3.2). Here the (window, pair) axes are materialized as a
single batch dimension at trace time:

    x [B, T_tot, n*4]
      → gather K static windows × P static pairs → [K*P*B, sms, 8]
      → ONE denoiser forward
      → scatter-add back via a one-hot pair→body matmul (MXU-friendly)
      → window overlap-normalized mean/sum.

All shapes are static; XLA sees one big conv workload per reverse step.
"""

from __future__ import annotations

import itertools
from typing import Callable, Literal

import jax
import jax.numpy as jnp
import numpy as np

EpsModel = Callable[[jax.Array, jax.Array], jax.Array]  # (x [B,T,F], t [B]) -> eps


def pair_indices(n_bodies: int) -> tuple[np.ndarray, np.ndarray]:
    """All i<j pairs (like the ii<jj loop at `model/diffusion_1d.py:979-981`)."""
    pairs = list(itertools.combinations(range(n_bodies), 2))
    pi = np.array([p[0] for p in pairs], dtype=np.int32)
    pj = np.array([p[1] for p in pairs], dtype=np.int32)
    return pi, pj


def window_coverage(
    total_steps: int, n_composed: int, compose_start_step: int, single_model_step: int
) -> np.ndarray:
    """How many windows cover each time step (mask_aggr.sum(0) of
    `model/diffusion_1d.py:975-978,996`). Shape [total_steps]."""
    cov = np.zeros(total_steps, dtype=np.float32)
    for kk in range(n_composed + 1):
        cov[kk * compose_start_step : kk * compose_start_step + single_model_step] += 1.0
    return cov


# throughput-optimal folded-axis slice for the composed denoiser call:
# measured on v5e — 5,376-sample slices (the B=64 flagship fold) run at
# ~470k pair-window fwds/s where a 43k monolithic fold runs at ~305k
# (benchmarks/bench_batch512.py, fold2/4/8 sweep)
FOLD_TARGET = 5376


def make_composed_eps_model(
    base_eps_model: EpsModel,
    *,
    compose_n_bodies: int,
    n_composed: int,
    compose_start_step: int,
    single_model_step: int,
    compose_mode: Literal["mean-inside", "sum-inside"] = "mean-inside",
    feature_size: int = 4,
    sched=None,
    clip_pairwise_x_start: bool = False,
    fold_chunks: int = 0,
) -> EpsModel:
    """Lift a 2-body single-window ε-model to n bodies over composed windows.

    The returned function has the plain EpsModel signature, so samplers are
    agnostic to whether they run composed or not.

    ``clip_pairwise_x_start`` implements the *outside*-composition semantics
    (`p_sample_compose_outside`, `model/diffusion_1d.py:1379-1652`): each
    pair-window's x̂0 is clipped to [-1, 1] BEFORE aggregation (per-pair
    p_mean_variance with clip_denoised). Because the posterior mean is
    affine in x̂0, averaging per-pair posterior means ("mean" mode) equals
    running the standard posterior on the aggregated pairwise-clipped noise
    — so outside-mean and outside-noise_sum both reduce to this option.
    Requires ``sched``.
    """
    n = compose_n_bodies
    K = n_composed + 1
    css, sms, F = compose_start_step, single_model_step, feature_size
    T_tot = sms + n_composed * css
    pi, pj = pair_indices(n)
    P = len(pi)

    # pair→body scatter matrix: contribution c∈{0,1} of pair p goes to body
    # pi[p] / pj[p] (the receiver axis of `model/diffusion_1d.py:989-990`).
    A = np.zeros((P, 2, n), dtype=np.float32)
    A[np.arange(P), 0, pi] = 1.0
    A[np.arange(P), 1, pj] = 1.0
    A = jnp.asarray(A)

    cov = jnp.asarray(window_coverage(T_tot, n_composed, css, sms))  # [T_tot]
    pi_j = jnp.asarray(pi)
    pj_j = jnp.asarray(pj)

    def eps_model(x: jax.Array, t: jax.Array) -> jax.Array:
        B = x.shape[0]
        assert x.shape[1] == T_tot and x.shape[2] == n * F, (x.shape, T_tot, n, F)
        xb = x.reshape(B, T_tot, n, F)

        # [K, B, sms, n, F] — static window offsets, K ≤ 3 so unrolled stack
        xw = jnp.stack([xb[:, kk * css : kk * css + sms] for kk in range(K)], axis=0)
        xi = xw[:, :, :, pi_j, :]  # [K, B, sms, P, F]
        xj = xw[:, :, :, pj_j, :]
        pair_in = jnp.concatenate([xi, xj], axis=-1)  # [K, B, sms, P, 2F]
        pair_in = jnp.transpose(pair_in, (0, 3, 1, 2, 4))  # [K, P, B, sms, 2F]
        pair_in = pair_in.reshape(K * P * B, sms, 2 * F)

        t_rep = jnp.tile(t, K * P)
        n_fold = K * P * B
        fc = fold_chunks
        if fc == 0:
            # auto: bound each denoiser call's folded axis at ~FOLD_TARGET
            # samples. One monolithic call degrades 429k→305k fwds/s from
            # B=64 to B=512 (VMEM working set; benchmarks/bench_batch512.py)
            # while 5,376-sample slices run at full rate — so pick the
            # smallest divisor of n_fold that restores that slice size.
            fc = 1
            if n_fold > FOLD_TARGET:
                lo = -(-n_fold // FOLD_TARGET)
                # nearest divisor ≥ the target count; give up (monolithic)
                # if none within 4× — tiny slices would serialize the MXU
                fc = next(
                    (f for f in range(lo, min(4 * lo, n_fold) + 1) if n_fold % f == 0),
                    1,
                )
        if fc > 1 and n_fold % fc == 0:
            # sequential lax.map slices inside one launch — bit-identical
            # to the monolithic call (test_fold_chunks_bit_identical)
            pair_c = pair_in.reshape(fc, n_fold // fc, sms, 2 * F)
            t_c = t_rep.reshape(fc, n_fold // fc)
            eps = jax.lax.map(lambda a: base_eps_model(a[0], a[1]), (pair_c, t_c))
            eps = eps.reshape(n_fold, sms, 2 * F)
        else:
            eps = base_eps_model(pair_in, t_rep)  # [K*P*B, sms, 2F]
        if clip_pairwise_x_start:
            # outside-composition: clip each pair-window x̂0 before
            # aggregating (`model/diffusion_1d.py:1407-1463`)
            from ..core import diffusion as _dd

            assert sched is not None, "clip_pairwise_x_start requires sched"
            x_start_p = _dd.predict_start_from_noise(sched, pair_in, t_rep, eps)
            x_start_p = jnp.clip(x_start_p, -1.0, 1.0)
            eps = _dd.predict_noise_from_start(sched, pair_in, t_rep, x_start_p)
        eps = eps.reshape(K, P, B, sms, 2, F)
        eps = jnp.transpose(eps, (0, 2, 3, 1, 4, 5))  # [K, B, sms, P, 2, F]

        # scatter pair contributions to bodies: one-hot matmul (MXU)
        agg = jnp.einsum("kbspcf,pcn->kbsnf", eps, A)  # [K, B, sms, n, F]
        if compose_mode == "mean-inside":
            agg = agg / (n - 1)
        agg = agg.reshape(K, B, sms, n * F)

        # scatter windows back to the full horizon and overlap-normalize
        out = jnp.zeros((B, T_tot, n * F), dtype=x.dtype)
        for kk in range(K):
            out = jax.lax.dynamic_update_slice(
                out,
                jax.lax.dynamic_slice(
                    out, (0, kk * css, 0), (B, sms, n * F)
                ) + agg[kk],
                (0, kk * css, 0),
            )
        if compose_mode == "mean-inside":
            out = out / cov[None, :, None]
        elif compose_mode == "sum-inside":
            out = out / (cov[None, :, None] / K)
        else:
            raise ValueError(f"unknown compose_mode {compose_mode}")
        return out

    return eps_model
