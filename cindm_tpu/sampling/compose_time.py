"""Time-composition & energy-based multi-body samplers (the C14 extras).

TPU-native re-design of the reference's additional compositional modes
(`model/diffusion_1d.py:1806-2327`):

- ``composing_time_sample``: (n_composed+1) chained windows denoise in
  parallel under one DDIM scan; at every step window i+1's condition is
  refreshed from window i's last ``conditioned_steps`` frames
  (`:1806-1854`). Here the window axis is folded into the batch so each
  reverse step is ONE denoiser forward.
- ``autoregress_time_compose_sample``: sequential full DDIM per window,
  conditioning each window on the previous result (`:2239-2327`).
- ``classifier_free_compose_eps``: EBM-style multi-body ε composition
  ε_i = Σ_{pairs ∋ i} ε_pair − c·ε_uncond(i), coefficient 1.4 (Eq. 18,
  `gradient()` `:1856-1982`), generalized from the hardcoded 3/4-body
  cases to any n via the pair-scatter matmul of ``compose.py``.
- ``sample_compose_multibodies`` + ULA: Langevin steps with that composed
  score for t > t_switch, ancestral p_sample below (`:1985-2073`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import diffusion as dd
from ..core.schedules import DiffusionSchedule
from .compose import EpsModel, pair_indices
from .sampler import p_sample_step


def composing_time_sample(
    sched: DiffusionSchedule,
    eps_model: EpsModel,  # conditioned model over [B, cond+rollout, F]
    batch: int,
    rollout_steps: int,
    conditioned_steps: int,
    feature_size: int,
    cond: jax.Array,  # [B, conditioned_steps, F] for window 0
    key: jax.Array,
    *,
    n_composed: int = 2,
    sampling_timesteps: int = 250,
    clip_denoised: bool = True,
    objective: str = "pred_noise",
) -> tuple[jax.Array, jax.Array]:
    """Parallel chained-window DDIM (`model/diffusion_1d.py:1806-1854`).

    Window i+1 is conditioned on the last ``conditioned_steps`` frames of
    window i, so its entire ``rollout_steps``-frame output lies strictly
    after window i ends — each continuation window contributes its full
    rollout to the stitched trajectory ((n_composed+1)·rollout total,
    matching the ground-truth window length the reference analysis loads,
    `inference_1d_composing_time_steps.py:157`). The reference instead
    hardcodes the last 20 frames per window (`diffusion_1d.py:1850-1853`),
    which misaligns the stitch for any rollout ≠ 20; we keep the
    geometrically correct semantics.

    Returns (window-0 samples [B, rollout, F],
             stitched continuation [B, n_composed*rollout, F]).
    """
    K = n_composed + 1
    times, times_next = dd.ddim_times(sched.num_timesteps, sampling_timesteps)
    key, k0, k1 = jax.random.split(key, 3)
    img = jax.random.normal(k0, (K * batch, rollout_steps, feature_size))
    cond_all = jax.random.normal(k1, (K * batch, conditioned_steps, feature_size))
    cond_all = cond_all.at[:batch].set(cond)

    def step(carry, tt):
        img, cond_all, key = carry
        t, t_next = tt
        key, kn = jax.random.split(key)
        # refresh window i+1 cond from window i's tail (`:1827-1829`)
        for i in range(n_composed):
            tail = jax.lax.dynamic_slice_in_dim(img, i * batch, batch, 0)[
                :, -conditioned_steps:, :
            ]
            cond_all = jax.lax.dynamic_update_slice_in_dim(
                cond_all, tail, (i + 1) * batch, 0
            )
        t_b = jnp.full((K * batch,), t, dtype=jnp.int32)
        x_full = jnp.concatenate([cond_all, img], axis=1)
        out = eps_model(x_full, t_b)
        pred = dd.model_prediction_from_output(
            sched, out, x_full, t_b, objective, clip_x_start=clip_denoised
        )
        pred_noise = pred.pred_noise[:, conditioned_steps:]
        x_start = pred.pred_x_start[:, conditioned_steps:]
        alpha_next = jnp.where(
            t_next >= 0, sched.alphas_cumprod[jnp.maximum(t_next, 0)], 1.0
        )
        c = jnp.sqrt(jnp.clip(1.0 - alpha_next, 0.0, None))
        noise = jax.random.normal(kn, img.shape, img.dtype)
        img_next = x_start * jnp.sqrt(alpha_next) + c * pred_noise
        img_next = jnp.where(t_next < 0, x_start, img_next)
        return (img_next, cond_all, key), None

    (img, _, _), _ = jax.lax.scan(step, (img, cond_all, key), (times, times_next))
    img0 = img[:batch]
    pieces = [img[(i + 1) * batch : (i + 2) * batch] for i in range(n_composed)]
    stitched = jnp.concatenate(pieces, axis=1) if pieces else img0[:, :0]
    return img0, stitched


def autoregress_time_compose_sample(
    sched: DiffusionSchedule,
    eps_model: EpsModel,
    batch: int,
    rollout_steps: int,
    conditioned_steps: int,
    feature_size: int,
    cond: jax.Array,
    key: jax.Array,
    *,
    n_composed: int = 2,
    sampling_timesteps: int = 250,
    objective: str = "pred_noise",
) -> jax.Array:
    """Sequential window chaining (`model/diffusion_1d.py:2239-2327`): run a
    full DDIM per window, feeding each window's tail as the next condition.
    Each window's full rollout lies after the previous window (see
    ``composing_time_sample`` docstring), so the stitched trajectory is
    [B, (n_composed+1)*rollout, F]."""
    from .sampler import ddim_sample_loop

    outs = []
    cur_cond = cond
    for i in range(n_composed + 1):
        key, k = jax.random.split(key)
        # conditioned model: sample the rollout part given cur_cond by
        # concatenating cond inside the eps model wrapper
        def cond_eps(x, t, _c=cur_cond):
            full = jnp.concatenate([_c, x], axis=1)
            out = eps_model(full, t)
            return out[:, conditioned_steps:]

        img = ddim_sample_loop(
            sched, cond_eps, (batch, rollout_steps, feature_size), k,
            sampling_timesteps=sampling_timesteps, objective=objective,
        )
        outs.append(img)
        cur_cond = img[:, -conditioned_steps:]
    return jnp.concatenate(outs, axis=1)


def make_classifier_free_compose_eps(
    pair_model: EpsModel,  # 2-body model over [*, T, 8]
    uncond_model: EpsModel,  # 1-body model over [*, T, 4]
    n_bodies: int,
    *,
    coefficient: float = 1.4,
    feature_size: int = 4,
) -> EpsModel:
    """EBM composition ε_i = Σ_{pairs ∋ i} ε_pair − c·ε_uncond(i)
    (Eq.18-style, `model/diffusion_1d.py:1856-1982`), for any n_bodies.
    One batched pair forward + one batched unconditional forward."""
    pi, pj = pair_indices(n_bodies)
    P = len(pi)
    A = np.zeros((P, 2, n_bodies), dtype=np.float32)
    A[np.arange(P), 0, pi] = 1.0
    A[np.arange(P), 1, pj] = 1.0
    A = jnp.asarray(A)
    pi_j, pj_j = jnp.asarray(pi), jnp.asarray(pj)

    def eps(x: jax.Array, t: jax.Array) -> jax.Array:
        B, T, _ = x.shape
        xb = x.reshape(B, T, n_bodies, feature_size)
        xi = xb[:, :, pi_j, :]
        xj = xb[:, :, pj_j, :]
        pair_in = jnp.concatenate([xi, xj], axis=-1)  # [B, T, P, 2F]
        pair_in = jnp.transpose(pair_in, (2, 0, 1, 3)).reshape(P * B, T, 2 * feature_size)
        e = pair_model(pair_in, jnp.tile(t, P)).reshape(P, B, T, 2, feature_size)
        e = jnp.transpose(e, (1, 2, 0, 3, 4))  # [B, T, P, 2, F]
        summed = jnp.einsum("btpcf,pcn->btnf", e, A)  # Σ over pairs per body
        singles = jnp.transpose(xb, (2, 0, 1, 3)).reshape(n_bodies * B, T, feature_size)
        eu = uncond_model(singles, jnp.tile(t, n_bodies))
        eu = eu.reshape(n_bodies, B, T, feature_size).transpose(1, 2, 0, 3)
        out = summed - coefficient * eu
        return out.reshape(B, T, n_bodies * feature_size)

    return eps


def sample_compose_multibodies(
    sched: DiffusionSchedule,
    composed_eps: EpsModel,  # e.g. from make_classifier_free_compose_eps
    cond: jax.Array,  # [B, conditioned_steps, n*F]
    rollout_steps: int,
    key: jax.Array,
    *,
    langevin_steps: int = 10,  # L
    t_switch: int = 400,
    langevin_step_scale: float = 0.035,
    conditioned_steps: int = 0,
    clip_denoised: bool = True,
) -> jax.Array:
    """ULA-for-high-t then ancestral sampling (`model/diffusion_1d.py:1985-2073`):
    for t > t_switch take L Langevin steps x ← x + s·score + √(2s)·ξ with
    score = −ε/√(1−ᾱ_t); below t_switch use standard p_sample.

    When ``conditioned_steps > 0`` the cond frames are re-inpainted at every
    outer step by q-sampling the clean cond to the current noise level (the
    `model/diffusion_1d.py:1715-1718` protocol) — unlike the reference's ULA
    loop, which lets the cond region drift above t_switch."""
    B = cond.shape[0]
    F = cond.shape[2]
    T = sched.num_timesteps
    key, k0 = jax.random.split(key)
    img = jax.random.normal(k0, (B, rollout_steps, F))
    x = jnp.concatenate([cond, img], axis=1) if conditioned_steps > 0 else img
    step_sizes = sched.betas * langevin_step_scale
    score_scale = 1.0 / sched.sqrt_one_minus_alphas_cumprod

    def inpaint(x, t, t_b, key):
        if conditioned_steps == 0:
            return x
        noisy = dd.q_sample(sched, cond, t_b, jax.random.normal(key, cond.shape))
        noisy = jnp.where(t > 0, noisy, cond)
        return x.at[:, :conditioned_steps].set(noisy)

    def body(carry, t):
        x, key = carry
        key, k1, k2 = jax.random.split(key, 3)
        t_b = jnp.full((B,), t, dtype=jnp.int32)

        def ula(x, key):
            ss = step_sizes[t]
            std = jnp.sqrt(2.0 * ss)

            def l_step(i, carry):
                x, key = carry
                key, k = jax.random.split(key)
                e = composed_eps(x, t_b)
                score = -score_scale[t] * e
                return x + ss * score + std * jax.random.normal(k, x.shape), key

            x, _ = jax.lax.fori_loop(0, langevin_steps, l_step, (x, key))
            return x

        def ancestral(x, key):
            out, _ = p_sample_step(
                sched, composed_eps, x, t, key, clip_denoised=clip_denoised
            )
            return out

        x = jax.lax.cond(t > t_switch, ula, ancestral, x, k1)
        x = inpaint(x, t, t_b, k2)
        return (x, key), None

    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    (x, _), _ = jax.lax.scan(body, (x, key), ts)
    return x[:, conditioned_steps:] if conditioned_steps > 0 else x


def sample_compose_multibodies_uhmc(
    sched: DiffusionSchedule,
    composed_eps: EpsModel,
    cond: jax.Array,
    rollout_steps: int,
    key: jax.Array,
    *,
    leapfrog_steps: int = 3,
    t_switch: int = 400,
    step_scale: float = 0.1,
    damping: float = 0.9,
    conditioned_steps: int = 0,
) -> jax.Array:
    """Underdamped-HMC variant (a *working* completion of the reference's
    partially-dead UHMC scaffolding, `model/diffusion_1d.py:2076-2237`):
    leapfrog momentum updates with the composed score for t > t_switch,
    ancestral p_sample below. ``conditioned_steps > 0`` re-inpaints the cond
    frames every outer step (q-sample to the current level), as in
    ``sample_compose_multibodies``."""
    B, F = cond.shape[0], cond.shape[2]
    T = sched.num_timesteps
    key, k0, kv = jax.random.split(key, 3)
    img = jax.random.normal(k0, (B, rollout_steps, F))
    x = jnp.concatenate([cond, img], axis=1) if conditioned_steps > 0 else img
    v = jax.random.normal(kv, x.shape)
    step_sizes = sched.betas * step_scale
    score_scale = 1.0 / sched.sqrt_one_minus_alphas_cumprod

    def inpaint(x, t, t_b, key):
        if conditioned_steps == 0:
            return x
        noisy = dd.q_sample(sched, cond, t_b, jax.random.normal(key, cond.shape))
        noisy = jnp.where(t > 0, noisy, cond)
        return x.at[:, :conditioned_steps].set(noisy)

    def body(carry, t):
        x, v, key = carry
        key, k1, k2 = jax.random.split(key, 3)
        t_b = jnp.full((B,), t, dtype=jnp.int32)

        def hmc(args):
            x, v, key = args
            ss = step_sizes[t]

            def leap(i, carry):
                x, v, key = carry
                key, k = jax.random.split(key)
                score = -score_scale[t] * composed_eps(x, t_b)
                v = damping * v + 0.5 * ss * score
                x = x + ss * v
                score = -score_scale[t] * composed_eps(x, t_b)
                v = v + 0.5 * ss * score
                # partial momentum refresh keeps the chain underdamped
                v = damping * v + jnp.sqrt(1 - damping**2) * jax.random.normal(k, v.shape)
                return x, v, key

            x, v, key = jax.lax.fori_loop(0, leapfrog_steps, leap, (x, v, key))
            return x, v

        def ancestral(args):
            x, v, key = args
            out, _ = p_sample_step(sched, composed_eps, x, t, key)
            return out, v

        x, v = jax.lax.cond(t > t_switch, hmc, ancestral, (x, v, k1))
        x = inpaint(x, t, t_b, k2)
        return (x, v, key), None

    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    (x, _, _), _ = jax.lax.scan(body, (x, v, key), ts)
    return x[:, conditioned_steps:] if conditioned_steps > 0 else x
