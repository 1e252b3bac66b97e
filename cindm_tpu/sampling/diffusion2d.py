"""2D airfoil diffusion: multi-boundary composition + guided sampling.

TPU-native re-design of `GaussianDiffusion` 2D (`model/diffusion_2d.py:551-1058`).
State tensor layout (channel-last): x = [B·nb, 64, 64, C] with
C = cond_frames·3 + pred_frames·3 + 3 (mask, offx, offy); channels per frame
are (vx, vy, p). Multi-boundary composition = sharing the *state* channels
(everything but the last 3 boundary channels) across the boundary axis —
mean (`use_average_share`) or sum — applied to the predicted noise
(`share_noise=True`) or to x̂0/mean (`model/diffusion_2d.py:712-770`);
the initial/step noise is also state-shared (`sample_noise`, `:775-785`).

Guidance: the 2D driver's design_fn returns the *gradient* directly
(`inference/inverse_design_2d.py:98-143`); schedules are
``standard_fixed_ratio`` (fixed) or ``coeff_ratio · flip(β)[t]``
("standard-alpha", `model/diffusion_2d.py:795-798`).
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core import diffusion as dd
from ..core.schedules import DiffusionSchedule, make_schedule, min_snr_loss_weight, snr_loss_weight


@dataclasses.dataclass(frozen=True)
class Diffusion2DConfig:
    """Mirrors `GaussianDiffusion.__init__` 2D (`model/diffusion_2d.py:552-577`)."""

    image_size: int = 64
    frames: int = 6
    cond_frames: int = 2
    pred_frames: int = 4
    timesteps: int = 1000
    sampling_timesteps: Optional[int] = None
    loss_type: str = "l2"
    objective: str = "pred_noise"
    beta_schedule: str = "sigmoid"
    ddim_sampling_eta: float = 0.0
    min_snr_loss_weight: bool = False
    min_snr_gamma: float = 5.0
    diffuse_cond: bool = True
    backward_steps: int = 5
    backward_lr: float = 0.01
    standard_fixed_ratio: float = 0.01
    forward_fixed_ratio: float = 0.01
    coeff_ratio: float = 0.1
    share_noise: bool = True
    use_average_share: bool = True

    @property
    def channels(self) -> int:
        return self.frames * 3 + 3

    def make_schedule(self) -> DiffusionSchedule:
        return make_schedule(self.timesteps, self.beta_schedule)


# DesignGradFn returns the gradient of the design objective directly
DesignGradFn = Callable[[jax.Array], jax.Array]


def share_states_over_boundaries(
    x: jax.Array, num_boundaries: int, use_average_share: bool = True
) -> jax.Array:
    """Share state channels (all but last 3) across boundaries
    (`model/diffusion_2d.py:712-725`). x: [B·nb, H, W, C]."""
    Bnb, H, W, C = x.shape
    B = Bnb // num_boundaries
    xb = x.reshape(B, num_boundaries, H, W, C)
    states, boundary = xb[..., : C - 3], xb[..., C - 3 :]
    agg = jnp.mean(states, axis=1, keepdims=True) if use_average_share else jnp.sum(
        states, axis=1, keepdims=True
    )
    states = jnp.broadcast_to(agg, states.shape)
    return jnp.concatenate([states, boundary], axis=-1).reshape(Bnb, H, W, C)


def sample_noise(
    key: jax.Array, batch: int, num_boundaries: int, H: int, W: int, C: int
) -> jax.Array:
    """Noise with state channels shared across boundaries
    (`model/diffusion_2d.py:775-785`). Returns [B·nb, H, W, C]."""
    k1, k2 = jax.random.split(key)
    state = jax.random.normal(k1, (batch, 1, H, W, C - 3))
    state = jnp.broadcast_to(state, (batch, num_boundaries, H, W, C - 3))
    boundary = jax.random.normal(k2, (batch, num_boundaries, H, W, 3))
    return jnp.concatenate([state, boundary], axis=-1).reshape(
        batch * num_boundaries, H, W, C
    )


def asynchronous_clamp(x: jax.Array) -> jax.Array:
    """Per-channel-group clamps (`model/diffusion_2d.py:534-549`):
    states to [-1, 1], mask to [0, 1], offsets to [-0.5, 0.5]."""
    C = x.shape[-1]
    states = jnp.clip(x[..., : C - 3], -1.0, 1.0)
    mask = jnp.clip(x[..., C - 3 : C - 2], 0.0, 1.0)
    offs = jnp.clip(x[..., C - 2 :], -0.5, 0.5)
    return jnp.concatenate([states, mask, offs], axis=-1)


def _model_predictions(
    cfg: Diffusion2DConfig,
    sched: DiffusionSchedule,
    eps_model,
    x: jax.Array,
    t_b: jax.Array,
    num_boundaries: int,
    clip_denoised: bool = True,
):
    """p_mean_variance with boundary sharing (`model/diffusion_2d.py:727-773`)."""
    out = eps_model(x, t_b)
    if cfg.share_noise:
        out = share_states_over_boundaries(out, num_boundaries, cfg.use_average_share)
    pred = dd.model_prediction_from_output(sched, out, x, t_b, cfg.objective)
    x_start = jnp.clip(pred.pred_x_start, -1.0, 1.0) if clip_denoised else pred.pred_x_start
    if not cfg.share_noise:
        x_start = share_states_over_boundaries(x_start, num_boundaries, cfg.use_average_share)
    post = dd.q_posterior(sched, x_start, x, t_b)
    mean = post.mean
    if not cfg.share_noise:
        mean = share_states_over_boundaries(mean, num_boundaries, cfg.use_average_share)
    return mean, post.log_variance_clipped, x_start


def p_sample_2d(
    cfg: Diffusion2DConfig,
    sched: DiffusionSchedule,
    eps_model,
    x: jax.Array,
    t,
    key: jax.Array,
    *,
    batch: int,
    num_boundaries: int,
    design_fn: Optional[DesignGradFn] = None,
    design_guidance: str = "standard-alpha",
) -> tuple[jax.Array, jax.Array]:
    """One guided reverse step (`model/diffusion_2d.py:787-889`). Non-recurrence
    order preserved: noise added first, guidance subtracted after. Recurrence
    variants ("...-recurrence-K") re-noise back to level t K times like the
    1D sampler (`model/diffusion_2d.py:846-889`)."""
    import re as _re

    Bnb, H, W, C = x.shape
    t_b = jnp.full((Bnb,), t, dtype=jnp.int32)
    coeff_sched = cfg.coeff_ratio * jnp.flip(sched.betas)
    eta = coeff_sched[t]

    m = _re.match(r"^(.*?)(?:-recurrence-(\d+))?$", design_guidance)
    base, rec = m.group(1), int(m.group(2) or 0)

    def guidance_grad(x, x_start):
        if base == "standard":
            return cfg.standard_fixed_ratio * design_fn(x)
        if base == "standard-alpha":
            return eta * design_fn(x)
        if base == "universal-forward":
            return cfg.forward_fixed_ratio * design_fn(x_start)
        if base == "universal-backward":
            def body(kk, carry):
                xc, snap = carry
                gr = design_fn(xc)
                snap = jnp.where(kk == 1, cfg.forward_fixed_ratio * gr, snap)
                return xc - gr * cfg.backward_lr, snap

            xc, snap = jax.lax.fori_loop(
                0, cfg.backward_steps, body, (x_start, jnp.zeros_like(x_start))
            )
            delta = xc - x_start
            return snap - dd.extract(sched.backward_delta_coef, t_b, x.ndim) * delta
        raise ValueError(f"unknown design_guidance {design_guidance}")

    if rec == 0 or design_fn is None:
        mean, logvar, x_start = _model_predictions(
            cfg, sched, eps_model, x, t_b, num_boundaries
        )
        key, kn = jax.random.split(key)
        noise = sample_noise(kn, batch, num_boundaries, H, W, C)
        noise = jnp.where(t > 0, noise, jnp.zeros_like(noise))
        pred_img = mean + jnp.exp(0.5 * logvar) * noise
        if design_fn is not None:
            pred_img = pred_img - guidance_grad(x, x_start)
        return pred_img, x_start

    # recurrence: relax back to level t with state-shared noise each pass
    def rbody(r, carry):
        x_cur, _, _, key = carry
        key, k1 = jax.random.split(key)
        mean, logvar, x_start = _model_predictions(
            cfg, sched, eps_model, x_cur, t_b, num_boundaries
        )
        pred_img = mean - guidance_grad(x_cur, x_start)
        noise_prime = sample_noise(k1, batch, num_boundaries, H, W, C)
        nd = x_cur.ndim
        x_next = (
            dd.extract(sched.sqrt_alpha_ratio, t_b, nd) * pred_img
            + dd.extract(sched.sqrt_one_minus_alpha_ratio, t_b, nd) * noise_prime
        )
        return x_next, pred_img, x_start, key

    init = (x, jnp.zeros_like(x), jnp.zeros_like(x), key)
    _, pred_img, x_start, key = jax.lax.fori_loop(0, rec, rbody, init)
    logvar = dd.extract(sched.posterior_log_variance_clipped, t_b, x.ndim)
    key, kn = jax.random.split(key)
    noise = sample_noise(kn, batch, num_boundaries, H, W, C)
    noise = jnp.where(t > 0, noise, jnp.zeros_like(noise))
    return pred_img + jnp.exp(0.5 * logvar) * noise, x_start


def p_sample_loop_2d(
    cfg: Diffusion2DConfig,
    sched: DiffusionSchedule,
    eps_model,
    key: jax.Array,
    *,
    batch: int,
    num_boundaries: int,
    design_fn: Optional[DesignGradFn] = None,
    design_guidance: str = "standard-alpha",
    host_chunks: int = 1,
    mesh=None,
    init_bias: Optional[jax.Array] = None,
    station_pattern: Optional[jax.Array] = None,
    station_until: int = 0,
    region_mask: Optional[jax.Array] = None,
    progress: bool = False,
) -> jax.Array:
    """Full ancestral loop (`model/diffusion_2d.py:892-907`).
    Returns [B, nb, H, W, C]. ``host_chunks`` splits the loop into short
    device launches (identical numerics) to stay under the TPU runtime's
    long-launch watchdog on big configs.

    ``mesh`` shards the folded (batch·nb) axis over its 'data' axis —
    batch-sharded sampling; the per-sample boundary-share reduction is
    compiled by XLA into the needed collectives.

    ``init_bias`` ([B·nb, H, W, C] or broadcastable) is added to the x_T
    noise — the asymmetric per-boundary initialization ablation (VERDICT
    r2 #1): distinct spatial bumps in each boundary's mask channel break
    the symmetry that otherwise collapses nb≥2 designs onto one shape.

    ``station_pattern`` ([B·nb, H, W] per-boundary target mask, data units
    [0, 1]) + ``station_until``: q-sample-inpaint the MASK channel toward
    the pattern while t >= station_until, then release (the 1D
    cond-inpainting protocol, `model/diffusion_1d.py:1715-1718`, applied to
    the boundary mask). Round-4 finding: an x_T-only bias is washed out
    immediately and the separation-penalty gradient is crushed by the
    standard-alpha eta (coeff_ratio·β ≈ 2e-8..4e-6), so nb≥2 designs
    deterministically collapse onto one location (0/16 valid, all-overlap
    rejections); holding distinct proto-masks through the high-noise phase
    breaks the symmetry at the distribution level instead.

    ``region_mask`` ([B·nb, H, W] binary allowed-region indicator): inpaint
    the mask channel to ZERO outside each boundary's region at every step
    (exactly zero at t=0) — a per-boundary spatial-partition constraint.
    Round-4 second finding (raw-dump diagnosis): even proto-masks held to
    t=300 migrate back to the shared state's single-airfoil location in the
    remaining steps, because the prior's state channels can only carry one
    wake; constraining WHERE each mask may be non-zero (while leaving the
    shape free inside its region) makes non-overlap hold by construction
    without dictating the design."""
    H = W = cfg.image_size
    C = cfg.channels
    key, k0 = jax.random.split(key)
    img = sample_noise(k0, batch, num_boundaries, H, W, C)
    if init_bias is not None:
        img = img + init_bias
    if mesh is not None:
        from ..parallel import shard_design_batch

        img = shard_design_batch(mesh, img)

    def step(carry, t):
        img, key = carry
        key, k, k2 = jax.random.split(key, 3)
        img, _ = p_sample_2d(
            cfg, sched, eps_model, img, t, k,
            batch=batch, num_boundaries=num_boundaries,
            design_fn=design_fn, design_guidance=design_guidance,
        )
        if station_pattern is not None:
            t_b = jnp.full((img.shape[0],), t, dtype=jnp.int32)
            noisy = dd.q_sample(
                sched, station_pattern, t_b,
                jax.random.normal(k2, station_pattern.shape),
            )
            inpainted = jnp.concatenate(
                [img[..., : C - 3], noisy[..., None], img[..., C - 2 :]],
                axis=-1,
            )
            img = jnp.where(t >= station_until, inpainted, img)
        if region_mask is not None:
            t_b = jnp.full((img.shape[0],), t, dtype=jnp.int32)
            zero_noisy = dd.q_sample(
                sched, jnp.zeros_like(region_mask), t_b,
                jax.random.normal(k2, region_mask.shape),
            )
            zero_noisy = jnp.where(t > 0, zero_noisy, 0.0)
            cur = img[..., C - 3]
            constrained = region_mask * cur + (1.0 - region_mask) * zero_noisy
            img = jnp.concatenate(
                [img[..., : C - 3], constrained[..., None], img[..., C - 2 :]],
                axis=-1,
            )
        return (img, key), None

    ts = jnp.arange(cfg.timesteps - 1, -1, -1, dtype=jnp.int32)
    if host_chunks <= 1:
        (img, _), _ = jax.lax.scan(step, (img, key), ts)
        return img.reshape(batch, num_boundaries, H, W, C)

    assert cfg.timesteps % host_chunks == 0
    chunk = cfg.timesteps // host_chunks

    @jax.jit
    def run_chunk(img, key, ts_chunk):
        (img, key), _ = jax.lax.scan(step, (img, key), ts_chunk)
        return img, key

    for c in range(host_chunks):
        img, key = run_chunk(img, key, ts[c * chunk : (c + 1) * chunk])
        img.block_until_ready()
        if progress:
            # stderr liveness marker: lets a log-staleness watchdog tell a
            # wedged tunnel from a long compile (which is silent).
            print(f"[sample2d] chunk {c + 1}/{host_chunks}", file=sys.stderr,
                  flush=True)
    return img.reshape(batch, num_boundaries, H, W, C)


def ddim_sample_loop_2d(
    cfg: Diffusion2DConfig,
    sched: DiffusionSchedule,
    eps_model,
    key: jax.Array,
    *,
    batch: int,
    num_boundaries: int,
    sampling_timesteps: int,
    design_fn: Optional[DesignGradFn] = None,
    design_guidance: str = "standard-alpha",
    init_bias: Optional[jax.Array] = None,
) -> jax.Array:
    """A *working* guided DDIM for the 2D stack — the reference's 2D
    ddim_sample has a stale signature and is unreachable for guided design
    (`model/diffusion_2d.py:909-963`, SURVEY.md §7 hard-part 6). Guidance is
    applied as an x̂0 shift with the same coefficient schedules.
    ``init_bias`` matches p_sample_loop_2d's (added to x_T, e.g. the
    per-boundary symmetry-breaking bumps)."""
    H = W = cfg.image_size
    C = cfg.channels
    times, times_next = dd.ddim_times(cfg.timesteps, sampling_timesteps)
    key, k0 = jax.random.split(key)
    img = sample_noise(k0, batch, num_boundaries, H, W, C)
    if init_bias is not None:
        img = img + init_bias
    Bnb = batch * num_boundaries
    coeff_sched = cfg.coeff_ratio * jnp.flip(sched.betas)

    def step(carry, tt):
        img, key = carry
        t, t_next = tt
        key, kn = jax.random.split(key)
        t_b = jnp.full((Bnb,), t, dtype=jnp.int32)
        out = eps_model(img, t_b)
        if cfg.share_noise:
            out = share_states_over_boundaries(out, num_boundaries, cfg.use_average_share)
        pred = dd.model_prediction_from_output(
            sched, out, img, t_b, cfg.objective, clip_x_start=True, rederive_pred_noise=True
        )
        pred_noise, x_start = pred.pred_noise, pred.pred_x_start
        if design_fn is not None:
            if design_guidance == "standard":
                g = cfg.standard_fixed_ratio * design_fn(img)
            else:  # standard-alpha
                g = coeff_sched[t] * design_fn(img)
            x_start = jnp.clip(x_start - g, -1.0, 1.0)
            pred_noise = dd.predict_noise_from_start(sched, img, t_b, x_start)

        alpha = sched.alphas_cumprod[t]
        alpha_next = jnp.where(t_next >= 0, sched.alphas_cumprod[jnp.maximum(t_next, 0)], 1.0)
        sigma = cfg.ddim_sampling_eta * jnp.sqrt(
            (1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha)
        )
        c = jnp.sqrt(jnp.clip(1 - alpha_next - sigma**2, 0.0, None))
        noise = sample_noise(kn, batch, num_boundaries, H, W, C)
        img_next = x_start * jnp.sqrt(alpha_next) + c * pred_noise + sigma * noise
        img_next = jnp.where(t_next < 0, x_start, img_next)
        return (img_next, key), None

    (img, _), _ = jax.lax.scan(step, (img, key), (times, times_next))
    return img.reshape(batch, num_boundaries, H, W, C)


def p_losses_2d(
    cfg: Diffusion2DConfig,
    sched: DiffusionSchedule,
    eps_model,
    x_start: jax.Array,  # [B, H, W, pred_frames*3 + 3]
    cond: jax.Array,  # [B, H, W, cond_frames*3]
    key: jax.Array,
) -> jax.Array:
    """Training loss (`model/diffusion_2d.py:1003-1058`): with diffuse_cond,
    both cond and pred parts are diffused and the target is the concatenated
    noise; per-t SNR loss weights applied."""
    B = x_start.shape[0]
    kt, kn, kc = jax.random.split(key, 3)
    t = jax.random.randint(kt, (B,), 0, cfg.timesteps)
    noise = jax.random.normal(kn, x_start.shape, x_start.dtype)
    x = dd.q_sample(sched, x_start, t, noise)
    if cfg.diffuse_cond:
        noise_cond = jax.random.normal(kc, cond.shape, cond.dtype)
        cond_t = dd.q_sample(sched, cond, t, noise_cond)
        target = jnp.concatenate([noise_cond, noise], axis=-1)
    else:
        cond_t = cond
        target = noise
    xin = jnp.concatenate([cond_t, x], axis=-1)
    out = eps_model(xin, t)
    if not cfg.diffuse_cond:
        out = out[..., cond.shape[-1] :]

    if cfg.objective == "pred_noise":
        pass
    elif cfg.objective == "pred_x0":
        target = x_start
    elif cfg.objective == "pred_v":
        target = dd.predict_v(sched, x_start, t, noise)
    else:
        raise ValueError(cfg.objective)

    if cfg.loss_type == "l1":
        loss = jnp.abs(out - target)
    elif cfg.loss_type == "l2":
        loss = jnp.square(out - target)
    else:
        raise ValueError(cfg.loss_type)
    loss = jnp.mean(loss.reshape(B, -1), axis=-1)
    lw = (
        min_snr_loss_weight(sched, cfg.objective, cfg.min_snr_gamma)
        if cfg.min_snr_loss_weight
        else snr_loss_weight(sched, cfg.objective)
    )
    return jnp.mean(loss * lw[t])
