"""Guided reverse-diffusion samplers as `lax.scan` programs.

TPU-native re-design of `GaussianDiffusion1D`'s sampling machinery
(`model/diffusion_1d.py:1046-2376`): the 1000-step Python loop becomes a
single `lax.scan`; the recurrence ("time-travel") relaxation is an inner
`lax.fori_loop`; design-objective gradients are taken with `jax.grad`
*inside* the traced step. Everything jits once and runs fully on-device,
including composed multi-body denoising (see ``compose.py``) and the
q_sample-based conditioning inpainting (`model/diffusion_1d.py:1715-1718`).

Guidance variants follow "Universal Guidance for Diffusion Models" as the
reference implements them (`model/diffusion_1d.py:1059-1186`):
  standard, standard-alpha, universal-forward, universal-backward,
  each optionally with "-recurrence-K" self-recurrence.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Callable, Literal, Optional

import jax
import jax.numpy as jnp

from ..core import diffusion as dd
from ..core.schedules import DiffusionSchedule
from .compose import EpsModel

DesignFn = Callable[[jax.Array], jax.Array]  # x -> scalar objective


@dataclasses.dataclass(frozen=True)
class GuidanceSpec:
    """Parsed design_guidance string (`model/diffusion_1d.py:1059-1123`)."""

    base: Literal["standard", "standard-alpha", "universal-forward", "universal-backward"]
    recurrence: int = 0  # 0 = no recurrence loop; K = "-recurrence-K"
    backward_steps: int = 5
    backward_lr: float = 1.0

    @staticmethod
    def parse(s: str, backward_steps: int = 5, backward_lr: float = 1.0) -> "GuidanceSpec":
        m = re.match(r"^(standard-alpha|standard|universal-forward|universal-backward)"
                     r"(?:-recurrence-(\d+))?$", s)
        if not m:
            raise ValueError(f"unknown design_guidance {s!r}")
        rec = int(m.group(2)) if m.group(2) else 0
        return GuidanceSpec(m.group(1), rec, backward_steps, backward_lr)


def _guidance_grad(
    sched: DiffusionSchedule,
    spec: GuidanceSpec,
    design_fn: DesignFn,
    x: jax.Array,
    x_start: jax.Array,
    t_b: jax.Array,
) -> jax.Array:
    """grad_design_final for one reverse step (`model/diffusion_1d.py:1072-1106`)."""
    nd = x.ndim
    eta = dd.extract(sched.guidance_eta, t_b, nd)
    if spec.base == "standard":
        return jax.grad(design_fn)(x)
    if spec.base == "standard-alpha":
        return eta * jax.grad(design_fn)(x)
    if spec.base == "universal-forward":
        return eta * jax.grad(design_fn)(x_start)
    if spec.base == "universal-backward":
        # k inner GD steps on x̂0; grad snapshot at kk==1 scaled by η; then
        # Δx0 correction (`model/diffusion_1d.py:1092-1103`).
        assert spec.backward_steps >= 2, "universal-backward needs backward_steps >= 2"

        def body(kk, carry):
            xc, snap = carry
            g = jax.grad(design_fn)(xc)
            snap = jnp.where(kk == 1, eta * g, snap)
            return xc - g * spec.backward_lr, snap

        xc, snap = jax.lax.fori_loop(
            0, spec.backward_steps, body, (x_start, jnp.zeros_like(x_start))
        )
        delta_x0 = xc - x_start
        return snap - dd.extract(sched.backward_delta_coef, t_b, nd) * delta_x0
    raise ValueError(spec.base)


def _p_mean_variance(
    sched: DiffusionSchedule,
    eps_model: EpsModel,
    x: jax.Array,
    t_b: jax.Array,
    objective: str = "pred_noise",
    clip_denoised: bool = True,
):
    out = eps_model(x, t_b)
    pred = dd.model_prediction_from_output(sched, out, x, t_b, objective)
    x_start = jnp.clip(pred.pred_x_start, -1.0, 1.0) if clip_denoised else pred.pred_x_start
    post = dd.q_posterior(sched, x_start, x, t_b)
    return post.mean, post.log_variance_clipped, x_start


def _overwrite_initial(pred_img: jax.Array, initial_state_overwrite: Optional[jax.Array]):
    """Clamp the first steps to a fixed state (`model/diffusion_1d.py:1111-1117`)."""
    if initial_state_overwrite is None:
        return pred_img
    k = initial_state_overwrite.shape[1]
    return jnp.concatenate([initial_state_overwrite, pred_img[:, k:]], axis=1)


def p_sample_step(
    sched: DiffusionSchedule,
    eps_model: EpsModel,
    x: jax.Array,
    t: jax.Array,  # scalar int32
    key: jax.Array,
    *,
    design_fn: Optional[DesignFn] = None,
    guidance: Optional[GuidanceSpec] = None,
    initial_state_overwrite: Optional[jax.Array] = None,
    clip_denoised: bool = True,
    objective: str = "pred_noise",
) -> tuple[jax.Array, jax.Array]:
    """One guided ancestral reverse step (p_sample, `model/diffusion_1d.py:1046-1186`).

    Returns (x_{t-1}, x̂0). ``t`` is a traced scalar so this sits inside scan.
    """
    B = x.shape[0]
    t_b = jnp.full((B,), t, dtype=jnp.int32)

    def one_pass(x):
        mean, logvar, x_start = _p_mean_variance(
            sched, eps_model, x, t_b, objective, clip_denoised
        )
        if design_fn is not None:
            g = _guidance_grad(sched, guidance, design_fn, x, x_start, t_b)
            pred_img = mean - g
        else:
            pred_img = mean
        pred_img = _overwrite_initial(pred_img, initial_state_overwrite)
        return pred_img, logvar, x_start

    rec = guidance.recurrence if (guidance is not None and design_fn is not None) else 0
    if rec == 0:
        key_n, _ = jax.random.split(key)
        pred_img, logvar, x_start = one_pass(x)
    else:
        # self-recurrence: re-noise pred_img back to level t each iteration
        # (`model/diffusion_1d.py:1125-1182`)
        def body(r, carry):
            x_cur, _, _, key = carry
            key, k1 = jax.random.split(key)
            pred_img, logvar, x_start = one_pass(x_cur)
            noise_prime = jax.random.normal(k1, pred_img.shape, pred_img.dtype)
            nd = x_cur.ndim
            x_next = (
                dd.extract(sched.sqrt_alpha_ratio, t_b, nd) * pred_img
                + dd.extract(sched.sqrt_one_minus_alpha_ratio, t_b, nd) * noise_prime
            )
            return x_next, pred_img, x_start, key

        init = (x, jnp.zeros_like(x), jnp.zeros_like(x), key)
        _, pred_img, x_start, key_n = jax.lax.fori_loop(0, rec, body, init)
        logvar = dd.extract(sched.posterior_log_variance_clipped, t_b, x.ndim)

    noise = jax.random.normal(key_n, x.shape, x.dtype)
    noise = jnp.where(t > 0, noise, jnp.zeros_like(noise))
    return pred_img + jnp.exp(0.5 * logvar) * noise, x_start


def p_sample_loop(
    sched: DiffusionSchedule,
    eps_model: EpsModel,
    shape: tuple[int, ...],
    key: jax.Array,
    *,
    cond: Optional[jax.Array] = None,
    design_fn: Optional[DesignFn] = None,
    guidance: Optional[GuidanceSpec] = None,
    initial_state_overwrite: Optional[jax.Array] = None,
    clip_denoised: bool = True,
    objective: str = "pred_noise",
    init_img: Optional[jax.Array] = None,
    host_chunks: int = 1,
) -> jax.Array:
    """Full T→0 ancestral loop as one scan (`model/diffusion_1d.py:1655-1720`).

    ``cond`` (with conditioned_steps == 0 semantics) is inpainted into the
    first steps by re-noising it to level t each iteration
    (`model/diffusion_1d.py:1715-1718`).

    ``host_chunks`` > 1 splits the reverse loop into that many device
    launches (identical numerics): a single multi-minute launch can trip
    the TPU runtime's execution watchdog on heavy composed configs; short
    chunks keep the same compiled program (one compile, reused per chunk).
    """
    T = sched.num_timesteps
    key, k0 = jax.random.split(key)
    img = jax.random.normal(k0, shape) if init_img is None else init_img

    def step(carry, t):
        img, key = carry
        key, k1, k2 = jax.random.split(key, 3)
        img, _ = p_sample_step(
            sched, eps_model, img, t, k1,
            design_fn=design_fn, guidance=guidance,
            initial_state_overwrite=initial_state_overwrite,
            clip_denoised=clip_denoised, objective=objective,
        )
        if cond is not None:
            t_b = jnp.full((shape[0],), t, dtype=jnp.int32)
            noisy_cond = dd.q_sample(
                sched, cond, t_b, jax.random.normal(k2, cond.shape, cond.dtype)
            )
            img = img.at[:, : cond.shape[1], :].set(noisy_cond)
        return (img, key), None

    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    if host_chunks <= 1:
        (img, _), _ = jax.lax.scan(step, (img, key), ts)
        return img

    assert T % host_chunks == 0, (T, host_chunks)
    chunk = T // host_chunks

    @jax.jit
    def run_chunk(img, key, ts_chunk):
        (img, key), _ = jax.lax.scan(step, (img, key), ts_chunk)
        return img, key

    for c in range(host_chunks):
        img, key = run_chunk(img, key, ts[c * chunk : (c + 1) * chunk])
        img.block_until_ready()
    return img


def ddim_sample_loop(
    sched: DiffusionSchedule,
    eps_model: EpsModel,
    shape: tuple[int, ...],
    key: jax.Array,
    *,
    sampling_timesteps: int,
    eta: float = 0.0,
    cond: Optional[jax.Array] = None,
    design_fn: Optional[DesignFn] = None,
    guidance: Optional[GuidanceSpec] = None,
    initial_state_overwrite: Optional[jax.Array] = None,
    clip_denoised: bool = True,
    objective: str = "pred_noise",
    init_img: Optional[jax.Array] = None,
) -> jax.Array:
    """DDIM sampler (`model/diffusion_1d.py:1723-1804`), implemented *working*
    with guidance (the reference's guided-DDIM path returns a guided mean in
    place of pred_noise, a known quirk — SURVEY.md §7 "hard parts" #6; here
    guidance shifts x̂0 by the design gradient before the DDIM update).

    ``init_img`` replaces the internally-drawn x_T — used by the sharded
    CLIs to seed the loop with a batch-sharded array whose placement
    propagates through the scan."""
    T = sched.num_timesteps
    times, times_next = dd.ddim_times(T, sampling_timesteps)
    key, k0 = jax.random.split(key)
    img = jax.random.normal(k0, shape) if init_img is None else init_img
    B = shape[0]

    def step(carry, tt):
        img, key = carry
        t, t_next = tt
        key, k1, k2, k3 = jax.random.split(key, 4)
        t_b = jnp.full((B,), t, dtype=jnp.int32)
        out = eps_model(img, t_b)
        pred = dd.model_prediction_from_output(
            sched, out, img, t_b, objective, clip_x_start=clip_denoised
        )
        pred_noise, x_start = pred.pred_noise, pred.pred_x_start
        if design_fn is not None:
            g = _guidance_grad(sched, guidance, design_fn, img, x_start, t_b)
            x_start = x_start - g
            x_start = _overwrite_initial(x_start, initial_state_overwrite)
            pred_noise = dd.predict_noise_from_start(sched, img, t_b, x_start)

        alpha = sched.alphas_cumprod[t]
        alpha_next = jnp.where(t_next >= 0, sched.alphas_cumprod[jnp.maximum(t_next, 0)], 1.0)
        sigma = eta * jnp.sqrt((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha))
        c = jnp.sqrt(jnp.clip(1 - alpha_next - sigma**2, 0.0, None))
        noise = jax.random.normal(k1, img.shape, img.dtype)
        img_next = x_start * jnp.sqrt(alpha_next) + c * pred_noise + sigma * noise
        # final step: return x̂0 (matching `model/diffusion_1d.py:1782-1787`)
        img_next = jnp.where(t_next < 0, x_start, img_next)
        if cond is not None:
            noisy_cond = dd.q_sample(
                sched, cond, t_b, jax.random.normal(k2, cond.shape, cond.dtype)
            )
            inpaint = jnp.where(t_next < 0, cond, noisy_cond)
            img_next = img_next.at[:, : cond.shape[1], :].set(inpaint)
        return (img_next, key), None

    (img, _), _ = jax.lax.scan(step, (img, key), (times, times_next))
    return img
