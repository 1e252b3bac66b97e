"""GaussianDiffusion1D — trajectory diffusion, functional-style.

TPU-native re-design of `GaussianDiffusion1D` (`model/diffusion_1d.py:801-2501`):
a frozen config + pure functions over (params, arrays) instead of an
nn.Module holding buffers. The same config drives training loss,
unconditional sampling, guided sampling, and compositional sampling.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..core import diffusion as dd
from ..core.schedules import DiffusionSchedule, make_schedule
from .compose import EpsModel, make_composed_eps_model
from .sampler import GuidanceSpec, ddim_sample_loop, p_sample_loop


@dataclasses.dataclass(frozen=True)
class Diffusion1DConfig:
    """Mirrors `GaussianDiffusion1D.__init__` args (`model/diffusion_1d.py:802-822`)."""

    rollout_steps: int  # image_size
    conditioned_steps: int = 0
    timesteps: int = 1000
    sampling_timesteps: Optional[int] = None
    loss_type: str = "l1"
    objective: str = "pred_noise"
    beta_schedule: str = "cosine"
    ddim_sampling_eta: float = 0.0
    loss_weight_discount: float = 0.95
    backward_steps: int = 5
    backward_lr: float = 1.0

    @property
    def horizon(self) -> int:
        return self.conditioned_steps + self.rollout_steps

    def make_schedule(self) -> DiffusionSchedule:
        return make_schedule(self.timesteps, self.beta_schedule)


def p_losses(
    cfg: Diffusion1DConfig,
    sched: DiffusionSchedule,
    eps_model: EpsModel,
    x_start: jax.Array,  # [B, rollout_steps, F]
    cond: Optional[jax.Array],  # [B, conditioned_steps, F] or None
    key: jax.Array,
) -> jax.Array:
    """Training loss (`model/diffusion_1d.py:2438-2501`).

    Samples t ~ U[0, T), diffuses the rollout part, concatenates the clean
    cond on the time axis, predicts noise over the full horizon with a
    zero-noise target on cond steps, applies discounted per-step weights.
    """
    B, R, F = x_start.shape
    kt, kn = jax.random.split(key)
    t = jax.random.randint(kt, (B,), 0, cfg.timesteps)
    noise = jax.random.normal(kn, x_start.shape, x_start.dtype)
    x = dd.q_sample(sched, x_start, t, noise)
    x_start_full = x_start
    if cfg.conditioned_steps != 0:
        assert cond is not None and cond.shape[1] == cfg.conditioned_steps
        x = jnp.concatenate([cond, x], axis=1)
        target_noise = jnp.concatenate([jnp.zeros_like(cond), noise], axis=1)
        # pred_x0 / pred_v targets span the full horizon too (the clean cond
        # is the x0 target on cond steps, matching the zero-noise target)
        x_start_full = jnp.concatenate([cond, x_start], axis=1)
    else:
        target_noise = noise
    model_out = eps_model(x, t)
    if cfg.loss_type == "loss_type3":
        # CustomLoss: L1 + per-body |speed²| channel, unweighted
        # (`model/diffusion_1d.py:2485-2486`, `utils.py:951-962`)
        from ..utils.extras import custom_l1_speed_loss

        return custom_l1_speed_loss(model_out, target_noise)
    weight = dd.rollout_loss_weight(
        cfg.conditioned_steps, R, F, cfg.loss_weight_discount, x_start.dtype
    )
    return dd.diffusion_loss(
        sched, model_out, x_start_full, target_noise, t,
        objective=cfg.objective, loss_type=cfg.loss_type, loss_weight=weight,
    )


def sample_total_steps(
    cfg: Diffusion1DConfig,
    n_composed: int = 0,
    compose_start_step: int = 4,
    compose_n_bodies: int = 2,
) -> int:
    """Time length of the array `sample` denoises — mirrors its dispatch
    (composed: horizon + n_composed·start; conditioned: rollout only)."""
    if n_composed > 0 or compose_n_bodies > 2:
        return cfg.horizon + n_composed * compose_start_step
    if cfg.conditioned_steps > 0:
        return cfg.rollout_steps
    return cfg.horizon


def sample(
    cfg: Diffusion1DConfig,
    sched: DiffusionSchedule,
    eps_model: EpsModel,
    key: jax.Array,
    batch_size: int,
    feature_size: int,
    *,
    cond: Optional[jax.Array] = None,
    design_fn=None,
    design_guidance: str = "standard",
    n_composed: int = 0,
    compose_start_step: int = 4,
    compose_n_bodies: int = 2,
    compose_mode: str = "mean-inside",
    initial_state_overwrite: Optional[jax.Array] = None,
    sample_steps: Optional[int] = None,
    init_img: Optional[jax.Array] = None,
    host_chunks: int = 1,
    fold_chunks: int = 1,
) -> jax.Array:
    """Sampling dispatcher (`model/diffusion_1d.py:2329-2376`): DDIM when
    sample_steps < T, else full ancestral; composed ε-model when requested."""
    steps = sample_steps or cfg.sampling_timesteps or cfg.timesteps
    cond_for_loop = cond
    if n_composed > 0 or compose_n_bodies > 2:
        # Composition is requested only when there is actually something to
        # compose (extra windows or >2 bodies); a trivially-composed 2-body
        # model is the identity, so the plain path below is equivalent and
        # cheaper (`model/diffusion_1d.py:2339-2357` gates likewise on the
        # compose args the CLI passes).
        # "mean"/"noise_sum" = outside composition: per-pair x̂0 clipping
        # before aggregation (`model/diffusion_1d.py:1379-1652`)
        outside = "inside" not in compose_mode
        model = make_composed_eps_model(
            eps_model,
            compose_n_bodies=compose_n_bodies,
            n_composed=n_composed,
            compose_start_step=compose_start_step,
            single_model_step=cfg.horizon,
            compose_mode="sum-inside" if compose_mode == "noise_sum"
            else ("mean-inside" if outside else compose_mode),
            sched=sched,
            clip_pairwise_x_start=outside,
            fold_chunks=fold_chunks,
        )
        total_steps = cfg.horizon + n_composed * compose_start_step
    elif cfg.conditioned_steps > 0:
        # Conditioned model, no composition: concatenate the *clean* cond
        # into the denoiser input and diffuse only the rollout part — the
        # same semantics as training (p_losses) and the reference's
        # model_predictions for conditioned models, instead of q-sample
        # inpainting (which is the conditioned_steps==0 protocol,
        # `model/diffusion_1d.py:1715-1718`).
        assert cond is not None, "conditioned model needs cond at sampling"
        base, c, k = eps_model, cond, cfg.conditioned_steps

        def model(z, t):
            return base(jnp.concatenate([c, z], axis=1), t)[:, k:]

        total_steps = cfg.rollout_steps
        cond_for_loop = None
    else:
        model = eps_model
        total_steps = cfg.horizon

    shape = (batch_size, total_steps, feature_size)
    guidance = GuidanceSpec.parse(design_guidance, cfg.backward_steps, cfg.backward_lr)

    if steps < cfg.timesteps:
        return ddim_sample_loop(
            sched, model, shape, key,
            sampling_timesteps=steps, eta=cfg.ddim_sampling_eta,
            cond=cond_for_loop, design_fn=design_fn, guidance=guidance,
            initial_state_overwrite=initial_state_overwrite,
            objective=cfg.objective, init_img=init_img,
        )
    return p_sample_loop(
        sched, model, shape, key,
        cond=cond_for_loop, design_fn=design_fn, guidance=guidance,
        initial_state_overwrite=initial_state_overwrite,
        objective=cfg.objective, init_img=init_img, host_chunks=host_chunks,
    )
