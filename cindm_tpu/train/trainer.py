"""Training: one pjit-compiled step + EMA + checkpoints.

TPU-native re-design of `Trainer1D` (`model/diffusion_1d.py:2504-2990`):
instead of an Accelerate-wrapped Python loop with host-side EMA and
StepLR, the train step is a single jitted function over a device mesh —
loss → grad → global-norm clip 1.0 → Adam(1e-4, β=(0.9, 0.99)) → EMA —
with gradients reduced over the mesh 'data' axis by XLA collectives.

Reference hyperparameters preserved:
- Adam lr 1e-4, betas (0.9, 0.99)          `model/diffusion_1d.py:2610`
- grad clip 1.0                            `model/diffusion_1d.py:2839`
- EMA decay 0.995 applied every 10 steps, with ema_pytorch's warmup
  semantics (copy online params for the first `update_after_step` steps,
  then ramp decay as 1-(1+k)^-2/3 up to 0.995)
                                           `model/diffusion_1d.py:2617`
- StepLR(40000, 0.5) engaged only after step 600000
                                           `model/diffusion_1d.py:2612,2855-2856`

With gradient accumulation, ``state['step']`` counts *applied optimizer
updates* (the reference's step counts one per `opt.step()` after its
accumulation inner loop, `model/diffusion_1d.py:2723-2863`), so EMA
cadence, the LR schedule, and train_num_steps all match reference
semantics regardless of gradient_accumulate_every.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.schedules import DiffusionSchedule
from ..sampling.diffusion1d import Diffusion1DConfig, p_losses


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-4
    adam_b1: float = 0.9
    adam_b2: float = 0.99
    grad_clip: float = 1.0
    ema_decay: float = 0.995
    ema_update_every: int = 10
    # ema_pytorch defaults (reference EMA(beta=0.995, update_every=10),
    # `model/diffusion_1d.py:2617`): copy-only warmup then decay ramp
    ema_update_after_step: int = 100
    ema_inv_gamma: float = 1.0
    ema_power: float = 2.0 / 3.0
    ema_min_value: float = 0.0
    lr_decay_start: int = 600_000
    lr_decay_every: int = 40_000
    lr_decay_factor: float = 0.5
    gradient_accumulate_every: int = 1


def reference_lr_schedule(cfg: TrainConfig) -> optax.Schedule:
    """StepLR(40000, 0.5) engaged after step 600000 (see module docstring)."""

    def schedule(step):
        n = jnp.maximum(step - cfg.lr_decay_start, 0) // cfg.lr_decay_every
        return cfg.lr * cfg.lr_decay_factor ** n.astype(jnp.float32)

    return schedule


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.scale_by_adam(b1=cfg.adam_b1, b2=cfg.adam_b2),
        optax.scale_by_learning_rate(reference_lr_schedule(cfg)),
    )
    if cfg.gradient_accumulate_every > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulate_every)
    return tx


class TrainState(dict):
    """Lightweight pytree state dict: params, ema_params, opt_state, step."""


def init_train_state(params, tx: optax.GradientTransformation) -> dict:
    return {
        "params": params,
        "ema_params": jax.tree.map(jnp.copy, params),
        "opt_state": tx.init(params),
        "step": jnp.zeros((), jnp.int32),
    }


def make_train_step_from_loss(
    loss_fn: Callable,
    train_cfg: TrainConfig,
    mesh: Optional[Mesh] = None,
    steps_per_launch: int = 1,
    broadcast_batch: bool = False,
    tx: Optional[optax.GradientTransformation] = None,
) -> Callable:
    """Build a jitted train step from any loss_fn(params, batch, key)→scalar.

    ``broadcast_batch=True`` (with steps_per_launch>1) passes the SAME batch
    pytree to every micro-step instead of scanning over a stacked leading
    axis — for device-resident-dataset loss_fns that draw their own random
    batch from the passed arrays (keyed per micro-step). Passing the arrays
    as a jit argument keeps multi-GB datasets out of the compiled graph
    (closure constants get serialized into HLO).

    Returns step_fn(state, batch, key) -> (state, loss). When a mesh is
    given, the batch is sharded over its 'data' axis and params replicated
    (pjit-style via NamedSharding constraints); XLA inserts the psum.

    ``steps_per_launch > 1`` runs that many micro-steps inside ONE device
    launch via `lax.scan` (each batch leaf gains a leading [k] axis; the
    per-launch key is folded per micro-step). The reference dispatches one
    CUDA step per Python iteration (`model/diffusion_1d.py:2719`); on this
    TPU every launch pays a host↔device tunnel round trip that dwarfs the
    ~10 ms of compute in a step, so amortizing k steps per launch is the
    difference between ~4 and >25 optimizer steps/s at batch 512. Returned
    loss is the [k] per-micro-step loss vector (host logs the last entry).

    ``tx`` overrides the optimizer (must match the one used for
    ``init_train_state``) — used by the baseline harness for adamw /
    cosine-schedule variants (`le_pde/models.py:2594` build_optimizer).
    """
    if tx is None:
        tx = make_optimizer(train_cfg)

    def ema_decay_at(step):
        # ema_pytorch.EMA semantics (`model/diffusion_1d.py:2617` uses its
        # defaults): decay ramps as 1-(1+k/inv_gamma)^-power, clamped to
        # [min_value, beta]; while step <= update_after_step the EMA copies
        # the online params (decay 0).
        k = jnp.maximum(step - train_cfg.ema_update_after_step - 1, 0).astype(jnp.float32)
        d = 1.0 - (1.0 + k / train_cfg.ema_inv_gamma) ** (-train_cfg.ema_power)
        d = jnp.clip(d, train_cfg.ema_min_value, train_cfg.ema_decay)
        return jnp.where(step <= train_cfg.ema_update_after_step, 0.0, d)

    def ema_update(ema, params, step, applied):
        # applied once every `ema_update_every` *optimizer* steps
        do = applied & ((step % train_cfg.ema_update_every) == 0)
        d = jnp.where(do, ema_decay_at(step), 1.0)
        return jax.tree.map(lambda e, p: e * d + p * (1.0 - d), ema, params)

    def step_fn(state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(state["params"], batch, key)
        updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        if train_cfg.gradient_accumulate_every > 1:
            # MultiSteps applies an inner update every k-th call; count
            # real optimizer steps, not micro-batches.
            applied = opt_state.mini_step == 0
        else:
            applied = jnp.asarray(True)
        step = state["step"] + applied.astype(state["step"].dtype)
        ema = ema_update(state["ema_params"], params, step, applied)
        return (
            {"params": params, "ema_params": ema, "opt_state": opt_state, "step": step},
            loss,
        )

    if steps_per_launch > 1:
        single = step_fn

        if broadcast_batch:

            def step_fn(state, batch, key):  # noqa: F811 — scan-wrapped variant
                def body(st, i):
                    return single(st, batch, jax.random.fold_in(key, i))

                return jax.lax.scan(body, state, jnp.arange(steps_per_launch))

        else:

            def step_fn(state, batches, key):  # noqa: F811 — scan-wrapped variant
                def body(st, inp):
                    i, batch = inp
                    return single(st, batch, jax.random.fold_in(key, i))

                return jax.lax.scan(
                    body, state, (jnp.arange(steps_per_launch), batches)
                )

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    if broadcast_batch:
        data = repl  # device-resident dataset: replicate, draws are per-chip
    else:
        data = NamedSharding(
            mesh, P(*((None, "data") if steps_per_launch > 1 else ("data",)))
        )
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_train_step(
    model_apply: Callable,
    diffusion_cfg: Diffusion1DConfig,
    sched: DiffusionSchedule,
    train_cfg: TrainConfig,
    mesh: Optional[Mesh] = None,
    steps_per_launch: int = 1,
) -> Callable:
    """1D-diffusion train step (`Trainer1D`, `model/diffusion_1d.py:2504-2990`):
    batch = {'x': [B, rollout, F], 'cond': [B, cond, F] (optional)}."""

    def loss_fn(params, batch, key):
        eps_model = lambda x, t: model_apply(params, x, t)
        return p_losses(
            diffusion_cfg, sched, eps_model, batch["x"], batch.get("cond"), key
        )

    return make_train_step_from_loss(loss_fn, train_cfg, mesh, steps_per_launch)


def make_train_step_2d(
    model_apply: Callable,
    diffusion_cfg,
    sched: DiffusionSchedule,
    train_cfg: TrainConfig,
    mesh: Optional[Mesh] = None,
    steps_per_launch: int = 1,
) -> Callable:
    """2D-diffusion train step (`Trainer` 2D, `model/diffusion_2d.py:1097-1360`):
    batch = {'x': [B, H, W, pred·3+3], 'cond': [B, H, W, cond·3]}."""
    from ..sampling.diffusion2d import p_losses_2d

    def loss_fn(params, batch, key):
        eps_model = lambda x, t: model_apply(params, x, t)
        return p_losses_2d(
            diffusion_cfg, sched, eps_model, batch["x"], batch["cond"], key
        )

    return make_train_step_from_loss(loss_fn, train_cfg, mesh, steps_per_launch)
