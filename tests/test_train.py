"""Training-step tests: loss decreases on a fixed batch; EMA/LR semantics;
multi-device mesh sharding compiles and runs on the virtual 8-CPU mesh."""

import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp
import numpy as np

from cindm_tpu.core import make_schedule
from cindm_tpu.models import TemporalUnet1D
from cindm_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from cindm_tpu.sampling import Diffusion1DConfig
from cindm_tpu.train.trainer import (
    TrainConfig,
    init_train_state,
    make_optimizer,
    make_train_step,
    reference_lr_schedule,
)


def _setup(horizon=8, feat=8, dim=16):
    model = TemporalUnet1D(horizon=horizon, transition_dim=feat, dim=dim, attention=False)
    x = jnp.zeros((2, horizon, feat))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros(2, jnp.int32))
    dcfg = Diffusion1DConfig(rollout_steps=horizon, timesteps=50)
    sched = make_schedule(50, "cosine")
    return model, params, dcfg, sched


def test_lr_schedule_reference_semantics():
    cfg = TrainConfig()
    s = reference_lr_schedule(cfg)
    np.testing.assert_allclose(float(s(0)), cfg.lr, rtol=1e-6)
    np.testing.assert_allclose(float(s(599_999)), cfg.lr, rtol=1e-6)
    np.testing.assert_allclose(float(s(640_000)), cfg.lr * 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(s(680_000)), cfg.lr * 0.25, rtol=1e-6)


def test_loss_decreases_on_fixed_batch():
    model, params, dcfg, sched = _setup()
    tcfg = TrainConfig(ema_update_every=1)
    state = init_train_state(params, make_optimizer(tcfg))
    step = make_train_step(model.apply, dcfg, sched, tcfg)
    batch = {"x": jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8)) * 0.3}
    losses = []
    key = jax.random.PRNGKey(2)
    for i in range(30):
        state, loss = step(state, batch, jax.random.fold_in(key, i % 4))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_ema_updates_every_k_steps():
    model, params, dcfg, sched = _setup()
    tcfg = TrainConfig(ema_update_every=10)
    state = init_train_state(params, make_optimizer(tcfg))
    step = make_train_step(model.apply, dcfg, sched, tcfg)
    batch = {"x": jnp.ones((4, 8, 8)) * 0.1}
    p0 = jax.tree.leaves(state["ema_params"])[0].copy()
    # steps 1..9: ema frozen (update fires only when step % 10 == 0)
    for i in range(9):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(state["ema_params"])[0]), np.asarray(p0)
    )
    state, _ = step(state, batch, jax.random.PRNGKey(99))  # step 10 → EMA moves
    assert not np.array_equal(
        np.asarray(jax.tree.leaves(state["ema_params"])[0]), np.asarray(p0)
    )


def test_grad_accum_counts_optimizer_steps():
    """With gradient_accumulate_every=k, state['step'] counts applied
    optimizer updates (reference Trainer1D semantics: one step per
    opt.step() after its accumulation inner loop), not micro-batches."""
    model, params, dcfg, sched = _setup()
    tcfg = TrainConfig(gradient_accumulate_every=2)
    state = init_train_state(params, make_optimizer(tcfg))
    step = make_train_step(model.apply, dcfg, sched, tcfg)
    batch = {"x": jnp.ones((4, 8, 8)) * 0.1}
    p_init = jax.tree.leaves(params)[0].copy()
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    assert int(state["step"]) == 0  # first micro-batch: no update applied
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(state["params"])[0]), np.asarray(p_init)
    )
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    assert int(state["step"]) == 1  # second micro-batch: update applied
    assert not np.array_equal(
        np.asarray(jax.tree.leaves(state["params"])[0]), np.asarray(p_init)
    )
    for i in range(4):
        state, _ = step(state, batch, jax.random.PRNGKey(2 + i))
    assert int(state["step"]) == 3


def test_ema_warmup_copies_then_ramps():
    """ema_pytorch semantics: during the first update_after_step optimizer
    steps the EMA copies the online params; afterwards decay ramps up."""
    model, params, dcfg, sched = _setup()
    tcfg = TrainConfig(ema_update_every=1, ema_update_after_step=3)
    state = init_train_state(params, make_optimizer(tcfg))
    step = make_train_step(model.apply, dcfg, sched, tcfg)
    batch = {"x": jnp.ones((4, 8, 8)) * 0.1}
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    # warmup: ema == online exactly
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(state["ema_params"])[0]),
        np.asarray(jax.tree.leaves(state["params"])[0]),
    )
    # decay is still 0 at step update_after_step+1 (ramp k=0); step twice
    state, _ = step(state, batch, jax.random.PRNGKey(10))
    state, _ = step(state, batch, jax.random.PRNGKey(11))
    # past warmup: ema lags the online params (nonzero decay)
    assert not np.array_equal(
        np.asarray(jax.tree.leaves(state["ema_params"])[0]),
        np.asarray(jax.tree.leaves(state["params"])[0]),
    )


def test_train_step_on_8_device_mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    model, params, dcfg, sched = _setup()
    mesh = make_mesh(8, ("data",))
    tcfg = TrainConfig()
    state = init_train_state(params, make_optimizer(tcfg))
    state = replicate(mesh, state)
    step = make_train_step(model.apply, dcfg, sched, tcfg, mesh=mesh)
    batch = shard_batch(mesh, {"x": jnp.ones((16, 8, 8)) * 0.2})
    state, loss = step(state, batch, jax.random.PRNGKey(0))
    assert jnp.isfinite(loss)
    state, loss2 = step(state, batch, jax.random.PRNGKey(1))
    assert jnp.isfinite(loss2)


def test_sampling_eval_1d_perfect_model():
    """With a perfect ε-model the sampled trajectories concentrate at the
    data mean, so MAE vs a constant batch is small."""
    from cindm_tpu.core import make_schedule
    from cindm_tpu.sampling import Diffusion1DConfig
    from cindm_tpu.train import sampling_eval_1d

    T = 50
    sched = make_schedule(T)
    mu = 0.4

    def eps(x, t):
        sa = sched.sqrt_alphas_cumprod[t][:, None, None]
        s1 = sched.sqrt_one_minus_alphas_cumprod[t][:, None, None]
        return (x - sa * mu) / s1

    cfg = Diffusion1DConfig(rollout_steps=8, timesteps=T)
    batch = {"x": jnp.full((8, 8, 4), mu)}
    rec = sampling_eval_1d(cfg, sched, eps, batch, jax.random.PRNGKey(0), sample_steps=20)
    assert rec["sample_mae"] < 0.6  # unit-variance posterior noise bounds this
    assert np.isfinite(rec["sample_rmse"])
