"""2D diffusion training smoke tests + checkpoint round-trip."""

import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp
import numpy as np

from cindm_tpu.core import make_schedule
from cindm_tpu.models.unet2d import Unet2D
from cindm_tpu.sampling.diffusion2d import (
    Diffusion2DConfig,
    p_losses_2d,
    p_sample_loop_2d,
)
from cindm_tpu.train import (
    CheckpointManager,
    TrainConfig,
    init_train_state,
    make_optimizer,
    make_train_step_2d,
)


def _setup(hw=16, frames=2, cond=1):
    cfg = Diffusion2DConfig(
        image_size=hw, frames=frames + cond, cond_frames=cond, pred_frames=frames,
        timesteps=20, beta_schedule="sigmoid", loss_type="l2",
    )
    model = Unet2D(dim=8, dim_mults=(1, 2), channels=cfg.channels)
    x = jnp.zeros((1, hw, hw, cfg.channels))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros(1, jnp.int32))
    sched = make_schedule(cfg.timesteps, cfg.beta_schedule)
    return cfg, model, params, sched


def test_2d_loss_decreases():
    cfg, model, params, sched = _setup()
    tcfg = TrainConfig(ema_update_every=1)
    state = init_train_state(params, make_optimizer(tcfg))
    step = make_train_step_2d(model.apply, cfg, sched, tcfg)
    key = jax.random.PRNGKey(1)
    batch = {
        "x": jax.random.normal(key, (4, 16, 16, 9)) * 0.3,  # 2 frames*3 + 3
        "cond": jax.random.normal(key, (4, 16, 16, 3)) * 0.3,
    }
    losses = []
    for i in range(20):
        state, loss = step(state, batch, jax.random.fold_in(key, i % 2))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_2d_steps_per_launch_matches_stepwise():
    """k-fused launches advance the same optimizer-step count and keep the
    loss finite (the scan wraps the identical per-step function)."""
    cfg, model, params, sched = _setup()
    tcfg = TrainConfig(ema_update_every=1)
    state = init_train_state(params, make_optimizer(tcfg))
    step = make_train_step_2d(model.apply, cfg, sched, tcfg, steps_per_launch=3)
    key = jax.random.PRNGKey(1)
    batch = {
        "x": jax.random.normal(key, (3, 4, 16, 16, 9)) * 0.3,
        "cond": jax.random.normal(key, (3, 4, 16, 16, 3)) * 0.3,
    }
    state, losses = step(state, batch, key)
    assert losses.shape == (3,)
    assert np.all(np.isfinite(np.asarray(losses)))
    assert int(state["step"]) == 3


def test_2d_sampling_shapes_and_sharing():
    cfg, model, params, sched = _setup()
    eps = lambda x, t: model.apply(params, x, t)
    out = p_sample_loop_2d(
        cfg, sched, eps, jax.random.PRNGKey(2), batch=2, num_boundaries=2,
    )
    assert out.shape == (2, 2, 16, 16, cfg.channels)  # (frames·3 + 3)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_checkpoint_roundtrip(tmp_path):
    cfg, model, params, sched = _setup()
    tcfg = TrainConfig()
    state = init_train_state(params, make_optimizer(tcfg))
    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    mngr.save(1, state)
    restored = mngr.load(1, template=state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert mngr.latest_milestone() == 1


def test_2d_recurrence_guidance_runs():
    cfg, model, params, sched = _setup()
    eps = lambda x, t: model.apply(params, x, t)
    # design_fn returns the gradient directly (2D convention)
    design_fn = lambda x: 0.01 * x
    out = p_sample_loop_2d(
        cfg, sched, eps, jax.random.PRNGKey(5), batch=1, num_boundaries=2,
        design_fn=design_fn, design_guidance="standard-alpha-recurrence-2",
    )
    assert out.shape == (1, 2, 16, 16, cfg.channels)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_2d_guided_ddim_with_init_bias():
    """Guided DDIM (CLI --ddim_steps) must run S < T reverse steps, honor
    init_bias, and stay finite; with zero guidance and the same key its
    output differs from the biased run (the bias must matter)."""
    from cindm_tpu.sampling.diffusion2d import ddim_sample_loop_2d

    cfg, model, params, sched = _setup()
    eps = lambda x, t: model.apply(params, x, t)
    bias = jnp.zeros((2 * 2, 16, 16, cfg.channels)).at[..., -3].set(0.5)
    kw = dict(batch=2, num_boundaries=2, sampling_timesteps=5,
              design_fn=lambda x: 0.01 * x, design_guidance="standard-alpha")
    out = ddim_sample_loop_2d(cfg, sched, eps, jax.random.PRNGKey(3),
                              init_bias=bias, **kw)
    assert out.shape == (2, 2, 16, 16, cfg.channels)
    assert bool(jnp.all(jnp.isfinite(out)))
    out0 = ddim_sample_loop_2d(cfg, sched, eps, jax.random.PRNGKey(3), **kw)
    assert float(jnp.max(jnp.abs(out - out0))) > 1e-4


def test_2d_station_inpainting_holds_then_releases():
    """station_pattern + station_until: the mask channel tracks the
    q-sampled proto-blobs while t >= station_until (the nb>=2 symmetry
    breaker — round-4 fix for the all-overlap collapse). With
    station_until=1 the final mask must correlate with the pattern far
    more than an unconstrained run."""
    cfg, model, params, sched = _setup()
    eps = lambda x, t: model.apply(params, x, t)
    hw = cfg.image_size
    # two disjoint quadrant blobs, one per boundary
    pat = np.zeros((2, 2, hw, hw), np.float32)
    pat[:, 0, 2:6, 2:6] = 1.0
    pat[:, 1, 10:14, 10:14] = 1.0
    pattern = jnp.asarray(pat.reshape(4, hw, hw))

    out = p_sample_loop_2d(
        cfg, sched, eps, jax.random.PRNGKey(7), batch=2, num_boundaries=2,
        station_pattern=pattern, station_until=1,
    )
    assert out.shape == (2, 2, hw, hw, cfg.channels)
    assert bool(jnp.all(jnp.isfinite(out)))
    mask = np.asarray(out[..., -3]).reshape(4, hw, hw)
    pat_np = np.asarray(pattern)
    # inpainted until t=1: the final mask should match the pattern region
    in_blob = (mask * pat_np).sum() / pat_np.sum()
    out_blob = (mask * (1 - pat_np)).sum() / (1 - pat_np).sum()
    assert in_blob > out_blob + 0.3, (in_blob, out_blob)

    # released early (station_until = T): pattern only touches x_T level,
    # shapes still valid
    out2 = p_sample_loop_2d(
        cfg, sched, eps, jax.random.PRNGKey(7), batch=2, num_boundaries=2,
        station_pattern=pattern, station_until=cfg.timesteps - 1,
    )
    assert bool(jnp.all(jnp.isfinite(out2)))


def test_2d_region_partition_constrains_masks():
    """region_mask: the mask channel is zero-inpainted outside each
    boundary's band at every step — non-overlap by construction (round-4
    second fix for the nb>=2 collapse)."""
    cfg, model, params, sched = _setup()
    eps = lambda x, t: model.apply(params, x, t)
    hw = cfg.image_size
    reg = np.zeros((2, 2, hw, hw), np.float32)
    reg[:, 0, : hw // 2 - 1] = 1.0   # boundary 0: top band
    reg[:, 1, hw // 2 + 1 :] = 1.0   # boundary 1: bottom band
    region = jnp.asarray(reg.reshape(4, hw, hw))
    out = p_sample_loop_2d(
        cfg, sched, eps, jax.random.PRNGKey(9), batch=2, num_boundaries=2,
        region_mask=region,
    )
    mask = np.asarray(out[..., -3]).reshape(4, hw, hw)
    outside = np.abs(mask * (1 - reg.reshape(4, hw, hw)))
    assert outside.max() < 1e-6, outside.max()
    assert bool(jnp.all(jnp.isfinite(out)))
