"""Tests for the time-composition and EBM multi-body samplers."""

import jax
import jax.numpy as jnp
import numpy as np

from cindm_tpu.core import make_schedule
from cindm_tpu.sampling.compose_time import (
    autoregress_time_compose_sample,
    composing_time_sample,
    make_classifier_free_compose_eps,
    sample_compose_multibodies,
    sample_compose_multibodies_uhmc,
)

T = 50
SCHED = make_schedule(T, "cosine")
MU = 0.3


def perfect_cond_eps(x, t):
    # perfect ε for N(MU, I) over the full (cond+rollout) horizon
    sa = SCHED.sqrt_alphas_cumprod[t][:, None, None]
    s1 = SCHED.sqrt_one_minus_alphas_cumprod[t][:, None, None]
    return (x - sa * MU) / s1


def test_composing_time_sample_shapes_and_mean():
    cond = jnp.full((4, 4, 8), MU)
    img0, stitched = composing_time_sample(
        SCHED, perfect_cond_eps, batch=4, rollout_steps=20, conditioned_steps=4,
        feature_size=8, cond=cond, key=jax.random.PRNGKey(0),
        n_composed=2, sampling_timesteps=20,
    )
    assert img0.shape == (4, 20, 8)
    assert stitched.shape == (4, 40, 8)  # 2 full continuation windows
    assert abs(float(jnp.mean(img0)) - MU) < 0.2


def test_autoregress_time_compose_shapes():
    cond = jnp.full((2, 4, 8), MU)
    out = autoregress_time_compose_sample(
        SCHED, perfect_cond_eps, batch=2, rollout_steps=12, conditioned_steps=4,
        feature_size=8, cond=cond, key=jax.random.PRNGKey(1),
        n_composed=1, sampling_timesteps=10,
    )
    assert out.shape == (2, 24, 8)  # 2 full 12-frame windows
    assert bool(jnp.all(jnp.isfinite(out)))


def _linear_models(key):
    k1, k2 = jax.random.split(key)
    Wp = jax.random.normal(k1, (8, 8)) * 0.05
    Wu = jax.random.normal(k2, (4, 4)) * 0.05
    return (lambda x, t: x @ Wp), (lambda x, t: x @ Wu), Wp, Wu


def test_classifier_free_compose_matches_reference_4body():
    """Check the generalized pair-scatter against the reference's hardcoded
    4-body wiring (`model/diffusion_1d.py:1901-1904`)."""
    pair, unc, Wp, Wu = _linear_models(jax.random.PRNGKey(0))
    eps = make_classifier_free_compose_eps(pair, unc, 4, coefficient=1.4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16))
    t = jnp.array([3, 7])
    got = np.asarray(eps(x, t))

    xb = np.asarray(x).reshape(2, 6, 4, 4)
    bodies = [xb[:, :, i] for i in range(4)]
    pairs = {}
    for i in range(4):
        for j in range(i + 1, 4):
            e = np.asarray(jnp.concatenate([bodies[i], bodies[j]], -1) @ Wp)
            pairs[(i, j)] = e
    want = np.zeros_like(got).reshape(2, 6, 4, 4)
    for b in range(4):
        acc = np.zeros((2, 6, 4), np.float32)
        for (i, j), e in pairs.items():
            if i == b:
                acc += e[..., :4]
            if j == b:
                acc += e[..., 4:]
        want[:, :, b] = acc - 1.4 * np.asarray(bodies[b] @ Wu)
    np.testing.assert_allclose(got, want.reshape(2, 6, 16), rtol=1e-4, atol=1e-5)


def test_ula_and_uhmc_samplers_run_finite():
    pair, unc, _, _ = _linear_models(jax.random.PRNGKey(2))
    eps = make_classifier_free_compose_eps(pair, unc, 4)
    cond = jnp.zeros((2, 1, 16))
    out = sample_compose_multibodies(
        SCHED, eps, cond, rollout_steps=8, key=jax.random.PRNGKey(3),
        langevin_steps=2, t_switch=25, conditioned_steps=1,
    )
    assert out.shape == (2, 8, 16)
    assert bool(jnp.all(jnp.isfinite(out)))
    out2 = sample_compose_multibodies_uhmc(
        SCHED, eps, cond, rollout_steps=8, key=jax.random.PRNGKey(4),
        leapfrog_steps=2, t_switch=25, conditioned_steps=1,
    )
    assert out2.shape == (2, 8, 16)
    assert bool(jnp.all(jnp.isfinite(out2)))
