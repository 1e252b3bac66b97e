"""Sampler behavior tests with an analytically-known ε-model.

If the true data distribution is N(mu, I) ... a perfect ε-model for a
Gaussian centered at mu is ε̂(x_t, t) = (x_t - sqrt(acp_t)·mu)/sqrt(1-acp_t).
Ancestral/DDIM sampling with that model must reproduce samples centered
near mu; guidance must pull samples toward the design target.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cindm_tpu.core import make_schedule
from cindm_tpu.sampling import (
    Diffusion1DConfig,
    GuidanceSpec,
    ddim_sample_loop,
    get_design_fn,
    p_losses,
    p_sample_loop,
    sample,
)

T = 100
SCHED = make_schedule(T, "cosine")
MU = 0.25


def perfect_eps_model(x, t):
    sa = SCHED.sqrt_alphas_cumprod[t][:, None, None]
    s1 = SCHED.sqrt_one_minus_alphas_cumprod[t][:, None, None]
    return (x - sa * MU) / s1


def test_ancestral_sampling_recovers_gaussian_mean():
    shape = (64, 8, 4)
    out = p_sample_loop(SCHED, perfect_eps_model, shape, jax.random.PRNGKey(0))
    m = float(jnp.mean(out))
    # posterior sampling of N(MU, I): batch mean near MU
    assert abs(m - MU) < 0.1, m


def test_ddim_sampling_recovers_gaussian_mean():
    shape = (64, 8, 4)
    out = ddim_sample_loop(
        SCHED, perfect_eps_model, shape, jax.random.PRNGKey(1), sampling_timesteps=25
    )
    assert abs(float(jnp.mean(out)) - MU) < 0.1
    assert out.shape == shape


def test_guidance_pulls_toward_target():
    # design objective: pull positions toward 0.8; guided mean must move up
    shape = (32, 8, 4)
    design_fn = get_design_fn(jnp.array([0.8, 0.8]), last_n_step=2, coef=0.05)
    base = p_sample_loop(SCHED, perfect_eps_model, shape, jax.random.PRNGKey(2))
    guided = p_sample_loop(
        SCHED, perfect_eps_model, shape, jax.random.PRNGKey(2),
        design_fn=design_fn, guidance=GuidanceSpec.parse("standard"),
    )
    pos = lambda x: x.reshape(32, 8, 1, 4)[..., -2:, :, :2]
    assert float(jnp.mean(pos(guided))) > float(jnp.mean(pos(base)))


@pytest.mark.parametrize(
    "g", ["standard", "standard-alpha", "universal-forward", "universal-backward",
          "standard-recurrence-2", "universal-backward-recurrence-2"]
)
def test_all_guidance_variants_run_finite(g):
    shape = (4, 8, 4)
    design_fn = get_design_fn(jnp.array([0.5, 0.5]), last_n_step=1, coef=0.1)
    out = ddim_sample_loop(
        SCHED, perfect_eps_model, shape, jax.random.PRNGKey(3),
        sampling_timesteps=10, design_fn=design_fn,
        guidance=GuidanceSpec.parse(g, backward_steps=2),
    )
    assert bool(jnp.all(jnp.isfinite(out)))


def test_guidance_spec_parse():
    s = GuidanceSpec.parse("standard-recurrence-10")
    assert s.base == "standard" and s.recurrence == 10
    s = GuidanceSpec.parse("universal-backward")
    assert s.base == "universal-backward" and s.recurrence == 0
    s = GuidanceSpec.parse("standard-alpha-recurrence-4")
    assert s.base == "standard-alpha" and s.recurrence == 4
    with pytest.raises(ValueError):
        GuidanceSpec.parse("bogus")


def test_cond_inpainting_clamps_first_steps():
    shape = (8, 8, 4)
    cond = jnp.full((8, 2, 4), 0.7)
    out = ddim_sample_loop(
        SCHED, perfect_eps_model, shape, jax.random.PRNGKey(4),
        sampling_timesteps=20, cond=cond,
    )
    np.testing.assert_allclose(np.asarray(out[:, :2]), 0.7, atol=1e-6)


def test_p_losses_decreases_for_better_model():
    cfg = Diffusion1DConfig(rollout_steps=8, timesteps=T)
    x0 = jnp.full((16, 8, 4), MU)
    key = jax.random.PRNGKey(5)
    good = p_losses(cfg, SCHED, perfect_eps_model, x0, None, key)
    bad = p_losses(cfg, SCHED, lambda x, t: jnp.zeros_like(x), x0, None, key)
    assert float(good) < float(bad)


def test_sample_dispatcher_composed_shapes():
    cfg = Diffusion1DConfig(rollout_steps=24, timesteps=20)
    sched = make_schedule(20, "cosine")

    def eps2body(x, t):  # fake 2-body model
        return x * 0.0

    out = sample(
        cfg, sched, eps2body, jax.random.PRNGKey(0), batch_size=2, feature_size=16,
        design_guidance="standard", n_composed=1, compose_start_step=4,
        compose_n_bodies=4, compose_mode="mean-inside",
    )
    assert out.shape == (2, 28, 16)


def test_host_chunks_identical_numerics():
    """Splitting the reverse loop into host-level chunks must not change
    the samples (same keys, same compiled step)."""
    shape = (4, 8, 4)
    a = p_sample_loop(SCHED, perfect_eps_model, shape, jax.random.PRNGKey(7))
    b = p_sample_loop(
        SCHED, perfect_eps_model, shape, jax.random.PRNGKey(7), host_chunks=4
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_design_fn_norm_factor_scales_gradient():
    # per-body normalization ablation (VERDICT r3 #3): norm_factor rescales
    # the whole objective, hence the guidance gradient, linearly
    import jax

    x = jax.random.normal(jax.random.PRNGKey(0), (3, 5, 8))
    f1 = get_design_fn(jnp.array([0.5, 0.5]), last_n_step=1, coef=0.2,
                       time_consistency_coef=0.2)
    f4 = get_design_fn(jnp.array([0.5, 0.5]), last_n_step=1, coef=0.2,
                       time_consistency_coef=0.2, norm_factor=0.25)
    g1 = jax.grad(f1)(x)
    g4 = jax.grad(f4)(x)
    assert jnp.allclose(g4, 0.25 * g1, rtol=1e-5)


def test_design_fn_vector_coefs_match_scalar_grads():
    """Per-sample coef vectors fold a coefficient sweep into the batch axis:
    grad of ONE batched objective must equal the per-sample grads obtained
    with scalar coefficients (benchmarks/run_sweep8.py relies on this)."""
    key = jax.random.PRNGKey(3)
    x = jax.random.uniform(key, (6, 8, 8))  # 2-body, 8 steps
    target = jnp.array([0.5, 0.5])
    coefs = jnp.array([0.1, 0.1, 0.2, 0.2, 0.4, 0.4])
    ccs = jnp.array([0.2, 0.6, 0.2, 0.6, 0.2, 0.6])
    f_vec = get_design_fn(target, last_n_step=1, coef=coefs,
                          time_consistency_coef=ccs)
    g_vec = jax.grad(f_vec)(x)
    for i in range(6):
        f_i = get_design_fn(target, last_n_step=1, coef=float(coefs[i]),
                            time_consistency_coef=float(ccs[i]))
        g_i = jax.grad(f_i)(x[i : i + 1])
        np.testing.assert_allclose(g_vec[i], g_i[0], rtol=1e-6, atol=1e-7)


def test_design_fn_vector_coef_zero_consistency_vector():
    """An all-zero consistency VECTOR must still trace (the static-zero
    shortcut only applies to scalar zero)."""
    x = jnp.ones((2, 4, 8)) * 0.3
    f = get_design_fn(jnp.array([0.5, 0.5]), last_n_step=1,
                      coef=jnp.array([0.2, 0.4]),
                      time_consistency_coef=jnp.zeros(2))
    g = jax.grad(f)(x)
    assert np.all(np.isfinite(np.asarray(g)))
