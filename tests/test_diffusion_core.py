"""Property tests for the pure DDPM functions: q_sample / predict round-trips,
posterior correctness, loss weights."""

import jax
import jax.numpy as jnp
import numpy as np

from cindm_tpu.core import (
    diffusion_loss,
    make_schedule,
    model_prediction_from_output,
    predict_noise_from_start,
    predict_start_from_noise,
    predict_start_from_v,
    predict_v,
    q_posterior,
    q_sample,
    rollout_loss_weight,
)

SCHED = make_schedule(100, "cosine")


def _rand(key, shape):
    return jax.random.normal(key, shape)


def test_q_sample_predict_start_roundtrip():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x0 = _rand(k1, (4, 24, 8))
    noise = _rand(k2, (4, 24, 8))
    t = jnp.array([0, 10, 50, 99])
    xt = q_sample(SCHED, x0, t, noise)
    x0_rec = predict_start_from_noise(SCHED, xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-3)
    noise_rec = predict_noise_from_start(SCHED, xt, t, x0)
    np.testing.assert_allclose(np.asarray(noise_rec), np.asarray(noise), atol=1e-3)


def test_v_parameterization_roundtrip():
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    x0 = _rand(k1, (2, 24, 8))
    noise = _rand(k2, (2, 24, 8))
    t = jnp.array([5, 70])
    xt = q_sample(SCHED, x0, t, noise)
    v = predict_v(SCHED, x0, t, noise)
    x0_rec = predict_start_from_v(SCHED, xt, t, v)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)


def test_q_posterior_at_t0_returns_x_start():
    # at t=0: acp_prev=1, coef1 = beta_0*1/(1-acp_0) = (1-a0)/(1-a0) = 1, coef2 = 0
    x0 = jnp.ones((1, 4, 2)) * 0.3
    xt = jnp.ones((1, 4, 2)) * -0.7
    t = jnp.array([0])
    post = q_posterior(SCHED, x0, xt, t)
    np.testing.assert_allclose(np.asarray(post.mean), 0.3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(post.variance), 0.0, atol=1e-7)


def test_model_prediction_objectives_consistent():
    key = jax.random.PRNGKey(2)
    k1, k2 = jax.random.split(key)
    x0 = jnp.clip(_rand(k1, (2, 8, 4)) * 0.3, -1, 1)
    noise = _rand(k2, (2, 8, 4))
    t = jnp.array([20, 60])
    xt = q_sample(SCHED, x0, t, noise)
    # feeding the true quantity under each objective recovers (noise, x0)
    p1 = model_prediction_from_output(SCHED, noise, xt, t, "pred_noise")
    p2 = model_prediction_from_output(SCHED, x0, xt, t, "pred_x0")
    v = predict_v(SCHED, x0, t, noise)
    p3 = model_prediction_from_output(SCHED, v, xt, t, "pred_v")
    for p in (p1, p2, p3):
        np.testing.assert_allclose(np.asarray(p.pred_x_start), np.asarray(x0), atol=1e-3)
        np.testing.assert_allclose(np.asarray(p.pred_noise), np.asarray(noise), atol=1e-3)


def test_rollout_loss_weight_matches_reference_semantics():
    # reference: weight_steps[i] = 0.95**(i+1), ones on cond steps
    w = rollout_loss_weight(4, 20, 8, 0.95)
    assert w.shape == (24, 8)
    np.testing.assert_allclose(np.asarray(w[:4]), 1.0)
    np.testing.assert_allclose(np.asarray(w[4]), 0.95, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(w[-1]), 0.95**20, rtol=1e-5)
    w0 = rollout_loss_weight(0, 24, 8, 0.95)
    assert w0.shape == (24, 8)
    np.testing.assert_allclose(np.asarray(w0[0]), 0.95, rtol=1e-6)


def test_diffusion_loss_zero_when_exact():
    key = jax.random.PRNGKey(3)
    x0 = _rand(key, (2, 24, 8))
    noise = _rand(jax.random.PRNGKey(4), (2, 24, 8))
    t = jnp.array([10, 20])
    loss = diffusion_loss(SCHED, noise, x0, noise, t, objective="pred_noise", loss_type="l1")
    assert float(loss) == 0.0
    loss2 = diffusion_loss(
        SCHED, noise + 0.1, x0, noise, t, objective="pred_noise", loss_type="l2"
    )
    np.testing.assert_allclose(float(loss2), 0.01, rtol=1e-5)
