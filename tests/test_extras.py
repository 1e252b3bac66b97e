"""Tests for parity extras: CustomLoss, GNS noise, plotting."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from cindm_tpu.utils import (
    custom_l1_speed_loss,
    plot_field,
    plot_trajectories,
    random_walk_noise,
)


def test_custom_loss_zero_when_equal():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 8))
    assert float(custom_l1_speed_loss(x, x)) == 0.0
    assert float(custom_l1_speed_loss(x + 1, x)) > 0


def test_random_walk_noise_properties():
    n = random_walk_noise(jax.random.PRNGKey(1), (4, 6, 2), 0.1)
    assert n.shape == (4, 6, 2)
    np.testing.assert_allclose(np.asarray(n[:, 0]), 0)
    # integrated noise variance grows along the sequence
    assert float(jnp.var(n[:, -1])) > float(jnp.var(n[:, 1]))


def test_plots_write_files(tmp_path):
    p1 = str(tmp_path / "traj.png")
    p2 = str(tmp_path / "field.png")
    plot_trajectories(np.random.rand(2, 10, 8), target=(0.5, 0.5), path=p1)
    plot_field(np.random.rand(16, 16, 3), path=p2, titles=["u", "v", "p"])
    assert os.path.exists(p1) and os.path.exists(p2)
