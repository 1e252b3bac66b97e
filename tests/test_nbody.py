"""Physics conservation and correctness tests for the n-body simulator."""

import jax
import jax.numpy as jnp
import numpy as np

from cindm_tpu.physics.nbody import (
    RADIUS,
    eval_simu,
    generate_initial_states,
    simulate,
)


def _energy(traj):
    # equal masses, elastic: kinetic energy conserved
    v = traj[..., 2:]
    return jnp.sum(v * v, axis=(-1, -2))  # [B, steps]


def test_free_flight_straight_line():
    # one ball in the middle, slow: x(t) = x0 + v*t*dt, no collisions
    state = jnp.array([[[100.0, 100.0, 30.0, -12.0]]])
    traj = simulate(state, 60)
    dt = 1 / 60.0
    t = np.arange(60)
    np.testing.assert_allclose(
        np.asarray(traj[0, :, 0, 0]), 100.0 + 30.0 * t * dt, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(traj[0, :, 0, 1]), 100.0 - 12.0 * t * dt, rtol=1e-5
    )


def test_wall_bounce_reflects_velocity_and_conserves_energy():
    state = jnp.array([[[30.0, 100.0, -100.0, 0.0]]])  # heading at left wall
    traj = simulate(state, 200)
    # must have bounced: final vx positive
    assert float(traj[0, -1, 0, 2]) > 0
    # stays in box
    assert float(jnp.min(traj[..., 0])) >= RADIUS - 1e-3
    e = _energy(traj)
    np.testing.assert_allclose(np.asarray(e[0]), float(e[0, 0]), rtol=1e-5)


def test_head_on_equal_mass_collision_swaps_velocities():
    # two balls approaching head-on along x: elastic equal-mass head-on
    # collision exchanges velocities
    state = jnp.array(
        [[[60.0, 100.0, 50.0, 0.0], [140.0, 100.0, -50.0, 0.0]]]
    )
    # gap = 80 - 2r = 40 units, closing at 100 u/s → collision near step 24;
    # check shortly after (before any wall bounce)
    traj = simulate(state, 40)
    v_after = np.asarray(traj[0, -1, :, 2])
    np.testing.assert_allclose(v_after, [-50.0, 50.0], atol=1e-3)
    e = _energy(traj)
    np.testing.assert_allclose(np.asarray(e[0]), float(e[0, 0]), rtol=1e-4)


def test_momentum_conserved_in_pair_collisions():
    # no walls hit in this window: total momentum conserved through collision
    state = jnp.array(
        [[[80.0, 100.0, 40.0, 10.0], [120.0, 102.0, -40.0, -5.0]]]
    )
    traj = simulate(state, 60)
    p = jnp.sum(traj[..., 2:], axis=-2)  # [B, steps, 2]
    np.testing.assert_allclose(
        np.asarray(p[0]), np.asarray(p[0, 0])[None].repeat(60, 0), atol=1e-3
    )


def test_energy_conserved_many_body():
    key = jax.random.PRNGKey(0)
    state = generate_initial_states(key, 8, 4)
    traj = simulate(state, 400)
    e = np.asarray(_energy(traj))
    np.testing.assert_allclose(e, np.broadcast_to(e[:, :1], e.shape), rtol=2e-2)
    # all bodies stay inside the box
    assert float(jnp.min(traj[..., :2])) >= RADIUS - 1.0
    assert float(jnp.max(traj[..., :2])) <= 200.0 - RADIUS + 1.0


def test_generate_initial_states_no_overlap():
    key = jax.random.PRNGKey(42)
    state = generate_initial_states(key, 64, 8)
    pos = state[..., :2]
    d = jnp.linalg.norm(pos[:, :, None] - pos[:, None, :], axis=-1)
    d = d + jnp.eye(8)[None] * 1e9
    assert float(jnp.min(d)) >= 2 * RADIUS - 1e-3


def test_eval_simu_shapes_and_objective():
    key = jax.random.PRNGKey(1)
    state = generate_initial_states(key, 4, 2)  # [4, 2, 4]
    cond = (state.reshape(4, 1, 8)) / 200.0
    design_fn = lambda traj: jnp.mean(traj)
    pred, obj = eval_simu(cond, design_fn, n_bodies=2, rollout_steps=24, time_interval=4)
    assert pred.shape == (4, 24, 8)
    assert jnp.isfinite(obj)
    # normalized positions in [0, 1]
    p = pred.reshape(4, 24, 2, 4)[..., :2]
    assert float(jnp.min(p)) >= 0.0 and float(jnp.max(p)) <= 1.0
