"""Vmapped JAX elastic-ball simulator — the n-body ground-truth oracle.

TPU-native replacement for the reference's pymunk/Chipmunk2D simulator
(`data/nbody_simulation.py:54-116`, `utils.py:1009-1125`): N rigid discs
(radius 20, mass 1, elasticity 1.0, no gravity) inside a 200×200 box,
stepped at dt = 1/60. Instead of a host-side C physics engine per
trajectory, the whole batch integrates on-device under one ``lax.scan``
(static shapes, dense [n, n] pair resolution — n ≤ 8 so the pair tensor
is tiny), which makes closed-loop design evaluation (`utils.py:1127-1148`)
a pure XLA program that can be vmapped/sharded over candidate designs.

Physics semantics (matching Chipmunk for equal-mass frictionless discs
with elasticity 1):
- ball-ball: exchange of the normal velocity components when overlapping
  and approaching (impulse j = -(1+e)/2 * v_rel·n for equal masses, e=1
  → swap), plus positional de-penetration split equally.
- ball-wall: reflect the wall-normal velocity when beyond the wall at
  distance r and moving outward; clamp position back to the legal box.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

WIDTH = 200.0
HEIGHT = 200.0
RADIUS = 20.0
DT = 1.0 / 60.0


def _resolve_walls(pos: jax.Array, vel: jax.Array, radius: float, width: float, height: float):
    lo = jnp.array([radius, radius])
    hi = jnp.array([width - radius, height - radius])
    below = pos < lo
    above = pos > hi
    # reflect velocity only if moving further out of bounds
    flip = (below & (vel < 0)) | (above & (vel > 0))
    vel = jnp.where(flip, -vel, vel)
    pos = jnp.clip(pos, lo, hi)
    return pos, vel


def _resolve_pairs(pos: jax.Array, vel: jax.Array, radius: float):
    """One pass of pairwise elastic collision resolution. pos/vel: [n, 2]."""
    n = pos.shape[0]
    if n < 2:
        return pos, vel
    dp = pos[:, None, :] - pos[None, :, :]  # [n, n, 2], i - j
    dist = jnp.sqrt(jnp.sum(dp * dp, axis=-1) + 1e-12)
    eye = jnp.eye(n, dtype=bool)
    overlapping = (dist < 2 * radius) & ~eye
    normal = dp / dist[..., None]  # from j to i
    dv = vel[:, None, :] - vel[None, :, :]  # v_i - v_j
    approaching = jnp.sum(dv * normal, axis=-1) < 0.0
    colliding = overlapping & approaching
    # equal masses, e = 1: each body's velocity changes by -(v_rel·n) n
    vn = jnp.sum(dv * normal, axis=-1)  # [n, n]
    impulse = jnp.where(colliding, vn, 0.0)[..., None] * normal  # [n, n, 2]
    # each colliding pair contributes -impulse to body i (sum over j)
    vel = vel - jnp.sum(impulse, axis=1)
    # positional de-penetration: push each body half the overlap along n
    pen = jnp.where(overlapping, 2 * radius - dist, 0.0)
    push = 0.5 * pen[..., None] * normal
    pos = pos + jnp.sum(push, axis=1)
    return pos, vel


@partial(jax.jit, static_argnames=("n_steps", "radius", "width", "height", "dt"))
def simulate(
    state0: jax.Array,
    n_steps: int,
    radius: float = RADIUS,
    width: float = WIDTH,
    height: float = HEIGHT,
    dt: float = DT,
) -> jax.Array:
    """Roll out a batch of n-body systems.

    Args:
        state0: [B, n, 4] (x, y, vx, vy) in box units (0..200).
        n_steps: number of dt steps.

    Returns:
        [B, n_steps, n, 4] trajectory; step i records the state *before*
        integration step i, like the reference recorder
        (`data/nbody_simulation.py:94-108` records then steps).
    """

    def step(carry, _):
        pos, vel = carry
        recorded = jnp.concatenate([pos, vel], axis=-1)
        pos = pos + vel * dt
        pos, vel = jax.vmap(_resolve_pairs, in_axes=(0, 0, None))(pos, vel, radius)
        pos, vel = _resolve_walls(pos, vel, radius, width, height)
        return (pos, vel), recorded

    pos0, vel0 = state0[..., :2], state0[..., 2:]
    _, traj = jax.lax.scan(step, (pos0, vel0), None, length=n_steps)
    return jnp.transpose(traj, (1, 0, 2, 3))


def eval_simu(
    cond_design: jax.Array,
    design_fn,
    n_bodies: int,
    rollout_steps: int,
    time_interval: int = 4,
):
    """On-device re-simulation scoring of a designed state (`utils.py:1127-1148`).

    Args:
        cond_design: [B, steps, n_bodies*4] normalized (/200) trajectory; the
            last step is taken as the designed initial state.
        design_fn: objective over the normalized re-simulated trajectory.

    Returns:
        (pred_simu [B, rollout_steps, n_bodies*4] normalized, design_obj scalar)
    """
    state = cond_design[:, -1, :] * 200.0
    state = state.reshape(state.shape[0], n_bodies, 4)
    traj = simulate(state, rollout_steps * time_interval)
    traj = traj.reshape(traj.shape[0], traj.shape[1], -1)
    traj = traj[:, time_interval - 1 :: time_interval] / 200.0
    return traj, design_fn(traj)


def generate_initial_states(
    key: jax.Array,
    n_sims: int,
    n_bodies: int,
    v_max: float = 100.0,
    radius: float = RADIUS,
    width: float = WIDTH,
    height: float = HEIGHT,
    n_resample: int = 200,
) -> jax.Array:
    """Random non-overlapping initial states [n_sims, n_bodies, 4].

    Positions uniform in [r, w-r] (like `data/nbody_simulation.py:56-58`),
    velocities uniform in [-v_max, v_max]. Overlapping placements are fixed
    by up to ``n_resample`` rounds of re-drawing offending bodies (the
    reference lets pymunk separate overlaps; we avoid them up front).
    """

    def sample_pos(k):
        return jax.random.uniform(
            k, (n_sims, n_bodies, 2), minval=radius, maxval=jnp.array([width - radius, height - radius])
        )

    def overlap_mask(pos):
        # body b conflicts if it overlaps any *lower-indexed* body; redrawing
        # only those makes the loop equivalent to sequential rejection
        # sampling, which converges even for 8 discs of d=40 in the box.
        d = jnp.linalg.norm(pos[:, :, None, :] - pos[:, None, :, :], axis=-1)
        lower = jnp.tril(jnp.ones((n_bodies, n_bodies), bool), k=-1)
        return jnp.any((d < 2 * radius) & lower[None], axis=-1)  # [n_sims, n_bodies]

    key, kp, kv = jax.random.split(key, 3)
    pos = sample_pos(kp)

    def body(i, carry):
        pos, key = carry
        key, k = jax.random.split(key)
        newpos = sample_pos(k)
        bad = overlap_mask(pos)
        pos = jnp.where(bad[..., None], newpos, pos)
        return pos, key

    pos, _ = jax.lax.fori_loop(0, n_resample, body, (pos, key))
    vel = jax.random.uniform(kv, (n_sims, n_bodies, 2), minval=-v_max, maxval=v_max)
    return jnp.concatenate([pos, vel], axis=-1)
