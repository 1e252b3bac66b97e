"""2D design objectives: ForceUnet-based lift/drag gradient + overlap penalty.

Re-implements `inference/inverse_design_2d.py:85-146` as pure jnp: the design
function returns the *gradient* of
  λ_force·Σ_frames (λ·|drag| + lift)  +  λ_overlap·pairwise-mask-overlap
w.r.t. the full state x, matching how the 2D sampler consumes it.
Channel-last layout: x [B·nb, 64, 64, C], channels per frame (vx, vy, p),
last 3 = (mask, offx, offy).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def unnormalize_state(pressure: jax.Array, p_min: float, p_max: float) -> jax.Array:
    """[-1, 1] → [p_min, p_max] (`inverse_design_2d.py:86-87`)."""
    return (0.5 * pressure + 0.5) * (p_max - p_min) + p_min


def compute_overlap(matrix: jax.Array) -> jax.Array:
    """Mean pairwise inner product across boundaries
    (`inverse_design_2d.py:89-96`). matrix: [B, nb, H'*W']."""
    inner = jnp.einsum("bnd,bmd->bnm", matrix, matrix)
    nb = matrix.shape[1]
    inner = inner * (1.0 - jnp.eye(nb)[None])
    return jnp.mean(inner, axis=(-2, -1))


def force_objective(
    x: jax.Array,
    force_model: Callable[[jax.Array], jax.Array],
    batch_size: int,
    num_boundaries: int,
    frames: int,
    p_min: float,
    p_max: float,
    lambda_force: float = 1.0,
) -> jax.Array:
    """Scalar Σ_B Σ_frames (λ·|drag| + lift) with boundaries summed across
    the boundary axis before scoring (`inverse_design_2d.py:98-121`)."""
    H, W = x.shape[1], x.shape[2]
    Bnb = x.shape[0]
    boundary = x[..., -3:]
    boundary = boundary.reshape(batch_size, num_boundaries, H, W, 3)
    boundary = jnp.clip(jnp.sum(boundary, axis=1, keepdims=True), 0.0, 1.0)
    boundary = jnp.broadcast_to(
        boundary, (batch_size, num_boundaries, H, W, 3)
    ).reshape(Bnb, H, W, 3)

    # all frames scored in ONE ForceUnet call (the reference loops the model
    # per frame, `inverse_design_2d.py:112-115` — batching the frame axis
    # keeps the traced graph 6× smaller and the MXU fed)
    pressures = jnp.stack(
        [
            unnormalize_state(x[..., 2 + 3 * i : 3 + 3 * i], p_min, p_max)
            for i in range(frames)
        ],
        axis=1,
    )  # [B·nb, frames, H, W, 1]
    bframes = jnp.broadcast_to(boundary[:, None], (Bnb, frames, H, W, 3))
    inp = jnp.concatenate([pressures, bframes], axis=-1).reshape(
        Bnb * frames, H, W, 4
    )
    ld = force_model(inp)  # [B·nb·frames, 2] (drag, lift)
    return jnp.sum(lambda_force * jnp.abs(ld[:, 0]) + ld[:, 1])


def overlap_objective(
    x: jax.Array, batch_size: int, num_boundaries: int, downsampling_factor: int = 4
) -> jax.Array:
    """Scalar Σ_B mean pairwise overlap of downsampled masks
    (`inverse_design_2d.py:135-143`)."""
    H, W = x.shape[1], x.shape[2]
    mask = jnp.clip(x[..., -3], 0.0, 1.0).reshape(batch_size, num_boundaries, H, W)
    f = downsampling_factor
    m = mask.reshape(batch_size, num_boundaries, H // f, f, W // f, f).mean(axis=(3, 5))
    m = m.reshape(batch_size, num_boundaries, -1)
    return jnp.sum(compute_overlap(m))


def mask_centroids(x: jax.Array, batch_size: int, num_boundaries: int) -> jax.Array:
    """Soft centroid of each boundary's mask channel: [B, nb, 2] in cells."""
    H, W = x.shape[1], x.shape[2]
    mask = jnp.clip(x[..., -3], 0.0, 1.0).reshape(batch_size, num_boundaries, H, W)
    tot = jnp.sum(mask, axis=(-2, -1)) + 1e-6
    rows = jnp.sum(mask * jnp.arange(H)[None, None, :, None], axis=(-2, -1)) / tot
    cols = jnp.sum(mask * jnp.arange(W)[None, None, None, :], axis=(-2, -1)) / tot
    return jnp.stack([rows, cols], axis=-1)


def separation_objective(
    x: jax.Array, batch_size: int, num_boundaries: int, scale: float = 12.0
) -> jax.Array:
    """Symmetry-breaking ablation (VERDICT r2 #1): Σ_{i<j} exp(−d²/2s²) of
    mask-centroid distances. Unlike the reference's overlap penalty
    (`inverse_design_2d.py:135-143`), whose gradient symmetrically SHRINKS
    both masks where they coincide, descending this term TRANSLATES the
    centroids apart — directly testing the round-2 diagnosis that nb≥2
    designs coalesce because nothing in the objective separates them."""
    c = mask_centroids(x, batch_size, num_boundaries)  # [B, nb, 2]
    d2 = jnp.sum((c[:, :, None] - c[:, None, :]) ** 2, axis=-1)
    off = 1.0 - jnp.eye(num_boundaries)[None]
    return jnp.sum(jnp.exp(-d2 / (2.0 * scale * scale)) * off) / 2.0


def make_design_grad_fn(
    force_model: Callable[[jax.Array], jax.Array],
    batch_size: int,
    num_boundaries: int,
    frames: int,
    p_min: float,
    p_max: float,
    lambda_force: float = 1.0,
    lambda_overlap: float = 1.0,
    lambda_separation: float = 0.0,
) -> Callable[[jax.Array], jax.Array]:
    """design_fn(x) → ∇x objective (`inverse_design_2d.py:208-214`)."""

    def objective(x):
        obj = force_objective(
            x, force_model, batch_size, num_boundaries, frames, p_min, p_max, lambda_force
        )
        if num_boundaries > 1 and lambda_overlap != 0.0:
            obj = obj + lambda_overlap * overlap_objective(x, batch_size, num_boundaries)
        if num_boundaries > 1 and lambda_separation != 0.0:
            obj = obj + lambda_separation * separation_objective(
                x, batch_size, num_boundaries
            )
        return obj

    return jax.grad(objective)


def mask_denoise(x: jax.Array, thre: float = 0.5) -> jax.Array:
    """Threshold a soft mask to binary (`inverse_design_2d.py:148-150`)."""
    return (x > thre).astype(x.dtype)
