"""Small reference-parity utilities: CustomLoss, GNS random-walk noise,
trajectory / field plotting.

- ``custom_l1_speed_loss``: the reference's "loss_type3" — per-element L1
  plus a |speed²| discrepancy channel per body (`utils.py:951-962`).
- ``random_walk_noise``: GNS training noise, accelerations ~ N(0, σ/√n)
  integrated twice (`utils.py:1154-1168`).
- ``plot_trajectories`` / ``plot_field``: the PDF trajectory/field dumps
  the reference writes during training/eval (`model/diffusion_1d.py:2865-2990`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def custom_l1_speed_loss(predicted: jax.Array, target: jax.Array) -> jax.Array:
    """loss_type3 (`utils.py:951-962`): concat [L1 per feature, |v²-v̂²| per
    body] and mean. predicted/target: [B, T, n_bodies*4]."""
    B, T, F = predicted.shape
    n = F // 4
    l1 = jnp.abs(predicted - target)
    p = predicted.reshape(B, T, n, 4)
    t = target.reshape(B, T, n, 4)
    speed2 = jnp.abs(
        (p[..., 2] ** 2 + p[..., 3] ** 2) - (t[..., 2] ** 2 + t[..., 3] ** 2)
    )  # [B, T, n]
    return jnp.mean(jnp.concatenate([l1, speed2.reshape(B, T, n)], axis=-1))


def random_walk_noise(key: jax.Array, pos_seq_shape: tuple, noise_std: float) -> jax.Array:
    """GNS random-walk position noise (`utils.py:1154-1168`).
    pos_seq_shape: [n_particles, n_steps, dim]."""
    n, steps, d = pos_seq_shape
    if steps == 1:
        acc = jax.random.normal(key, (n, 1, d)) * noise_std
        return jnp.cumsum(jnp.cumsum(acc, axis=1), axis=1)
    nv = steps - 1
    acc = jax.random.normal(key, (n, nv, d)) * (noise_std / nv**0.5)
    vel = jnp.cumsum(acc, axis=1)
    pos = jnp.cumsum(vel, axis=1)
    return jnp.concatenate([jnp.zeros_like(pos[:, :1]), pos], axis=1)


def plot_trajectories(
    trajs: np.ndarray,  # [B, T, n_bodies*4] normalized
    target: Optional[tuple] = None,
    path: Optional[str] = None,
    max_plots: int = 16,
):
    """Trajectory scatter plots like the reference's PDF dumps."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    B = min(trajs.shape[0], max_plots)
    n = trajs.shape[-1] // 4
    cols = int(np.ceil(np.sqrt(B)))
    rows = int(np.ceil(B / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows), squeeze=False)
    for b in range(B):
        ax = axes[b // cols][b % cols]
        tr = trajs[b].reshape(-1, n, 4)
        for j in range(n):
            ax.plot(tr[:, j, 0], tr[:, j, 1], "-o", ms=2, lw=0.8)
            ax.plot(tr[-1, j, 0], tr[-1, j, 1], "r*", ms=8)
        if target is not None:
            ax.plot([target[0]], [target[1]], "kx", ms=10)
        ax.set_xlim(0, 1)
        ax.set_ylim(0, 1)
    fig.tight_layout()
    if path:
        fig.savefig(path)
        plt.close(fig)
    return fig


def plot_field(
    field: np.ndarray,  # [H, W] or [H, W, C]
    path: Optional[str] = None,
    titles: Optional[list] = None,
):
    """Field heatmaps like the reference's airfoil plots."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    f = field if field.ndim == 3 else field[..., None]
    C = f.shape[-1]
    fig, axes = plt.subplots(1, C, figsize=(4 * C, 4), squeeze=False)
    for c in range(C):
        im = axes[0][c].imshow(f[..., c], cmap="RdBu_r")
        fig.colorbar(im, ax=axes[0][c])
        if titles:
            axes[0][c].set_title(titles[c])
    fig.tight_layout()
    if path:
        fig.savefig(path)
        plt.close(fig)
    return fig
