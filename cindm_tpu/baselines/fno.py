"""FNO — Fourier Neural Operator baselines (1D/2D).

TPU-native re-design of the reference FNO stack
(`le_pde/models.py:1996-2593`: `SpectralConv1d/2d`, `FNO1d/2d`,
`FNOModel` wrapper): spectral convolutions are FFT → low-mode complex
contraction → iFFT, which XLA maps to batched complex matmuls — natively
fast on TPU. Default 2D config modes=12, width=20 (the reference trains
`fno-m20-w32` via `train/train_baseline.py`).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.blocks import Dense


class SpectralConv2d(nn.Module):
    """Complex multiply of the lowest `modes` Fourier modes
    (`le_pde/models.py:2070-2130`)."""

    out_channels: int
    modes1: int = 12
    modes2: int = 12

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [B, H, W, C]
        B, H, W, C = x.shape
        m1, m2 = self.modes1, self.modes2
        scale = 1.0 / (C * self.out_channels)
        init = lambda key, shape: scale * jax.random.uniform(key, shape)
        wr1 = self.param("w1_real", init, (C, self.out_channels, m1, m2))
        wi1 = self.param("w1_imag", init, (C, self.out_channels, m1, m2))
        wr2 = self.param("w2_real", init, (C, self.out_channels, m1, m2))
        wi2 = self.param("w2_imag", init, (C, self.out_channels, m1, m2))
        w1 = wr1 + 1j * wi1
        w2 = wr2 + 1j * wi2

        x_ft = jnp.fft.rfft2(x, axes=(1, 2))  # [B, H, W//2+1, C]
        out = jnp.zeros((B, H, W // 2 + 1, self.out_channels), jnp.complex64)
        top = jnp.einsum("bxyc,coxy->bxyo", x_ft[:, :m1, :m2], w1)
        bot = jnp.einsum("bxyc,coxy->bxyo", x_ft[:, -m1:, :m2], w2)
        out = out.at[:, :m1, :m2].set(top)
        out = out.at[:, -m1:, :m2].set(bot)
        return jnp.fft.irfft2(out, s=(H, W), axes=(1, 2)).astype(x.dtype)


class FNO2d(nn.Module):
    """4 spectral layers + 1×1 bypass, GELU (`le_pde/models.py:2132-2220`).
    Maps [B, H, W, in_c] → [B, H, W, out_c]; appends a normalized (x, y) grid
    like the reference lifting."""

    out_channels: int
    modes: int = 12
    width: int = 20
    n_layers: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, _ = x.shape
        gx = jnp.broadcast_to(jnp.linspace(0, 1, H)[None, :, None, None], (B, H, W, 1))
        gy = jnp.broadcast_to(jnp.linspace(0, 1, W)[None, None, :, None], (B, H, W, 1))
        x = jnp.concatenate([x, gx, gy], axis=-1)
        x = Dense(self.width)(x)
        for i in range(self.n_layers):
            y = SpectralConv2d(self.width, self.modes, self.modes)(x)
            y = y + Dense(self.width)(x)
            x = nn.gelu(y) if i < self.n_layers - 1 else y
        x = nn.gelu(Dense(128)(x))
        return Dense(self.out_channels)(x)


class SpectralConv1d(nn.Module):
    out_channels: int
    modes: int = 16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, L, C = x.shape
        m = self.modes
        scale = 1.0 / (C * self.out_channels)
        init = lambda key, shape: scale * jax.random.uniform(key, shape)
        w = self.param("w_real", init, (C, self.out_channels, m)) + 1j * self.param(
            "w_imag", init, (C, self.out_channels, m)
        )
        x_ft = jnp.fft.rfft(x, axis=1)
        out = jnp.zeros((B, L // 2 + 1, self.out_channels), jnp.complex64)
        out = out.at[:, :m].set(jnp.einsum("bxc,cox->bxo", x_ft[:, :m], w))
        return jnp.fft.irfft(out, n=L, axis=1).astype(x.dtype)


class FNO1d(nn.Module):
    out_channels: int
    modes: int = 16
    width: int = 64
    n_layers: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, L, _ = x.shape
        grid = jnp.broadcast_to(jnp.linspace(0, 1, L)[None, :, None], (B, L, 1))
        x = Dense(self.width)(jnp.concatenate([x, grid], axis=-1))
        for i in range(self.n_layers):
            y = SpectralConv1d(self.width, self.modes)(x) + Dense(self.width)(x)
            x = nn.gelu(y) if i < self.n_layers - 1 else y
        x = nn.gelu(Dense(128)(x))
        return Dense(self.out_channels)(x)
