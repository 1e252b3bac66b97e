"""Unet1D — the generic DDPM-style 1D U-Net (C4).

TPU-native re-design of the reference `Unet1D` (`model/diffusion_1d.py:319-450`):
init 7-tap conv, WS-conv ResnetBlocks with FiLM time embedding (GELU time
MLP at 4·dim), linear attention at every resolution, full attention in the
middle, skip connections taken *before* each block pair (two per stage),
and a final residual block over [x ∥ init-conv residue]. The n-body paper
path uses TemporalUnet1D instead; this generic variant exists for parity
with the reference model zoo.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import (
    Conv1d,
    Dense,
    FullAttention,
    LinearAttention,
    PreNormResidual,
    RandomOrLearnedSinusoidalPosEmb,
    SinusoidalPosEmb,
)


class WSConv1d(nn.Module):
    """Weight-standardized 1D conv (`model/diffusion_1d.py:108-121`)."""

    features: int
    kernel_size: int = 3
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        C = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (k, C, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = jnp.mean(kernel, axis=(0, 1), keepdims=True)
        var = jnp.var(kernel, axis=(0, 1), keepdims=True)
        w = (kernel - mean) * jax.lax.rsqrt(var + self.eps)
        out = jax.lax.conv_general_dilated(
            x, w, (1,), [(k // 2, k // 2)], dimension_numbers=("NWC", "WIO", "NWC")
        )
        return out + bias


class Block1D(nn.Module):
    """WSConv → GroupNorm(8) → (scale+1, shift) → SiLU (`model/diffusion_1d.py:179-195`)."""

    features: int
    groups: int = 8

    @nn.compact
    def __call__(self, x: jax.Array, scale_shift=None) -> jax.Array:
        x = WSConv1d(self.features, 3)(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5)(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        return nn.silu(x)


class ResnetBlock1D(nn.Module):
    """(`model/diffusion_1d.py:217-241`)."""

    features: int
    groups: int = 8

    @nn.compact
    def __call__(self, x: jax.Array, t_emb: Optional[jax.Array] = None) -> jax.Array:
        scale_shift = None
        if t_emb is not None:
            h = Dense(self.features * 2)(nn.silu(t_emb))[:, None, :]
            scale_shift = jnp.split(h, 2, axis=-1)
        h = Block1D(self.features, self.groups)(x, scale_shift)
        h = Block1D(self.features, self.groups)(h)
        if x.shape[-1] != self.features:
            x = Conv1d(self.features, 1)(x)
        return h + x


class Unet1D(nn.Module):
    """Args mirror `Unet1D.__init__` (`model/diffusion_1d.py:320-333`).
    Input [B, T, channels] channel-last (the reference rearranges b h t↔b t h;
    here T is the conv axis throughout)."""

    dim: int
    channels: int = 3
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    out_dim: Optional[int] = None
    resnet_block_groups: int = 8
    learned_sinusoidal_cond: bool = False
    random_fourier_features: bool = False
    learned_sinusoidal_dim: int = 16

    @nn.compact
    def __call__(self, x: jax.Array, time: jax.Array) -> jax.Array:
        g = self.resnet_block_groups
        dims = [self.dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_res = len(in_out)

        x = Conv1d(self.dim, 7)(x)
        r = x

        if self.learned_sinusoidal_cond or self.random_fourier_features:
            t = RandomOrLearnedSinusoidalPosEmb(
                self.learned_sinusoidal_dim, self.random_fourier_features
            )(time)
        else:
            t = SinusoidalPosEmb(self.dim)(time)
        t = Dense(self.dim * 4)(t)
        t = nn.gelu(t)
        t = Dense(self.dim * 4)(t)

        hs = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= num_res - 1
            x = ResnetBlock1D(dim_in, g)(x, t)
            hs.append(x)
            x = ResnetBlock1D(dim_in, g)(x, t)
            x = PreNormResidual(dim_in, LinearAttention(dim_in))(x)
            hs.append(x)
            if not is_last:
                # Downsample = Conv1d(k4, s2, p1) (`model/diffusion_1d.py:89-90`)
                x = Conv1d(dim_out, 4, stride=2, padding=[(1, 1)])(x)
            else:
                x = Conv1d(dim_out, 3)(x)

        mid = dims[-1]
        x = ResnetBlock1D(mid, g)(x, t)
        x = PreNormResidual(mid, FullAttention(mid))(x)
        x = ResnetBlock1D(mid, g)(x, t)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == num_res - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ResnetBlock1D(dim_out, g)(x, t)
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ResnetBlock1D(dim_out, g)(x, t)
            x = PreNormResidual(dim_out, LinearAttention(dim_out))(x)
            if not is_last:
                # Upsample = nearest ×2 + conv3 (`model/diffusion_1d.py:83-87`)
                B, T, C = x.shape
                x = jax.image.resize(x, (B, T * 2, C), method="nearest")
                x = Conv1d(dim_in, 3)(x)
            else:
                x = Conv1d(dim_in, 3)(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = ResnetBlock1D(self.dim, g)(x, t)
        return Conv1d(self.out_dim or self.channels, 1)(x)
