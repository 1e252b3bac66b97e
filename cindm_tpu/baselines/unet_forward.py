"""Unet1D_forward_model — deterministic trajectory surrogate baseline.

TPU-native re-design of `Unet1D_forward_model` (`model/diffusion_1d.py:648-797`):
the TemporalUnet1D skeleton without time embeddings; the input is noise with
the conditioned first steps overwritten (`:766-767`), the output a full
trajectory. Used by the "Unet" / "Unet_single_step" design baselines
(`inference/inverse_design_1d_baseline.py`).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.blocks import (
    Conv1d,
    Conv1dBlock,
    Downsample1d,
    LinearAttentionTemporal,
    PreNormResidual,
    Upsample1d,
)
from ..models.unet1d import _stage_flags


class ResidualBlock(nn.Module):
    """Two Conv1dBlocks + 1×1 residual, no time emb (`model/diffusion_1d.py:648-670`)."""

    features: int
    kernel_size: int = 5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = Conv1dBlock(self.features, self.kernel_size)(x)
        h = Conv1dBlock(self.features, self.kernel_size)(h)
        if x.shape[-1] != self.features:
            x = Conv1d(self.features, 1)(x)
        return h + x


class Unet1DForwardModel(nn.Module):
    """forward(cond [B, cond_steps, F], key) -> [B, horizon, F]."""

    horizon: int
    transition_dim: int
    dim: int = 64
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    attention: bool = False

    @nn.compact
    def __call__(self, cond: jax.Array, noise: Optional[jax.Array] = None) -> jax.Array:
        B = cond.shape[0]
        if noise is None:
            noise = jnp.zeros((B, self.horizon, self.transition_dim), cond.dtype)
        x = noise.at[:, : cond.shape[1], :].set(cond)

        dims = [self.transition_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        down_flags, up_flags = _stage_flags(self.horizon, len(in_out))

        hs = []
        for ind, (_, dim_out) in enumerate(in_out):
            x = ResidualBlock(dim_out)(x)
            x = ResidualBlock(dim_out)(x)
            if self.attention:
                x = PreNormResidual(dim_out, LinearAttentionTemporal(dim_out))(x)
            hs.append(x)
            if down_flags[ind]:
                x = Downsample1d(dim_out)(x)

        mid = dims[-1]
        x = ResidualBlock(mid)(x)
        if self.attention:
            x = PreNormResidual(mid, LinearAttentionTemporal(mid))(x)
        x = ResidualBlock(mid)(x)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out[1:])):
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ResidualBlock(dim_out)(x)
            x = ResidualBlock(dim_in)(x)
            if self.attention:
                x = PreNormResidual(dim_in, LinearAttentionTemporal(dim_in))(x)
            if up_flags[ind]:
                x = Upsample1d(dim_in)(x)

        x = Conv1dBlock(self.dim, kernel_size=5)(x)
        return Conv1d(self.transition_dim, 1)(x)
