"""TemporalUnet1D — the n-body trajectory denoiser.

TPU-native re-design of the reference's diffuser-style temporal U-Net
(`model/diffusion_1d.py:517-646`): ResidualTemporalBlock stacks
(Conv1d+GroupNorm+Mish with additive time embedding), optional linear
attention over the time axis, horizon-aware down/upsampling (stages are
skipped so short horizons divide evenly, `model/diffusion_1d.py:550-601`).

Channel-last layout [B, horizon, transition_dim]; convs run over the
horizon axis — the natural XLA TPU layout, no rearranges needed.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import (
    Conv1d,
    Conv1dBlock,
    Dense,
    Downsample1d,
    LinearAttentionTemporal,
    PreNormResidual,
    ResidualTemporalBlock,
    SinusoidalPosEmb,
    Upsample1d,
    mish,
)


def _stage_flags(horizon: int, num_resolutions: int) -> tuple[list[bool], list[bool]]:
    """Per-stage (down, up) sampling flags replicating the horizon rules of
    `model/diffusion_1d.py:549-603`. Returns (down_flags[num_res], up_flags[num_res-1])."""
    if horizon % 8 == 0:
        down_last = num_resolutions - 1
        up_skip = ()
    elif horizon % 4 == 0:
        down_last = num_resolutions - 2
        up_skip = (0,)
    elif horizon % 2 == 0:
        down_last = num_resolutions - 3
        up_skip = (0, 1)
    else:
        raise ValueError(f"horizon {horizon} must be divisible by 2")
    downs = [ind < down_last for ind in range(num_resolutions)]
    ups = [ind not in up_skip for ind in range(num_resolutions - 1)]
    return downs, ups


class TemporalUnet1D(nn.Module):
    """Args mirror `TemporalUnet1D.__init__` (`model/diffusion_1d.py:519-527`)."""

    horizon: int
    transition_dim: int
    dim: int = 64
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    attention: bool = True

    @property
    def channels(self) -> int:
        return self.transition_dim

    @nn.compact
    def __call__(self, x: jax.Array, time: jax.Array) -> jax.Array:
        """x: [B, horizon, transition_dim]; time: [B] int/float timesteps."""
        dims = [self.transition_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_res = len(in_out)
        down_flags, up_flags = _stage_flags(self.horizon, num_res)

        # time MLP: SinusoidalPosEmb(dim) → Dense(4*dim) → Mish → Dense(dim)
        # (`model/diffusion_1d.py:537-542`)
        t = SinusoidalPosEmb(self.dim)(time)
        t = Dense(self.dim * 4)(t)
        t = mish(t)
        t = Dense(self.dim)(t)

        hs = []
        for ind, (_, dim_out) in enumerate(in_out):
            x = ResidualTemporalBlock(dim_out)(x, t)
            x = ResidualTemporalBlock(dim_out)(x, t)
            if self.attention:
                x = PreNormResidual(dim_out, LinearAttentionTemporal(dim_out))(x)
            hs.append(x)
            if down_flags[ind]:
                x = Downsample1d(dim_out)(x)

        mid_dim = dims[-1]
        x = ResidualTemporalBlock(mid_dim)(x, t)
        if self.attention:
            x = PreNormResidual(mid_dim, LinearAttentionTemporal(mid_dim))(x)
        x = ResidualTemporalBlock(mid_dim)(x, t)

        # up path over reversed(in_out[1:]) — the first skip (stage 0 features)
        # is intentionally unused, matching `model/diffusion_1d.py:572,636-641`.
        up_in_out = list(reversed(in_out[1:]))
        for ind, (dim_in, dim_out) in enumerate(up_in_out):
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ResidualTemporalBlock(dim_out)(x, t)
            x = ResidualTemporalBlock(dim_in)(x, t)
            if self.attention:
                x = PreNormResidual(dim_in, LinearAttentionTemporal(dim_in))(x)
            if up_flags[ind]:
                x = Upsample1d(dim_in)(x)

        x = Conv1dBlock(self.dim, kernel_size=5)(x)
        x = Conv1d(self.transition_dim, 1)(x)
        return x
