"""2D airfoil denoiser + differentiable force surrogate.

TPU-native re-design of the 2D model zoo (`model/diffusion_2d.py:91-486`):
- ``Unet2D``: DDPM U-Net over [B, 64, 64, C] (channel-last NHWC, the native
  TPU conv layout). Weight-standardized 3×3 convs + GroupNorm + SiLU with
  FiLM-style time scale/shift, linear attention at every resolution,
  pixel-unshuffle downsampling (`model/diffusion_2d.py:105-109`), full
  attention in the middle. Default airfoil config: dim 64, dim_mults (1, 2),
  channels = (cond 2 + pred 4 frames)·3 + (mask, offx, offy) = 21
  (`train/train_2d.py:30-36`).
- ``ForceUnet``: the U-Net encoder + mean-pool + Linear(…, 2) drag/lift
  surrogate used as the differentiable design objective
  (`model/diffusion_2d.py:411-486`).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import (
    ChannelLayerNorm,
    Dense,
    FullAttention,
    LinearAttention,
    SinusoidalPosEmb,
    torch_bias_init,
    torch_kernel_init,
)


class WSConv2d(nn.Module):
    """Weight-standardized conv (`model/diffusion_2d.py:111-124`): kernel is
    standardized over (kh, kw, in) per output channel before the conv."""

    features: int
    kernel_size: int = 3
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel", torch_kernel_init, (k, k, in_ch, self.features), jnp.float32
        )
        fan_in = in_ch * k * k
        bias = self.param(
            "bias", lambda key, s: torch_bias_init(key, s, jnp.float32, fan_in), (self.features,)
        )
        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
        w = (kernel - mean) * jax.lax.rsqrt(var + self.eps)
        out = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias


class Conv2d(nn.Module):
    features: int
    kernel_size: int = 3
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = x.shape[-1] * self.kernel_size**2
        return nn.Conv(
            self.features, (self.kernel_size, self.kernel_size), padding="SAME",
            use_bias=self.use_bias, kernel_init=torch_kernel_init,
            bias_init=lambda k, s, d=jnp.float32: torch_bias_init(k, s, d, fan_in),
        )(x)


class Block2D(nn.Module):
    """WSConv3×3 → GroupNorm(8) → (scale+1, shift) → SiLU
    (`model/diffusion_2d.py:182-198`)."""

    features: int
    groups: int = 8

    @nn.compact
    def __call__(self, x: jax.Array, scale_shift=None) -> jax.Array:
        x = WSConv2d(self.features, 3)(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5)(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        return nn.silu(x)


class ResnetBlock2D(nn.Module):
    """Two Block2Ds with FiLM time embedding + 1×1 residual
    (`model/diffusion_2d.py:200-224`)."""

    features: int
    groups: int = 8
    time_emb: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, t_emb: Optional[jax.Array] = None) -> jax.Array:
        scale_shift = None
        if self.time_emb and t_emb is not None:
            h = Dense(self.features * 2)(nn.silu(t_emb))[:, None, None, :]
            scale_shift = jnp.split(h, 2, axis=-1)
        h = Block2D(self.features, self.groups)(x, scale_shift)
        h = Block2D(self.features, self.groups)(h)
        if x.shape[-1] != self.features:
            x = Conv2d(self.features, 1)(x)
        return h + x


def _flatten_hw(x):
    B, H, W, C = x.shape
    return x.reshape(B, H * W, C), (H, W)


class LinearAttention2D(nn.Module):
    """2D linear attention with the v/(h·w) normalization
    (`model/diffusion_2d.py:226-254`)."""

    dim: int
    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        xf, (H, W) = _flatten_hw(x)
        B, N, _ = xf.shape
        hidden = self.heads * self.dim_head
        qkv = Dense(hidden * 3, use_bias=False)(xf)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = jax.nn.softmax(
            q.reshape(B, N, self.heads, self.dim_head), axis=-1
        ).reshape(B, N, hidden) * (self.dim_head**-0.5)
        k = jax.nn.softmax(k, axis=1)
        v = v / (H * W)
        # block-dense head-masked context (see models/blocks.py)
        hid = jnp.arange(hidden) // self.dim_head
        mask = (hid[:, None] == hid[None, :]).astype(x.dtype)
        context = jnp.einsum("bnc,bne->bce", k, v) * mask
        out = jnp.einsum("bnc,bce->bne", q, context)
        out = Dense(self.dim)(out)
        out = ChannelLayerNorm(self.dim)(out)
        return out.reshape(B, H, W, self.dim)


class Attention2D(nn.Module):
    dim: int
    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        xf, (H, W) = _flatten_hw(x)
        out = FullAttention(self.dim, self.heads, self.dim_head)(xf)
        return out.reshape(B := x.shape[0], H, W, self.dim)


class PreNormResidual2D(nn.Module):
    dim: int
    fn: nn.Module

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        normed = ChannelLayerNorm(self.dim)(x.reshape(B, H * W, C)).reshape(B, H, W, C)
        return self.fn(normed) + x


class Downsample2D(nn.Module):
    """Pixel-unshuffle (2×2 → channels) + 1×1 conv (`model/diffusion_2d.py:105-109`)."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        x = jnp.transpose(x, (0, 1, 3, 5, 2, 4)).reshape(B, H // 2, W // 2, C * 4)
        return Conv2d(self.features, 1)(x)


class Upsample2D(nn.Module):
    """Nearest ×2 + 3×3 conv (`model/diffusion_2d.py:99-103`)."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return Conv2d(self.features, 3)(x)


class Unet2D(nn.Module):
    """DDPM 2D U-Net (`model/diffusion_2d.py:281-408`); input [B, H, W, C].

    ``remat=True`` checkpoints each ResnetBlock/attention residual
    (``nn.remat``): the backward pass then stores only block-boundary
    activations and recomputes block interiors, cutting the train-step's
    HLO-temp footprint from ~13 G to a few hundred MB at batch 48 — the
    lever that lets a multi-GB device-resident dataset share 16 G HBM with
    training. Wrapping the WHOLE apply in ``jax.checkpoint`` does NOT help:
    its backward rebuilds every activation at once, reproducing the
    un-remat'd peak. Param structure is unchanged, so checkpoints written
    either way stay loadable."""

    dim: int = 64
    dim_mults: Sequence[int] = (1, 2)
    channels: int = 21
    out_dim: Optional[int] = None
    resnet_block_groups: int = 8
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, time: jax.Array) -> jax.Array:
        g = self.resnet_block_groups
        # Explicit names keep the param tree identical to the non-remat
        # module (nn.remat would otherwise prefix "Checkpoint").
        rb_cls = nn.remat(ResnetBlock2D) if self.remat else ResnetBlock2D
        pn_cls = nn.remat(PreNormResidual2D) if self.remat else PreNormResidual2D
        counts = {"rb": 0, "pn": 0}

        def RB(features):
            m = rb_cls(features, g, name=f"ResnetBlock2D_{counts['rb']}")
            counts["rb"] += 1
            return m

        def PN(dim, fn):
            m = pn_cls(dim, fn, name=f"PreNormResidual2D_{counts['pn']}")
            counts["pn"] += 1
            return m

        dims = [self.dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_res = len(in_out)

        x = Conv2d(self.dim, 7)(x)
        r = x

        t = SinusoidalPosEmb(self.dim)(time)
        t = Dense(self.dim * 4)(t)
        t = nn.gelu(t, approximate=False)  # torch nn.GELU default is exact
        t = Dense(self.dim * 4)(t)

        hs = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= num_res - 1
            x = RB(dim_in)(x, t)
            hs.append(x)
            x = RB(dim_in)(x, t)
            x = PN(dim_in, LinearAttention2D(dim_in))(x)
            hs.append(x)
            x = Downsample2D(dim_out)(x) if not is_last else Conv2d(dim_out, 3)(x)

        mid = dims[-1]
        x = RB(mid)(x, t)
        x = PN(mid, Attention2D(mid))(x)
        x = RB(mid)(x, t)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == num_res - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = RB(dim_out)(x, t)
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = RB(dim_out)(x, t)
            x = PN(dim_out, LinearAttention2D(dim_out))(x)
            x = Upsample2D(dim_in)(x) if not is_last else Conv2d(dim_in, 3)(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = RB(self.dim)(x, t)
        return Conv2d(self.out_dim or self.channels, 1)(x)


class ForceUnet(nn.Module):
    """Encoder-only U-Net → global mean pool → Linear(2) predicting
    (drag, lift) from [pressure, mask, offx, offy] (`model/diffusion_2d.py:411-486`).
    Input [B, H, W, 4]."""

    dim: int = 64
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    resnet_block_groups: int = 8

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        g = self.resnet_block_groups
        dims = [self.dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_res = len(in_out)

        x = Conv2d(self.dim, 7)(x)
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= num_res - 1
            x = ResnetBlock2D(dim_in, g, time_emb=False)(x)
            x = ResnetBlock2D(dim_in, g, time_emb=False)(x)
            x = PreNormResidual2D(dim_in, LinearAttention2D(dim_in))(x)
            x = Downsample2D(dim_out)(x) if not is_last else Conv2d(dim_out, 3)(x)

        mid = dims[-1]
        x = ResnetBlock2D(mid, g, time_emb=False)(x)
        x = PreNormResidual2D(mid, Attention2D(mid))(x)
        x = ResnetBlock2D(mid, g, time_emb=False)(x)
        x = jnp.mean(x, axis=(1, 2))
        return Dense(2)(x)
