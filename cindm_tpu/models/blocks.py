"""Shared denoiser building blocks (Flax, channel-last).

TPU-native re-design of the reference's torch helper modules
(`model/diffusion_1d.py:75-315`, `model/diffusion_2d.py:91-278`).
All tensors are channel-last ([B, T, C] for 1D, [B, H, W, C] for 2D) —
the native XLA/TPU convolution layout — instead of torch's channel-first.

Initializers mimic torch's Conv/Linear defaults (kaiming-uniform with
a=sqrt(5), i.e. U(±sqrt(1/fan_in)) for both kernel and bias) so training
dynamics match the reference recipe.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch nn.Conv*/nn.Linear default kernel init: kaiming_uniform(a=sqrt(5))
# == variance_scaling(scale=1/3, fan_in, uniform).
torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(key, shape, dtype, fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def mish(x: jax.Array) -> jax.Array:
    return x * jnp.tanh(jax.nn.softplus(x))


class Conv1d(nn.Module):
    """1D conv over axis -2 of [B, T, C] with torch-default init."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: str | Sequence[tuple[int, int]] = "SAME"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = x.shape[-1] * self.kernel_size
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=self.padding,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=lambda k, s, d=jnp.float32: torch_bias_init(k, s, d, fan_in),
        )(x)


class Dense(nn.Module):
    """Linear with torch-default init."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = x.shape[-1]
        return nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=lambda k, s, d=jnp.float32: torch_bias_init(k, s, d, fan_in),
        )(x)


class SinusoidalPosEmb(nn.Module):
    """Timestep embedding (`model/diffusion_1d.py:146-158`)."""

    dim: int

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        half = self.dim // 2
        freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / (half - 1)))
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class RandomOrLearnedSinusoidalPosEmb(nn.Module):
    """Fourier timestep features (`model/diffusion_1d.py:160-175`)."""

    dim: int
    is_random: bool = False

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        assert self.dim % 2 == 0
        half = self.dim // 2
        w = self.param("weights", nn.initializers.normal(1.0), (half,))
        if self.is_random:
            w = jax.lax.stop_gradient(w)
        t = t.astype(jnp.float32)[:, None]
        freqs = t * w[None, :] * 2 * math.pi
        return jnp.concatenate([t, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class ChannelLayerNorm(nn.Module):
    """Bias-free LayerNorm over the channel axis (`model/diffusion_1d.py:123-132`).

    Biased variance (unbiased=False), eps 1e-5, learnable gain only.
    """

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        g = self.param("g", nn.initializers.ones, (self.dim,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * g


class GroupNorm(nn.Module):
    """GroupNorm over channel-last input; matches torch eps/groups defaults."""

    num_groups: int = 8
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.GroupNorm(num_groups=self.num_groups, epsilon=self.eps)(x)


class Conv1dBlock(nn.Module):
    """Conv1d(k, pad k//2) → GroupNorm(8) → Mish (`model/diffusion_1d.py:197-214`)."""

    features: int
    kernel_size: int = 5
    n_groups: int = 8

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.kernel_size // 2
        x = Conv1d(self.features, self.kernel_size, padding=[(p, p)])(x)
        x = GroupNorm(self.n_groups)(x)
        return mish(x)


class ResidualTemporalBlock(nn.Module):
    """Two Conv1dBlocks with additive time embedding + 1×1 residual
    (`model/diffusion_1d.py:483-511`)."""

    features: int
    kernel_size: int = 5

    @nn.compact
    def __call__(self, x: jax.Array, t_emb: jax.Array) -> jax.Array:
        h = Conv1dBlock(self.features, self.kernel_size)(x)
        h = h + Dense(self.features)(mish(t_emb))[:, None, :]
        h = Conv1dBlock(self.features, self.kernel_size)(h)
        if x.shape[-1] != self.features:
            x = Conv1d(self.features, 1)(x)
        return h + x


class LinearAttentionTemporal(nn.Module):
    """Softmax-kernel linear attention over the time axis
    (`model/diffusion_1d.py:272-291`). Input [B, T, C].

    Computed block-dense: instead of per-head [T, 32]ᵀ[T, 32] contractions
    (25% MXU lane utilization at dim_head 32), the context is ONE
    [hidden, hidden] = kᵀv matmul masked to the per-head block diagonal —
    bit-identical output, 128-lane-shaped matmuls, measured ~3× faster on
    the composed-sampling hot path (RESULTS.md)."""

    dim: int
    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, T, _ = x.shape
        hidden = self.heads * self.dim_head
        qkv = Dense(hidden * 3, use_bias=False)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # per-head softmax over time == channelwise softmax over time
        k = jax.nn.softmax(k, axis=1)
        q = q * (self.dim_head**-0.5)
        # block-diagonal head mask [hidden, hidden]
        hid = jnp.arange(hidden) // self.dim_head
        mask = (hid[:, None] == hid[None, :]).astype(x.dtype)
        context = jnp.einsum("btc,bte->bce", k, v) * mask
        out = jnp.einsum("btc,bce->bte", q, context)
        return Dense(self.dim)(out)


class LinearAttention(nn.Module):
    """Linear attention with q/k softmaxes + LayerNorm output proj
    (`model/diffusion_1d.py:243-270`, 2D variant `model/diffusion_2d.py:201-230`).
    Input [B, N, C] where N is the flattened spatial/time axis."""

    dim: int
    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, N, _ = x.shape
        hidden = self.heads * self.dim_head
        qkv = Dense(hidden * 3, use_bias=False)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # q softmax is per-head over dim_head (torch dim=-2 in [b,h,c,n])
        q = jax.nn.softmax(
            q.reshape(B, N, self.heads, self.dim_head), axis=-1
        ).reshape(B, N, hidden) * (self.dim_head**-0.5)
        k = jax.nn.softmax(k, axis=1)  # over sequence, channelwise == per-head
        # block-dense context (see LinearAttentionTemporal): one
        # [hidden, hidden] matmul masked to the head block diagonal
        hid = jnp.arange(hidden) // self.dim_head
        mask = (hid[:, None] == hid[None, :]).astype(x.dtype)
        context = jnp.einsum("bnc,bne->bce", k, v) * mask
        out = jnp.einsum("bnc,bce->bne", q, context)
        out = Dense(self.dim)(out)
        return ChannelLayerNorm(self.dim)(out)


class FullAttention(nn.Module):
    """Full softmax attention (`model/diffusion_1d.py:293-315`). Input [B, N, C]."""

    dim: int
    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, N, _ = x.shape
        hidden = self.heads * self.dim_head
        qkv = Dense(hidden * 3, use_bias=False)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda a: a.reshape(B, N, self.heads, self.dim_head)
        q, k, v = split(q), split(k), split(v)
        q = q * (self.dim_head**-0.5)
        sim = jnp.einsum("bihd,bjhd->bhij", q, k)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v)
        out = out.reshape(B, N, hidden)
        return Dense(self.dim)(out)


class PreNormResidual(nn.Module):
    """Residual(PreNorm(fn)) (`model/diffusion_1d.py:75-81,134-142`)."""

    dim: int
    fn: Callable

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return self.fn(ChannelLayerNorm(self.dim)(x)) + x


class Downsample1d(nn.Module):
    """Strided conv halving the time axis (`model/diffusion_1d.py:92-98`)."""

    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return Conv1d(self.dim, 3, stride=2, padding=[(1, 1)])(x)


class Upsample1d(nn.Module):
    """Transposed conv doubling the time axis (`model/diffusion_1d.py:100-106`)."""

    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = x.shape[-1] * 4
        return nn.ConvTranspose(
            features=self.dim,
            kernel_size=(4,),
            strides=(2,),
            padding="SAME",
            kernel_init=torch_kernel_init,
            bias_init=lambda k, s, d=jnp.float32: torch_bias_init(k, s, d, fan_in),
        )(x)
