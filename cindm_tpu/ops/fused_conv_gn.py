"""Pallas TPU kernel: fused Conv1d(k) + GroupNorm + Mish.

The Conv1dBlock (`model/diffusion_1d.py:197-214`) is the innermost op of
every ResidualTemporalBlock — the 1D denoiser hot path. XLA lowers it as
conv → (write HBM) → group-norm reduction → (read HBM) → Mish; for the
flagship composed batch (≈5.4k samples × T=24 × C≤512) that's ~0.5 GB of
avoidable HBM traffic per block per reverse step. This kernel keeps the
conv accumulator in VMEM and applies the per-sample GroupNorm + Mish
before writing once.

Strategy: grid over batch tiles; per tile, the k-tap conv is k shifted
[Bt·T, C] × [C, O] matmuls on the MXU; GroupNorm reduces over (T, C/G)
within the tile (per-sample statistics, so tiling the batch is safe);
Mish on the VPU. Falls back to plain jnp for shapes that don't map to the
128-lane tiling.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_HI = jax.lax.Precision.HIGHEST  # GN stats must reduce in f32


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def fused_conv1d_gn_mish_reference(
    x: jax.Array,  # [B, T, C]
    w: jax.Array,  # [K, C, O]
    b: jax.Array,  # [O]
    gn_scale: jax.Array,  # [O]
    gn_bias: jax.Array,  # [O]
    groups: int = 8,
    eps: float = 1e-5,
) -> jax.Array:
    """jnp fallback with identical semantics (torch Conv1d pad=K//2 +
    GroupNorm(groups) + Mish)."""
    K = w.shape[0]
    pad = K // 2
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + b
    B, T, O = out.shape
    g = out.reshape(B, T, groups, O // groups)
    mean = jnp.mean(g, axis=(1, 3), keepdims=True)
    var = jnp.var(g, axis=(1, 3), keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    out = g.reshape(B, T, O) * gn_scale + gn_bias
    return _mish(out)


def _kernel(x_ref, w_ref, b_ref, gs_ref, gb_ref, o_ref, *, K, groups, eps):
    x = x_ref[:]  # [Bt, T, C]
    Bt, T, C = x.shape
    O = w_ref.shape[2]
    pad = K // 2
    acc = jnp.zeros((Bt * T, O), jnp.float32)
    for k in range(K):
        shift = k - pad  # tap offset
        if shift < 0:
            xs = jnp.concatenate(
                [jnp.zeros((Bt, -shift, C), x.dtype), x[:, : T + shift]], axis=1
            )
        elif shift > 0:
            xs = jnp.concatenate(
                [x[:, shift:], jnp.zeros((Bt, shift, C), x.dtype)], axis=1
            )
        else:
            xs = x
        acc = acc + jnp.dot(
            xs.reshape(Bt * T, C), w_ref[k], preferred_element_type=jnp.float32
        )
    acc = acc + b_ref[:][None, :]

    # GroupNorm per (sample, group) as matmuls — Mosaic rejects the 4D
    # [Bt, T, G, O/G] reshape (non-128 last dim), so the group and sample
    # reductions/broadcasts go through one-hot matrices on the MXU instead.
    og = O // groups
    ch = jax.lax.broadcasted_iota(jnp.int32, (O, groups), 0) // og
    gid = jax.lax.broadcasted_iota(jnp.int32, (O, groups), 1)
    Mg = (ch == gid).astype(jnp.float32)  # [O, G] channel→group one-hot
    row = jax.lax.broadcasted_iota(jnp.int32, (Bt * T, Bt), 0) // T
    sid = jax.lax.broadcasted_iota(jnp.int32, (Bt * T, Bt), 1)
    S = (row == sid).astype(jnp.float32)  # [Bt*T, Bt] row→sample one-hot

    denom = 1.0 / (T * og)
    gsum = jnp.dot(acc, Mg, preferred_element_type=jnp.float32, precision=_HI)  # [BtT, G]
    mean = jnp.dot(S.T, gsum, preferred_element_type=jnp.float32, precision=_HI) * denom  # [Bt, G]
    g2 = jnp.dot(acc * acc, Mg, preferred_element_type=jnp.float32, precision=_HI)
    m2 = jnp.dot(S.T, g2, preferred_element_type=jnp.float32, precision=_HI) * denom
    # broadcast [Bt, G] stats back to [BtT, O]
    mean_b = jnp.dot(jnp.dot(S, mean, preferred_element_type=jnp.float32, precision=_HI), Mg.T,
                     preferred_element_type=jnp.float32, precision=_HI)
    m2_b = jnp.dot(jnp.dot(S, m2, preferred_element_type=jnp.float32, precision=_HI), Mg.T,
                   preferred_element_type=jnp.float32, precision=_HI)
    var_b = m2_b - mean_b * mean_b
    out = (acc - mean_b) * jax.lax.rsqrt(var_b + eps)
    out = out * gs_ref[:][None, :] + gb_ref[:][None, :]
    o_ref[:] = _mish(out).reshape(Bt, T, O).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("groups", "eps", "batch_tile"))
def fused_conv1d_gn_mish(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    gn_scale: jax.Array,
    gn_bias: jax.Array,
    groups: int = 8,
    eps: float = 1e-5,
    batch_tile: int = 32,
) -> jax.Array:
    """Fused Conv1d+GN+Mish. Uses the Pallas kernel when the channel dims
    map onto the 128-lane tiling and the batch divides the tile; otherwise
    the jnp reference path (identical numerics)."""
    B, T, C = x.shape
    K, _, O = w.shape
    usable = (
        jax.devices()[0].platform != "cpu"  # Mosaic needs the TPU backend
        and C % 128 == 0
        and O % 128 == 0
        and B % batch_tile == 0
        and (O // groups) % 8 == 0
    )
    if not usable:
        return fused_conv1d_gn_mish_reference(x, w, b, gn_scale, gn_bias, groups, eps)

    grid = (B // batch_tile,)
    return pl.pallas_call(
        partial(_kernel, K=K, groups=groups, eps=eps),
        out_shape=jax.ShapeDtypeStruct((B, T, O), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((batch_tile, T, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C, O), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((O,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((O,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((O,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (batch_tile, T, O), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )(x, w, b, gn_scale, gn_bias)
