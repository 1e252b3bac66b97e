"""Params-compatible TemporalUnet1D forward with fused-RTB Pallas blocks.

Walks the exact module structure of `TemporalUnet1D.__call__`
(`models/unet1d.py`, reference `model/diffusion_1d.py:517-646`) over an
UNCHANGED param tree: every non-ResidualTemporalBlock submodule is applied
via its own Flax module on its param subtree, and every Pallas-eligible
ResidualTemporalBlock (channels on the 128-lane tiling) goes through
`ops.fused_rtb` — the whole block in one VMEM-resident kernel. Ineligible
blocks (the dim-64 stages and the 8-channel stem) fall back to the module.

Because the tree layout is identical, this forward is a drop-in for
`model.apply(params, x, t)` on any existing checkpoint — no conversion.
Flax auto-names children `{Class}_{i}` with one counter per class in call
order; `_Namer` replicates that rule.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.fused_rtb import fused_rtb_differentiable
from .blocks import (
    ChannelLayerNorm,
    Conv1d,
    Conv1dBlock,
    Dense,
    Downsample1d,
    LinearAttentionTemporal,
    ResidualTemporalBlock,
    SinusoidalPosEmb,
    Upsample1d,
    mish,
)
from .unet1d import TemporalUnet1D, _stage_flags


class _Namer:
    """Replicates flax.linen auto-naming: {Class}_{per-class counter}."""

    def __init__(self):
        self.counts: dict[str, int] = {}

    def __call__(self, cls_name: str) -> str:
        i = self.counts.get(cls_name, 0)
        self.counts[cls_name] = i + 1
        return f"{cls_name}_{i}"


def _rtb_fused_args(p: dict) -> dict:
    a = dict(
        w1=p["Conv1dBlock_0"]["Conv1d_0"]["Conv_0"]["kernel"],
        b1=p["Conv1dBlock_0"]["Conv1d_0"]["Conv_0"]["bias"],
        gs1=p["Conv1dBlock_0"]["GroupNorm_0"]["GroupNorm_0"]["scale"],
        gb1=p["Conv1dBlock_0"]["GroupNorm_0"]["GroupNorm_0"]["bias"],
        w2=p["Conv1dBlock_1"]["Conv1d_0"]["Conv_0"]["kernel"],
        b2=p["Conv1dBlock_1"]["Conv1d_0"]["Conv_0"]["bias"],
        gs2=p["Conv1dBlock_1"]["GroupNorm_0"]["GroupNorm_0"]["scale"],
        gb2=p["Conv1dBlock_1"]["GroupNorm_0"]["GroupNorm_0"]["bias"],
    )
    if "Conv1d_0" in p:
        a["wres"] = p["Conv1d_0"]["Conv_0"]["kernel"][0]
        a["bres"] = p["Conv1d_0"]["Conv_0"]["bias"]
    return a


def temporal_unet1d_fused_apply(
    model: TemporalUnet1D,
    variables: dict,
    x: jnp.ndarray,
    time: jnp.ndarray,
    batch_tile: int = 32,
) -> jnp.ndarray:
    """Drop-in for `model.apply(variables, x, time)` routing eligible
    ResidualTemporalBlocks through the fused Pallas kernel."""
    params = variables["params"] if "params" in variables else variables
    nm = _Namer()

    def apply_mod(mod, *args):
        name = nm(type(mod).__name__)
        # param-free modules (SinusoidalPosEmb) have no subtree
        return mod.apply({"params": params.get(name, {})}, *args)

    def apply_attn(dim: int, h):
        # PreNormResidual(dim, LinearAttentionTemporal(dim)): the attention
        # module is constructed in the PARENT's compact scope, so flax
        # registers it as a top-level sibling (LinearAttentionTemporal_k),
        # while PreNormResidual_k holds only the ChannelLayerNorm.
        pn = params[nm("PreNormResidual")]
        at = params[nm("LinearAttentionTemporal")]
        ln = ChannelLayerNorm(dim).apply({"params": pn["ChannelLayerNorm_0"]}, h)
        return LinearAttentionTemporal(dim).apply({"params": at}, ln) + h

    def apply_rtb(dim_out: int, h, t):
        name = nm("ResidualTemporalBlock")
        p = params[name]
        B, T, C = h.shape
        O = p["Conv1dBlock_0"]["Conv1d_0"]["Conv_0"]["kernel"].shape[2]
        # Measured policy (results/fused_rtb_bench.json, v5e, fold batch
        # 5376): the kernel beats XLA only on the non-contracting wide
        # blocks — C_in >= 256 and C_out >= C_in (up to 3.3x there); on
        # narrow or channel-contracting blocks XLA's own fusion wins.
        eligible = (
            C % 128 == 0 and O % 128 == 0 and B % batch_tile == 0
            and (O // 8) % 8 == 0 and C >= 256 and O >= C
        )
        if not eligible:
            return ResidualTemporalBlock(dim_out).apply({"params": p}, h, t)
        dk = p["Dense_0"]["Dense_0"]
        temb = mish(t) @ dk["kernel"] + dk["bias"]
        return fused_rtb_differentiable(h, temb, **_rtb_fused_args(p),
                                        batch_tile=batch_tile)

    dims = [model.transition_dim] + [model.dim * m for m in model.dim_mults]
    in_out = list(zip(dims[:-1], dims[1:]))
    num_res = len(in_out)
    down_flags, up_flags = _stage_flags(model.horizon, num_res)

    t = apply_mod(SinusoidalPosEmb(model.dim), time)
    t = apply_mod(Dense(model.dim * 4), t)
    t = mish(t)
    t = apply_mod(Dense(model.dim), t)

    hs = []
    for ind, (_, dim_out) in enumerate(in_out):
        x = apply_rtb(dim_out, x, t)
        x = apply_rtb(dim_out, x, t)
        if model.attention:
            x = apply_attn(dim_out, x)
        hs.append(x)
        if down_flags[ind]:
            x = apply_mod(Downsample1d(dim_out), x)

    mid_dim = dims[-1]
    x = apply_rtb(mid_dim, x, t)
    if model.attention:
        x = apply_attn(mid_dim, x)
    x = apply_rtb(mid_dim, x, t)

    up_in_out = list(reversed(in_out[1:]))
    for ind, (dim_in, dim_out) in enumerate(up_in_out):
        x = jnp.concatenate([x, hs.pop()], axis=-1)
        x = apply_rtb(dim_out, x, t)
        x = apply_rtb(dim_in, x, t)
        if model.attention:
            x = apply_attn(dim_in, x)
        if up_flags[ind]:
            x = apply_mod(Upsample1d(dim_in), x)

    x = apply_mod(Conv1dBlock(model.dim, kernel_size=5), x)
    x = apply_mod(Conv1d(model.transition_dim, 1), x)
    return x
