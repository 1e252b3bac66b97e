"""Convert reference PyTorch checkpoints to cindm_tpu Flax params.

The reference ships torch ``.pt`` milestone dicts {step, model, opt, ema,
scaler} (`model/diffusion_1d.py:2635-2647`). This module maps a
`TemporalUnet1D` state_dict (layout per `model/diffusion_1d.py:517-608`)
onto our Flax `models.TemporalUnet1D` parameter tree so reference-trained
weights can be loaded for parity validation.

Per-layer weight transforms:
- torch Conv1d [O, C, K]      → flax Conv kernel [K, C, O]
- torch Linear [O, I]         → flax Dense kernel [I, O]
- torch GroupNorm weight/bias → flax GroupNorm scale/bias
- torch ConvTranspose1d [C, O, K] → flax ConvTranspose kernel [K, C, O],
  with a kernel flip along K (torch's transposed conv correlates with the
  flipped kernel relative to lax.conv_transpose's default).
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np


def _conv1d(w):  # [O, C, K] -> [K, C, O]
    return jnp.asarray(np.transpose(np.asarray(w), (2, 1, 0)))


def _linear(w):  # [O, I] -> [I, O]
    return jnp.asarray(np.transpose(np.asarray(w)))


def _convT1d(w):  # [C, O, K] -> [K, C, O], flipped along K
    return jnp.asarray(np.transpose(np.asarray(w), (2, 0, 1))[::-1].copy())


def _arr(w):
    return jnp.asarray(np.asarray(w))


def _rtb(sd: Mapping, prefix: str) -> dict:
    """ResidualTemporalBlock (`model/diffusion_1d.py:483-511`): two
    Conv1dBlocks + time Dense + optional 1×1 residual conv."""
    out = {}
    for bi in (0, 1):
        blk = {
            "Conv1d_0": {
                "Conv_0": {
                    "kernel": _conv1d(sd[f"{prefix}.blocks.{bi}.block.0.weight"]),
                    "bias": _arr(sd[f"{prefix}.blocks.{bi}.block.0.bias"]),
                }
            },
            "GroupNorm_0": {
                "GroupNorm_0": {
                    "scale": _arr(sd[f"{prefix}.blocks.{bi}.block.2.weight"]),
                    "bias": _arr(sd[f"{prefix}.blocks.{bi}.block.2.bias"]),
                }
            },
        }
        out[f"Conv1dBlock_{bi}"] = blk
    out["Dense_0"] = {
        "Dense_0": {
            "kernel": _linear(sd[f"{prefix}.time_mlp.1.weight"]),
            "bias": _arr(sd[f"{prefix}.time_mlp.1.bias"]),
        }
    }
    if f"{prefix}.residual_conv.weight" in sd:
        out["Conv1d_0"] = {
            "Conv_0": {
                "kernel": _conv1d(sd[f"{prefix}.residual_conv.weight"]),
                "bias": _arr(sd[f"{prefix}.residual_conv.bias"]),
            }
        }
    return out


def _attn(sd: Mapping, prefix: str) -> tuple[dict, dict]:
    """Residual(PreNorm(LinearAttentionTemporal)) (`model/diffusion_1d.py:272-291`).

    Returns (prenorm_params, attention_params): Flax scopes the attention
    module to the *parent* (it is passed into PreNormResidual as an
    attribute), so the two live side by side in the tree."""
    # torch to_qkv: Conv1d 1x1 no bias [3H, C, 1] → Dense [C, 3H]
    qkv = np.asarray(sd[f"{prefix}.fn.fn.to_qkv.weight"])[:, :, 0].T
    out_w = np.asarray(sd[f"{prefix}.fn.fn.to_out.weight"])[:, :, 0].T
    prenorm = {
        "ChannelLayerNorm_0": {"g": _arr(np.asarray(sd[f"{prefix}.fn.norm.g"])[0, :, 0])}
    }
    attn = {
        "Dense_0": {"Dense_0": {"kernel": jnp.asarray(qkv)}},
        "Dense_1": {
            "Dense_0": {
                "kernel": jnp.asarray(out_w),
                "bias": _arr(sd[f"{prefix}.fn.fn.to_out.bias"]),
            }
        },
    }
    return prenorm, attn


def convert_temporal_unet1d(
    state_dict: Mapping,
    horizon: int = 24,
    dim_mults: tuple = (1, 2, 4, 8),
    attention: bool = True,
) -> dict:
    """Map a reference TemporalUnet1D state_dict to our Flax params tree.

    Returns {"params": {...}} suitable for `models.TemporalUnet1D.apply`.
    """
    from ..models.unet1d import _stage_flags

    sd = state_dict
    num_res = len(dim_mults)
    down_flags, up_flags = _stage_flags(horizon, num_res)

    p: dict = {}
    # time MLP (`model/diffusion_1d.py:537-542`)
    p["Dense_0"] = {
        "Dense_0": {
            "kernel": _linear(sd["time_mlp.1.weight"]),
            "bias": _arr(sd["time_mlp.1.bias"]),
        }
    }
    p["Dense_1"] = {
        "Dense_0": {
            "kernel": _linear(sd["time_mlp.3.weight"]),
            "bias": _arr(sd["time_mlp.3.bias"]),
        }
    }

    rtb_i = attn_i = down_i = up_i = 0
    for i in range(num_res):
        p[f"ResidualTemporalBlock_{rtb_i}"] = _rtb(sd, f"downs.{i}.0"); rtb_i += 1
        p[f"ResidualTemporalBlock_{rtb_i}"] = _rtb(sd, f"downs.{i}.1"); rtb_i += 1
        if attention:
            pn, at = _attn(sd, f"downs.{i}.2")
            p[f"PreNormResidual_{attn_i}"] = pn
            p[f"LinearAttentionTemporal_{attn_i}"] = at
            attn_i += 1
        if down_flags[i]:
            p[f"Downsample1d_{down_i}"] = {
                "Conv1d_0": {
                    "Conv_0": {
                        "kernel": _conv1d(sd[f"downs.{i}.3.conv.weight"]),
                        "bias": _arr(sd[f"downs.{i}.3.conv.bias"]),
                    }
                }
            }
            down_i += 1

    p[f"ResidualTemporalBlock_{rtb_i}"] = _rtb(sd, "mid_block1"); rtb_i += 1
    if attention:
        pn, at = _attn(sd, "mid_attn")
        p[f"PreNormResidual_{attn_i}"] = pn
        p[f"LinearAttentionTemporal_{attn_i}"] = at
        attn_i += 1
    p[f"ResidualTemporalBlock_{rtb_i}"] = _rtb(sd, "mid_block2"); rtb_i += 1

    for i in range(num_res - 1):
        p[f"ResidualTemporalBlock_{rtb_i}"] = _rtb(sd, f"ups.{i}.0"); rtb_i += 1
        p[f"ResidualTemporalBlock_{rtb_i}"] = _rtb(sd, f"ups.{i}.1"); rtb_i += 1
        if attention:
            pn, at = _attn(sd, f"ups.{i}.2")
            p[f"PreNormResidual_{attn_i}"] = pn
            p[f"LinearAttentionTemporal_{attn_i}"] = at
            attn_i += 1
        if up_flags[i]:
            p[f"Upsample1d_{up_i}"] = {
                "ConvTranspose_0": {
                    "kernel": _convT1d(sd[f"ups.{i}.3.conv.weight"]),
                    "bias": _arr(sd[f"ups.{i}.3.conv.bias"]),
                }
            }
            up_i += 1

    p["Conv1dBlock_0"] = {
        "Conv1d_0": {
            "Conv_0": {
                "kernel": _conv1d(sd["final_conv.0.block.0.weight"]),
                "bias": _arr(sd["final_conv.0.block.0.bias"]),
            }
        },
        "GroupNorm_0": {
            "GroupNorm_0": {
                "scale": _arr(sd["final_conv.0.block.2.weight"]),
                "bias": _arr(sd["final_conv.0.block.2.bias"]),
            }
        },
    }
    p["Conv1d_0"] = {
        "Conv_0": {
            "kernel": _conv1d(sd["final_conv.1.weight"]),
            "bias": _arr(sd["final_conv.1.bias"]),
        }
    }
    return {"params": p}


def _conv2d(w):  # [O, I, kh, kw] -> [kh, kw, I, O]
    return jnp.asarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _resnet2d(sd: Mapping, prefix: str) -> dict:
    """ResnetBlock 2D (`model/diffusion_2d.py:200-224`): FiLM time Dense +
    two (WSConv, GroupNorm) blocks + optional 1×1 residual conv."""
    out = {}
    if f"{prefix}.mlp.1.weight" in sd:
        out["Dense_0"] = {
            "Dense_0": {
                "kernel": _linear(sd[f"{prefix}.mlp.1.weight"]),
                "bias": _arr(sd[f"{prefix}.mlp.1.bias"]),
            }
        }
    for bi, blk in ((0, "block1"), (1, "block2")):
        out[f"Block2D_{bi}"] = {
            "WSConv2d_0": {
                "kernel": _conv2d(sd[f"{prefix}.{blk}.proj.weight"]),
                "bias": _arr(sd[f"{prefix}.{blk}.proj.bias"]),
            },
            "GroupNorm_0": {
                "scale": _arr(sd[f"{prefix}.{blk}.norm.weight"]),
                "bias": _arr(sd[f"{prefix}.{blk}.norm.bias"]),
            },
        }
    if f"{prefix}.res_conv.weight" in sd:
        out["Conv2d_0"] = {
            "Conv_0": {
                "kernel": _conv2d(sd[f"{prefix}.res_conv.weight"]),
                "bias": _arr(sd[f"{prefix}.res_conv.bias"]),
            }
        }
    return out


def _conv2d_wrap(sd: Mapping, prefix: str) -> dict:
    return {
        "Conv_0": {
            "kernel": _conv2d(sd[f"{prefix}.weight"]),
            "bias": _arr(sd[f"{prefix}.bias"]),
        }
    }


def _attn2d(sd: Mapping, prefix: str, full: bool) -> tuple[dict, dict]:
    """Residual(PreNorm(LinearAttention|Attention)) 2D
    (`model/diffusion_2d.py:226-278`). Returns (prenorm, attention) params;
    like the 1D case the attention module is scoped to the parent."""
    prenorm = {
        "ChannelLayerNorm_0": {"g": _arr(np.asarray(sd[f"{prefix}.fn.norm.g"])[0, :, 0, 0])}
    }
    qkv = np.asarray(sd[f"{prefix}.fn.fn.to_qkv.weight"])[:, :, 0, 0].T
    if full:  # Attention: to_out is a bare Conv2d
        out_w = np.asarray(sd[f"{prefix}.fn.fn.to_out.weight"])[:, :, 0, 0].T
        attn = {
            "FullAttention_0": {
                "Dense_0": {"Dense_0": {"kernel": jnp.asarray(qkv)}},
                "Dense_1": {
                    "Dense_0": {
                        "kernel": jnp.asarray(out_w),
                        "bias": _arr(sd[f"{prefix}.fn.fn.to_out.bias"]),
                    }
                },
            }
        }
    else:  # LinearAttention: to_out = Sequential(Conv2d 1×1, LayerNorm)
        out_w = np.asarray(sd[f"{prefix}.fn.fn.to_out.0.weight"])[:, :, 0, 0].T
        attn = {
            "Dense_0": {"Dense_0": {"kernel": jnp.asarray(qkv)}},
            "Dense_1": {
                "Dense_0": {
                    "kernel": jnp.asarray(out_w),
                    "bias": _arr(sd[f"{prefix}.fn.fn.to_out.0.bias"]),
                }
            },
            "ChannelLayerNorm_0": {
                "g": _arr(np.asarray(sd[f"{prefix}.fn.fn.to_out.1.g"])[0, :, 0, 0])
            },
        }
    return prenorm, attn


def convert_unet2d(state_dict: Mapping, dim_mults: tuple = (1, 2)) -> dict:
    """Map a reference 2D `Unet` state_dict (`model/diffusion_2d.py:281-408`)
    to our Flax `models.Unet2D` params tree."""
    sd = state_dict
    num_res = len(dim_mults)
    p: dict = {"Conv2d_0": _conv2d_wrap(sd, "init_conv")}
    p["Dense_0"] = {
        "Dense_0": {
            "kernel": _linear(sd["time_mlp.1.weight"]),
            "bias": _arr(sd["time_mlp.1.bias"]),
        }
    }
    p["Dense_1"] = {
        "Dense_0": {
            "kernel": _linear(sd["time_mlp.3.weight"]),
            "bias": _arr(sd["time_mlp.3.bias"]),
        }
    }
    rtb = attn = down = up = 0
    conv = 1  # Conv2d_0 is the init conv
    for i in range(num_res):
        p[f"ResnetBlock2D_{rtb}"] = _resnet2d(sd, f"downs.{i}.0"); rtb += 1
        p[f"ResnetBlock2D_{rtb}"] = _resnet2d(sd, f"downs.{i}.1"); rtb += 1
        pn, at = _attn2d(sd, f"downs.{i}.2", full=False)
        p[f"PreNormResidual2D_{attn}"] = pn
        p[f"LinearAttention2D_{attn}"] = at
        attn += 1
        if i < num_res - 1:  # Downsample = Sequential(Rearrange, Conv 1×1)
            p[f"Downsample2D_{down}"] = {"Conv2d_0": _conv2d_wrap(sd, f"downs.{i}.3.1")}
            down += 1
        else:  # last: plain 3×3 conv
            p[f"Conv2d_{conv}"] = _conv2d_wrap(sd, f"downs.{i}.3")
            conv += 1

    p[f"ResnetBlock2D_{rtb}"] = _resnet2d(sd, "mid_block1"); rtb += 1
    pn, at = _attn2d(sd, "mid_attn", full=True)
    p[f"PreNormResidual2D_{attn}"] = pn
    p["Attention2D_0"] = at
    attn += 1
    p[f"ResnetBlock2D_{rtb}"] = _resnet2d(sd, "mid_block2"); rtb += 1

    for i in range(num_res):
        p[f"ResnetBlock2D_{rtb}"] = _resnet2d(sd, f"ups.{i}.0"); rtb += 1
        p[f"ResnetBlock2D_{rtb}"] = _resnet2d(sd, f"ups.{i}.1"); rtb += 1
        pn, at = _attn2d(sd, f"ups.{i}.2", full=False)
        p[f"PreNormResidual2D_{attn}"] = pn
        p[f"LinearAttention2D_{attn - 1}"] = at  # Attention2D_0 took no LA slot
        attn += 1
        if i < num_res - 1:  # Upsample = Sequential(nearest, Conv 3×3)
            p[f"Upsample2D_{up}"] = {"Conv2d_0": _conv2d_wrap(sd, f"ups.{i}.3.1")}
            up += 1
        else:
            p[f"Conv2d_{conv}"] = _conv2d_wrap(sd, f"ups.{i}.3")
            conv += 1

    p[f"ResnetBlock2D_{rtb}"] = _resnet2d(sd, "final_res_block")
    p[f"Conv2d_{conv}"] = _conv2d_wrap(sd, "final_conv")
    return {"params": p}


def convert_forceunet(state_dict: Mapping, dim_mults: tuple = (1, 2, 4, 8)) -> dict:
    """Map a reference `ForceUnet` state_dict (`model/diffusion_2d.py:411-486`)
    to our Flax `models.ForceUnet` params tree (encoder + pool + Linear(2))."""
    sd = state_dict
    num_res = len(dim_mults)
    p: dict = {"Conv2d_0": _conv2d_wrap(sd, "init_conv")}
    rtb = attn = down = 0
    conv = 1
    for i in range(num_res):
        p[f"ResnetBlock2D_{rtb}"] = _resnet2d(sd, f"downs.{i}.0"); rtb += 1
        p[f"ResnetBlock2D_{rtb}"] = _resnet2d(sd, f"downs.{i}.1"); rtb += 1
        pn, at = _attn2d(sd, f"downs.{i}.2", full=False)
        p[f"PreNormResidual2D_{attn}"] = pn
        p[f"LinearAttention2D_{attn}"] = at
        attn += 1
        if i < num_res - 1:
            p[f"Downsample2D_{down}"] = {"Conv2d_0": _conv2d_wrap(sd, f"downs.{i}.3.1")}
            down += 1
        else:
            p[f"Conv2d_{conv}"] = _conv2d_wrap(sd, f"downs.{i}.3")
            conv += 1
    p[f"ResnetBlock2D_{rtb}"] = _resnet2d(sd, "mid_block1"); rtb += 1
    pn, at = _attn2d(sd, "mid_attn", full=True)
    p[f"PreNormResidual2D_{attn}"] = pn
    p["Attention2D_0"] = at
    p[f"ResnetBlock2D_{rtb}"] = _resnet2d(sd, "mid_block2"); rtb += 1
    p["Dense_0"] = {
        "Dense_0": {
            "kernel": _linear(sd["final.weight"]),
            "bias": _arr(sd["final.bias"]),
        }
    }
    return {"params": p}


def load_reference_checkpoint(path: str, **kwargs) -> dict:
    """Load a reference `model-{k}.pt` and convert its EMA (preferred) or
    raw model weights."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("ema", ckpt.get("model", ckpt))
    # The reference saves ema.state_dict() of EMA(GaussianDiffusion1D), so
    # Unet weights are nested TWO levels deep: 'ema_model.model.*' (the EMA
    # wrapper around the diffusion wrapper around the Unet). Strip each
    # prefix level in turn; each keep-only filter also drops the sibling
    # keys at that level (online_model.* / initted / step at the EMA level,
    # betas / alphas_cumprod / loss_weight buffers at the diffusion level).
    if any(k.startswith("ema_model.") for k in sd):
        sd = {k[len("ema_model."):]: v for k, v in sd.items() if k.startswith("ema_model.")}
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return convert_temporal_unet1d(sd, **kwargs)
