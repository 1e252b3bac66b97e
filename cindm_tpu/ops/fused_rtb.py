"""Pallas TPU kernel: fully fused ResidualTemporalBlock.

The roofline attribution (RESULTS.md round 4, `results/roofline.json`)
found every layer class of the 1D denoiser bandwidth-bound, and named the
remaining perf lever "a cross-layer-resident Pallas megakernel (keeping
full stages in VMEM)". This kernel is that experiment at the
ResidualTemporalBlock granularity (`model/diffusion_1d.py:483-511` in the
reference): the whole block —

    h  = Mish(GN(conv5(x)))          # Conv1dBlock 1
    h += temb_proj[:, None, :]       # time embedding (projected outside)
    h  = Mish(GN(conv5(h)))          # Conv1dBlock 2
    out = h + (x @ Wres + bres | x)  # 1x1 residual projection

— runs in ONE pallas_call per batch tile, so the two conv accumulators,
both GroupNorm normalizations and the residual add never round-trip to
HBM. XLA already fuses GN+Mish into each conv's epilogue, but it
materializes h between the two convs and the block output between blocks;
at the flagship shapes (fold batch ≈5.4k × T≤24 × C≤512) those
materializations are the dominant HBM traffic.

Semantics are bit-comparable to the jnp reference below (same fp32
accumulation, biased variance, eps) — verified in tests/test_ops.py with
interpret mode on CPU. Shapes that don't map onto the 128-lane tiling
fall back to the reference path (identical numerics).

The time-embedding projection (Dense(mish(t_emb))) stays OUTSIDE: it is a
[B, 4C]x[4C, C] matmul over the un-tiled batch that XLA fuses well, and
keeping it out lets one projected temb be reused across the kernel's
batch tiles without reloading the Dense weights per tile.
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


def fused_rtb_reference(
    x: jax.Array,  # [B, T, Cin]
    temb: jax.Array,  # [B, O] — already Dense(mish(t_emb))
    w1: jax.Array,  # [K, Cin, O]
    b1: jax.Array,
    gs1: jax.Array,
    gb1: jax.Array,
    w2: jax.Array,  # [K, O, O]
    b2: jax.Array,
    gs2: jax.Array,
    gb2: jax.Array,
    wres: jax.Array | None = None,  # [Cin, O] 1x1 residual (None => identity)
    bres: jax.Array | None = None,
    groups: int = 8,
    eps: float = 1e-5,
) -> jax.Array:
    """jnp fallback with identical semantics (torch Conv1d pad=K//2 +
    GroupNorm + Mish, twice, with temb add and residual)."""

    def conv_gn_mish(h, w, b, gs, gb):
        K = w.shape[0]
        pad = K // 2
        out = jax.lax.conv_general_dilated(
            h, w, window_strides=(1,), padding=[(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + b
        B, T, O = out.shape
        g = out.reshape(B, T, groups, O // groups)
        mean = jnp.mean(g, axis=(1, 3), keepdims=True)
        var = jnp.var(g, axis=(1, 3), keepdims=True)
        g = (g - mean) * jax.lax.rsqrt(var + eps)
        return _mish(g.reshape(B, T, O) * gs + gb)

    h = conv_gn_mish(x, w1, b1, gs1, gb1)
    h = h + temb[:, None, :]
    h = conv_gn_mish(h, w2, b2, gs2, gb2)
    if wres is None:
        res = x
    else:
        res = jnp.einsum("btc,co->bto", x, wres) + bres
    return h + res


def _conv_gn_mish_tile(x, w_ref, b_ref, gs_ref, gb_ref, *, K, groups, eps):
    """One Conv1dBlock on a [Bt, T, C] VMEM tile; returns [Bt*T, O] fp32.

    Same one-hot-matmul GroupNorm trick as fused_conv_gn._kernel — Mosaic
    rejects the 4D [Bt, T, G, O/G] reshape, so group/sample reductions ride
    the MXU via one-hot matrices.
    """
    Bt, T, C = x.shape
    O = w_ref.shape[2]
    pad = K // 2
    acc = jnp.zeros((Bt * T, O), jnp.float32)
    for k in range(K):
        shift = k - pad
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

    og = O // groups
    ch = jax.lax.broadcasted_iota(jnp.int32, (O, groups), 0) // og
    gid = jax.lax.broadcasted_iota(jnp.int32, (O, groups), 1)
    Mg = (ch == gid).astype(jnp.float32)  # [O, G]
    row = jax.lax.broadcasted_iota(jnp.int32, (Bt * T, Bt), 0) // T
    sid = jax.lax.broadcasted_iota(jnp.int32, (Bt * T, Bt), 1)
    S = (row == sid).astype(jnp.float32)  # [Bt*T, Bt]

    denom = 1.0 / (T * og)
    gsum = jnp.dot(acc, Mg, preferred_element_type=jnp.float32, precision=_HI)
    mean = jnp.dot(S.T, gsum, preferred_element_type=jnp.float32, precision=_HI) * denom
    g2 = jnp.dot(acc * acc, Mg, preferred_element_type=jnp.float32, precision=_HI)
    m2 = jnp.dot(S.T, g2, preferred_element_type=jnp.float32, precision=_HI) * denom
    mean_b = jnp.dot(jnp.dot(S, mean, preferred_element_type=jnp.float32, precision=_HI), Mg.T,
                     preferred_element_type=jnp.float32, precision=_HI)
    m2_b = jnp.dot(jnp.dot(S, m2, preferred_element_type=jnp.float32, precision=_HI), Mg.T,
                   preferred_element_type=jnp.float32, precision=_HI)
    var_b = m2_b - mean_b * mean_b
    out = (acc - mean_b) * jax.lax.rsqrt(var_b + eps)
    out = out * gs_ref[:][None, :] + gb_ref[:][None, :]
    return _mish(out), S


def _kernel_proj(x_ref, temb_ref, w1_ref, b1_ref, gs1_ref, gb1_ref,
                 w2_ref, b2_ref, gs2_ref, gb2_ref, wres_ref, bres_ref,
                 o_ref, *, K, groups, eps):
    x = x_ref[:]
    Bt, T, C = x.shape
    O = w1_ref.shape[2]
    h, S = _conv_gn_mish_tile(x, w1_ref, b1_ref, gs1_ref, gb1_ref,
                              K=K, groups=groups, eps=eps)
    # temb broadcast [Bt, O] -> [Bt*T, O] via the sample one-hot on the MXU
    h = h + jnp.dot(S, temb_ref[:].astype(jnp.float32),
                    preferred_element_type=jnp.float32, precision=_HI)
    h2, _ = _conv_gn_mish_tile(h.reshape(Bt, T, O), w2_ref, b2_ref,
                               gs2_ref, gb2_ref, K=K, groups=groups, eps=eps)
    res = jnp.dot(x.reshape(Bt * T, C), wres_ref[:],
                  preferred_element_type=jnp.float32) + bres_ref[:][None, :]
    o_ref[:] = (h2 + res).reshape(Bt, T, O).astype(o_ref.dtype)


def _kernel_id(x_ref, temb_ref, w1_ref, b1_ref, gs1_ref, gb1_ref,
               w2_ref, b2_ref, gs2_ref, gb2_ref,
               o_ref, *, K, groups, eps):
    x = x_ref[:]
    Bt, T, C = x.shape
    O = w1_ref.shape[2]
    h, S = _conv_gn_mish_tile(x, w1_ref, b1_ref, gs1_ref, gb1_ref,
                              K=K, groups=groups, eps=eps)
    h = h + jnp.dot(S, temb_ref[:].astype(jnp.float32),
                    preferred_element_type=jnp.float32, precision=_HI)
    h2, _ = _conv_gn_mish_tile(h.reshape(Bt, T, O), w2_ref, b2_ref,
                               gs2_ref, gb2_ref, K=K, groups=groups, eps=eps)
    o_ref[:] = (h2 + x.reshape(Bt * T, C).astype(jnp.float32)).reshape(
        Bt, T, O).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("groups", "eps", "batch_tile", "interpret"))
def fused_rtb(
    x: jax.Array,
    temb: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    gs1: jax.Array,
    gb1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    gs2: jax.Array,
    gb2: jax.Array,
    wres: jax.Array | None = None,
    bres: jax.Array | None = None,
    groups: int = 8,
    eps: float = 1e-5,
    batch_tile: int = 32,
    interpret: bool = False,
) -> jax.Array:
    """Fused ResidualTemporalBlock. Pallas when the channel dims map onto
    the 128-lane tiling and the batch divides the tile; jnp reference
    otherwise (identical numerics)."""
    B, T, C = x.shape
    K, _, O = w1.shape
    usable = (
        jax.devices()[0].platform != "cpu"  # Mosaic needs the TPU backend
        and C % 128 == 0
        and O % 128 == 0
        and B % batch_tile == 0
        and (O // groups) % 8 == 0
        and ((wres is None) == (C == O))
    )
    if not usable and not interpret:
        return fused_rtb_reference(
            x, temb, w1, b1, gs1, gb1, w2, b2, gs2, gb2, wres, bres, groups, eps
        )

    grid = (B // batch_tile,)
    vec = lambda n: pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM)
    w_spec = lambda w: pl.BlockSpec(w.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((batch_tile, T, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((batch_tile, O), lambda i: (i, 0), memory_space=pltpu.VMEM),
        w_spec(w1), vec(O), vec(O), vec(O),
        w_spec(w2), vec(O), vec(O), vec(O),
    ]
    args = [x, temb, w1, b1, gs1, gb1, w2, b2, gs2, gb2]
    if wres is not None:
        in_specs += [
            pl.BlockSpec((C, O), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec(O),
        ]
        args += [wres, bres]
        kern = _kernel_proj
    else:
        kern = _kernel_id
    return pl.pallas_call(
        partial(kern, K=K, groups=groups, eps=eps),
        out_shape=jax.ShapeDtypeStruct((B, T, O), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (batch_tile, T, O), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(*args)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fused_rtb_cv(groups, eps, batch_tile, x, temb,
                  w1, b1, gs1, gb1, w2, b2, gs2, gb2, wres, bres):
    return fused_rtb(x, temb, w1, b1, gs1, gb1, w2, b2, gs2, gb2, wres, bres,
                     groups=groups, eps=eps, batch_tile=batch_tile)


def _fused_rtb_cv_fwd(groups, eps, batch_tile, *args):
    return _fused_rtb_cv(groups, eps, batch_tile, *args), args


def _fused_rtb_cv_bwd(groups, eps, batch_tile, res, g):
    _, vjp = jax.vjp(
        lambda *a: fused_rtb_reference(*a, groups=groups, eps=eps), *res
    )
    return vjp(g)


_fused_rtb_cv.defvjp(_fused_rtb_cv_fwd, _fused_rtb_cv_bwd)


def fused_rtb_differentiable(
    x, temb, w1, b1, gs1, gb1, w2, b2, gs2, gb2, wres=None, bres=None,
    groups: int = 8, eps: float = 1e-5, batch_tile: int = 32,
):
    """fused_rtb with a VJP: forward runs the Pallas kernel, backward
    rematerializes through the jnp reference (identical numerics) so
    guided sampling can differentiate design objectives through the
    denoiser (`sampling/sampler.py` standard/universal guidance)."""
    return _fused_rtb_cv(groups, eps, batch_tile, x, temb,
                         w1, b1, gs1, gb1, w2, b2, gs2, gb2, wres, bres)
