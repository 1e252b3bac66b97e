"""Pallas fused kernel equivalence tests (run in interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from cindm_tpu.ops.fused_conv_gn import (
    fused_conv1d_gn_mish_reference,
)
from cindm_tpu.models.blocks import Conv1dBlock


def test_reference_path_matches_flax_conv1dblock():
    """The fallback must match the Conv1dBlock module (conv k=5 pad 2 +
    GroupNorm(8) + Mish) given the same parameters."""
    B, T, C, O = 4, 24, 16, 32
    m = Conv1dBlock(O, kernel_size=5)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, C))
    params = m.init(jax.random.PRNGKey(1), x)
    want = np.asarray(m.apply(params, x))

    p = params["params"]
    w = p["Conv1d_0"]["Conv_0"]["kernel"]  # [K, C, O]
    b = p["Conv1d_0"]["Conv_0"]["bias"]
    gs = p["GroupNorm_0"]["GroupNorm_0"]["scale"]
    gb = p["GroupNorm_0"]["GroupNorm_0"]["bias"]
    got = np.asarray(fused_conv1d_gn_mish_reference(x, w, b, gs, gb, groups=8))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_kernel_matches_reference_interpret():
    """Pallas kernel vs jnp reference in interpreter mode (no TPU needed)."""
    from functools import partial

    import jax.experimental.pallas as pl

    from cindm_tpu.ops import fused_conv_gn as m

    B, T, C, O, K = 4, 24, 128, 128, 5
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (B, T, C))
    w = jax.random.normal(ks[1], (K, C, O)) * 0.1
    b = jax.random.normal(ks[2], (O,)) * 0.1
    gs = jnp.ones((O,)) + jax.random.normal(ks[3], (O,)) * 0.1
    gb = jax.random.normal(ks[4], (O,)) * 0.1

    want = np.asarray(m.fused_conv1d_gn_mish_reference(x, w, b, gs, gb))

    got = pl.pallas_call(
        partial(m._kernel, K=K, groups=8, eps=1e-5),
        out_shape=jax.ShapeDtypeStruct((B, T, O), x.dtype),
        grid=(2,),
        in_specs=[
            pl.BlockSpec((2, T, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((K, C, O), lambda i: (0, 0, 0)),
            pl.BlockSpec((O,), lambda i: (0,)),
            pl.BlockSpec((O,), lambda i: (0,)),
            pl.BlockSpec((O,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((2, T, O), lambda i: (i, 0, 0)),
        interpret=True,
    )(x, w, b, gs, gb)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def _rtb_params_to_args(p):
    """Map ResidualTemporalBlock params onto fused_rtb's argument list."""
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
    if "Conv1d_0" in p:  # residual 1x1 projection present
        a["wres"] = p["Conv1d_0"]["Conv_0"]["kernel"][0]  # [1, C, O] -> [C, O]
        a["bres"] = p["Conv1d_0"]["Conv_0"]["bias"]
    return a


def _rtb_temb(p, t_emb):
    from cindm_tpu.ops.fused_rtb import _mish

    d = p["Dense_0"]["Dense_0"]
    return _mish(t_emb) @ d["kernel"] + d["bias"]


def test_fused_rtb_reference_matches_flax_module():
    """fused_rtb_reference vs the ResidualTemporalBlock module, both with
    and without the 1x1 residual projection."""
    from cindm_tpu.models.blocks import ResidualTemporalBlock
    from cindm_tpu.ops.fused_rtb import fused_rtb_reference

    for C, O in [(16, 32), (32, 32)]:
        B, T, E = 4, 24, 64
        m = ResidualTemporalBlock(O, kernel_size=5)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, T, C))
        t_emb = jax.random.normal(jax.random.PRNGKey(1), (B, E))
        params = m.init(jax.random.PRNGKey(2), x, t_emb)
        want = np.asarray(m.apply(params, x, t_emb))

        p = params["params"]
        got = np.asarray(
            fused_rtb_reference(x, _rtb_temb(p, t_emb), **_rtb_params_to_args(p))
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_rtb_pallas_matches_reference_interpret():
    """Pallas fused-RTB kernel vs jnp reference in interpreter mode, for
    the identity-residual (C==O) and projection-residual (C!=O) variants."""
    from cindm_tpu.ops.fused_rtb import fused_rtb, fused_rtb_reference

    for C, O in [(128, 128), (128, 256)]:
        B, T, K = 4, 24, 5
        ks = jax.random.split(jax.random.PRNGKey(3), 12)
        x = jax.random.normal(ks[0], (B, T, C))
        temb = jax.random.normal(ks[1], (B, O))
        w1 = jax.random.normal(ks[2], (K, C, O)) * 0.05
        b1 = jax.random.normal(ks[3], (O,)) * 0.1
        gs1 = jnp.ones((O,)) + jax.random.normal(ks[4], (O,)) * 0.1
        gb1 = jax.random.normal(ks[5], (O,)) * 0.1
        w2 = jax.random.normal(ks[6], (K, O, O)) * 0.05
        b2 = jax.random.normal(ks[7], (O,)) * 0.1
        gs2 = jnp.ones((O,)) + jax.random.normal(ks[8], (O,)) * 0.1
        gb2 = jax.random.normal(ks[9], (O,)) * 0.1
        if C == O:
            wres = bres = None
        else:
            wres = jax.random.normal(ks[10], (C, O)) * 0.05
            bres = jax.random.normal(ks[11], (O,)) * 0.1

        want = np.asarray(
            fused_rtb_reference(x, temb, w1, b1, gs1, gb1, w2, b2, gs2, gb2,
                                wres, bres)
        )
        got = np.asarray(
            fused_rtb(x, temb, w1, b1, gs1, gb1, w2, b2, gs2, gb2, wres, bres,
                      batch_tile=2, interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
