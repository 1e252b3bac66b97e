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
