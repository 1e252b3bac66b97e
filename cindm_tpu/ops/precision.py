"""Mixed-precision helpers for the sampling hot path.

TPU v5e MXU peaks in bfloat16; the DDPM buffer math stays float32 for
stability while the denoiser body (convs/matmuls — all the FLOPs) runs in
bf16. This roughly halves HBM traffic for activations, which is the usual
bound for the small-horizon TemporalUnet1D workloads (SURVEY.md §6).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype):
    return jax.tree.map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a, tree
    )


def bf16_eps_model(apply_fn: Callable, params) -> Callable:
    """Wrap a denoiser apply into a bf16-body ε-model: params and activations
    bfloat16, inputs/outputs float32 at the boundary."""
    params_bf16 = cast_floating(params, jnp.bfloat16)

    def eps_model(x: jax.Array, t: jax.Array) -> jax.Array:
        out = apply_fn(params_bf16, x.astype(jnp.bfloat16), t)
        return out.astype(jnp.float32)

    return eps_model
