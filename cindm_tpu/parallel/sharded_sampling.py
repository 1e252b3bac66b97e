"""Batch-sharded sampling over a device mesh.

The TPU-native scaling path for inference (SURVEY.md §2.6): each chip
denoises a shard of the candidate-design batch. The sampler body is pure
SPMD — there is no cross-sample communication in guided diffusion — so
sharding the batch axis gives linear scaling over ICI without code changes
to the samplers; XLA partitions the whole scan.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_sharded_sampler(sample_fn: Callable, mesh: Mesh) -> Callable:
    """Wrap a sampler fn(key, ...) -> [B, ...] so its output batch axis is
    sharded over the mesh 'data' axis. The caller passes a per-call batch
    that divides the mesh size."""
    out_sharding = NamedSharding(mesh, P("data"))

    @partial(jax.jit, out_shardings=out_sharding)
    def sharded(key, *args, **kwargs):
        return sample_fn(key, *args, **kwargs)

    return sharded


def shard_design_batch(mesh: Mesh, x: jax.Array) -> jax.Array:
    """Place a [B, ...] array with B sharded over 'data'."""
    return jax.device_put(x, NamedSharding(mesh, P("data")))
