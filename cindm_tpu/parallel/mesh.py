"""Device-mesh and sharding helpers.

The reference has no real distributed path (SURVEY.md §2.6 — HF Accelerate
wrappers only, never exercised multi-process). This module is the TPU-native
replacement: a named ``Mesh`` over the available chips with a ``data`` axis
(DP) and an optional ``model`` axis reserved for larger configs; train steps
shard batches over ``data`` and replicate params, with gradient reduction
compiled by XLA into ICI collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host (DCN) initialization: `jax.distributed.initialize` with
    TPU-pod auto-detection when args are None (SURVEY.md §2.6 — the
    reference has no multi-host path at all). Call once before any jax op
    on each host; afterwards `jax.devices()` spans the pod and `make_mesh`
    lays the global mesh over ICI+DCN."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    mesh_devices = np.array(devices).reshape(shape)
    return Mesh(mesh_devices, axis_names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis sharded over 'data', everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of [B, ...] arrays with the batch axis sharded."""
    s = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
