"""Persistent XLA compilation cache for TPU runs.

The TPU backend on this infra compiles remotely and cold compiles of the
big scan programs (BDIM simulate, guided samplers) can take minutes; the
persistent cache amortizes them across processes. CPU is deliberately
excluded: XLA:CPU AOT entries are machine-feature-specific and loading one
compiled elsewhere silently changes numerics (observed; see
tests/conftest.py).
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.environ.get("CINDM_COMPILE_CACHE", "/tmp/cindm_tpu_compile_cache")


def enable_compile_cache(cache_dir: str = _DEFAULT_DIR) -> bool:
    """Enable the persistent compilation cache when running on a TPU-like
    backend. Returns True if enabled."""
    # Probe the tunnel BEFORE jax.devices(): with the relay down, backend
    # init blocks forever instead of erroring (see utils/preflight.py).
    from .preflight import require_tpu_reachable

    require_tpu_reachable()
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform == "cpu":
        return False
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return True
