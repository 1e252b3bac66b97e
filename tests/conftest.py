"""Test configuration: run everything on a virtual 8-device CPU backend so
multi-chip sharding tests work without TPU hardware (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell presets JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# sitecustomize.py (axon TPU plugin) imports jax at interpreter startup, so
# the env var above can be too late — force the platform via config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
jax.config.update("jax_default_matmul_precision", "highest")
# NOTE: do NOT enable the persistent compilation cache here — on this infra
# XLA:CPU AOT entries can be compiled on a machine with different CPU
# features ("Machine type used for XLA:CPU compilation doesn't match the
# machine type for execution"), which silently changes numerics.
