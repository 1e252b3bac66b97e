"""cindm_tpu — TPU-native compositional generative inverse design framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
AI4Science-WestlakeU/cindm (Compositional Generative Inverse Design,
ICLR 2024): diffusion models over trajectories and boundary fields,
compositional guided sampling for inverse design, on-device physics
simulators for closed-loop evaluation, and forward-model baselines.

Layout
------
- ``core``      : diffusion schedules and pure DDPM math (pytrees of buffers)
- ``models``    : Flax denoisers (TemporalUnet1D, Unet2D, ForceUnet, ...)
- ``ops``       : Pallas TPU kernels for the hot ops (with jnp fallbacks)
- ``physics``   : vmapped on-device simulators (n-body elastic, BDIM fluid)
- ``data``      : dataset generation + windowing (pure numpy/jnp)
- ``sampling``  : guided reverse-diffusion samplers as ``lax.scan`` loops
- ``train``     : pjit train step, optax Adam + EMA, orbax checkpoints
- ``parallel``  : device-mesh / sharding helpers
- ``baselines`` : forward-model surrogates (UNet forward, GNS, FNO, LE-PDE)
                  and CEM/backprop design optimizers
- ``cli``       : entry points mirroring the reference CLIs
"""

__version__ = "0.1.0"
