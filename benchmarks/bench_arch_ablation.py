"""Architectural perf probe: the two levers ARCHITECTURE.md names but never
measured (round-4 verdict, stretch task 8) — "fewer skip round-trips" and
"wider T at depth".

Variants, all at the flagship fold batch (64 designs x 3 windows x C(8,2)
pairs = 5376 windows, dim 64, f32 — exactly bench.py's denoiser geometry):

- base:    TemporalUnet1D(horizon=24) — T shrinks 24->12->6->3 at depth, so
           the deepest (widest-channel) convs run at T=3 against the TPU's
           8x128 VREG tiling.
- pad32:   same weights/architecture, inputs zero-padded 24->32 on the time
           axis (T stays 32->16->8->4 at depth; horizon rules identical,
           both are %8==0). Same useful work per window — if dt(32) <
           dt(24), lane utilization was the binding constraint; if dt grows
           ~32/24, the model is bandwidth-bound as the roofline said and the
           lever is dead.
- addskip: up-path skips added instead of concatenated (channel-compatible
           at every stage: 512+512, 256+256, 128+128), halving the up-path
           RTB input widths and the skip HBM traffic. Throughput-only probe
           (untrained weights — a win here would motivate retraining, not
           replace parity with the reference's concat U-Net,
           `model/diffusion_1d.py:636-641`).

Writes results/arch_ablation.json and prints one JSON line per variant.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import time

import jax
import jax.numpy as jnp

from cindm_tpu.models import TemporalUnet1D
from cindm_tpu.models.unet1d import _stage_flags
from cindm_tpu.models.blocks import (
    Conv1d,
    Conv1dBlock,
    Dense,
    LinearAttentionTemporal,
    PreNormResidual,
    ResidualTemporalBlock,
    SinusoidalPosEmb,
    Downsample1d,
    Upsample1d,
    mish,
)
from cindm_tpu.utils.cache import enable_compile_cache

from flax import linen as nn


class TemporalUnet1DAddSkip(nn.Module):
    """TemporalUnet1D with additive up-path skips (see module docstring)."""

    horizon: int
    transition_dim: int
    dim: int = 64
    dim_mults = (1, 2, 4, 8)
    attention: bool = True

    @nn.compact
    def __call__(self, x, time):
        dims = [self.transition_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        down_flags, up_flags = _stage_flags(self.horizon, len(in_out))

        t = SinusoidalPosEmb(self.dim)(time)
        t = Dense(self.dim * 4)(t)
        t = mish(t)
        t = Dense(self.dim)(t)

        hs = []
        for ind, (_, dim_out) in enumerate(in_out):
            x = ResidualTemporalBlock(dim_out)(x, t)
            x = ResidualTemporalBlock(dim_out)(x, t)
            if self.attention:
                x = PreNormResidual(dim_out, LinearAttentionTemporal(dim_out))(x)
            hs.append(x)
            if down_flags[ind]:
                x = Downsample1d(dim_out)(x)

        mid_dim = dims[-1]
        x = ResidualTemporalBlock(mid_dim)(x, t)
        if self.attention:
            x = PreNormResidual(mid_dim, LinearAttentionTemporal(mid_dim))(x)
        x = ResidualTemporalBlock(mid_dim)(x, t)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out[1:])):
            x = x + hs.pop()  # add instead of concat: halves RTB input width
            x = ResidualTemporalBlock(dim_out)(x, t)
            x = ResidualTemporalBlock(dim_in)(x, t)
            if self.attention:
                x = PreNormResidual(dim_in, LinearAttentionTemporal(dim_in))(x)
            if up_flags[ind]:
                x = Upsample1d(dim_in)(x)

        x = Conv1dBlock(self.dim, kernel_size=5)(x)
        x = Conv1d(self.transition_dim, 1)(x)
        return x


def timed(model, params, B, H, iters, scan_len=20):
    @jax.jit
    def run(x, t):
        def body(h, _):
            return model.apply(params, h, t) * 0.01 + h, None

        h, _ = jax.lax.scan(body, x, None, length=scan_len)
        return h

    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, 8))
    t = jnp.full((B,), 500, jnp.int32)
    run(x, t).block_until_ready()  # compile
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        run(x, t).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / scan_len)
    return best


def main():
    from cindm_tpu.utils.heartbeat import start_heartbeat

    start_heartbeat()  # log-liveness under the queue watchdog
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=5376)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="./results/arch_ablation.json")
    args = ap.parse_args()
    enable_compile_cache()

    rows = []

    def emit(row):
        rows.append(row)
        print(json.dumps(row), flush=True)
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)

    base = TemporalUnet1D(horizon=24, transition_dim=8, dim=64, attention=True)
    p = base.init(jax.random.PRNGKey(0), jnp.zeros((1, 24, 8)), jnp.zeros(1, jnp.int32))
    dt24 = timed(base, p, args.batch, 24, args.iters)
    emit({"variant": "base_h24", "batch": args.batch, "ms": round(dt24 * 1e3, 3),
          "windows_per_s": round(args.batch / dt24)})

    # same weights, padded time axis (24 useful steps per window either way)
    pad = TemporalUnet1D(horizon=32, transition_dim=8, dim=64, attention=True)
    dt32 = timed(pad, p, args.batch, 32, args.iters)
    emit({"variant": "pad32_same_weights", "batch": args.batch,
          "ms": round(dt32 * 1e3, 3), "windows_per_s": round(args.batch / dt32),
          "vs_base": round(dt24 / dt32, 3)})

    add = TemporalUnet1DAddSkip(horizon=24, transition_dim=8)
    pa = add.init(jax.random.PRNGKey(0), jnp.zeros((1, 24, 8)), jnp.zeros(1, jnp.int32))
    n_base = sum(x.size for x in jax.tree.leaves(p))
    n_add = sum(x.size for x in jax.tree.leaves(pa))
    dta = timed(add, pa, args.batch, 24, args.iters)
    emit({"variant": "addskip_h24", "batch": args.batch,
          "ms": round(dta * 1e3, 3), "windows_per_s": round(args.batch / dta),
          "vs_base": round(dt24 / dta, 3),
          "params": n_add, "params_base": n_base})

    # combined: both levers at once
    addp = TemporalUnet1DAddSkip(horizon=32, transition_dim=8)
    dtap = timed(addp, pa, args.batch, 32, args.iters)
    emit({"variant": "addskip_pad32", "batch": args.batch,
          "ms": round(dtap * 1e3, 3), "windows_per_s": round(args.batch / dtap),
          "vs_base": round(dt24 / dtap, 3)})


if __name__ == "__main__":
    main()
