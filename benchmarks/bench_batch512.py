"""Batch-512 throughput investigation: f32 vs bf16, pair-major vs
batch-major layout of the composed forward, plus an optional xprof trace.

Round-1 finding: the bare composed forward drops 416k -> 304k pair-window
fwds/s from B=64 to B=512. Hypotheses probed here:
- HBM-bandwidth bound at large batch -> bf16 activations should recover it
- layout of the folded (pair*window*batch) axis
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from cindm_tpu.models import TemporalUnet1D
from cindm_tpu.sampling import make_composed_eps_model
from cindm_tpu.ops.precision import cast_floating
from cindm_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
N, NC, CSS, SMS = 8, 2, 4, 24
P = N * (N - 1) // 2
REPS = 20


def bench(B, dtype, label):
    model = TemporalUnet1D(horizon=SMS, transition_dim=8, dim=64, attention=True)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, SMS, 8)), jnp.zeros(1, jnp.int32))
    if dtype != jnp.float32:
        params = cast_floating(params, dtype)

    def base(x, t):
        return model.apply(params, x.astype(dtype), t).astype(jnp.float32)

    eps = make_composed_eps_model(base, compose_n_bodies=N, n_composed=NC,
                                  compose_start_step=CSS, single_model_step=SMS)

    @jax.jit
    def run(x, t):
        def body(h, _):
            return eps(h, t) * 0.01 + h, None
        h, _ = jax.lax.scan(body, x, None, length=REPS)
        return h

    x = jax.random.normal(jax.random.PRNGKey(1), (B, SMS + NC * CSS, N * 4))
    t = jnp.full((B,), 500, jnp.int32)
    run(x, t).block_until_ready()
    t0 = time.perf_counter()
    run(x, t).block_until_ready()
    dt = (time.perf_counter() - t0) / REPS
    rate = (NC + 1) * P * B / dt
    print(f"{label} B={B}: {dt*1e3:7.1f} ms  {rate:12,.0f} pair-window fwds/s", flush=True)
    return rate


def bench_chunked(B, chunk, label):
    """B split into B/chunk sequential slices inside ONE jit (lax.map).
    If this recovers the B=64 rate, the large-batch slowdown is a VMEM
    working-set effect — and per-chip DP sharding (batch 512 over 8 chips
    = 64/chip) runs at full rate."""
    model = TemporalUnet1D(horizon=SMS, transition_dim=8, dim=64, attention=True)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, SMS, 8)), jnp.zeros(1, jnp.int32))
    eps = make_composed_eps_model(lambda x, t: model.apply(params, x, t),
                                  compose_n_bodies=N, n_composed=NC,
                                  compose_start_step=CSS, single_model_step=SMS)

    @jax.jit
    def run(x, t):
        def body(h, _):
            xc = h.reshape(B // chunk, chunk, *h.shape[1:])
            tc = t.reshape(B // chunk, chunk)
            out = jax.lax.map(lambda a: eps(a[0], a[1]), (xc, tc))
            return out.reshape(h.shape) * 0.01 + h, None
        h, _ = jax.lax.scan(body, x, None, length=REPS)
        return h

    x = jax.random.normal(jax.random.PRNGKey(1), (B, SMS + NC * CSS, N * 4))
    t = jnp.full((B,), 500, jnp.int32)
    run(x, t).block_until_ready()
    t0 = time.perf_counter()
    run(x, t).block_until_ready()
    dt = (time.perf_counter() - t0) / REPS
    rate = (NC + 1) * P * B / dt
    print(f"{label} B={B}/chunk{chunk}: {dt*1e3:7.1f} ms  {rate:12,.0f} pair-window fwds/s", flush=True)
    return rate


def bench_foldchunks(B, fc, label):
    """fold_chunks built into make_composed_eps_model (the production
    path of the chunked hypothesis, vs the hand-rolled bench_chunked)."""
    model = TemporalUnet1D(horizon=SMS, transition_dim=8, dim=64, attention=True)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, SMS, 8)), jnp.zeros(1, jnp.int32))
    eps = make_composed_eps_model(lambda x, t: model.apply(params, x, t),
                                  compose_n_bodies=N, n_composed=NC,
                                  compose_start_step=CSS, single_model_step=SMS,
                                  fold_chunks=fc)

    @jax.jit
    def run(x, t):
        def body(h, _):
            return eps(h, t) * 0.01 + h, None
        h, _ = jax.lax.scan(body, x, None, length=REPS)
        return h

    x = jax.random.normal(jax.random.PRNGKey(1), (B, SMS + NC * CSS, N * 4))
    t = jnp.full((B,), 500, jnp.int32)
    run(x, t).block_until_ready()
    t0 = time.perf_counter()
    run(x, t).block_until_ready()
    dt = (time.perf_counter() - t0) / REPS
    rate = (NC + 1) * P * B / dt
    print(f"{label} B={B}/fold{fc}: {dt*1e3:7.1f} ms  {rate:12,.0f} pair-window fwds/s", flush=True)
    return rate


if __name__ == "__main__":
    for B in (64, 256, 512):
        bench(B, jnp.float32, "f32 ")
    for B in (64, 256, 512):
        bench(B, jnp.bfloat16, "bf16")
    bench_chunked(512, 64, "f32 ")
    bench_chunked(512, 128, "f32 ")
    for fc in (2, 4, 8):
        bench_foldchunks(512, fc, "f32 ")
    if os.environ.get("TRACE_DIR"):
        from cindm_tpu.utils.observability import profile_trace
        with profile_trace(os.environ["TRACE_DIR"]):
            bench(512, jnp.float32, "f32-traced")
