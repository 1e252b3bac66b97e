"""Throughput vs batch size for the flagship composed guided sampler."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from cindm_tpu.core import make_schedule
from cindm_tpu.models import TemporalUnet1D
from cindm_tpu.sampling import GuidanceSpec, get_design_fn, make_composed_eps_model
from cindm_tpu.sampling.sampler import p_sample_step
from cindm_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
N, NC, CSS, SMS, REC, STEPS = 8, 2, 4, 24, 10, 10
model = TemporalUnet1D(horizon=SMS, transition_dim=8, dim=64, attention=True)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, SMS, 8)), jnp.zeros(1, jnp.int32))
sched = make_schedule(1000)
design_fn = get_design_fn(jnp.array([0.5, 0.5]), 1, coef=100.0)
guidance = GuidanceSpec.parse(f"standard-recurrence-{REC}")
eps = make_composed_eps_model(lambda x, t: model.apply(params, x, t),
                              compose_n_bodies=N, n_composed=NC,
                              compose_start_step=CSS, single_model_step=SMS)

def make_run():
    def run(img, key, t0):
        def body(c, i):
            img, key = c
            key, k = jax.random.split(key)
            img, _ = p_sample_step(sched, eps, img, t0 - i, k, design_fn=design_fn, guidance=guidance)
            return (img, key), None
        (img, _), _ = jax.lax.scan(body, (img, key), jnp.arange(STEPS))
        return img
    return jax.jit(run)

for B in (64, 256, 512):
    run = make_run()
    key = jax.random.PRNGKey(1)
    img = jax.random.normal(key, (B, SMS + NC*CSS, N*4))
    run(img, key, jnp.int32(999)).block_until_ready()
    t0 = time.perf_counter()
    run(img, key, jnp.int32(999)).block_until_ready()
    dt = time.perf_counter() - t0
    fwds = STEPS * REC * (NC+1) * (N*(N-1)//2) * B
    print(f"B={B}: {fwds/dt:,.0f} pair-window fwds/s ({dt:.2f}s)")
