"""Compare f32 vs bf16 sampling throughput on the flagship composed config."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from cindm_tpu.core import make_schedule
from cindm_tpu.models import TemporalUnet1D
from cindm_tpu.ops import bf16_eps_model
from cindm_tpu.sampling import GuidanceSpec, get_design_fn, make_composed_eps_model
from cindm_tpu.sampling.sampler import p_sample_step

B, N, NC, CSS, SMS, REC, STEPS = 64, 8, 2, 4, 24, 10, 25
model = TemporalUnet1D(horizon=SMS, transition_dim=8, dim=64, attention=True)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, SMS, 8)), jnp.zeros(1, jnp.int32))
sched = make_schedule(1000)
design_fn = get_design_fn(jnp.array([0.5, 0.5]), 1, coef=100.0)
guidance = GuidanceSpec.parse(f"standard-recurrence-{REC}")

def bench(base_eps, label):
    eps = make_composed_eps_model(base_eps, compose_n_bodies=N, n_composed=NC,
                                  compose_start_step=CSS, single_model_step=SMS)
    def run(img, key, t0):
        def body(c, i):
            img, key = c
            key, k = jax.random.split(key)
            img, _ = p_sample_step(sched, eps, img, t0 - i, k, design_fn=design_fn, guidance=guidance)
            return (img, key), None
        (img, _), _ = jax.lax.scan(body, (img, key), jnp.arange(STEPS))
        return img
    rj = jax.jit(run)
    key = jax.random.PRNGKey(1)
    img = jax.random.normal(key, (B, SMS + NC*CSS, N*4))
    rj(img, key, jnp.int32(999)).block_until_ready()
    t0 = time.perf_counter()
    rj(img, key, jnp.int32(999)).block_until_ready()
    dt = time.perf_counter() - t0
    fwds = STEPS * REC * (NC+1) * (N*(N-1)//2) * B
    print(f"{label}: {fwds/dt:,.0f} pair-window fwds/s  ({dt:.2f}s)")
    return fwds/dt

f32 = bench(lambda x, t: model.apply(params, x, t), "f32 ")
bf16 = bench(bf16_eps_model(model.apply, params), "bf16")
print(f"speedup: {bf16/f32:.2f}x")
