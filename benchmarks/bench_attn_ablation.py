"""Attention cost ablation: composed forward with/without linear attention.

Round-1 finding: attention was 66% of the forward before the block-dense
rewrite (see RESULTS.md).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from cindm_tpu.models import TemporalUnet1D
from cindm_tpu.sampling import make_composed_eps_model
from cindm_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
N, NC, CSS, SMS = 8, 2, 4, 24
P = N * (N - 1) // 2
for attn in (True, False):
    model = TemporalUnet1D(horizon=SMS, transition_dim=8, dim=64, attention=attn)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, SMS, 8)), jnp.zeros(1, jnp.int32))
    eps = make_composed_eps_model(lambda x, t: model.apply(params, x, t),
                                  compose_n_bodies=N, n_composed=NC,
                                  compose_start_step=CSS, single_model_step=SMS)
    for B in (64, 512):
        @jax.jit
        def run(x, t):
            def body(h, _):
                return eps(h, t) * 0.01 + h, None
            h, _ = jax.lax.scan(body, x, None, length=20)
            return h
        x = jax.random.normal(jax.random.PRNGKey(1), (B, SMS + NC * CSS, N * 4))
        t = jnp.full((B,), 500, jnp.int32)
        run(x, t).block_until_ready()
        t0 = time.perf_counter(); run(x, t).block_until_ready()
        dt = (time.perf_counter() - t0) / 20
        print(f"attn={attn} B={B}: {dt*1e3:.1f}ms -> {(NC+1)*P*B/dt:,.0f} fwds/s")
