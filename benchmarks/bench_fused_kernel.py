"""Pallas fused conv+GN+Mish vs XLA-fused reference, flagship hot shapes."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from cindm_tpu.ops.fused_conv_gn import fused_conv1d_gn_mish, fused_conv1d_gn_mish_reference
from cindm_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
for (B, T, C, O) in [(5376, 24, 128, 128), (5376, 12, 256, 256), (5376, 6, 512, 512)]:
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (B, T, C))
    w = jax.random.normal(ks[1], (5, C, O)) * 0.05
    b = jax.random.normal(ks[2], (O,)) * 0.05
    gs = jnp.ones((O,))
    gb = jnp.zeros((O,))
    # amortize the tunnel round-trip: N chained applications inside one jit
    N_INNER = 50

    def chain(fn):
        @jax.jit
        def run(x):
            def body(h, _):
                o = fn(h, w, b, gs, gb)
                return o[..., :h.shape[-1]] * 0.5 + h * 0.5, None
            h, _ = jax.lax.scan(body, x, None, length=N_INNER)
            return h
        return run

    ref = chain(fused_conv1d_gn_mish_reference)
    pal = chain(lambda *a: fused_conv1d_gn_mish(*a, batch_tile=32))
    r1 = jax.jit(fused_conv1d_gn_mish_reference)(x, w, b, gs, gb)
    p1 = jax.jit(lambda *a: fused_conv1d_gn_mish(*a, batch_tile=32))(x, w, b, gs, gb)
    err = float(jnp.max(jnp.abs(r1 - p1)))
    ref(x).block_until_ready(); pal(x).block_until_ready()
    t0 = time.perf_counter(); ref(x).block_until_ready()
    tr = (time.perf_counter() - t0) / N_INNER
    t0 = time.perf_counter(); pal(x).block_until_ready()
    tp = (time.perf_counter() - t0) / N_INNER
    print(f"[{B}x{T}x{C}->{O}] xla {tr*1e3:.2f}ms pallas {tp*1e3:.2f}ms speedup {tr/tp:.2f}x maxerr {err:.2e}")
