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
    ref = jax.jit(fused_conv1d_gn_mish_reference)
    pal = jax.jit(lambda *a: fused_conv1d_gn_mish(*a, batch_tile=32))
    r1 = ref(x, w, b, gs, gb).block_until_ready()
    p1 = pal(x, w, b, gs, gb).block_until_ready()
    err = float(jnp.max(jnp.abs(r1 - p1)))
    n = 20
    t0 = time.perf_counter()
    for _ in range(n): ref(x, w, b, gs, gb).block_until_ready()
    tr = (time.perf_counter() - t0) / n
    t0 = time.perf_counter()
    for _ in range(n): pal(x, w, b, gs, gb).block_until_ready()
    tp = (time.perf_counter() - t0) / n
    print(f"[{B}x{T}x{C}->{O}] xla {tr*1e3:.2f}ms pallas {tp*1e3:.2f}ms speedup {tr/tp:.2f}x maxerr {err:.2e}")
