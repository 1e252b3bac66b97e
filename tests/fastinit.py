"""Shape-only flax init for tests.

Real ``model.init`` pays per-op XLA mini-compiles (~2 s/op-shape on this
1-core CPU box; ~100 s for a small U-Net). ``jax.eval_shape`` traces the
same init abstractly in ~2 s. Zero params preserve shape/finiteness
assertions (GroupNorm/WS-conv are eps-guarded); any test that asserts on
VALUES must keep real init.
"""

import jax
import jax.numpy as jnp


def zeros_init(model, rng, *args, **kwargs):
    shapes = jax.eval_shape(model.init, rng, *args, **kwargs)
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def zeros_init_thunk(init_thunk):
    """Like zeros_init but for inits with static (Python-int) args that
    eval_shape must not abstract: pass ``lambda: model.init(rng, x, 3)``."""
    shapes = jax.eval_shape(init_thunk)
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
