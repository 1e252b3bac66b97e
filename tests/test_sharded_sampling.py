"""Multi-device sampling: the guided sampler sharded over an 8-CPU mesh."""

import jax
import jax.numpy as jnp

from cindm_tpu.core import make_schedule
from cindm_tpu.parallel import make_mesh, make_sharded_sampler, shard_design_batch
from cindm_tpu.sampling import GuidanceSpec, get_design_fn, p_sample_loop


def test_sharded_guided_sampling_8dev():
    assert jax.device_count() >= 8
    mesh = make_mesh(8, ("data",))
    sched = make_schedule(20)
    mu = 0.3

    def eps(x, t):
        sa = sched.sqrt_alphas_cumprod[t][:, None, None]
        s1 = sched.sqrt_one_minus_alphas_cumprod[t][:, None, None]
        return (x - sa * mu) / s1

    design_fn = get_design_fn(jnp.array([0.5, 0.5]), 1, coef=0.1)

    def sample_fn(key):
        return p_sample_loop(
            sched, eps, (16, 8, 8), key,
            design_fn=design_fn, guidance=GuidanceSpec.parse("standard"),
        )

    sharded = make_sharded_sampler(sample_fn, mesh)
    out = sharded(jax.random.PRNGKey(0))
    assert out.shape == (16, 8, 8)
    # the output really is sharded over devices
    assert len(out.sharding.device_set) == 8
    assert bool(jnp.all(jnp.isfinite(out)))
