"""Shape and horizon-rule tests for TemporalUnet1D."""

import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from cindm_tpu.models.unet1d import TemporalUnet1D, _stage_flags


def test_stage_flags_horizon24():
    # 24 % 8 == 0: 3 downsamples, 3 upsamples (`model/diffusion_1d.py:549-603`)
    downs, ups = _stage_flags(24, 4)
    assert downs == [True, True, True, False]
    assert ups == [True, True, True]


def test_stage_flags_horizon44():
    # 44 % 8 == 4, 44 % 4 == 0: 2 downs, up skipped at stage 0
    downs, ups = _stage_flags(44, 4)
    assert downs == [True, True, False, False]
    assert ups == [False, True, True]


def test_stage_flags_horizon34():
    # 34 % 4 == 2, 34 % 2 == 0: 1 down, ups skipped at stages 0, 1
    downs, ups = _stage_flags(34, 4)
    assert downs == [True, False, False, False]
    assert ups == [False, False, True]


@pytest.mark.parametrize("horizon", [24, 44, 34])
def test_forward_shapes(horizon):
    model = TemporalUnet1D(horizon=horizon, transition_dim=8, dim=32, attention=True)
    x = jnp.zeros((2, horizon, 8))
    t = jnp.array([0, 999])
    params = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == (2, horizon, 8)


def test_forward_is_jittable_and_deterministic():
    model = TemporalUnet1D(horizon=24, transition_dim=8, dim=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 8))
    t = jnp.array([10, 500])
    params = model.init(jax.random.PRNGKey(0), x, t)
    f = jax.jit(model.apply)
    o1 = f(params, x, t)
    o2 = f(params, x, t)
    assert jnp.allclose(o1, o2)
    assert jnp.all(jnp.isfinite(o1))


def test_time_embedding_changes_output():
    model = TemporalUnet1D(horizon=24, transition_dim=8, dim=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 24, 8))
    params = model.init(jax.random.PRNGKey(0), x, jnp.array([0]))
    o1 = model.apply(params, x, jnp.array([0]))
    o2 = model.apply(params, x, jnp.array([900]))
    assert not jnp.allclose(o1, o2)


def test_golden_values_regression():
    """Golden-value guard: fixed seed + fixed input must reproduce the
    recorded activations (catches silent numerical regressions; the
    reference has no such guard — SURVEY.md §4)."""
    import numpy as np

    model = TemporalUnet1D(horizon=24, transition_dim=8, dim=16, attention=True)
    x = jnp.linspace(-1, 1, 2 * 24 * 8).reshape(2, 24, 8)
    t = jnp.array([7, 423])
    params = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(params, x, t)
    np.testing.assert_allclose(float(out.sum()), 57.049736, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out[0, 0, :4]),
        [0.0002423227, -0.14058116, -0.01790789, 0.4388479],
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out[1, -1, :4]),
        [0.2306819, -0.23320648, -0.08968508, 0.04371372],
        rtol=1e-4, atol=1e-6,
    )


def test_generic_unet1d_shapes():
    from cindm_tpu.models import Unet1D

    m = Unet1D(dim=16, channels=8, dim_mults=(1, 2))
    x = jnp.zeros((2, 16, 8))
    t = jnp.array([0, 100])
    params = m.init(jax.random.PRNGKey(0), x, t)
    out = m.apply(params, x, t)
    assert out.shape == (2, 16, 8)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_generic_unet1d_fourier_time():
    from cindm_tpu.models import Unet1D

    m = Unet1D(dim=16, channels=4, dim_mults=(1, 2), learned_sinusoidal_cond=True)
    x = jnp.zeros((1, 8, 4))
    params = m.init(jax.random.PRNGKey(0), x, jnp.array([5]))
    assert m.apply(params, x, jnp.array([5])).shape == (1, 8, 4)


def test_fused_apply_matches_module():
    """temporal_unet1d_fused_apply is a drop-in for model.apply on an
    unchanged param tree (flagship config, horizon 24)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cindm_tpu.models.fused_apply import temporal_unet1d_fused_apply
    from cindm_tpu.models.unet1d import TemporalUnet1D

    model = TemporalUnet1D(horizon=24, transition_dim=8, dim=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 24, 8))
    t = jnp.array([1.0, 10.0, 100.0, 999.0])
    variables = model.init(jax.random.PRNGKey(1), x, t)
    want = np.asarray(model.apply(variables, x, t))
    got = np.asarray(
        temporal_unet1d_fused_apply(model, variables, x, t, batch_tile=2)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_apply_is_differentiable():
    """Guided sampling takes grads through the eps model: the fused path
    must expose a VJP (Pallas forward, reference backward) matching the
    module's gradient."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cindm_tpu.models.fused_apply import temporal_unet1d_fused_apply
    from cindm_tpu.models.unet1d import TemporalUnet1D

    model = TemporalUnet1D(horizon=24, transition_dim=8, dim=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 24, 8))
    t = jnp.array([5.0, 50.0, 500.0, 900.0])
    variables = model.init(jax.random.PRNGKey(1), x, t)

    g_want = jax.grad(lambda x: jnp.sum(model.apply(variables, x, t) ** 2))(x)
    g_got = jax.grad(lambda x: jnp.sum(
        temporal_unet1d_fused_apply(model, variables, x, t, batch_tile=2) ** 2
    ))(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-3, atol=1e-4)
