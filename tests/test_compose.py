"""Tests for the compositional ε-model against a literal (loop-based)
re-implementation of the reference aggregation semantics
(`model/diffusion_1d.py:959-999`)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cindm_tpu.sampling.compose import (
    make_composed_eps_model,
    pair_indices,
    window_coverage,
)


def _reference_compose(base_fn, x, t, n, n_composed, css, sms, mode):
    """Literal numpy port of the reference's double loop (test oracle only)."""
    B, T_tot, _ = x.shape
    pred_aggr = np.zeros((n_composed + 1, B, T_tot, n, n, 4), np.float32)
    mask_aggr = np.zeros((n_composed + 1, B, T_tot, n * 4), np.float32)
    for kk in range(n_composed + 1):
        mask_aggr[kk, :, kk * css : kk * css + sms] = 1.0
        for ii, jj in itertools.combinations(range(n), 2):
            idx = np.concatenate([np.arange(ii * 4, ii * 4 + 4), np.arange(jj * 4, jj * 4 + 4)])
            ele = np.asarray(base_fn(x[:, kk * css : kk * css + sms, idx], t))
            pred_aggr[kk, :, kk * css : kk * css + sms, jj, ii] = ele[..., :4]
            pred_aggr[kk, :, kk * css : kk * css + sms, ii, jj] = ele[..., 4:]
    if mode == "mean-inside":
        s = (pred_aggr.sum(-3) / (n - 1)).reshape(n_composed + 1, B, T_tot, n * 4)
        return s.sum(0) / mask_aggr.sum(0)
    s = pred_aggr.sum(-3).reshape(n_composed + 1, B, T_tot, n * 4)
    return s.sum(0) / mask_aggr.mean(0)


def _linear_base(key):
    """A fake 2-body ε-model: linear mixing so composition is nontrivial."""
    W = jax.random.normal(key, (8, 8)) * 0.1

    def fn(x, t):
        return x @ W + 0.01 * t[:, None, None].astype(jnp.float32)

    return fn


def test_pair_indices_count():
    for n in (2, 4, 8):
        pi, pj = pair_indices(n)
        assert len(pi) == n * (n - 1) // 2
        assert np.all(pi < pj)


def test_window_coverage():
    cov = window_coverage(32, 2, 4, 24)
    assert cov.shape == (32,)
    # windows [0:24], [4:28], [8:32]
    np.testing.assert_allclose(cov[:4], 1)
    np.testing.assert_allclose(cov[8:24], 3)
    np.testing.assert_allclose(cov[-4:], 1)


def _check(n, n_composed, css, sms, mode):
    key = jax.random.PRNGKey(0)
    base = _linear_base(key)
    T_tot = sms + n_composed * css
    x = jax.random.normal(jax.random.PRNGKey(1), (3, T_tot, n * 4))
    t = jnp.array([5, 10, 15])
    fn = make_composed_eps_model(
        base, compose_n_bodies=n, n_composed=n_composed,
        compose_start_step=css, single_model_step=sms, compose_mode=mode,
    )
    got = np.asarray(fn(x, t))
    want = _reference_compose(base, np.asarray(x), t, n, n_composed, css, sms, mode)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_compose_mean_inside_2body_1window():
    _check(2, 0, 4, 24, "mean-inside")


def test_compose_mean_inside_4body_3windows():
    _check(4, 2, 4, 24, "mean-inside")


def test_compose_sum_inside_4body_2windows():
    _check(4, 1, 4, 24, "sum-inside")


def test_compose_mean_inside_8body():
    _check(8, 2, 4, 24, "mean-inside")


def test_composed_model_is_jittable():
    base = _linear_base(jax.random.PRNGKey(0))
    fn = make_composed_eps_model(
        base, compose_n_bodies=4, n_composed=1,
        compose_start_step=4, single_model_step=24,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 16))
    t = jnp.array([3, 7])
    jitted = jax.jit(fn)
    np.testing.assert_allclose(np.asarray(jitted(x, t)), np.asarray(fn(x, t)), rtol=1e-5)


def test_fold_chunks_bit_identical():
    """fold_chunks only re-slices the folded (window, pair, batch) axis —
    output must match the monolithic path exactly."""
    base = _linear_base(jax.random.PRNGKey(0))
    kw = dict(compose_n_bodies=4, n_composed=1,
              compose_start_step=4, single_model_step=24)
    fn1 = make_composed_eps_model(base, **kw)
    fn4 = make_composed_eps_model(base, fold_chunks=4, **kw)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 16))
    t = jnp.array([3, 7])
    np.testing.assert_array_equal(np.asarray(fn4(x, t)), np.asarray(fn1(x, t)))
    # non-divisible fold count falls back to the monolithic call
    fn5 = make_composed_eps_model(base, fold_chunks=5, **kw)
    np.testing.assert_array_equal(np.asarray(fn5(x, t)), np.asarray(fn1(x, t)))


def test_outside_composition_clips_pairwise():
    """clip_pairwise_x_start (outside-composition semantics) must differ from
    inside when x̂0 exceeds [-1, 1], and equal it when it doesn't."""
    import jax
    from cindm_tpu.core import make_schedule

    sched = make_schedule(50)
    base = _linear_base(jax.random.PRNGKey(0))
    kw = dict(compose_n_bodies=4, n_composed=1, compose_start_step=4, single_model_step=24)
    inside = make_composed_eps_model(base, compose_mode="mean-inside", **kw)
    outside = make_composed_eps_model(
        base, compose_mode="mean-inside", sched=sched, clip_pairwise_x_start=True, **kw
    )
    t = jnp.array([45, 45])  # high noise → x̂0 large → clipping active
    x_big = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 16)) * 5.0
    a = np.asarray(inside(x_big, t))
    b = np.asarray(outside(x_big, t))
    assert not np.allclose(a, b)
    # tiny x at low t → no clipping → identical
    t2 = jnp.array([1, 1])
    x_small = jax.random.normal(jax.random.PRNGKey(2), (2, 28, 16)) * 0.01
    np.testing.assert_allclose(
        np.asarray(inside(x_small, t2)), np.asarray(outside(x_small, t2)), rtol=1e-4, atol=1e-6
    )


@pytest.mark.slow
def test_trivial_composition_equals_plain_sampling():
    """n=2 bodies, no extra windows: the composed path (K=1, P=1,
    mean-inside) must reproduce plain p_sample_loop exactly."""
    import jax
    from cindm_tpu.core import make_schedule
    from cindm_tpu.sampling import Diffusion1DConfig, p_sample_loop, sample

    T = 20
    sched = make_schedule(T)
    mu = 0.2

    def eps(x, t):
        sa = sched.sqrt_alphas_cumprod[t][:, None, None]
        s1 = sched.sqrt_one_minus_alphas_cumprod[t][:, None, None]
        return (x - sa * mu) / s1

    cfg = Diffusion1DConfig(rollout_steps=8, timesteps=T)
    key = jax.random.PRNGKey(0)
    plain = p_sample_loop(sched, eps, (4, 8, 8), key)
    composed = sample(
        cfg, sched, eps, key, batch_size=4, feature_size=8,
        compose_n_bodies=2, n_composed=0, compose_mode="mean-inside",
    )
    np.testing.assert_allclose(np.asarray(plain), np.asarray(composed), rtol=1e-4, atol=1e-5)
