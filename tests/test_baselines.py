"""Baseline model + design-optimizer tests."""

import jax
import jax.numpy as jnp
import numpy as np

from fastinit import zeros_init, zeros_init_thunk

from cindm_tpu.baselines import (
    BackpropConfig,
    CEMConfig,
    FNO1d,
    FNO2d,
    GNSConfig,
    GNSNet,
    LEPDE,
    LEPDEConfig,
    Unet1DForwardModel,
    backprop_design,
    cem_design,
    clamp_nbody_cond,
    gns_direct_rollout,
    gns_rollout,
    lepde_loss,
)


def test_unet_forward_model_shapes():
    m = Unet1DForwardModel(horizon=24, transition_dim=8, dim=16)
    cond = jnp.ones((2, 1, 8)) * 0.5
    params = zeros_init(m, jax.random.PRNGKey(0), cond)
    out = jax.jit(m.apply)(params, cond)
    assert out.shape == (2, 24, 8)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_gns_net_and_rollouts():
    cfg = GNSConfig(hidden_size=32, gnn_layers=2, radius=0.2)
    m = GNSNet(cfg)
    poss = jax.random.uniform(jax.random.PRNGKey(0), (2, 4, 4, 2))
    ptype = jnp.zeros((2, 4), jnp.int32)
    params = m.init(jax.random.PRNGKey(1), poss, ptype)
    acc = m.apply(params, poss, ptype)
    assert acc.shape == (2, 4, 2)
    traj = gns_rollout(m.apply, params, poss, ptype, 6)
    assert traj.shape == (2, 4, 6, 2)
    assert bool(jnp.all(jnp.isfinite(traj)))
    # direct multi-step head
    cfg2 = GNSConfig(hidden_size=32, gnn_layers=2, radius=0.2, out_size=12)
    m2 = GNSNet(cfg2)
    params2 = m2.init(jax.random.PRNGKey(2), poss, ptype)
    direct = gns_direct_rollout(m2.apply, params2, poss, ptype, 6)
    assert direct.shape == (2, 4, 6, 2)


def test_spectral_conv2d_matches_fft_oracle():
    """The real-arithmetic truncated DFT must match an FFT-based spectral
    conv (complex is fine on the CPU test backend)."""
    from cindm_tpu.baselines.fno import SpectralConv2d, _dft_bases, _mode_freqs

    m = SpectralConv2d(out_channels=3, modes1=3, modes2=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    params = m.init(jax.random.PRNGKey(1), x)
    got = np.asarray(m.apply(params, x))

    wr = np.asarray(params["params"]["w_real"])
    wi = np.asarray(params["params"]["w_imag"])
    w = wr + 1j * wi  # [2, C, O, m1, m2]
    B, H, W, C = x.shape
    m1 = m2 = 3
    x_ft = np.fft.fft2(np.asarray(x), axes=(1, 2))  # full complex FFT
    out_ft = np.zeros((B, H, m2, 3), np.complex64)
    out_full = np.zeros((B, H, W, 3), np.complex64)
    top = np.einsum("bxyc,coxy->bxyo", x_ft[:, :m1, :m2], w[0])
    bot = np.einsum("bxyc,coxy->bxyo", x_ft[:, -m1:, :m2], w[1])
    out_full[:, :m1, :m2] = top
    out_full[:, -m1:, :m2] = bot
    # Hermitian extension over ky (the irfft2 semantics)
    for ky in range(1, m2):
        out_full[:, :, W - ky] += np.conj(np.roll(out_full[:, ::-1, ky], 1, axis=1))
    want = np.real(np.fft.ifft2(out_full, axes=(1, 2)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-5)


def test_fno2d_shapes():
    m = FNO2d(out_channels=3, modes=4, width=8, n_layers=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 5))
    params = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(params, x)
    assert out.shape == (2, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_fno1d_shapes():
    m = FNO1d(out_channels=2, modes=4, width=8, n_layers=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 3))
    params = m.init(jax.random.PRNGKey(1), x)
    assert m.apply(params, x).shape == (2, 24, 2)


def test_lepde_forward_and_loss():
    cfg = LEPDEConfig(latent_size=16, enc_dim=4, evo_hidden=16)
    m = LEPDE(cfg, out_hw=16)
    u0 = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    static = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    params = zeros_init_thunk(lambda: m.init(jax.random.PRNGKey(2), u0, static, 1))
    preds = jax.jit(lambda p: m.apply(p, u0, static, 3))(params)
    assert preds.shape == (2, 3, 16, 16, 3)
    targets = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 16, 16, 3))
    loss = lepde_loss(m, params, u0, static, targets)
    assert jnp.isfinite(loss)


def test_clamp_nbody_cond():
    c = jnp.array([[[2.0, -2.0, 2.0, -2.0, 0.5, 0.5, 0.1, -0.1]]])
    out = np.asarray(clamp_nbody_cond(c))[0, 0]
    assert out[0] == 0.9 and out[1] == 0.1  # pos clamped
    assert out[2] == 0.5 and out[3] == -0.5  # vel clamped
    assert out[4] == 0.5 and out[6] == 0.1  # untouched values preserved


def _quadratic_surrogate():
    # rollout = broadcast cond; design = squared distance of pos to 0.7
    def rollout(cond):
        return jnp.broadcast_to(cond, (4,) + cond.shape[-2:]) if cond.ndim == 2 else cond

    def design(pred):
        p = pred.reshape(-1, 2, 4)[..., :2]
        return jnp.sum(jnp.square(p - 0.7))

    return rollout, design


def test_cem_design_converges_toward_target():
    rollout, design = _quadratic_surrogate()
    cfg = CEMConfig(n_samples=64, n_elites=8, n_iterations=30)
    best, obj = cem_design(cfg, rollout, design, (1, 8), jax.random.PRNGKey(0))
    pos = np.asarray(best).reshape(2, 4)[:, :2]
    np.testing.assert_allclose(pos, 0.7, atol=0.1)


def test_backprop_design_converges():
    rollout, design = _quadratic_surrogate()
    cfg = BackpropConfig(n_iterations=100, lr=0.05)
    cond0 = jnp.full((1, 8), 0.4)
    cond, objs = backprop_design(cfg, rollout, design, cond0, jax.random.PRNGKey(0))
    pos = np.asarray(cond).reshape(2, 4)[:, :2]
    np.testing.assert_allclose(pos, 0.7, atol=0.02)
    assert float(objs[-1]) < float(objs[0])


def test_parse_multi_step_reference_format():
    from cindm_tpu.baselines.harness import parse_multi_step

    assert parse_multi_step("1") == {1: 1.0}
    assert parse_multi_step("1^2:1e-2^4:1e-3") == {1: 1.0, 2: 0.01, 4: 0.001}
    assert parse_multi_step("2:0.5") == {2: 0.5}


def test_multi_step_loss_weights_listed_steps_only():
    import jax.numpy as jnp
    from cindm_tpu.baselines.harness import loss_core, multi_step_loss

    # step_fn doubles the state; targets chosen so step-2 loss is zero
    u0 = jnp.ones((2, 3))
    targets = jnp.stack([jnp.zeros((2, 3)), 4.0 * jnp.ones((2, 3))], axis=1)
    # only step 2 listed -> rolled to 4.0 == target -> loss 0
    out = multi_step_loss(lambda x: 2.0 * x, u0, targets, {2: 1.0}, "mse")
    assert float(out) == 0.0
    # steps 1 and 2 with weights: step1 mse = (2-0)^2 = 4, step2 = 0
    out = multi_step_loss(lambda x: 2.0 * x, u0, targets, {1: 0.5, 2: 1.0}, "mse")
    assert abs(float(out) - (0.5 * 4.0) / 1.5) < 1e-6
    # l1 / huber paths trace
    for lt in ("l1", "huber"):
        assert float(loss_core(jnp.ones(3), jnp.zeros(3), lt)) > 0
