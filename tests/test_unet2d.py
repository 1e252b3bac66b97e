"""Shape tests for the 2D U-Net, ForceUnet, and boundary-sharing ops."""

import jax
import jax.numpy as jnp
import numpy as np

from cindm_tpu.models.unet2d import ForceUnet, Unet2D, WSConv2d
from cindm_tpu.sampling.diffusion2d import (
    asynchronous_clamp,
    sample_noise,
    share_states_over_boundaries,
)
from cindm_tpu.sampling.guidance2d import compute_overlap, mask_denoise


def _zeros_init(model, rng, *args):
    """Shape-only init: eval_shape traces abstractly (~2 s) where a real
    model.init pays ~100 s of per-op XLA mini-compiles on this 1-core box.
    Zero params are fine for shape/finiteness assertions (GN/WS-conv are
    eps-guarded); value-sensitive tests must use real init."""
    shapes = jax.eval_shape(model.init, rng, *args)
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def test_unet2d_shapes():
    model = Unet2D(dim=16, dim_mults=(1, 2), channels=21)
    x = jnp.zeros((2, 16, 16, 21))
    t = jnp.array([0, 500])
    params = _zeros_init(model, jax.random.PRNGKey(0), x, t)
    out = jax.jit(model.apply)(params, x, t)
    assert out.shape == (2, 16, 16, 21)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_forceunet_shapes():
    model = ForceUnet(dim=16, dim_mults=(1, 2))
    x = jnp.zeros((3, 16, 16, 4))
    params = _zeros_init(model, jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(params, x)
    assert out.shape == (3, 2)


def test_wsconv_weight_standardization():
    m = WSConv2d(8, 3)
    x = jnp.ones((1, 8, 8, 4))
    p = m.init(jax.random.PRNGKey(0), x)
    # scaling the kernel must (nearly) not change the output — standardization
    # is scale-invariant up to the fixed eps inside rsqrt(var + eps)
    p2 = {"params": {"kernel": p["params"]["kernel"] * 3.0, "bias": p["params"]["bias"]}}
    o1 = m.apply(p, x)
    o2 = m.apply(p2, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-2, atol=1e-2)


def test_share_states_mean():
    B, nb, H, W, C = 2, 3, 4, 4, 9
    x = jax.random.normal(jax.random.PRNGKey(0), (B * nb, H, W, C))
    y = share_states_over_boundaries(x, nb, use_average_share=True)
    yb = np.asarray(y).reshape(B, nb, H, W, C)
    xb = np.asarray(x).reshape(B, nb, H, W, C)
    # state channels equal across boundaries and equal to the mean
    np.testing.assert_allclose(yb[:, 0, ..., : C - 3], xb[..., : C - 3].mean(1), atol=1e-6)
    np.testing.assert_allclose(yb[:, 1, ..., : C - 3], yb[:, 0, ..., : C - 3])
    # boundary channels untouched
    np.testing.assert_allclose(yb[..., C - 3 :], xb[..., C - 3 :])


def test_sample_noise_shares_states():
    x = sample_noise(jax.random.PRNGKey(0), 2, 3, 8, 8, 9)
    xb = np.asarray(x).reshape(2, 3, 8, 8, 9)
    np.testing.assert_allclose(xb[:, 0, ..., :6], xb[:, 1, ..., :6])
    assert not np.allclose(xb[:, 0, ..., 6:], xb[:, 1, ..., 6:])


def test_asynchronous_clamp_groups():
    x = jnp.ones((2, 4, 4, 9)) * 5.0
    y = np.asarray(asynchronous_clamp(x))
    assert y[..., :6].max() == 1.0
    assert y[..., 6].max() == 1.0
    assert y[..., 7:].max() == 0.5
    x2 = jnp.ones((2, 4, 4, 9)) * -5.0
    y2 = np.asarray(asynchronous_clamp(x2))
    assert y2[..., :6].min() == -1.0
    assert y2[..., 6].min() == 0.0
    assert y2[..., 7:].min() == -0.5


def test_compute_overlap_zero_for_disjoint():
    m = np.zeros((1, 2, 16), np.float32)
    m[0, 0, :8] = 1
    m[0, 1, 8:] = 1
    assert float(compute_overlap(jnp.asarray(m))[0]) == 0.0
    m[0, 1, :8] = 1  # now overlapping
    assert float(compute_overlap(jnp.asarray(m))[0]) > 0.0


def test_mask_denoise():
    x = jnp.array([0.2, 0.7, 0.5])
    np.testing.assert_array_equal(np.asarray(mask_denoise(x)), [0, 1, 0])


def test_separation_objective_gradient_separates():
    """The separation term's gradient must TRANSLATE overlapping masks
    apart (VERDICT r2 #1 ablation), unlike the overlap penalty which only
    shrinks them."""
    from cindm_tpu.sampling.guidance2d import (
        mask_centroids,
        separation_objective,
    )

    H = W = 32
    x = np.zeros((2, H, W, 9), np.float32)  # B=1, nb=2
    # two nearly-coincident square masks (slightly offset centroids — the
    # round-2 diagnostic showed coalesced designs differ by |Δ|~0.007, not 0)
    x[0, 12:20, 12:20, -3] = 1.0
    x[1, 12:20, 14:22, -3] = 1.0
    xj = jnp.asarray(x)
    c = np.asarray(mask_centroids(xj, 1, 2))
    assert c.shape == (1, 2, 2)
    obj0 = float(separation_objective(xj, 1, 2, scale=8.0))
    assert obj0 > 0.0  # near-coincident → penalty active
    g = jax.grad(lambda v: separation_objective(v, 1, 2, scale=8.0))(xj)
    # descend: centroids must move further apart
    x1 = xj - 5.0 * g
    c1 = np.asarray(mask_centroids(x1, 1, 2))
    d0 = np.linalg.norm(c[0, 0] - c[0, 1])
    d1 = np.linalg.norm(c1[0, 0] - c1[0, 1])
    assert d1 > d0
    # far-apart masks → negligible penalty
    y = np.zeros((2, H, W, 9), np.float32)
    y[0, 2:6, 2:6, -3] = 1.0
    y[1, 26:30, 26:30, -3] = 1.0
    assert float(separation_objective(jnp.asarray(y), 1, 2, scale=4.0)) < 1e-3
