"""Torch→Flax checkpoint conversion tests: per-layer numeric parity against
torch.nn, and structural round-trip into our TemporalUnet1D."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from cindm_tpu.models import TemporalUnet1D
from cindm_tpu.models.blocks import mish
from cindm_tpu.utils.torch_convert import (
    _conv1d,
    _convT1d,
    _linear,
    convert_temporal_unet1d,
)


def test_conv1d_weight_parity():
    tconv = torch.nn.Conv1d(6, 10, 5, padding=2)
    x = np.random.default_rng(0).normal(size=(2, 6, 24)).astype(np.float32)
    want = tconv(torch.tensor(x)).detach().numpy()  # [B, O, T]
    k = _conv1d(tconv.weight.detach().numpy())
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x.transpose(0, 2, 1)), k, (1,), [(2, 2)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + jnp.asarray(tconv.bias.detach().numpy())
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), want, rtol=1e-4, atol=1e-5)


def test_linear_weight_parity():
    tl = torch.nn.Linear(8, 12)
    x = np.random.default_rng(1).normal(size=(3, 8)).astype(np.float32)
    want = tl(torch.tensor(x)).detach().numpy()
    out = jnp.asarray(x) @ _linear(tl.weight.detach().numpy()) + jnp.asarray(
        tl.bias.detach().numpy()
    )
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


def test_conv_transpose1d_weight_parity():
    tc = torch.nn.ConvTranspose1d(6, 6, 4, stride=2, padding=1)
    x = np.random.default_rng(2).normal(size=(2, 6, 12)).astype(np.float32)
    want = tc(torch.tensor(x)).detach().numpy()  # [B, C, 2T]
    from flax import linen as nn

    k = _convT1d(tc.weight.detach().numpy())
    out = jax.lax.conv_transpose(
        jnp.asarray(x.transpose(0, 2, 1)), k, strides=(2,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + jnp.asarray(tc.bias.detach().numpy())
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 2, 1), want, rtol=1e-3, atol=1e-4
    )


def _synthetic_state_dict(horizon=24, transition=8, dim=64, mults=(1, 2, 4, 8)):
    """Build a random torch-layout state_dict with the reference shapes."""
    rng = np.random.default_rng(0)
    sd = {}

    def add(k, *shape):
        sd[k] = rng.normal(size=shape).astype(np.float32) * 0.05

    dims = [transition] + [dim * m for m in mults]
    in_out = list(zip(dims[:-1], dims[1:]))
    add("time_mlp.1.weight", dim * 4, dim)
    add("time_mlp.1.bias", dim * 4)
    add("time_mlp.3.weight", dim, dim * 4)
    add("time_mlp.3.bias", dim)

    def rtb(prefix, cin, cout):
        add(f"{prefix}.blocks.0.block.0.weight", cout, cin, 5)
        add(f"{prefix}.blocks.0.block.0.bias", cout)
        add(f"{prefix}.blocks.0.block.2.weight", cout)
        add(f"{prefix}.blocks.0.block.2.bias", cout)
        add(f"{prefix}.blocks.1.block.0.weight", cout, cout, 5)
        add(f"{prefix}.blocks.1.block.0.bias", cout)
        add(f"{prefix}.blocks.1.block.2.weight", cout)
        add(f"{prefix}.blocks.1.block.2.bias", cout)
        add(f"{prefix}.time_mlp.1.weight", cout, dim)
        add(f"{prefix}.time_mlp.1.bias", cout)
        if cin != cout:
            add(f"{prefix}.residual_conv.weight", cout, cin, 1)
            add(f"{prefix}.residual_conv.bias", cout)

    def attn(prefix, c):
        add(f"{prefix}.fn.norm.g", 1, c, 1)
        add(f"{prefix}.fn.fn.to_qkv.weight", 384, c, 1)
        add(f"{prefix}.fn.fn.to_out.weight", c, 128, 1)
        add(f"{prefix}.fn.fn.to_out.bias", c)

    for i, (cin, cout) in enumerate(in_out):
        rtb(f"downs.{i}.0", cin, cout)
        rtb(f"downs.{i}.1", cout, cout)
        attn(f"downs.{i}.2", cout)
        if i < len(in_out) - 1:  # horizon 24 % 8 == 0: downsample at 0,1,2
            add(f"downs.{i}.3.conv.weight", cout, cout, 3)
            add(f"downs.{i}.3.conv.bias", cout)

    mid = dims[-1]
    rtb("mid_block1", mid, mid)
    attn("mid_attn", mid)
    rtb("mid_block2", mid, mid)

    up_in_out = list(reversed(in_out[1:]))
    for i, (cin, cout) in enumerate(up_in_out):
        rtb(f"ups.{i}.0", cout * 2, cout)
        rtb(f"ups.{i}.1", cout, cin)
        attn(f"ups.{i}.2", cin)
        add(f"ups.{i}.3.conv.weight", cin, cin, 4)
        add(f"ups.{i}.3.conv.bias", cin)

    add("final_conv.0.block.0.weight", dim, dim, 5)
    add("final_conv.0.block.0.bias", dim)
    add("final_conv.0.block.2.weight", dim)
    add("final_conv.0.block.2.bias", dim)
    add("final_conv.1.weight", transition, dim, 1)
    add("final_conv.1.bias", transition)
    return sd


@pytest.mark.slow
def test_full_model_conversion_structure_and_forward():
    sd = _synthetic_state_dict()
    params = convert_temporal_unet1d(sd, horizon=24)
    model = TemporalUnet1D(horizon=24, transition_dim=8, dim=64, attention=True)
    ref = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 24, 8)), jnp.zeros(1, jnp.int32)
    )
    # identical tree structure and shapes
    ref_shapes = jax.tree.map(lambda a: a.shape, ref)
    got_shapes = jax.tree.map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes
    out = model.apply(params, jnp.ones((2, 24, 8)) * 0.1, jnp.array([5, 10]))
    assert out.shape == (2, 24, 8)
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.slow  # builds a real torch model + full flax forward: ~100 s here
def test_load_reference_checkpoint_pt(tmp_path):
    """Round-trip a reference-style .pt milestone dict through the loader
    (`model/diffusion_1d.py:2635-2647` layout, EMA-prefixed keys)."""
    sd = _synthetic_state_dict()
    tsd = {f"ema_model.{k}": torch.tensor(v) for k, v in sd.items()}
    ckpt = {"step": 123, "model": {}, "ema": tsd, "opt": {}, "scaler": None}
    path = str(tmp_path / "model-9.pt")
    torch.save(ckpt, path)

    from cindm_tpu.utils.torch_convert import load_reference_checkpoint

    params = load_reference_checkpoint(path, horizon=24)
    model = TemporalUnet1D(horizon=24, transition_dim=8, dim=64, attention=True)
    out = model.apply(params, jnp.ones((1, 24, 8)) * 0.1, jnp.array([3]))
    assert out.shape == (1, 24, 8)
    assert bool(jnp.all(jnp.isfinite(out)))
