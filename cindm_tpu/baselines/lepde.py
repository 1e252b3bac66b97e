"""LE-PDE — latent evolution surrogate baseline.

TPU-native re-design of the reference `Contrastive` model
(`le_pde/models.py:80-1250`): CNN encoder → flat latent (default 160) +
static-parameter encoder → MLP latent evolution operator → CNN decoder
(`CNN_Encoder :1387`, `Evolution_Op :1786`, `CNN_Decoder :1598`). Losses =
reconstruction + latent consistency + multi-step prediction
(`get_loss :1143`, `le_pde/utils.py:251`); the autoregressive stepper
`get_data_next_step` (`le_pde/utils.py:137`) becomes a `lax.scan` rollout.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.blocks import Dense


@dataclasses.dataclass(frozen=True)
class LEPDEConfig:
    latent_size: int = 160
    channels: int = 3  # (vx, vy, p)
    static_channels: int = 3  # (mask, offx, offy)
    static_latent_size: int = 16
    enc_dim: int = 32
    evo_hidden: int = 256
    n_conv: int = 4  # 64 → 4 after 4 stride-2 convs


class CNNEncoder(nn.Module):
    cfg: LEPDEConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.cfg
        for k in range(c.n_conv):
            x = nn.Conv(c.enc_dim * (2**k), (3, 3), strides=(2, 2), padding="SAME")(x)
            x = nn.elu(x)
        x = x.reshape(x.shape[0], -1)
        return Dense(c.latent_size)(x)


class StaticEncoder(nn.Module):
    cfg: LEPDEConfig

    @nn.compact
    def __call__(self, static: jax.Array) -> jax.Array:
        c = self.cfg
        x = static
        for k in range(2):
            x = nn.Conv(c.enc_dim, (3, 3), strides=(4, 4), padding="SAME")(x)
            x = nn.elu(x)
        x = x.reshape(x.shape[0], -1)
        return Dense(c.static_latent_size)(x)


class EvolutionOp(nn.Module):
    """MLP z_{t+1} = f(z_t ∥ z_static) (`le_pde/models.py:1786-1850`)."""

    cfg: LEPDEConfig

    @nn.compact
    def __call__(self, z: jax.Array, z_static: jax.Array) -> jax.Array:
        c = self.cfg
        h = jnp.concatenate([z, z_static], axis=-1)
        h = nn.elu(Dense(c.evo_hidden)(h))
        h = nn.elu(Dense(c.evo_hidden)(h))
        return Dense(c.latent_size)(h)


class CNNDecoder(nn.Module):
    cfg: LEPDEConfig
    out_hw: int = 64

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        c = self.cfg
        hw0 = self.out_hw // (2**c.n_conv)
        ch0 = c.enc_dim * (2 ** (c.n_conv - 1))
        x = Dense(hw0 * hw0 * ch0)(z).reshape(z.shape[0], hw0, hw0, ch0)
        for k in range(c.n_conv - 1, 0, -1):
            x = nn.ConvTranspose(c.enc_dim * (2 ** (k - 1)), (4, 4), strides=(2, 2), padding="SAME")(x)
            x = nn.elu(x)
        x = nn.ConvTranspose(c.channels, (4, 4), strides=(2, 2), padding="SAME")(x)
        return x


class LEPDE(nn.Module):
    """Full model: encode u_t (+ static boundary) → evolve k → decode u_{t+k}."""

    cfg: LEPDEConfig = LEPDEConfig()
    out_hw: int = 64

    def setup(self):
        self.encoder = CNNEncoder(self.cfg)
        self.static_encoder = StaticEncoder(self.cfg)
        self.evolution = EvolutionOp(self.cfg)
        self.decoder = CNNDecoder(self.cfg, self.out_hw)

    def __call__(self, u: jax.Array, static: jax.Array, n_steps: int = 1) -> jax.Array:
        """u: [B, H, W, C]; static: [B, H, W, Cs]. → [B, n_steps, H, W, C]."""
        z = self.encoder(u)
        zs = self.static_encoder(static)
        # n_steps is small & static: a Python loop keeps linen modules happy
        # (lax.scan over bound submodules needs nn.scan lifting)
        outs = []
        for _ in range(n_steps):
            z = self.evolution(z, zs)
            outs.append(self.decoder(z))
        return jnp.stack(outs, axis=1)

    def encode(self, u, static):
        return self.encoder(u), self.static_encoder(static)

    def decode(self, z):
        return self.decoder(z)


def lepde_loss(
    model: LEPDE,
    params,
    u0: jax.Array,
    static: jax.Array,
    targets: jax.Array,  # [B, K, H, W, C]
    multi_step_dict: dict | None = None,
    loss_type: str = "mse",
) -> jax.Array:
    """recons + latent-consistency + multi-step loss (`le_pde/models.py:1143-1250`).

    ``multi_step_dict`` ({step: weight}, `le_pde/utils.py:713` semantics)
    weights the prediction loss per rollout step; default = uniform mse
    over all K steps (the previous behavior).
    """
    def apply(fn_name, *args):
        return model.apply(params, *args, method=getattr(model, fn_name))

    z0, zs = apply("encode", u0, static)
    recon = apply("decode", z0)
    loss_recon = jnp.mean(jnp.square(recon - u0))
    preds = model.apply(params, u0, static, targets.shape[1])
    if multi_step_dict is None:
        loss_pred = jnp.mean(jnp.square(preds - targets))
    else:
        from .harness import loss_core

        loss_pred = sum(
            w * loss_core(preds[:, k - 1], targets[:, k - 1], loss_type)
            for k, w in multi_step_dict.items()
        ) / sum(multi_step_dict.values())
    # latent consistency: evolving z0 should match encoding the target
    B, K = targets.shape[:2]
    z_t, _ = apply("encode", targets[:, 0], static)
    z_evo = model.apply(
        params, z0, zs, method=lambda m, z, s: m.evolution(z, s)
    )
    loss_latent = jnp.mean(jnp.square(z_evo - z_t))
    return loss_pred + 0.1 * loss_recon + 0.1 * loss_latent
