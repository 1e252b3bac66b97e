"""GNS — graph network simulator baseline, dense TPU formulation.

TPU-native re-design of the reference GNS stack (`GNS_model/dyn_model.py`,
`GNS_model/layers/GNN_dmwater.py`, config `GNS_model/configs/Nbody.yaml`):
encoder-processor-decoder over an n-body interaction graph. The reference
builds edges with a host-side cKDTree radius query + scatter_add
(`dyn_model.py:83-119`); with n ≤ 8 bodies a **dense masked [n, n]
adjacency** is strictly better on TPU — no host round-trip, no dynamic
shapes, message passing becomes batched matmuls.

Preserved semantics:
- node features = (N_HIS-1) velocity diffs ∥ clipped wall distances ∥ type
  embedding (`dyn_model.py:59-81`)
- edge features = (Δpos/R ∥ ‖Δpos‖/R), edges where dist < RADIUS, optional
  self edges (`dyn_model.py:83-119`)
- 5 MessagePassing layers: edge MLP on [dst ∥ src ∥ edge], scatter-sum to
  receivers, node MLP on [node ∥ effects], LayerNorm ends, residual on
  nodes that touch an edge + edge residual (`GNN_dmwater.py:9-56`)
- decoder → per-step acceleration(s); autoregressive position update
  x_{k+1} = x_k + v_k + a (`dyn_model.py:122-197`)
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.blocks import Dense


@dataclasses.dataclass(frozen=True)
class GNSConfig:
    """Mirrors `GNS_model/configs/Nbody.yaml`."""

    n_his: int = 4
    hidden_size: int = 128
    gnn_layers: int = 5
    out_size: int = 2  # 2 = one acceleration step; 2k = k steps at once
    radius: float = 0.015
    particle_emb_size: int = 16
    num_particle_types: int = 1
    self_edge: bool = True
    bounds: tuple = ((0.0, 1.0), (0.0, 1.0))  # normalized box


def _mlp(hidden: int, out: int, layer_norm: bool = True):
    class MLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.relu(Dense(hidden)(x))
            x = nn.relu(Dense(hidden)(x))
            x = Dense(out)(x)
            if layer_norm:
                x = nn.LayerNorm()(x)
            return x

    return MLP()


class GNSNet(nn.Module):
    """Single-step (or k-step) acceleration predictor over [B, n, n_his, 2]
    position histories. Dense edges; vmapped over batch."""

    cfg: GNSConfig = GNSConfig()

    @nn.compact
    def __call__(self, poss: jax.Array, particle_type: jax.Array) -> jax.Array:
        """poss: [B, n, n_his, 2]; particle_type: [B, n] int. → acc [B, n, out_size]."""
        cfg = self.cfg
        B, n, H, _ = poss.shape
        vels = poss[:, :, 1:] - poss[:, :, :-1]  # [B, n, H-1, 2]
        vels = vels.reshape(B, n, -1)
        pos_last = poss[:, :, -1]  # [B, n, 2]
        bounds = jnp.asarray(cfg.bounds)  # [2, 2] (lo, hi) per dim? stored as ((lo,hi),..)
        lo = bounds[:, 0][None, None]
        hi = bounds[:, 1][None, None]
        dist_walls = jnp.concatenate([pos_last - lo, hi - pos_last], axis=-1)
        dist_walls = jnp.clip(dist_walls / cfg.radius, -1.0, 1.0)
        type_emb = nn.Embed(cfg.num_particle_types, cfg.particle_emb_size)(particle_type)
        nodes_in = jnp.concatenate([vels, dist_walls, type_emb], axis=-1)

        # dense edges
        dvec = (pos_last[:, :, None, :] - pos_last[:, None, :, :]) / cfg.radius  # [B,n,n,2] sender i → receiver j is [i, j]?
        # safe norm: self-edges have dvec == 0 and jnp.linalg.norm has a NaN
        # gradient at 0 (torch defines it as 0) — poisons GNS training
        dist = jnp.sqrt(jnp.sum(jnp.square(dvec), axis=-1, keepdims=True) + 1e-12)
        edges_in = jnp.concatenate([dvec, dist], axis=-1)  # [B, n, n, 3]
        eye = jnp.eye(n, dtype=bool)[None]
        adj = dist[..., 0] < 1.0  # dist already /radius
        adj = adj & (~eye) if not cfg.self_edge else (adj & ~eye) | eye
        adj_f = adj.astype(poss.dtype)[..., None]  # [B, n, n, 1]

        h = cfg.hidden_size
        nodes = _mlp(h, h)(nodes_in)  # [B, n, h]
        edges = _mlp(h, h)(edges_in)  # [B, n, n, h]

        for _ in range(cfg.gnn_layers):
            # edge update on [dst ∥ src ∥ edge]; row index = sender, col = receiver
            src = jnp.broadcast_to(nodes[:, :, None, :], (B, n, n, h))
            dst = jnp.broadcast_to(nodes[:, None, :, :], (B, n, n, h))
            e_out = _mlp(h, h)(jnp.concatenate([dst, src, edges], axis=-1)) * adj_f
            effects = jnp.sum(e_out, axis=1)  # sum over senders → per-receiver [B, n, h]
            n_out = _mlp(h, h)(jnp.concatenate([nodes, effects], axis=-1))
            # residual only on nodes touching an edge (`GNN_dmwater.py:53-55`)
            has_edge = jnp.any(adj, axis=2, keepdims=False)[..., None].astype(nodes.dtype)
            nodes = nodes + n_out * has_edge
            edges = edges + e_out

        return _mlp(h, cfg.out_size, layer_norm=False)(nodes)


def gns_rollout(
    apply_fn,
    params,
    poss0: jax.Array,  # [B, n, n_his, 2]
    particle_type: jax.Array,
    n_steps: int,
) -> jax.Array:
    """Autoregressive rollout (`dyn_model.py:141-155`):
    x_{k+1} = x_k + (x_k - x_{k-1}) + a. Returns positions [B, n, n_steps, 2]."""

    def step(poss, _):
        acc = apply_fn(params, poss, particle_type)  # [B, n, 2]
        vel = poss[:, :, -1] - poss[:, :, -2]
        new_pos = poss[:, :, -1] + vel + acc
        poss = jnp.concatenate([poss[:, :, 1:], new_pos[:, :, None]], axis=2)
        return poss, new_pos

    _, traj = jax.lax.scan(step, poss0, None, length=n_steps)
    return jnp.transpose(traj, (1, 2, 0, 3))


def make_gns_loss(
    apply_fn,
    cfg: GNSConfig,
    n_bodies: int,
    mode: str,  # "autoregress" | "cond_one" | "direct"
    time_interval: int = 4,
    noise_std: float = 6.7e-7,
):
    """Training loss for the GNS family over diffusion-layout batches
    {'x': [B, T, n*4] normalized}.

    Reference semantics (`model/diffusion_1d.py:2798-2830`): rollout the
    model, loss = L1(pred_poss, tgt_poss) + L1(pred_accns, tgt_accns), with
    random-walk noise (NET.NOISE = 6.7e-7, `GNS_model/configs/Nbody.yaml:28`)
    injected into the input history (`utils.py:1154-1168`).

    Modes:
    - "autoregress": Net semantics — real cfg.n_his-frame history, 1-step
      model rolled out over the remaining window (`dyn_model.py:122-197`).
    - "cond_one": Net_cond_one — conditioned on ONE (pos, vel) frame; the
      2-frame history is synthesized by constant-velocity back-extrapolation,
      exactly how the design driver feeds it (`dyn_model.py:210`,
      `inverse_design_1d_baseline.py:440-478`).
    - "direct": Net_cond_one with output_size = 2·k — one call predicts all
      k accelerations, integrated twice (`dyn_model.py:157-180`).
    """
    from ..utils.extras import random_walk_noise

    def loss_fn(params, batch, key):
        x = batch["x"]  # [B, T, n*4]
        B, T, _ = x.shape
        xr = x.reshape(B, T, n_bodies, 4)
        pos = jnp.transpose(xr[..., :2], (0, 2, 1, 3))  # [B, n, T, 2]
        if mode == "autoregress":
            H = cfg.n_his
            hist = pos[:, :, :H]
            tgt = pos[:, :, H:]
        else:
            # one (pos, vel) frame → 2-frame history; vel is stored in raw
            # units/200, one window frame spans time_interval sim steps
            vel0 = jnp.transpose(xr[..., 2:], (0, 2, 1, 3))[:, :, 0] * (
                time_interval / 60.0
            )
            p0 = pos[:, :, 0]
            hist = jnp.stack([p0 - vel0, p0], axis=2)  # [B, n, 2, 2]
            tgt = pos[:, :, 1:]
        if noise_std > 0:
            Hh = hist.shape[2]
            noise = random_walk_noise(key, (B * n_bodies, Hh, 2), noise_std)
            hist = hist + noise.reshape(hist.shape)
        k = tgt.shape[2]
        ptype = jnp.zeros((B, n_bodies), jnp.int32)
        if mode == "direct":
            pred = gns_direct_rollout(apply_fn, params, hist, ptype, k)
        else:
            pred = gns_rollout(apply_fn, params, hist, ptype, k)
        pad = hist[:, :, -2:]

        def accs(seq):  # second differences: a_j = p_{j+1} - 2 p_j + p_{j-1}
            return seq[:, :, 2:] - 2 * seq[:, :, 1:-1] + seq[:, :, :-2]

        pred_acc = accs(jnp.concatenate([pad, pred], axis=2))
        tgt_acc = accs(jnp.concatenate([pad, tgt], axis=2))
        return jnp.mean(jnp.abs(pred - tgt)) + jnp.mean(jnp.abs(pred_acc - tgt_acc))

    return loss_fn


def gns_direct_rollout(
    apply_fn, params, poss0: jax.Array, particle_type: jax.Array, n_steps: int
) -> jax.Array:
    """"GNS_direct": one call predicts all n_steps accelerations at once
    (out_size = 2·n_steps), integrated twice (`dyn_model.py:157-180`)."""
    acc = apply_fn(params, poss0, particle_type)  # [B, n, 2*n_steps]
    B, n, _ = acc.shape
    acc = acc.reshape(B, n, n_steps, 2)
    v_last = (poss0[:, :, -1] - poss0[:, :, -2])[:, :, None]
    vel = v_last + jnp.cumsum(acc, axis=2)
    pos = poss0[:, :, -1][:, :, None] + jnp.cumsum(vel, axis=2)
    return pos
