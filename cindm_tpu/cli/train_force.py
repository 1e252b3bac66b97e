"""train_force — ForceUnet lift/drag surrogate training CLI.

The reference ships a pretrained `force_surrogate_model.pth` loaded at
design time (`inference/inverse_design_2d.py:162-168`); here the surrogate
is trained from scratch on BDIM-recorded pressure fields and polygon
pressure forces: input [pressure, mask, offx, offy] → (drag, lift)
(`model/diffusion_2d.py:411-486` architecture).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train ForceUnet on BDIM data (TPU)")
    p.add_argument("--n_sims", type=int, default=8)
    p.add_argument("--train_num_steps", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--dim_mults", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--results_folder", default="./results/force_surrogate")
    p.add_argument("--is_testdata", type=lambda s: s == "True", default=True)
    p.add_argument("--data_cache", default=None,
                   help="generate_airfoil_sims cache dir shared across CLIs")
    p.add_argument("--x_band", type=float, nargs=2, default=[0.25, 0.45])
    p.add_argument("--y_band", type=float, nargs=2, default=[0.4, 0.6])
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    from ..utils.heartbeat import start_heartbeat

    start_heartbeat()  # log-liveness under the queue watchdog
    from ..data.airfoil import AirfoilDatasetConfig, generate_airfoil_sims
    from ..models.unet2d import ForceUnet
    from ..physics.bdim import BDIMConfig
    from ..train import (
        CheckpointManager,
        TrainConfig,
        init_train_state,
        make_optimizer,
        make_train_step_from_loss,
    )
    from ..utils.cache import enable_compile_cache

    enable_compile_cache()
    args = build_parser().parse_args(argv)
    acfg = AirfoilDatasetConfig(
        time_stamps=40 if args.is_testdata else 100,
        n_warmup=60 if args.is_testdata else 300,
        x_band=tuple(args.x_band), y_band=tuple(args.y_band),
    )
    data = generate_airfoil_sims(
        args.seed, args.n_sims, acfg, BDIMConfig(), cache_dir=args.data_cache
    )

    # (pressure+boundary → force) pairs from every recorded frame, gathered
    # lazily per batch: materializing the full [S·T, 64, 64, 4] tensor is
    # ~7 GB of strided single-core numpy copies (~15 min on this 1-core
    # host) for data the loop touches ~2 MB of per step
    S, T = data["fields"].shape[:2]
    press = data["fields"][..., 2]  # [S, T, 62, 62]
    aux = np.concatenate(
        [data["mask"][..., None], data["offset"]], axis=-1
    )  # [S, 62, 62, 3]
    targets_all = data["forces"][..., 0, :]  # [S, T, 2] (Fx=drag, Fy=lift)

    def gather_batch(flat_idx: np.ndarray):
        s, t = flat_idx // T, flat_idx % T
        x = np.concatenate([press[s, t][..., None], aux[s]], axis=-1)
        x = np.pad(x, ((0, 0), (0, 2), (0, 2), (0, 0)))  # [B, 64, 64, 4]
        return x, targets_all[s, t]

    model = ForceUnet(dim=args.dim, dim_mults=tuple(args.dim_mults))
    key = jax.random.PRNGKey(args.seed)
    params = model.init(key, jnp.zeros((1, 64, 64, 4)))
    print(f"Number of parameter: {sum(p.size for p in jax.tree.leaves(params))/1e6:.2f}M")

    def loss_fn(params, batch, key):
        x, y = batch
        pred = model.apply(params, x)
        return jnp.mean(jnp.square(pred - y))

    tcfg = TrainConfig(lr=args.lr, ema_update_every=1)
    state = init_train_state(params, make_optimizer(tcfg))
    step = make_train_step_from_loss(loss_fn, tcfg)
    mngr = CheckpointManager(args.results_folder)
    rng = np.random.default_rng(args.seed)
    for i in range(args.train_num_steps):
        idx = rng.integers(0, S * T, args.batch_size)
        x_np, y_np = gather_batch(idx)
        batch = (jnp.asarray(x_np), jnp.asarray(y_np))
        state, loss = step(state, batch, jax.random.fold_in(key, i))
        if i % 10 == 0 or i == args.train_num_steps - 1:
            print(f"step {i}: loss {float(loss):.6f}")
    mngr.save(1, state)
    return state


if __name__ == "__main__":
    main()
